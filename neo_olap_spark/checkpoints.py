"""Round checkpoint / resume for iterative programs (SURVEY.md §2.1 R10).

The reference checkpoints its accumulator array after every round to
``page_rank_<minNodeId>_<nodesPerRound>.int`` and deletes the previous
file (Runner.java:67-88); on restart it parses the loop state back out
of the filename (Runner.java:261-264). The Spark-native equivalent:
parquet snapshots under ``<base>/round=<step>/`` — the directory name
carries the loop state exactly like the reference's filename — with
delete-previous retention, so disk stays bounded at one round.

Parquet replaces the length-prefixed binary int format (ArrayStore
.java:13-80): columnar, compressed, splittable, schema-carrying.
"""

from __future__ import annotations

import re
import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_ROUND_RE = re.compile(r"^round=(\d+)$")
_TMP_ROUND_RE = re.compile(r"^_tmp_round=\d+$")


def round_dir(base: str, step: int) -> str:
    return f"{base}/round={step}"


def latest_round(base: str) -> int | None:
    """Parse the resume point out of the directory name — the analog of
    the reference's filename parse (Runner.java:261-264)."""
    p = Path(base)
    if not p.is_dir():
        return None
    rounds = [int(m.group(1)) for d in p.iterdir() if (m := _ROUND_RE.match(d.name))]
    return max(rounds) if rounds else None


def write_round(dfs: dict[str, DataFrame], base: str, step: int) -> None:
    """Snapshot named DataFrames under round=<step>, then delete the
    previous rounds (Runner.java:67-71 delete-after-write retention).

    Crash-safe: everything is written into a ``_tmp_round=<step>``
    staging directory, which is RENAMED to ``round=<step>`` only once
    every table landed — latest_round never matches a partial
    snapshot, so an interrupted writer resumes from the previous
    intact round."""
    base_p = Path(base)
    if base_p.is_dir():
        # drop ALL stale staging dirs, not just this step's: a crash
        # mid-snapshot followed by a resume with different
        # steps_per_round would otherwise orphan its _tmp_round=<n>
        # forever (no later write ever targets that exact step)
        for d in base_p.iterdir():
            if _TMP_ROUND_RE.match(d.name):
                shutil.rmtree(d, ignore_errors=True)
    tmp = base_p / f"_tmp_round={step}"
    for name, df in dfs.items():
        df.write.mode("overwrite").parquet(str(tmp / name))
    final = Path(round_dir(base, step))
    shutil.rmtree(final, ignore_errors=True)
    tmp.rename(final)
    for d in Path(base).iterdir():
        if (m := _ROUND_RE.match(d.name)) and int(m.group(1)) != step:
            shutil.rmtree(d, ignore_errors=True)


def read_round(spark: SparkSession, base: str, step: int, name: str) -> DataFrame:
    return spark.read.parquet(f"{round_dir(base, step)}/{name}")
