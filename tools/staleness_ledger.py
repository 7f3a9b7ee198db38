"""Per-key driver-evidence staleness ledger — the input every round's
DRIVER_WAVE_ROTATION is built from (round-workflow step: "rotate
oldest-evidence-first").

Reads every committed CORRECTNESS_r*.json, computes each key's LATEST
driver record round, and prints one JSON line:
  {"latest": {key: round, ...},        # every key ever driver-sampled
   "never_sampled": [...],             # registered keys with no record
   "tiers": {"r5": [...], "r6": [...], ...},  # oldest-first buckets
   "failing_latest": [...]}            # keys whose LATEST record failed

Usage: python tools/staleness_ledger.py [repo_dir]
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    repo = sys.argv[1] if len(sys.argv) > 1 else os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))
    )
    latest: dict[str, int] = {}
    ok: dict[str, bool] = {}
    for f in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", f)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            rows = json.load(open(f))
        except Exception:
            continue
        for key, rec in rows.items():
            if not isinstance(rec, dict):
                continue
            latest[key] = rnd
            ok[key] = bool(
                rec.get("err") is None
                and rec.get("rows_match")
                and (rec.get("hash_match") is not False)
            )
    from neo_olap_spark.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    never = sorted(k for k in REGISTRY if k not in latest)
    tiers: dict[str, list[str]] = {}
    for key, rnd in latest.items():
        tiers.setdefault(f"r{rnd}", []).append(key)
    for v in tiers.values():
        v.sort()
    print(json.dumps({
        "latest": dict(sorted(latest.items())),
        "never_sampled": never,
        "tiers": {k: tiers[k] for k in sorted(tiers)},
        "failing_latest": sorted(k for k, good in ok.items() if not good),
    }))


if __name__ == "__main__":
    main()
