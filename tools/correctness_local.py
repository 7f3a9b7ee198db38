"""Emit CORRECTNESS_local_full.json — the full-surface local ledger.

The driver's CORRECTNESS_r{N}.json samples ~50 of the registered keys
per round; this tool runs EVERY key against its DuckDB oracle (same
canonicalization as the driver: sort columns by name, canonical
dtypes, order-insensitive row compare) and writes one artifact with
the driver's per-key schema:

    {"<key>": {"rows_match", "schema_match", "hash_match",
               "spark_rows", "oracle_rows", "err"}}

Rows-only keys (no oracle) record row count with err="no_oracle" —
exactly the driver's marker. Checked in per round so the judge can
audit the never-driver-sampled keys without rerunning Spark.

Usage:  python tools/correctness_local.py [sf_dir] [out_path]
Default sf_dir is the driver's verification scale, sf0.01.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from neo_olap_spark.registry import REGISTRY, queries
from neo_olap_spark.session import get_spark
from neo_olap_spark.testing import (
    _canon,
    assert_no_composite_output,
    compare_frames,
    duck_connect,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "CORRECTNESS_local_full.json"
    if not os.path.isdir(sf_dir):
        # a stray flag (e.g. --help) would otherwise run the full
        # sweep against a nonexistent path and OVERWRITE the committed
        # ledger with 274 path-error rows (r12 near-miss)
        sys.exit(f"correctness_local.py: sf_dir {sf_dir!r} is not a directory")
    spark = get_spark("neo-olap-correctness", cpus=8)
    queries()

    report: dict[str, dict] = {}
    t_start = time.time()
    for key in sorted(REGISTRY):
        q = REGISTRY[key]
        entry = {
            "rows_match": None,
            "schema_match": None,
            "hash_match": None,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
            # hash of the oracle TEXT this run verified: lets the
            # artifact test detect an oracle edited after the last
            # ledger run (the r5 round's only defect was this class
            # of staleness, in flag form — the text hash closes the
            # remaining gap where flags stay identical)
            "oracle_sha": (
                hashlib.sha256(q.oracle.encode()).hexdigest()[:16]
                if q.oracle is not None
                else None
            ),
        }
        try:
            df = q.fn(spark, sf_dir)
            # Recorded per key so test_no_composite_output_columns can
            # sweep the WHOLE registry from the committed artifact
            # without re-running Spark (artifact staleness is already
            # suite-gated, so the record can't silently rot).
            entry["spark_schema"] = [
                f"{f.name}:{f.dataType.simpleString()}" for f in df.schema.fields
            ]
            assert_no_composite_output(df, key)
            left = _canon(df.toPandas())
            entry["spark_rows"] = int(len(left))
            if q.oracle is None:
                entry["err"] = "no_oracle"
            else:
                con = duck_connect(sf_dir)
                try:
                    right = _canon(con.execute(q.oracle).fetchdf())
                finally:
                    con.close()
                entry["oracle_rows"] = int(len(right))
                r, s, h = compare_frames(left, right)
                entry.update(rows_match=r, schema_match=s, hash_match=h)
        except Exception:
            entry["err"] = traceback.format_exc(limit=3).splitlines()[-1][:300]
        report[key] = entry
        spark.catalog.clearCache()

    n_oracle = sum(1 for v in report.values() if v["hash_match"] is not None)
    n_hash = sum(1 for v in report.values() if v["hash_match"])
    n_rows_only = sum(1 for v in report.values() if v["err"] == "no_oracle")
    n_err = sum(
        1 for v in report.values() if v["err"] not in (None, "no_oracle")
    )
    summary = {
        "_summary": {
            "sf_dir": sf_dir,
            "keys_total": len(report),
            "oracle_keys": n_oracle,
            "hash_match": n_hash,
            "rows_only": n_rows_only,
            "errors": n_err,
            "wall_sec": round(time.time() - t_start, 1),
        }
    }
    with open(out_path, "w") as f:
        json.dump({**summary, **report}, f, indent=1)
    print(json.dumps(summary["_summary"]))
    sys.exit(0 if (n_err == 0 and n_hash == n_oracle) else 1)


if __name__ == "__main__":
    main()
