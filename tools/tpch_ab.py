"""TPC-H drift adjudication tool (VERDICT r5 item 3).

tpch_total moved 13.69 → 14.03 → 15.08 s across r3→r5 on a frozen
wave. This tool separates code from environment:

- ``time`` mode: run the full TPCH wave once in THIS process (cold
  numbers, same shape as bench.py) and print per-query seconds.
  Run it N times as N isolated processes; compare medians.
- ``plans`` mode: dump a NORMALIZED ``EXPLAIN FORMATTED`` per query to
  a directory — plan-node ids, codegen ids, and paths stripped, so two
  dumps diff clean iff the physical plans differ. Run at two commits
  (git worktree) and ``diff -r`` the dumps: identical plans + slower
  wall = environment; changed plan = code.

Usage:
  python tools/tpch_ab.py time
  python tools/tpch_ab.py plans /tmp/plans_current
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import TPCH  # the frozen wave definition — never re-declare
from neo_olap_spark.registry import queries
from neo_olap_spark.session import get_spark


def _normalize_plan(text: str) -> str:
    """Strip run-varying tokens so identical physical plans diff empty:
    plan node ids `(12)`, codegen stage ids, exchange/subquery ids,
    file paths, statistics, and pointer-ish hex."""
    text = re.sub(r"\(\d+\)", "(#)", text)
    text = re.sub(r"\[codegen id : \d+\]", "[codegen id : #]", text)
    text = re.sub(r"\[id=#?\d+\]", "[id=#]", text)
    text = re.sub(r"#\d+L?", "#x", text)  # attribute exprIds
    text = re.sub(r"file:[^\],\s]+", "file:PATH", text)
    text = re.sub(r"0x[0-9a-f]+", "0xHEX", text)
    text = re.sub(r"subquery\d+", "subqueryN", text)
    text = re.sub(r"cte\d+", "cteN", text)
    return text


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "time"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        "tpch-ab", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    spark.range(1000).selectExpr("sum(id)").collect()
    qs = queries()
    if mode == "time":
        out = {}
        for key in TPCH:
            t0 = time.perf_counter()
            qs[key](spark, sf_dir).write.format("noop").mode("overwrite").save()
            out[key] = round(time.perf_counter() - t0, 3)
            spark.catalog.clearCache()
        out["_total"] = round(sum(out.values()), 3)
        print(json.dumps(out))
    elif mode == "plans":
        dest = sys.argv[2]
        os.makedirs(dest, exist_ok=True)
        for key in TPCH:
            df = qs[key](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(dest, f"{key}.txt"), "w") as f:
                f.write(_normalize_plan(plan))
        print(json.dumps({"dumped": len(TPCH), "dest": dest}))
    else:
        raise SystemExit(f"unknown mode {mode!r}")


if __name__ == "__main__":
    main()
