"""Physical-plan introspection and scale assertions.

"Correct but mis-planned" is a failure mode at 100 TB: a scan that
reads all columns, a dim join that shuffles instead of broadcasting, a
top-K that global-sorts. These helpers make the intended physical plan
*testable* (tests/test_plans.py) so a regression in plan shape fails CI
the same way a wrong result does — the engine-side enforcement of
SURVEY.md §4's "what Catalyst gives us for free" table.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def plan_str(df: DataFrame, mode: str = "formatted") -> str:
    """The physical plan as text (what .explain() prints)."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


@contextlib.contextmanager
def runtime_bloom_filter(spark, application_side_threshold: str = "0"):
    """Enable Catalyst's runtime Bloom-filter join pruning for the
    block (InjectRuntimeFilter): the selective side of a shuffle join
    builds a bloom_filter_agg over its join keys and the big side gets
    a might_contain pre-filter — rows that can't join are dropped
    BEFORE the shuffle. This is Spark's built-in realization of the
    reference's "check the light record before materializing" pattern
    (RelationshipPreloader.java:18-21) applied to joins. The
    application-side scan threshold defaults to 10 GiB (the filter
    only pays for itself on big scans); tests lower it to 0 to make
    the injection observable at test scale."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": (
            application_side_threshold
        ),
    }
    saved: dict[str, str | None] = {}
    for k, v in confs.items():
        saved[k] = spark.conf.get(k, None)
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def assert_pushed_filter(df: DataFrame, fragment: str) -> None:
    """The parquet scan must carry a pushed filter mentioning
    ``fragment`` (predicate reached the reader: row-group skipping)."""
    p = plan_str(df)
    pushed = [ln for ln in p.splitlines() if "PushedFilters" in ln]
    assert pushed and any(fragment in ln for ln in pushed), (
        f"no pushed filter containing {fragment!r}:\n{p}"
    )


def assert_read_schema_only(df: DataFrame, table_fragment: str, columns: set[str]) -> None:
    """The scan of the table whose path contains ``table_fragment`` must
    read exactly ``columns`` (column pruning reached the reader)."""
    p = plan_str(df)
    lines = p.splitlines()
    for i, ln in enumerate(lines):
        if "Location" in ln and table_fragment in ln:
            schema_lines = [x for x in lines[i - 3 : i + 3] if "ReadSchema" in x]
            assert schema_lines, f"no ReadSchema near {table_fragment}:\n{p}"
            schema = schema_lines[0].split("struct<", 1)[-1]
            read_cols = {c.split(":")[0].strip() for c in schema.rstrip(">").split(",") if c}
            assert read_cols == columns, f"read {read_cols}, want {columns}\n{p}"
            return
    raise AssertionError(f"no scan of {table_fragment} found:\n{p}")


def assert_in_plan(df: DataFrame, *operators: str) -> None:
    p = plan_str(df)
    for op in operators:
        assert op in p, f"expected {op} in plan:\n{p}"


def assert_not_in_plan(df: DataFrame, *operators: str) -> None:
    p = plan_str(df)
    for op in operators:
        assert op not in p, f"did not expect {op} in plan:\n{p}"
