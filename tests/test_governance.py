"""Invariants for the governance / ops operators beyond oracle parity:
erase-digest canonicality, k-anonymity accounting, point-in-time
uniqueness, and backfill arithmetic."""

from __future__ import annotations

from pyspark.sql import functions as F

from neo_olap_spark.registry import queries
from neo_olap_spark.tables import load


def test_erase_digest_partitioning_invariant(spark, sf_dir):
    """The erased-row digest must be canonical: recomputing over a
    differently-partitioned input yields the identical md5 — that is
    the property that lets two independent runs prove they delete the
    same rows."""
    from neo_olap_spark.operators.quality import ERASE_MOD

    qs = queries()
    row = qs["q_privacy_erase"](spark, sf_dir).collect()[0]
    # recompute the digest from a DIFFERENTLY-PARTITIONED manual
    # pipeline: collect_list order changes, sort_array must not
    e = load(spark, sf_dir, "events").repartition(7, "event_id")
    manual = (
        e.where(F.col("user_id") % ERASE_MOD == 0)
        .agg(
            F.md5(
                F.concat_ws(
                    ",",
                    F.transform(
                        F.sort_array(F.collect_list("event_id")),
                        lambda v: v.cast("string"),
                    ),
                )
            ).alias("d")
        )
        .collect()[0]["d"]
    )
    assert row["erased_digest"] == manual
    # accounting closes: erased + kept == table size; every erased
    # user is on the deletion list
    e = load(spark, sf_dir, "events")
    assert row["n_erased"] + row["n_kept"] == e.count()
    assert (
        e.where((F.col("user_id") % ERASE_MOD == 0)).count() == row["n_erased"]
    )
    assert row["min_kept_user"] % ERASE_MOD != 0


def test_kanon_accounting_closes(spark, sf_dir):
    from neo_olap_spark.operators.quality import KANON_K

    row = queries()["q_privacy_kanon"](spark, sf_dir).collect()[0]
    c = load(spark, sf_dir, "customer")
    assert row["n_rows"] == c.count()
    assert 0 <= row["n_violating_classes"] <= row["n_classes"]
    # rows at risk come only from violating classes, each < k members
    assert row["n_rows_at_risk"] <= row["n_violating_classes"] * (KANON_K - 1)
    if row["n_violating_classes"] > 0:
        assert row["min_class_size"] < KANON_K


def test_scd2_asof_one_row_per_customer(spark, sf_dir):
    """A point-in-time read returns at most one interval per customer
    unless the history has same-instant changes (zero-length
    intervals); verify per-customer multiplicity matches the
    duplicate-date structure of the underlying history."""
    out = queries()["q_scd2_asof"](spark, sf_dir)
    per_cust = out.groupBy("o_custkey").count()
    multi = {r["o_custkey"] for r in per_cust.where("count > 1").collect()}
    o = load(spark, sf_dir, "orders")
    dup_date_custs = {
        r["o_custkey"]
        for r in o.groupBy("o_custkey", "o_orderdate")
        .count()
        .where("count > 1")
        .select("o_custkey")
        .distinct()
        .collect()
    }
    assert multi <= dup_date_custs  # multiplicity only from same-date changes


def test_backfill_arithmetic(spark, sf_dir):
    row = queries()["q_time_backfill_gaps"](spark, sf_dir).collect()[0]
    assert row["n_missing"] == row["n_expected"] - row["n_present"]
    assert row["n_expected"] >= row["n_present"] >= 1
    if row["n_missing"] == 0:
        assert row["first_missing"] == -1


def test_active_users_wau_bounds(spark, sf_dir):
    """WAU must dominate DAU on every day and never exceed the total
    distinct-user population."""
    rows = queries()["q_events_active_users"](spark, sf_dir).collect()
    total_users = (
        load(spark, sf_dir, "events").select("user_id").distinct().count()
    )
    assert rows
    for r in rows:
        assert r["dau"] <= r["wau"] <= total_users
