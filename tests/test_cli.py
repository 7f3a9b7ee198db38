"""The python -m neo_olap_spark operational surface (Runner.main ≙)."""

from __future__ import annotations

from neo_olap_spark.__main__ import main


def test_cli_list(capsys):
    assert main(["list"]) == 0
    out = capsys.readouterr().out
    assert "q_topn" in out and "q_sql_tpch_q22" in out


def test_cli_topn_and_query(spark, sf_dir, capsys):
    assert main(["topn", "--sf-dir", sf_dir], spark=spark) == 0
    assert "node_id" in capsys.readouterr().out
    assert main(["query", "q_agg_sum", "--sf-dir", sf_dir], spark=spark) == 0
    capsys.readouterr()
    assert main(["query", "no_such_key", "--sf-dir", sf_dir], spark=spark) == 2


def test_cli_walk_resume_bit_identical(spark, sf_dir, tmp_path, capsys):
    """Interrupted-style rerun must reproduce the same top rows
    (Runner.java:255-267 restart contract)."""
    ckpt = str(tmp_path / "walk_ckpt")
    args = ["walk", "--sf-dir", sf_dir, "--ckpt-dir", ckpt, "--steps", "8"]
    assert main(args, spark=spark) == 0
    first = capsys.readouterr().out
    assert main(args, spark=spark) == 0
    second = capsys.readouterr().out
    assert first == second
