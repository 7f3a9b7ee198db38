"""Checkpoint/resume equivalence (SURVEY.md §5.2, AnalysisRoundTest port).

The reference asserts its round loop resumes exactly from a checkpoint
file (AnalysisRoundTest.java:18-54). Spark analog: an interrupted
resumable walk, resumed in a fresh call, must produce bit-identical
counts to an uninterrupted run AND to the non-checkpointed walk.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest

from neo_olap_spark.checkpoints import latest_round
from neo_olap_spark.operators.graph_algos import (
    random_walk_counts,
    resumable_random_walk_counts,
)

ARGS = dict(n_walkers=32, n_steps=8, seed=13)


@pytest.fixture()
def ckpt_dir():
    d = tempfile.mkdtemp(prefix="neo_olap_ckpt_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_resume_equivalence(spark, sf_dir, ckpt_dir):
    plain = _rows(random_walk_counts(spark, sf_dir, **ARGS))

    # interrupted: one round (4 of 8 steps), then a fresh call resumes
    partial = resumable_random_walk_counts(
        spark, sf_dir, ckpt_dir, steps_per_round=4, max_rounds=1, **ARGS
    )
    # materialize before resuming: the resumed run deletes round=4 files
    partial_total = sum(v for _, v in _rows(partial))
    assert latest_round(ckpt_dir) == 4  # loop state encoded in dir name
    resumed = resumable_random_walk_counts(
        spark, sf_dir, ckpt_dir, steps_per_round=4, **ARGS
    )

    assert latest_round(ckpt_dir) == 8
    assert _rows(resumed) == plain
    # partial counts cover 4 steps + start: walkers * 5 total visits
    assert partial_total == ARGS["n_walkers"] * 5


def test_delete_previous_retention(spark, sf_dir, ckpt_dir):
    resumable_random_walk_counts(
        spark, sf_dir, ckpt_dir, steps_per_round=2, **ARGS
    )
    # only the final round's snapshot remains (Runner.java:67-71)
    import pathlib

    rounds = [p.name for p in pathlib.Path(ckpt_dir).iterdir() if p.name.startswith("round=")]
    assert rounds == ["round=8"]


def test_resume_is_round_size_independent(spark, sf_dir, ckpt_dir):
    """The step kernel depends only on (walker, step, seed), so a run
    interrupted at a 4-step boundary and resumed with a DIFFERENT round
    size must still be bit-identical to the uninterrupted run."""
    plain = _rows(random_walk_counts(spark, sf_dir, **ARGS))
    resumable_random_walk_counts(
        spark, sf_dir, ckpt_dir, steps_per_round=4, max_rounds=1, **ARGS
    )
    resumed = resumable_random_walk_counts(
        spark, sf_dir, ckpt_dir, steps_per_round=2, **ARGS
    )
    assert _rows(resumed) == plain


def test_pagerank_resume_equivalence(spark, sf_dir, ckpt_dir):
    """Round-checkpointed PageRank (the reference's literal checkpoint
    payload, page_rank.int): interrupted after one round and resumed,
    the ranks must be bit-identical to the uninterrupted power
    iteration."""
    from neo_olap_spark.graph import edges, symmetrize
    from neo_olap_spark.operators.graph_algos import (
        all_nodes,
        pagerank,
        resumable_pagerank,
    )

    plain = _rows(
        pagerank(symmetrize(edges(spark, sf_dir)), all_nodes(spark, sf_dir), n_iters=4)
    )
    resumable_pagerank(
        spark, sf_dir, ckpt_dir, n_iters=4, iters_per_round=2, max_rounds=1
    )
    assert latest_round(ckpt_dir) == 2
    resumed = resumable_pagerank(
        spark, sf_dir, ckpt_dir, n_iters=4, iters_per_round=2
    )
    assert latest_round(ckpt_dir) == 4
    assert _rows(resumed) == plain


def test_partial_snapshot_is_invisible(spark, sf_dir, ckpt_dir):
    """A crash mid-write leaves only a _tmp_round staging dir, which
    latest_round must ignore — resume picks the last INTACT round."""
    import pathlib

    resumable_random_walk_counts(
        spark, sf_dir, ckpt_dir, steps_per_round=4, max_rounds=1, **ARGS
    )
    assert latest_round(ckpt_dir) == 4
    # simulate a crash mid-snapshot of round 8: staging dir exists,
    # final dir does not
    (pathlib.Path(ckpt_dir) / "_tmp_round=8" / "frontier").mkdir(parents=True)
    assert latest_round(ckpt_dir) == 4


def test_stale_staging_swept_on_next_write(spark, sf_dir, ckpt_dir):
    """An orphaned staging dir from a crashed run with a DIFFERENT
    round size must be deleted by the next snapshot, not accumulate
    forever (no later write ever targets that exact step)."""
    import pathlib

    # crashed run staged round 3 (steps_per_round the resume won't use)
    (pathlib.Path(ckpt_dir) / "_tmp_round=3" / "frontier").mkdir(parents=True)
    resumable_random_walk_counts(
        spark, sf_dir, ckpt_dir, steps_per_round=4, max_rounds=1, **ARGS
    )
    leftovers = [
        p.name
        for p in pathlib.Path(ckpt_dir).iterdir()
        if p.name.startswith("_tmp_round=")
    ]
    assert leftovers == []
