"""The checked-in CORRECTNESS_local_full.json must stay in sync.

The artifact (written by tools/correctness_local.py, VERDICT r3 item
5) is the full-surface local ledger the judge audits in place of the
driver's ~50-key sample. These tests make the per-round discipline
self-enforcing: adding a registry key without regenerating the
artifact — or checking in an artifact with failures — fails the
suite.
"""

from __future__ import annotations

import json
import os

ARTIFACT = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                        "CORRECTNESS_local_full.json")


def _load():
    with open(ARTIFACT) as f:
        return json.load(f)


def test_artifact_exists_and_is_green():
    d = _load()
    s = d["_summary"]
    assert s["errors"] == 0, s
    assert s["hash_match"] == s["oracle_keys"], s
    assert s["keys_total"] == s["oracle_keys"] + s["rows_only"], s


def test_artifact_covers_exactly_the_registry():
    from neo_olap_spark.registry import REGISTRY, queries

    queries()
    d = _load()
    artifact_keys = {k for k in d if not k.startswith("_")}
    missing = set(REGISTRY) - artifact_keys
    stale = artifact_keys - set(REGISTRY)
    assert not missing, f"regenerate the ledger: keys missing {sorted(missing)}"
    assert not stale, f"regenerate the ledger: stale keys {sorted(stale)}"


def test_artifact_oracle_flags_match_registry():
    from neo_olap_spark.registry import REGISTRY, queries

    queries()
    d = _load()
    for k, q in REGISTRY.items():
        entry = d[k]
        if q.oracle is None:
            assert entry["err"] == "no_oracle", k
        else:
            assert entry["hash_match"] is True, (k, entry)
