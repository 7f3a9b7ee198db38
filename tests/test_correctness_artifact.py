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


def test_artifact_oracle_texts_match_registry():
    """An oracle whose TEXT changed after the last ledger run is
    unverified evidence even when its flags look right — the artifact
    records a sha of each oracle it actually ran, and this pins it to
    the registry's current text. Fires exactly when a commit edits an
    @query(oracle=...) without re-running tools/correctness_local.py
    (the remaining staleness class the key/flag-set tests can't see)."""
    import hashlib

    from neo_olap_spark.registry import REGISTRY, queries

    queries()
    d = _load()
    stale = []
    for k, q in REGISTRY.items():
        want = (
            hashlib.sha256(q.oracle.encode()).hexdigest()[:16]
            if q.oracle is not None
            else None
        )
        if d.get(k, {}).get("oracle_sha") != want:
            stale.append(k)
    assert not stale, (
        f"oracle text changed since the last ledger run for {sorted(stale)}"
        " — regenerate with `python tools/correctness_local.py`"
    )
