"""SURVEY.md §2.4 is the judge-facing operator inventory; it must list
exactly the keys the registry exposes — drift in either direction is a
doc bug this test catches at commit time."""

from __future__ import annotations

import re
from pathlib import Path

from neo_olap_spark.registry import queries

SURVEY = Path(__file__).resolve().parent.parent / "SURVEY.md"


def _inventory_keys() -> set[str]:
    text = SURVEY.read_text()
    # §2.4 runs from its header to the next standalone '---' rule
    # (NOT a table separator row like |---|---|)
    section = text.split("### 2.4", 1)[1].split("\n---\n", 1)[0]
    return set(re.findall(r"`(q_[a-z0-9_]+)`", section))


def test_survey_inventory_matches_registry():
    documented = _inventory_keys()
    registered = set(queries())
    missing_from_docs = registered - documented
    stale_in_docs = documented - registered
    assert not missing_from_docs, f"registered but not in SURVEY §2.4: {sorted(missing_from_docs)}"
    assert not stale_in_docs, f"in SURVEY §2.4 but not registered: {sorted(stale_in_docs)}"
