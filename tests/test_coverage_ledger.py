"""COVERAGE.md's generated verification ledger must stay in lockstep
with the registry — the per-query "verified by" record is derived from
artifacts (tools/refresh_coverage.py via `make coverage`), never
hand-typed, and a registry change without a regeneration fails here."""

from __future__ import annotations

import os
import re

from kafka_bigdata_jobs_spark import suite

PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "COVERAGE.md")
BEGIN = "<!-- BEGIN GENERATED VERIFICATION LEDGER (make coverage) -->"
END = "<!-- END GENERATED VERIFICATION LEDGER -->"


def _ledger_names() -> set[str]:
    with open(PATH, encoding="utf-8") as fh:
        text = fh.read()
    assert BEGIN in text and END in text, (
        "COVERAGE.md has no generated ledger — run `make coverage`")
    section = text.split(BEGIN, 1)[1].split(END, 1)[0]
    return set(re.findall(r"^\| `([a-z0-9_]+)` \|", section, flags=re.M))


def test_ledger_matches_registry():
    names = _ledger_names()
    reg = set(suite.registry())
    assert names == reg, (
        "ledger stale — run `make coverage`; "
        f"missing={sorted(reg - names)[:5]} extra={sorted(names - reg)[:5]}")
