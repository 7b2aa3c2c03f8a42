"""Freshness pin for the repo-side full correctness matrix.

The driver samples ~50 queries per round; ``CORRECTNESS_local.json``
(regenerated via ``make correctness-local``) publishes the complete
strict-comparison signal for every registered query at sf0.001 and
sf0.01.  These tests fail the build if the committed matrix goes stale
against the registry or records any non-green status — so "the matrix
is complete and green" is a CI invariant, not a claim.
"""

from __future__ import annotations

import json
import os

import pytest

from kafka_bigdata_jobs_spark import suite

PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "CORRECTNESS_local.json")


@pytest.fixture(scope="module")
def matrix():
    assert os.path.exists(PATH), (
        "CORRECTNESS_local.json missing — run `make correctness-local`")
    with open(PATH, encoding="utf-8") as fh:
        return json.load(fh)


def test_matrix_covers_registry_exactly(matrix):
    reg = suite.registry()
    assert sorted(matrix["queries"]) == sorted(reg), (
        "matrix stale vs registry — run `make correctness-local`; "
        f"missing={sorted(set(reg) - set(matrix['queries']))[:5]} "
        f"extra={sorted(set(matrix['queries']) - set(reg))[:5]}")
    for name, row in matrix["queries"].items():
        assert row["oracle"] == (reg[name].oracle is not None), (
            f"{name}: oracle-backed flag stale — run `make correctness-local`")


def test_matrix_is_all_green(matrix):
    bad = {
        (name, sf): cell["status"]
        for name, row in matrix["queries"].items()
        for sf, cell in row.items()
        if isinstance(cell, dict) and cell["status"] not in ("MATCH", "ROWS_ONLY")
    }
    assert matrix["failures"] == 0 and not bad, f"non-green cells: {bad}"


def test_matrix_checked_both_scale_factors(matrix):
    assert len(matrix["sf_dirs"]) >= 2
    for name, row in matrix["queries"].items():
        for sf in matrix["sf_dirs"]:
            assert sf in row, f"{name} missing result at {sf}"
