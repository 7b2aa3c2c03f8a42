"""CLI surface: list/run/explain must keep working (user-facing)."""

from __future__ import annotations

import subprocess
import sys


def _run(*args):
    return subprocess.run(
        [sys.executable, "-m", "kafka_bigdata_jobs_spark", *args],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=180,
    )


def test_cli_list():
    r = _run("list")
    assert r.returncode == 0
    assert "pricing_summary" in r.stdout
    assert "[oracle]" in r.stdout and "[rows-only]" in r.stdout


def test_cli_unknown_query_exit_code():
    r = _run("run", "no_such_query")
    assert r.returncode == 2
    assert "unknown query" in r.stderr


def test_cli_explain_prints_plan():
    r = _run("explain", "top_orders", "--sf-dir", "/root/testdata/sf0.001")
    assert r.returncode == 0
    assert "TakeOrderedAndProject" in r.stdout


def test_cli_oracle_match():
    # Subprocess like the other CLI tests: main() stops its session, which
    # would kill the shared pytest SparkSession if run in-process.
    r = _run("oracle", "daily_volume", "--sf-dir", "/root/testdata/sf0.001")
    assert r.returncode == 0
    assert "MATCH" in r.stdout


def test_cli_oracle_rows_only():
    r = _run("oracle", "approx_uniq_users", "--sf-dir", "/root/testdata/sf0.001")
    assert r.returncode == 0
    assert "rows-only" in r.stdout
