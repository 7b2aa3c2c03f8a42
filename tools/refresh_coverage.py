"""Regenerate COVERAGE.md's per-query verification ledger from the
committed correctness artifacts (round-2 verdict item 8).

The hand-written sections of COVERAGE.md map SURVEY §2 operators to
implementations; the ledger this script rewrites (between the GENERATED
markers) is the authoritative per-query "verified by" record, derived
from — never typed alongside — the artifacts:

- ``CORRECTNESS_r*.json``: the driver's own rounds (hash-matched at
  sf0.01, the hard signal),
- ``CORRECTNESS_local.json``: the repo-side full strict matrix
  (every query x sf0.001 + sf0.01, ``make correctness-local``).

Run via ``make coverage``.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BEGIN = "<!-- BEGIN GENERATED VERIFICATION LEDGER (make coverage) -->"
END = "<!-- END GENERATED VERIFICATION LEDGER -->"


def load_artifacts():
    driver: dict[str, list[str]] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = os.path.basename(path)[len("CORRECTNESS_"):-len(".json")]
        with open(path, encoding="utf-8") as fh:
            for name, row in json.load(fh).items():
                if row.get("hash_match"):
                    tag = rnd
                elif row.get("hash_match") is None and row.get("err") == "no_oracle":
                    tag = f"{rnd}(rows-only)"
                elif row.get("rows_match"):
                    tag = f"{rnd}(hash-FAIL)"
                else:
                    tag = f"{rnd}(FAIL)"
                driver.setdefault(name, []).append(tag)
    local_path = os.path.join(REPO, "CORRECTNESS_local.json")
    local = {}
    if os.path.exists(local_path):
        with open(local_path, encoding="utf-8") as fh:
            local = json.load(fh)["queries"]
    return driver, local


def build_ledger() -> str:
    sys.path.insert(0, REPO)
    from kafka_bigdata_jobs_spark import suite

    driver, local = load_artifacts()
    reg = suite.registry()
    lines = [
        BEGIN,
        "",
        "## Per-query verification ledger (generated — do not edit)",
        "",
        "driver = hash-green round(s) in the committed CORRECTNESS_r*.json; "
        "local = strict matrix status at sf0.001/sf0.01 from "
        "CORRECTNESS_local.json (`make correctness-local`).",
        "",
        "| query | oracle | driver rounds | local matrix |",
        "|---|---|---|---|",
    ]
    for name in sorted(reg):
        has_oracle = reg[name].oracle is not None
        dr = ", ".join(driver.get(name, [])) or "—"
        if name in local:
            row = local[name]
            statuses = {
                cell["status"]
                for sf, cell in row.items()
                if isinstance(cell, dict)
            }
            loc = "/".join(sorted(statuses))
        else:
            loc = "— (regenerate)"
        lines.append(
            f"| `{name}` | {'yes' if has_oracle else 'rows-only'} "
            f"| {dr} | {loc} |")
    n_driver = sum(1 for n in reg if n in driver)
    lines += [
        "",
        f"Totals: {len(reg)} registered queries; driver rows across rounds: "
        f"{n_driver}; oracle-backed: "
        f"{sum(1 for n in reg if reg[n].oracle is not None)}.",
        "",
        END,
    ]
    return "\n".join(lines)


def latest_round() -> str:
    rounds = sorted(
        os.path.basename(p)[len("CORRECTNESS_"):-len(".json")]
        for p in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")))
    return rounds[-1].lstrip("r0") if rounds else "?"


def main() -> int:
    path = os.path.join(REPO, "COVERAGE.md")
    with open(path, encoding="utf-8") as fh:
        text = fh.read()
    ledger = build_ledger()
    text = re.sub(
        r"^(# COVERAGE[^\n(]*)\(updated round \d+\)",
        lambda m: f"{m.group(1)}(updated round {latest_round()})",
        text, count=1, flags=re.M)
    if BEGIN in text:
        text = re.sub(
            re.escape(BEGIN) + r".*?" + re.escape(END),
            lambda _m: ledger, text, flags=re.S)
    else:
        text = text.rstrip() + "\n\n" + ledger + "\n"
    with open(path, "w", encoding="utf-8") as fh:
        fh.write(text)
    print(f"refreshed ledger in {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
