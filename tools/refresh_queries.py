"""Regenerate QUERIES.md from the live registry (the generated catalog
previously refreshed ad hoc; `python -m kafka_bigdata_jobs_spark list`
gives the live view).  Run whenever queries are added or re-documented.
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from kafka_bigdata_jobs_spark import suite  # noqa: E402

DOC_WIDTH = 217  # truncated docs render as 217 chars + "..."


def main() -> None:
    reg = suite.registry()
    n_oracle = sum(1 for q in reg.values() if q.oracle is not None)
    lines = [
        "# QUERIES — generated catalog of the oracle suite",
        "",
        "Auto-generated from `kafka_bigdata_jobs_spark/suite.py` "
        "(`python -m kafka_bigdata_jobs_spark list` gives the live view).",
        f"Total: {len(reg)} queries; 'oracle' = value-hash-checked against "
        "DuckDB, 'rows-only' = engine-specific/approximate by design "
        f"({n_oracle} oracle / {len(reg) - n_oracle} rows-only).",
        "",
        "| query | check | what it demonstrates |",
        "|---|---|---|",
    ]
    for name in sorted(reg):
        q = reg[name]
        check = "oracle" if q.oracle is not None else "rows-only"
        doc = re.sub(r"\s+", " ", q.doc or "").strip()
        if len(doc) > DOC_WIDTH + 3:
            doc = doc[:DOC_WIDTH] + "..."
        lines.append(f"| `{name}` | {check} | {doc} |")
    out = os.path.join(REPO, "QUERIES.md")
    with open(out, "w", encoding="utf-8") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"wrote {out}: {len(reg)} queries ({n_oracle} oracle)")


if __name__ == "__main__":
    main()
