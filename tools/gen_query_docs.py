#!/usr/bin/env python
"""Regenerate docs/QUERIES.md from the registry docstrings."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vnavc_spark.queries import ORACLE, QUERIES  # noqa: E402

lines = [
    "# Query registry reference",
    "",
    "Auto-generated from the registry docstrings"
    " (`python tools/gen_query_docs.py` regenerates).",
    "",
    "| # | Query | Oracle | What it does |",
    "|---|---|---|---|",
]
for i, (name, fn) in enumerate(QUERIES.items(), 1):
    doc = (fn.__doc__ or "").strip().split("\n\n")[0]
    doc = " ".join(x.strip() for x in doc.splitlines())
    if len(doc) > 220:
        doc = doc[:217] + "..."
    doc = doc.replace("|", "\\|")
    oracle = "hash" if name in ORACLE else "rows-only"
    lines.append(f"| {i} | {name} | {oracle} | {doc} |")

out = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "docs",
    "QUERIES.md",
)
with open(out, "w") as fh:
    fh.write("\n".join(lines) + "\n")
print(f"wrote {out} ({len(QUERIES)} queries)")
