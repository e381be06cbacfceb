"""Dump the full query registry — active and retired — with each
query's oracle status and first docstring line, so a reviewer sees the
whole verified surface on one page without reading the modules.

Usage: python tools/registry_report.py > artifacts/QUERIES_r{N}.md
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def first_line(fn) -> str:
    doc = (fn.__doc__ or "").strip()
    return doc.split("\n")[0].rstrip() if doc else "(no docstring)"


def main() -> int:
    from sparkgraft.queries import ORACLES, QUERIES, RETIRED_ORACLES, RETIRED_QUERIES

    print("# Query registry")
    print(
        f"\nActive (driver-verified every round): {len(QUERIES)} "
        f"({sum(1 for q in QUERIES if q in ORACLES)} oracled, "
        f"{sum(1 for q in QUERIES if q not in ORACLES)} rows-only by nature)."
    )
    print(
        f"Retired (locally oracle-verified every pytest run): "
        f"{len(RETIRED_QUERIES)} ({len(RETIRED_ORACLES)} oracled)."
    )
    print("\n## Active\n\n| # | query | check | summary |\n|---|---|---|---|")
    for i, (name, fn) in enumerate(QUERIES.items(), 1):
        kind = "oracle" if name in ORACLES else "rows-only"
        print(f"| {i} | `{name}` | {kind} | {first_line(fn)} |")
    print("\n## Retired\n\n| # | query | check | summary |\n|---|---|---|---|")
    for i, (name, fn) in enumerate(RETIRED_QUERIES.items(), 1):
        kind = "oracle" if name in RETIRED_ORACLES else "pytest-only"
        print(f"| {i} | `{name}` | {kind} | {first_line(fn)} |")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
