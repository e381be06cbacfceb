"""Dump the formatted physical plan of every bench headline query.

Correctness artifacts say the answers are right; BENCH says they are
fast at the tested scale. This report is the third leg: the PLANS
themselves, so a reviewer can check 100 TB shape — pushed filters,
ReadSchema pruning, broadcast vs shuffle joins, Exchange counts,
WholeStageCodegen spans, Arrow-batched (never row-wise) Python — on
paper without executing anything.

Usage: python tools/plan_report.py [sf_dir] > artifacts/PLANS_r{N}.txt
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    import bench
    from sparkgraft import queries as Q
    from sparkgraft.session import get_spark

    spark = get_spark("sparkgraft-plan-report")
    print(f"# Physical plans (explain formatted) at {sf_dir}")
    for name in bench.HEADLINE:
        spark.catalog.clearCache()  # cached subtrees would hide the real plan
        df = Q.QUERIES[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        print(f"\n{'=' * 72}\n## {name}\n{'=' * 72}")
        print(buf.getvalue().rstrip())
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
