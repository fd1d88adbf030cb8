#!/usr/bin/env python
"""Capture `.explain("formatted")` for named registry queries into
plans/r{N}/<query>_<tag>.txt — the optimization-round evidence files
(the judge checks plan claims against these).

Usage:
    python tools/capture_plans.py --tag before --round 13 q207_radius2_linkage ...
    python tools/capture_plans.py --tag after  --round 13 --sf-dir /root/testdata/sf0.1 all
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+", help="query names, or 'all'")
    ap.add_argument("--tag", required=True, help="before|after")
    ap.add_argument("--round", type=int, default=13)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from vnavc_spark.plans.audit import explain_string
    from vnavc_spark.queries import all_queries
    from vnavc_spark.session import get_spark

    spark = get_spark(app_name="capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    names = list(qs) if args.names == ["all"] else args.names
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        f"r{args.round}",
    )
    os.makedirs(out_dir, exist_ok=True)
    rc = 0
    for name in names:
        if name not in qs:
            print(f"unknown query {name}", file=sys.stderr)
            rc = 2
            continue
        try:
            df = qs[name](spark, args.sf_dir)
            txt = explain_string(df, "formatted")
        except Exception as e:  # capture the failure instead of dying
            txt = f"EXPLAIN FAILED: {e!r}\n"
            rc = 1
        path = os.path.join(out_dir, f"{name}_{args.tag}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"wrote {path}")
        # plan capture can leave persisted frames behind; clear so the
        # next query's plan is isolated (the audit.py lesson)
        from vnavc_spark.cache import clear_tracked

        try:
            clear_tracked()
        except Exception:
            spark.catalog.clearCache()
    spark.stop()
    return rc


if __name__ == "__main__":
    main()
