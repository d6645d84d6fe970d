#!/usr/bin/env python
"""Capture .explain("formatted") for bench queries into plans/r12/.

Usage:
    python tools_r12_plans.py before            # all bench queries
    python tools_r12_plans.py after q1 q2 ...   # only the named ones
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from martian_moments_spark.plans import load_all  # noqa: E402
from martian_moments_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    suffix = sys.argv[1]  # "before" | "after"
    registry = load_all()
    names = sys.argv[2:] or sorted(n for n, s in registry.items() if s.bench)
    outdir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r12")
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark(app_name="mm-r12-plans")
    for n in names:
        df = registry[n].fn(spark, SF)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(outdir, f"{n}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"# {n} — explain(formatted) at {SF} ({suffix})\n\n")
            f.write(buf.getvalue().strip() + "\n")
        print("wrote", path)
    spark.stop()


if __name__ == "__main__":
    main()
