"""Capture .explain("formatted") for declared queries into plans/<tag>/.

Usage:
    python scripts/capture_plans.py before            # all declared queries
    python scripts/capture_plans.py after q27 q34     # subset by prefix

Writes plans/$E02_PLANS_ROUND/<query>_<tag>.txt (round dir defaults to
r15). Building the plan is lazy (no
execution) except for entries whose construction is eager (streaming
composites execute jobs at build time); those are captured too — the
formatted plan of the final returned DataFrame — but their cost is in
the build, so the file carries the plan of the RESULT shape.
"""

from __future__ import annotations

import os
import sys

here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, here)

from e02_spark.queries import all_queries, reset_shared_state
from e02_spark.session import get_spark


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    prefixes = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        here, "plans", os.environ.get("E02_PLANS_ROUND", "r15")
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("e02-capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    names = [
        n for n in sorted(qs)
        if not prefixes or any(n.startswith(p) for p in prefixes)
    ]
    for name in names:
        try:
            import contextlib
            import io

            df = qs[name](spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as e:  # capture the failure instead of dying
            plan = f"ERROR building {name}: {e!r}\n"
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)", file=sys.stderr)
        reset_shared_state(spark)
    return 0


if __name__ == "__main__":
    sys.exit(main())
