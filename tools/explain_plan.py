"""Dump `.explain("formatted")` for named registry queries to files.

Usage: python tools/explain_plan.py OUT_DIR SUFFIX [sf_dir] query...

Writes OUT_DIR/<query>_<SUFFIX>.txt for each query. Used to commit the
plans/r10/<query>_before.txt / _after.txt evidence the optimization
round requires.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pgsink_spark.session import get_spark  # noqa: E402


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    rest = sys.argv[3:]
    if rest and os.path.isdir(rest[0]):
        sf_dir, names = rest[0], rest[1:]
    else:
        sf_dir, names = "/root/testdata/sf0.1", rest
    os.makedirs(out_dir, exist_ok=True)

    import __spark_entry__ as em

    qs = em.queries()
    spark = get_spark("explain-plan")
    import contextlib
    import io

    for name in names:
        df = qs[name](spark, sf_dir)
        # queries that return an eagerly checkpointed frame stash the
        # pre-checkpoint plan here (same hook gen_plans_md.py uses) —
        # the checkpoint scan alone is evidence of nothing
        df = getattr(df, "_plan_audit_df", df)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(f"# {name} @ {sf_dir} ({suffix})\n")
            fh.write(plan)
        print(f"wrote {path} ({plan.count(chr(10))} lines)")
    spark.stop()


if __name__ == "__main__":
    main()
