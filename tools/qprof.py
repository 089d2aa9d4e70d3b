"""Per-query profiler for the optimization rounds.

Times individual registry queries (bench methodology: same warmup, same
``df.count()`` action, best-of-REPS) and captures their
``explain("formatted")`` output — the evidence files the optimization
round commits under ``plans/<round>/``.

Usage:
    python tools/qprof.py [--reps N] [--explain-dir plans/r11] \
        [--suffix before|after] query1 query2 ...

Respects $SPARK_GRAFT_SF_DIR / $SPARK_GRAFT_CPUS like bench.py. Prints
one line per query: ``name  best_s  (rows)``; with --explain-dir also
writes ``<dir>/<name>_<suffix>.txt``.
"""

from __future__ import annotations

import argparse
import contextlib
import io
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--explain-dir", default=None)
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--no-warmup", action="store_true")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from multi_attribute_join_search_with_mapreduce_spark.session import get_spark

    spark = get_spark("majs-qprof")

    import __spark_entry__ as e

    qs = e.queries()
    unknown = [n for n in args.names if n not in qs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    if not args.no_warmup:
        from multi_attribute_join_search_with_mapreduce_spark.index import (
            cached_posting_index,
        )
        from multi_attribute_join_search_with_mapreduce_spark.sources.lake import (
            load_table,
        )

        t0 = time.perf_counter()
        cached_posting_index(spark, sf_dir).count()
        load_table(spark, "events", sf_dir).count()
        spark.range(0, 32, 1, 32).mapInPandas(lambda it: it, "id long").count()
        print(f"# warmup: {time.perf_counter() - t0:.3f}s", file=sys.stderr)

    for name in args.names:
        fn = qs[name]
        best, n = float("inf"), 0
        for _ in range(max(1, args.reps)):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            n = df.count()
            best = min(best, time.perf_counter() - t0)
        print(f"{name}\t{best:.3f}s\t({n} rows)")
        if args.explain_dir:
            os.makedirs(args.explain_dir, exist_ok=True)
            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            path = os.path.join(args.explain_dir, f"{name}_{args.suffix}.txt")
            with open(path, "w") as fh:
                fh.write(buf.getvalue())
            print(f"# wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
