"""Round-12 optimization profiler.

Times registered queries in one engine session with the bench's
methodology (.count(), warm steady min-of-N) plus an optional noop-sink
timing (guide §1.4: computes every column, no count-pruning), and dumps
``explain("formatted")`` per query to plans/r12/.

Usage:
    python tools/opt_profile.py [--sf DIR] [--reps N] [--noop]
        [--explain-dir plans/r12] [--suffix before] [query ...]

With no query names: profiles every registered query (one steady pass
of the full registry — a quick same-session per-query cost map).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--noop", action="store_true")
    ap.add_argument("--explain-dir", default=None)
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--shuffle", default=os.environ.get("SPARK_GRAFT_SHUFFLE", "8"))
    args = ap.parse_args()

    from data_management_python_spark.plans import collect_queries
    from data_management_python_spark.session import get_spark

    spark = get_spark(app_name="opt_profile", shuffle_partitions=args.shuffle)
    spark.sparkContext.setLogLevel("ERROR")
    qs = collect_queries()
    names = args.queries or list(qs)
    for n in names:
        if n not in qs:
            raise SystemExit(f"unknown query {n}")

    # session warmup (mirrors bench.py)
    qs["p1_eq_filter"].fn(spark, args.sf).collect()

    if args.explain_dir:
        os.makedirs(os.path.join(REPO, args.explain_dir), exist_ok=True)

    results: dict[str, dict[str, float]] = {}
    # cold pass (also the explain capture; explain itself is driver-side)
    for n in names:
        spark.sparkContext.setJobDescription(f"cold:{n}")
        t0 = time.time()
        df = qs[n].fn(spark, args.sf)
        df.count()
        cold = time.time() - t0
        results[n] = {"cold": round(cold, 4)}
        if args.explain_dir:
            try:
                txt = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
            except Exception:
                import contextlib
                import io

                buf = io.StringIO()
                with contextlib.redirect_stdout(buf):
                    df.explain("formatted")
                txt = buf.getvalue()
            path = os.path.join(
                REPO, args.explain_dir, f"{n}_{args.suffix}.txt"
            )
            with open(path, "w") as f:
                f.write(txt)

    # steady passes, interleaved across queries (min-of-reps)
    for rep in range(args.reps):
        for n in names:
            spark.sparkContext.setJobDescription(f"steady{rep}:{n}")
            t0 = time.time()
            qs[n].fn(spark, args.sf).count()
            dt = time.time() - t0
            cur = results[n].get("steady")
            if cur is None or dt < cur:
                results[n]["steady"] = round(dt, 4)

    if args.noop:
        for rep in range(args.reps):
            for n in names:
                spark.sparkContext.setJobDescription(f"noop{rep}:{n}")
                t0 = time.time()
                (
                    qs[n].fn(spark, args.sf)
                    .write.format("noop")
                    .mode("overwrite")
                    .save()
                )
                dt = time.time() - t0
                cur = results[n].get("noop")
                if cur is None or dt < cur:
                    results[n]["noop"] = round(dt, 4)

    width = max(len(n) for n in names)
    order = sorted(names, key=lambda n: -results[n].get("steady", 0.0))
    tot_c = sum(r["cold"] for r in results.values())
    tot_s = sum(r.get("steady", 0.0) for r in results.values())
    for n in order:
        r = results[n]
        line = f"{n:<{width}}  cold {r['cold']:8.3f}  steady {r.get('steady', float('nan')):8.3f}"
        if "noop" in r:
            line += f"  noop {r['noop']:8.3f}"
        print(line)
    print(f"TOTAL cold {tot_c:.2f}  steady {tot_s:.2f}  ({len(names)} queries)")
    spark.stop()


if __name__ == "__main__":
    main()
