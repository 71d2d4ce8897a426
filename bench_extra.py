#!/usr/bin/env python
"""Per-query isolation harness for optimization work (guide §1).

``bench.py`` is FROZEN for measurement; this file holds the extra
instrumentation the optimization rounds need:

- time any subset of the registered queries at any SF dir with the
  driver's exact action (``df.agg(count(c) for every column).collect()``),
  best-of-N, with ``setJobDescription`` labels;
- dump ``.explain("formatted")`` per query (plans/r07/<q>_{before,after}.txt);
- the session is built exactly like the frozen bench's query phase
  (local[CPUS-1], shuffle_partitions=CPUS*2).

Usage:
  python bench_extra.py --sf-dir /root/testdata/sf1.0 \
      --queries sim_near_dup,dedup_simhash --repeats 1 \
      --explain plans/r07 --tag before
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def cap_off_query(sp, sf_dir):
    """The frozen bench's A/B twin: sim_near_dup with the skew cap off."""
    import __spark_entry__ as em
    from livre_spark.functions import similarity as qsim

    return qsim.cosine_near_dup_pairs_lsh(
        em._t(sp, sf_dir, "embeddings"), dim=64, threshold=0.45,
        bands=em._ND_BANDS, planes_per_band=em._ND_PLANES_PER_BAND,
        seed=42)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--queries", default="headline",
                    help="comma list, 'headline', or 'all'")
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--explain", default=None,
                    help="directory to dump explain('formatted') files")
    ap.add_argument("--tag", default="before",
                    help="suffix for explain files: <query>_<tag>.txt")
    ap.add_argument("--out", default=None, help="write JSON results here")
    args = ap.parse_args()

    import __spark_entry__ as em
    from bench import HEADLINE
    from livre_spark.plans.job import build_session
    from pyspark.sql.functions import count as F_count

    queries = dict(em.queries())
    queries["sim_near_dup_cap_off"] = cap_off_query
    if args.queries == "headline":
        names = HEADLINE + ["sim_near_dup_cap_off"]
    elif args.queries == "all":
        names = sorted(queries)
    else:
        names = [q.strip() for q in args.queries.split(",") if q.strip()]

    spark = build_session(app_name="bench-extra", cores=CPUS - 1,
                          shuffle_partitions=CPUS * 2)
    results: dict[str, float] = {}
    samples: dict[str, list[float]] = {}
    try:
        for name in names:
            fn = queries[name]
            if args.explain:
                os.makedirs(args.explain, exist_ok=True)
                df = fn(spark, args.sf_dir)
                plan = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted")
                with open(os.path.join(
                        args.explain, f"{name}_{args.tag}.txt"), "w") as fh:
                    fh.write(plan)
            runs = []
            for _ in range(args.repeats):
                spark.sparkContext.setJobDescription(f"{name} [{args.tag}]")
                t0 = time.perf_counter()
                df = fn(spark, args.sf_dir)
                df.agg(*[F_count(c) for c in df.columns]).collect()
                runs.append(round(time.perf_counter() - t0, 3))
            spark.sparkContext.setJobDescription(None)
            results[name] = min(runs)
            samples[name] = runs
            print(f"{name}: {min(runs)} {runs}", flush=True)
    finally:
        spark.stop()
    line = {"sf_dir": args.sf_dir, "tag": args.tag, "queries": results,
            "samples": samples}
    print(json.dumps(line, separators=(",", ":")))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(line, fh, indent=1)


if __name__ == "__main__":
    main()
