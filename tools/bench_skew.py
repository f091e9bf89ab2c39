"""Measured evidence for the salted-join skew path (functions/skew.py).

Scenario: a fact table whose join key is badly skewed (80% of rows on
one hot key) joined to a dimension too large to broadcast — the shape
where one straggler task eats the hot key at 100 TB. Three runs:

1. naive join, AQE skew-split ON (the session default) — AQE splits
   the sort-merge stream side at runtime, so this is the baseline a
   well-configured cluster gets for free;
2. naive join, AQE skew-split OFF — the unmitigated plan every
   runtime-opaque case degrades to (skew invisible to AQE stats, skew
   materialized AFTER the exchange by an explode/flatMap, engines
   without runtime re-plan);
3. ``salted_join`` with AQE skew-split OFF — the deterministic fix the
   engine exposes: must beat (2) and be in (1)'s neighborhood.

Note the per-key aggregate AFTER the join: AQE's skew split repairs the
join's stream side but the downstream partial aggregation of the hot
key still runs inside whatever partition holds it, which is why (1)
does not dominate here — salting spreads BOTH the join and the partial
agg of the hot key across ``salts`` tasks. That post-shuffle-skew shape
is exactly the case the module docstring reserves salting for.

Writes ``SKEW_BENCH.json`` at the repo root and prints it.

Usage: python tools/bench_skew.py [--rows 6000000] [--dim 300000] [--salts 32]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from data_observability_installer_spark.functions.skew import salted_join  # noqa: E402
from data_observability_installer_spark.session import get_spark  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_frames(spark, n_rows: int, n_dim: int):
    # 80% of fact rows land on key 0; the rest spread uniformly.
    fact = spark.range(n_rows).select(
        F.col("id"),
        F.when(F.col("id") % 10 < 8, F.lit(0))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(n_dim)))
        .cast("long")
        .alias("key"),
        (F.col("id") % 1000).cast("double").alias("amount"),
    )
    dim = spark.range(n_dim).select(
        F.col("id").alias("key"), (F.col("id") % 7).cast("double").alias("rate")
    )
    return fact, dim


def run_once(fact, dim, salted: bool, salts: int) -> float:
    t0 = time.time()
    joined = (
        salted_join(fact, dim, "key", salts=salts, salt_source="id")
        if salted
        else fact.join(dim, "key")
    )
    # per-key aggregate keeps the result tiny while forcing the full join
    joined.groupBy("key").agg(F.sum(F.col("amount") * F.col("rate")).alias("v")).count()
    return round(time.time() - t0, 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=20_000_000)
    ap.add_argument("--dim", type=int, default=100_000)
    ap.add_argument("--salts", type=int, default=32)
    args = ap.parse_args()

    spark = get_spark("skew-bench")
    # dimension must not broadcast, or there is no shuffle to skew
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    fact, dim = build_frames(spark, args.rows, args.dim)
    fact = fact.persist()
    dim = dim.persist()
    fact.count(), dim.count()  # pay materialization outside the timings

    skew_key = "spark.sql.adaptive.skewJoin.enabled"
    results = {}
    run_once(fact, dim, salted=False, salts=args.salts)  # JIT/codegen warmup
    spark.conf.set(skew_key, "true")
    results["naive_aqe_skew_on"] = run_once(fact, dim, salted=False, salts=args.salts)
    spark.conf.set(skew_key, "false")
    results["naive_aqe_skew_off"] = run_once(fact, dim, salted=False, salts=args.salts)
    results["salted_aqe_skew_off"] = run_once(fact, dim, salted=True, salts=args.salts)
    spark.conf.set(skew_key, "true")

    out = {
        "rows": args.rows,
        "dim_rows": args.dim,
        "hot_key_share": 0.8,
        "salts": args.salts,
        "unit": "sec",
        "timings": results,
        "speedup_vs_unmitigated": round(
            results["naive_aqe_skew_off"] / max(results["salted_aqe_skew_off"], 1e-9), 2
        ),
    }
    with open(os.path.join(REPO, "SKEW_BENCH.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
