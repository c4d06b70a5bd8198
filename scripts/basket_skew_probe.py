"""Adversarial SKEW probe for the co-purchase edge build (graph_pagerank's
pair-generation stage).

The sf1 probe (BASELINE.md §4b) holds basket sizes constant by construction
— id-shifted orders keep every basket <= 7 items — so the per-order items
self-join is only ever measured in its linear regime. This probe attacks
its actual weak spot: ONE mega-order with k distinct parts emits k(k-1)/2
pairs, and because the self-join shuffles on the order key alone, every one
of those pairs forms in the task that owns that single key (AQE skew-join
splits a skewed partition's INPUT, but a single key's pair expansion still
happens wherever that key's rows meet).

Fixture: n_orders normal baskets (5 items from a 20k-part catalog) plus one
mega-order with k distinct parts, probed at k and 3k (pair work grows 9x).
Measured, per scale:

- the PLAIN build (copurchase_pairs n_blocks=1 — what the registered
  queries run on TPC-H-shaped data, where baskets are bounded), and
- the BLOCKED build (n_blocks=8 — the exact triangle-cell spreading:
  each item fans to the 8 cells touching its hash block, the join key
  becomes (order, cell), and the mega-order's k^2 work spreads over
  8*9/2 = 36 independent shuffle keys).

Exactness is asserted, not assumed: at the small scale the blocked build
must emit the identical (pa, pb, support) multiset as the plain build
(unit-level equivalence incl. same-block pairs is in
tests/test_operators.py::test_copurchase_pairs_blocked_matches_plain).

Expected shape: plain wall grows ~9x (single-task quadratic regime);
blocked wall grows far slower and beats plain outright at the big scale on
local[32]. That gap is the probe's finding — the mitigation is one
parameter (n_blocks) on the same exact operator, to be raised when a
corpus has unbounded basket sizes.

Usage: python scripts/basket_skew_probe.py [n_orders=3000] [mega_k=2000]
"""

from __future__ import annotations

import json
import random
import sys
import time

ROOT = __file__.rsplit("/", 2)[0]
sys.path.insert(0, ROOT)

CATALOG = 20_000
BASKET = 5


def build_rows(n_orders: int, mega_k: int, seed: int = 23):
    rng = random.Random(seed)
    rows = [(0, p) for p in rng.sample(range(CATALOG), mega_k)]
    for o in range(1, n_orders + 1):
        rows.extend((o, p) for p in rng.sample(range(CATALOG), BASKET))
    return rows


def edge_build(spark, rows, n_blocks: int):
    """The exact stage the pagerank queries run: pair generation +
    support aggregation (the groupBy is part of the measurement — it is
    what consumes the skewed pair stream)."""
    from pyspark.sql import functions as F

    from experimentsplan_datapipeline_spark.operators.graph import (
        copurchase_pairs,
    )

    items = spark.createDataFrame(rows, ["l_orderkey", "l_partkey"])
    return (
        copurchase_pairs(items, "l_orderkey", "l_partkey", n_blocks=n_blocks)
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("support"))
    )


def timed_count(df) -> tuple[float, int]:
    df.count()  # warm: plan compile + parquet-free, measures the build
    t0 = time.monotonic()
    n = df.count()
    return round(time.monotonic() - t0, 3), n


def support_hash(df) -> int:
    from pyspark.sql import functions as F

    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("bit_xor(xxhash64(pa, pb, support))").alias("h"),
    ).first()
    return (row["n"], row["h"])


def main() -> None:
    n_orders = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
    mega_k = int(sys.argv[2]) if len(sys.argv) > 2 else 2000

    from experimentsplan_datapipeline_spark.session import get_session

    spark = get_session()
    spark.sparkContext.setLogLevel("ERROR")

    out: dict = {"n_orders": n_orders, "mega_k_small": mega_k,
                 "mega_k_big": 3 * mega_k}

    rows_small = build_rows(n_orders, mega_k)
    plain_small = edge_build(spark, rows_small, n_blocks=1)
    blocked_small = edge_build(spark, rows_small, n_blocks=8)
    out["plain_small_sec"], out["pairs_small"] = timed_count(plain_small)
    out["blocked_small_sec"], n_blk = timed_count(blocked_small)
    out["exact_match"] = (
        n_blk == out["pairs_small"]
        and support_hash(plain_small) == support_hash(blocked_small)
    )

    rows_big = build_rows(n_orders, 3 * mega_k, seed=31)
    plain_big = edge_build(spark, rows_big, n_blocks=1)
    blocked_big = edge_build(spark, rows_big, n_blocks=8)
    out["plain_big_sec"], out["pairs_big"] = timed_count(plain_big)
    out["blocked_big_sec"], _ = timed_count(blocked_big)

    out["plain_growth"] = round(out["plain_big_sec"] / out["plain_small_sec"], 2)
    out["blocked_growth"] = round(
        out["blocked_big_sec"] / out["blocked_small_sec"], 2
    )
    out["blocked_speedup_at_big"] = round(
        out["plain_big_sec"] / out["blocked_big_sec"], 2
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
