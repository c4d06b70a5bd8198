"""Reference-shape single-node baseline for BASELINE.md.

The reference processes data the same way everywhere: eager driver-side
Python loops over per-row dicts (assembly in train/common/dataset.py:66-227,
metric reduction in train/common/metrics.py:401-477 of /root/reference).
This script implements the engine's flagship query (multi-way join +
group-agg) in exactly that style — dict indexes, row loops, no vectorization
— over the same parquet, so BASELINE.md can record a measured
same-data-scale comparison instead of an assertion.

Run: python scripts/reference_shape_baseline.py [sf_dir]
"""

from __future__ import annotations

import sys
import time
from collections import defaultdict

import pyarrow.parquet as pq


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    t0 = time.time()
    # reference-style: load everything into row dicts up front (the eager
    # construction at dataset.py:66-71), then index with Python dicts
    orders = pq.read_table(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    ).to_pylist()
    customer = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    ).to_pylist()
    nation = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).to_pylist()
    lineitem = pq.read_table(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    ).to_pylist()
    load_s = time.time() - t0

    t1 = time.time()
    nation_by_key = {r["n_nationkey"]: r["n_name"] for r in nation}
    cust_nation = {r["c_custkey"]: nation_by_key[r["c_nationkey"]] for r in customer}
    order_nation = {r["o_orderkey"]: cust_nation[r["o_custkey"]] for r in orders}

    revenue: dict[str, float] = defaultdict(float)
    counts: dict[str, int] = defaultdict(int)
    for row in lineitem:  # the per-sample loop, metrics.py:401-451 shape
        n_name = order_nation.get(row["l_orderkey"])
        if n_name is None:
            continue
        revenue[n_name] += row["l_extendedprice"] * (1 - row["l_discount"])
        counts[n_name] += 1
    join_s = time.time() - t1

    total = round(load_s + join_s, 3)
    print(
        f"reference-shape flagship @ {sf_dir}: total={total}s "
        f"(load={round(load_s, 3)}s, join+agg={round(join_s, 3)}s), "
        f"{len(revenue)} groups, {sum(counts.values())} rows aggregated"
    )

    # --- dedup family, same style: per-row md5 fingerprint into a dict
    # (the reference's completeness/lookup loops, dataset.py:112-159 shape)
    import hashlib
    import re

    t2 = time.time()
    docs = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).to_pylist()
    load2_s = time.time() - t2
    t3 = time.time()
    seen: dict[str, tuple[int, int]] = {}
    for row in docs:
        fp = hashlib.md5(
            re.sub(r"\s+", " ", row["text"].strip().lower()).encode()
        ).hexdigest()
        rep, n = seen.get(fp, (row["doc_id"], 0))
        seen[fp] = (min(rep, row["doc_id"]), n + 1)
    dedup_s = time.time() - t3
    print(
        f"reference-shape exact-dedup @ {sf_dir}: "
        f"total={round(load2_s + dedup_s, 3)}s "
        f"(load={round(load2_s, 3)}s, fingerprint+group={round(dedup_s, 3)}s), "
        f"{len(seen)} fingerprints over {len(docs)} docs"
    )


if __name__ == "__main__":
    main()
