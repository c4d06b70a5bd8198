"""Scale probe for editdist_prefix_join (the exact Ed-Join).

The registry fixture (64 distinct part names) proves correctness, not
scale, so this probe measures the operator on a corpus shaped like real
fuzzy-key workloads: a large set of distinct strings over a SMALL
alphabet (so q-grams repeat heavily and frequency-blind bucketing would
explode), with planted near-duplicates so true pairs exist at every
scale and the verify stage does real work.

Two measurements:

- recall: at the small scale, the operator's output is compared
  pair-for-pair against the brute-force all-pairs levenshtein oracle
  (exactness is the operator's contract — any pruning regression shows
  here first);
- scaling: wall-clock at N and 10N strings on the same warm session.
  True pairs grow ~linearly (mutations are per-base-string), while the
  q-gram bucket pressure grows with corpus size — near-linear is a
  ratio <= ~12x for 10x strings; a prefix-filter regression (e.g. losing
  the rarity order) shows up as a blow-up, because the common-gram
  buckets are quadratic.

Usage: python scripts/editdist_scale_probe.py [n_small=20000]
"""

from __future__ import annotations

import json
import random
import sys
import time

ROOT = __file__.rsplit("/", 2)[0]
sys.path.insert(0, ROOT)

ALPHA = "abcdefgh"  # small alphabet: only 64 possible 2-grams, every
# gram is corpus-common — the adversarial regime for gram bucketing
LEN_LO, LEN_HI = 6, 18
MUTATED_FRAC = 0.4  # fraction of strings that are 1-2 edits off a base
MAX_DIST = 2
Q = 2


def build_corpus(n: int, seed: int = 23):
    rng = random.Random(seed)
    seen: dict[str, int] = {}
    rows: list[tuple[int, str]] = []

    def add(s: str) -> None:
        if s not in seen:
            seen[s] = len(rows)
            rows.append((len(rows), s))

    n_base = max(1, int(n * (1 - MUTATED_FRAC)))
    while len(rows) < n_base:
        add(
            "".join(
                rng.choice(ALPHA)
                for _ in range(rng.randint(LEN_LO, LEN_HI))
            )
        )
    bases = [s for _, s in rows]
    while len(rows) < n:
        t = list(rng.choice(bases))
        for _ in range(rng.randint(1, MAX_DIST)):
            op = rng.choice("ids")
            pos = rng.randint(0, max(len(t) - 1, 0))
            if op == "i":
                t.insert(pos, rng.choice(ALPHA))
            elif t and op == "d":
                del t[pos]
            elif t:
                t[pos] = rng.choice(ALPHA)
        add("".join(t))
    return rows


def run_once(spark, rows):
    from experimentsplan_datapipeline_spark.operators.dedup import (
        editdist_prefix_join,
    )

    df = spark.createDataFrame(rows, ["sid", "s"])
    out = editdist_prefix_join(df, "s", "sid", q=Q, max_dist=MAX_DIST)
    out.count()  # warm
    t0 = time.monotonic()
    n = out.count()
    return round(time.monotonic() - t0, 3), n


def _lev(a: str, b: str) -> int:
    if abs(len(a) - len(b)) > MAX_DIST:
        return MAX_DIST + 1
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        best = i
        for j, cb in enumerate(b, 1):
            v = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            cur.append(v)
            best = min(best, v)
        if best > MAX_DIST:
            return MAX_DIST + 1
        prev = cur
    return prev[len(b)]


def oracle_pairs(rows):
    # brute force with a length-band prefilter so the small scale stays
    # tractable; band-exceeding pairs cannot be within MAX_DIST
    by_len: dict[int, list[tuple[int, str]]] = {}
    for i, s in rows:
        by_len.setdefault(len(s), []).append((i, s))
    got = set()
    for L, bucket in by_len.items():
        partners = [
            p
            for L2 in range(L, L + MAX_DIST + 1)
            for p in by_len.get(L2, [])
        ]
        for i, a in bucket:
            for j, b in partners:
                if i < j and _lev(a, b) <= MAX_DIST:
                    got.add((i, j))
    return got


def main() -> None:
    n_small = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    from experimentsplan_datapipeline_spark.session import get_session

    spark = get_session()
    spark.sparkContext.setLogLevel("ERROR")

    small_rows = build_corpus(n_small)
    sec_small, n_pairs_small = run_once(spark, small_rows)
    from experimentsplan_datapipeline_spark.operators.dedup import (
        editdist_prefix_join,
    )

    got = {
        (r.id_a, r.id_b)
        for r in editdist_prefix_join(
            spark.createDataFrame(small_rows, ["sid", "s"]),
            "s", "sid", q=Q, max_dist=MAX_DIST,
        ).collect()
    }
    want = oracle_pairs(small_rows)
    recall_ok = got == want

    big_rows = build_corpus(10 * n_small, seed=31)
    sec_big, n_pairs_big = run_once(spark, big_rows)
    print(
        json.dumps(
            {
                "n_small": n_small,
                "small_sec": sec_small,
                "small_pairs": n_pairs_small,
                "big_sec": sec_big,
                "big_pairs": n_pairs_big,
                "ratio": round(sec_big / sec_small, 2)
                if sec_small
                else None,
                "recall_exact_vs_allpairs": recall_ok,
            }
        )
    )


if __name__ == "__main__":
    main()
