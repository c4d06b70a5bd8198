"""Adversarial SKEW probe for containment_prefix_join.

The sf1 probe measures uniform 10x growth; this one attacks the join's
weak spot directly. containment_prefix_join's container side indexes FULL
token lists (inherent to containment — no lower bound relates overlap to
|container|), so its candidate count is sum over tokens of
|probe prefixes containing t| * |containers containing t|. Rarity
ordering keeps probe prefixes on rare tokens, but an adversarial corpus
can defeat that:

- Zipf token distribution over a BOUNDED vocab: the head tokens appear in
  nearly every document, so the container index has a handful of gigantic
  gid buckets;
- documents drawn ONLY from the Zipf head: their "rarest" prefix tokens
  are still corpus-common, so probe rows land in those gigantic buckets;
- one mega-container holding the whole head vocab plus planted contained
  docs, so true positives exist and the verify stage does real work.

The probe times the operator at N and 10N documents on the same session
and prints the wall-clock ratio; near-linear is <= ~12x for 10x docs
(candidate pairs for head tokens grow ~quadratically in the number of
head-only docs, so a blow-up shows up immediately as a >> 12x ratio).
Recall is cross-checked against the brute-force all-pairs oracle at the
small scale (exactness must survive any future pruning fix).

Usage: python scripts/containment_skew_probe.py [n_small=2000]
"""

from __future__ import annotations

import json
import random
import sys
import time

ROOT = __file__.rsplit("/", 2)[0]
sys.path.insert(0, ROOT)

VOCAB = 1500  # bounded vocabulary
HEAD = 80  # Zipf head size; head tokens appear in most docs
ZIPF_S = 1.05
MEGA_TOKENS = 1200  # the mega-container covers most of the vocab
DOC_LEN = 24
HEAD_LEN = 12  # head-only docs: 12 DISTINCT of 80 head tokens, so two of
# them share >= ceil(0.7*12) = 9 tokens with hypergeometric-tail
# probability ~1e-6 — TRUE pairs stay (near-)linear in n while the
# candidate pressure on the head-token gid buckets grows quadratically;
# the probe then measures algorithm overhead, not output size
PLANTED_FRAC = 0.05  # fraction of docs that are subsets of the mega doc
HEAD_ONLY_FRAC = 0.3  # fraction drawn ONLY from the Zipf head (adversarial)


def build_corpus(n_docs: int, seed: int = 17):
    rng = random.Random(seed)
    weights = [1.0 / (i + 1) ** ZIPF_S for i in range(VOCAB)]
    vocab = [f"tok{i}" for i in range(VOCAB)]
    head = vocab[:HEAD]
    mega = vocab[:MEGA_TOKENS]
    rows = [(0, " ".join(mega))]  # the mega-container
    for i in range(1, n_docs):
        r = rng.random()
        if r < PLANTED_FRAC:  # fully contained in the mega doc
            words = rng.sample(mega, DOC_LEN)
        elif r < PLANTED_FRAC + HEAD_ONLY_FRAC:  # head-only: worst case
            words = rng.sample(head, HEAD_LEN)
        else:
            words = rng.choices(vocab, weights=weights, k=DOC_LEN)
        rows.append((i, " ".join(words)))
    return rows


def run_once(spark, rows, threshold=0.7):
    from experimentsplan_datapipeline_spark.operators.dedup import (
        containment_prefix_join,
    )

    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = containment_prefix_join(df, "text", "doc_id", 1, threshold)
    out.count()  # warm
    t0 = time.monotonic()
    n = out.count()
    return round(time.monotonic() - t0, 3), n


def oracle_pairs(rows, threshold=0.7):
    sets = {i: set(t.split()) for i, t in rows}
    got = set()
    ids = sorted(sets)
    for a in ids:
        for b in ids:
            if a == b or not sets[a]:
                continue
            c = len(sets[a] & sets[b]) / len(sets[a])
            if round(c, 6) >= threshold:
                got.add((a, b))
    return got


def main() -> None:
    n_small = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    from experimentsplan_datapipeline_spark.session import get_session

    spark = get_session()
    spark.sparkContext.setLogLevel("ERROR")

    small_rows = build_corpus(n_small)
    sec_small, n_pairs_small = run_once(spark, small_rows)
    want = oracle_pairs(small_rows)
    from experimentsplan_datapipeline_spark.operators.dedup import (
        containment_prefix_join,
    )

    got = {
        (r.id_inner, r.id_outer)
        for r in containment_prefix_join(
            spark.createDataFrame(small_rows, ["doc_id", "text"]),
            "text", "doc_id", 1, 0.7,
        ).collect()
    }
    recall_ok = got == want

    big_rows = build_corpus(10 * n_small, seed=29)
    sec_big, n_pairs_big = run_once(spark, big_rows)
    print(
        json.dumps(
            {
                "n_small": n_small,
                "small_sec": sec_small,
                "small_pairs": n_pairs_small,
                "big_sec": sec_big,
                "big_pairs": n_pairs_big,
                "ratio": round(sec_big / sec_small, 2) if sec_small else None,
                "recall_exact_vs_allpairs": recall_ok,
            }
        )
    )


if __name__ == "__main__":
    main()
