"""Join operators (SURVEY.md §2.3, J1-J8 + S14 semi/anti).

Design for scale: small relations are explicitly ``broadcast()`` (pairs files,
dims); the only theta-shaped join in the reference (prefix match, J6) is
normalized to an equi-join on an extracted key so it hash-partitions instead
of falling into BroadcastNestedLoopJoin. file:line cites /root/reference.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from experimentsplan_datapipeline_spark.functions.strings import composite_key


def assemble_triplets(
    df: DataFrame,
    key_col: str,
    slot_col: str,
    value_col: str,
    slots: Sequence[str],
) -> DataFrame:
    """J1: group-pivot triplet assembly with completeness filter.

    Reference: group S3 keys by extracted stem, one slot per image_type,
    keep only stems with all three slots filled
    (train/common/dataset.py:112-159). ONE shuffle: a conditional
    first-non-null per slot in a single groupBy — ``.pivot()`` would plan a
    second exchange (agg by (key, slot), then pivotfirst by key) for the
    same result.
    """
    aggs = [
        F.first(
            F.when(F.col(slot_col) == s, F.col(value_col)), ignorenulls=True
        ).alias(s)
        for s in slots
    ]
    pivoted = df.groupBy(key_col).agg(*aggs)
    return pivoted.na.drop(subset=list(slots))


def join_pairs(
    pairs: DataFrame,
    assets: DataFrame,
    pair_key: str,
    asset_key: str,
    how: str = "inner",
    broadcast_assets: bool = False,
) -> DataFrame:
    """J2: FK lookup join; the small side is broadcast.

    Reference: (person_id, garment_id) row -> person/garment file lookups
    (train/train_CATVTON/dataloader.py:80-87). The pairs file is tiny, so at
    scale broadcast it (or the asset dim, whichever is small).
    """
    right = F.broadcast(assets) if broadcast_assets else assets
    return pairs.join(right, pairs[pair_key] == right[asset_key], how)


def join_composite(
    left: DataFrame,
    right: DataFrame,
    left_cols: Sequence[str],
    right_key: str,
    sep: str = "_",
    how: str = "inner",
) -> DataFrame:
    """J3: join on a composite ``{a}_{b}`` key.

    Reference: CP-VTON target files keyed '{person_id}_{garment_id}'
    (train/train_CP_VTON/dataloader.py:61). The concat happens on the fat
    side pre-shuffle; at 100 TB prefer joining on the raw column pair when
    both sides have them (skips the concat and keeps column stats usable).
    """
    keyed = left.withColumn("__ck", composite_key(*left_cols, sep=sep))
    return keyed.join(right, keyed["__ck"] == right[right_key], how).drop("__ck")


def join_optional_left(
    base: DataFrame, optional: DataFrame, on: str | Sequence[str]
) -> DataFrame:
    """J5: left-outer join for optional assets; missing side stays null.

    Reference: masked metrics only ``if 'mask' in item``
    (train/common/metrics.py:316-326,416-419). Downstream uses
    when(col.isNotNull(), ...) instead of branching.
    """
    return base.join(optional, on, "left")


def normalize_prefix_join(
    files: DataFrame,
    stems: DataFrame,
    file_name_col: str,
    stem_col: str,
    key_extractor: Column,
) -> DataFrame:
    """J6 (normalized): prefix-match join rewritten as an equi-join.

    Reference: find cloth file where filename.startswith(stem), take first
    (train/common/metrics.py:303-304). The raw theta form
    ``substr(f, 1, len(s)) = s`` forces BroadcastNestedLoopJoin; extracting
    the candidate key from the filename turns it into a hash join that
    scales. ``key_extractor`` is the expression producing the stem from
    ``file_name_col``.
    """
    keyed = files.withColumn("__stem_key", key_extractor)
    return keyed.join(stems, keyed["__stem_key"] == stems[stem_col], "inner").drop(
        "__stem_key"
    )


def prefix_theta_join(files: DataFrame, stems: DataFrame, file_col: str, stem_col: str) -> DataFrame:
    """J6 (raw theta fallback): startswith join via BroadcastNestedLoopJoin.

    Documented fallback only — O(n*m) compare; use normalize_prefix_join at
    scale. Valid when the stems side is tiny (broadcast) and keys are not
    extractable.
    """
    return files.join(
        F.broadcast(stems), files[file_col].startswith(stems[stem_col]), "inner"
    )


def semi_join(left: DataFrame, right: DataFrame, on: Column) -> DataFrame:
    """S14: existence probe (head_object before download) as left-semi.

    Reference: train/common/s3_utils.py:52-57. Semi joins shuffle only keys —
    at scale dramatically cheaper than inner+distinct.
    """
    return left.join(right, on, "left_semi")


def bloom_semi_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str | None = None,
    n_bits: int = 1 << 17,
    n_hashes: int = 5,
) -> DataFrame:
    """Bloom-pruned exact left-semi join (S14 existence probe at 100 TB).

    Builds a Bloom filter over the build side from public primitives only
    (``bloom_filter_agg`` is not in Spark's public function registry):
    k seeded ``xxhash64`` probes -> bit positions -> ``bit_or``-combined
    64-bit words -> an (n_bits/8)-byte bitset collected to the driver and
    re-embedded as an array literal. The probe side is filtered by a pure
    whole-stage-codegen bit test BEFORE its shuffle, then exact-semi-joined —
    Bloom false positives cost prune efficiency, never correctness, so the
    result is bit-identical to ``semi_join``. Keys hash as strings on both
    sides, so an int build side still prunes a bigint probe side correctly
    (a type-split hash would cause false NEGATIVES, i.e. wrong answers).

    This is the explicit-operator form of Spark's runtime row-level
    filtering (spark.sql.optimizer.runtime.bloomFilter.*), usable when the
    build side comes pre-filtered by arbitrary logic and the prune must be
    guaranteed rather than cost-based. Defaults: 128 Kbit / 5 hashes ->
    <1% false positives up to ~18k distinct build keys.
    """
    small_key = small_key or big_key
    n_words = n_bits // 64

    def _pos(key_sql: str, i: int) -> str:
        return f"pmod(xxhash64(cast(`{key_sql}` as string), {i}), {n_bits}L)"

    build = small.selectExpr(
        f"explode(array({', '.join(_pos(small_key, i) for i in range(n_hashes))})) as p"
    ).selectExpr("p div 64 as w", "shiftleft(1L, cast(p % 64 as int)) as m")
    words = [0] * n_words
    for r in build.groupBy("w").agg(F.expr("bit_or(m)").alias("m")).collect():
        words[r["w"]] = r["m"]
    # one parsed literal, not F.lit(list): 2048 elements through py4j
    # cost ~1.5 s of pure driver time per call (r14; longs are exact
    # in text, so the parsed array is identical)
    bitset = F.expr(
        "array(" + ",".join(f"{w}L" for w in words) + ")"
    )

    checks = [
        f"(element_at(__bloom, cast({_pos(big_key, i)} div 64 as int) + 1)"
        f" & shiftleft(1L, cast({_pos(big_key, i)} % 64 as int))) != 0"
        for i in range(n_hashes)
    ]
    pruned = (
        big.withColumn("__bloom", bitset)
        .filter(F.expr(" AND ".join(checks)))
        .drop("__bloom")
    )
    return semi_join(
        pruned.alias("l"),
        small.alias("r"),
        F.col(f"l.{big_key}") == F.col(f"r.{small_key}"),
    )


def merge_upsert(
    base: DataFrame, updates: DataFrame, key_cols: Sequence[str]
) -> DataFrame:
    """MERGE INTO with last-write-wins semantics: rows in ``updates``
    override same-key rows in ``base``; new keys insert. The generalized
    batch form of the reference's "latest/ overwrite" checkpoint publish
    (train/train_CATVTON/utils.py:39-40, train/common/checkpoint_utils.py).

    ONE shuffle: union + groupBy(key) with a priority-keyed ``max_by`` on
    the packed payload struct (map-side combinable) — no window, no join.
    Both sides must be unique per key (dedup upstream otherwise); column
    sets must match ``base``'s non-key columns.
    """
    cols = [c for c in base.columns if c not in key_cols]
    tagged = base.select(
        *key_cols, *cols, F.lit(0).alias("__prio")
    ).unionByName(updates.select(*key_cols, *cols, F.lit(1).alias("__prio")))
    payload = F.struct(*[F.col(c) for c in cols])
    return (
        tagged.groupBy(*key_cols)
        .agg(F.max_by(payload, F.col("__prio")).alias("__p"))
        .select(*key_cols, *[F.col(f"__p.{c}").alias(c) for c in cols])
    )


def anti_join(left: DataFrame, right: DataFrame, on: Column) -> DataFrame:
    """S14 complement: rows with no match (missing-asset detection)."""
    return left.join(right, on, "left_anti")


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt_from: Sequence[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: spread each hot key over ``n_salts`` sub-keys.

    The large/skewed side gets a deterministic salt from ``salt_from``
    columns (xxhash64 — no RNG, so plans are reproducible); the small side is
    exploded across all salt values (n_salts× its size — keep it the dim
    side). One straggler task per hot key becomes n_salts parallel tasks.

    AQE's skew-join handles most cases at runtime; the explicit form exists
    for deterministic layouts (bucketed tables, fixed partitioning) and for
    joins under a window/agg where AQE cannot split. Result set is identical
    to the plain join — salting only changes the physical distribution.
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in salt_from]), F.lit(n_salts))
    l = left.withColumn("__salt", salt)
    r = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<long>"))
    )
    return l.join(r, [on, "__salt"], how).drop("__salt")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    payload_cols: Sequence[str],
    right_order: str | None = None,
) -> DataFrame:
    """As-of join: attach to each left row the most recent right row with
    ``right_ts <= left_ts`` within its key group.

    Scale shape: ONE tagged union + window carry-forward — a single
    shuffle/sort on (keys, ts), never a per-row subquery or a broadcast
    nested loop. Right rows sort before left rows at equal ts, so an exact
    tie matches (<= semantics, like SQL ASOF JOIN). ``right_order`` breaks
    ties between right rows sharing a timestamp (latest wins);
    deduplicate the right side per (key, ts) if you need a stronger
    contract. Left-outer semantics: left rows with no prior right row keep
    null payloads.
    """
    keys = [on] if isinstance(on, str) else list(on)
    from pyspark.sql.window import Window

    data_cols = [c for c in left.columns if c not in keys and c != left_ts]
    p_alias = {p: f"__p_{p}" for p in payload_cols}

    l = left.select(
        *keys,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast("long").alias("__ord"),
        *data_cols,
        *[
            F.lit(None).cast(right.schema[p].dataType).alias(a)
            for p, a in p_alias.items()
        ],
    )
    r = right.select(
        *keys,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        (F.col(right_order) if right_order else F.lit(0)).cast("long").alias("__ord"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in data_cols],
        *[F.col(p).alias(a) for p, a in p_alias.items()],
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__ts"), F.col("__side"), F.col("__ord").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = l.unionByName(r).select(
        *keys,
        "__ts",
        "__side",
        *data_cols,
        *[
            F.last(a, ignorenulls=True).over(w).alias(p)
            for p, a in p_alias.items()
        ],
    )
    return (
        carried.filter(F.col("__side") == 1)
        .drop("__side")
        .withColumnRenamed("__ts", left_ts)
    )


def range_join_banded(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    window_sec: int,
) -> DataFrame:
    """Range join (``left_ts <= right_ts < left_ts + window_sec``) as a
    banded equi-join.

    The naive form is a theta join — quadratic per key (broadcast nested
    loop in Spark). Banding assigns both sides to ``window_sec``-wide epoch
    buckets; a right row can only match left rows in its own or the
    previous bucket, so the left side explodes into 2 bucket probes and the
    join becomes a hash equi-join on (keys, bucket) + an exact residual
    filter. Cost: 2x left rows through one hash join, instead of |L|x|R|
    per key.
    """
    keys = [on] if isinstance(on, str) else list(on)
    l_epoch = F.unix_timestamp(F.col(left_ts))
    r_epoch = F.unix_timestamp(F.col(right_ts))
    l = left.withColumn(
        "__bucket",
        F.explode(
            F.array(
                F.floor(l_epoch / window_sec),
                F.floor(l_epoch / window_sec) + 1,
            )
        ),
    )
    r = right.withColumn("__bucket", F.floor(r_epoch / window_sec))
    joined = l.join(r, [*keys, "__bucket"]).filter(
        (F.col(right_ts) >= F.col(left_ts))
        & (
            F.unix_timestamp(F.col(right_ts))
            < F.unix_timestamp(F.col(left_ts)) + window_sec
        )
    )
    return joined.drop("__bucket")


def merge_changelog(
    snapshot: DataFrame,
    changes: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    op_col: str = "op",
    delete_op: str = "delete",
) -> DataFrame:
    """MERGE/SCD-1 changelog application: fold a stream of keyed
    upsert/delete events into a snapshot — the table-maintenance
    primitive (Delta/Iceberg MERGE INTO semantics) a training-data
    pipeline runs to keep its corpus snapshot current without rewriting
    history. Returns the new snapshot with the snapshot's schema.

    Per key, the LATEST change wins: one map-side-combinable
    ``max_by(payload, (ts, payload))`` aggregation picks it in a single
    pass (the payload struct rides as the final tiebreak, so equal-ts
    duplicates resolve deterministically instead of by partition order).
    The fold then full-outer-joins the one-row-per-key change set onto
    the snapshot: absent key -> row unchanged; latest op = ``delete_op``
    -> row dropped (a delete for an absent key is a no-op); anything
    else -> upsert (update or brand-new insert).

    Scale shape: one aggregation shuffle over the CHANGES (normally a
    small fraction of the snapshot) and one equi-join on the key —
    broadcastable when the deduped change set is small, AQE-planned
    otherwise. ``changes`` must carry every non-key snapshot column plus
    ``op_col``; extra change-side columns (like ``ts_col``) are dropped
    from the output.

    A latest change with a NULL op RAISES rather than filtering: the
    three-valued ``op != delete`` would otherwise silently treat a
    malformed change event as a delete (same fail-loud convention as
    pack_chunks' bad-length guard).
    """
    keys = list(key_cols)
    value_cols = [c for c in snapshot.columns if c not in keys]
    missing = [c for c in value_cols + [op_col, ts_col]
               if c not in changes.columns]
    if missing:
        raise ValueError(f"merge_changelog: changes lack columns {missing}")
    payload = F.struct(
        *[F.col(c) for c in changes.columns if c not in keys]
    )
    latest = changes.groupBy(*keys).agg(
        F.max_by(payload, F.struct(F.col(ts_col), payload)).alias("__ch")
    )
    merged = snapshot.alias("s").join(latest, keys, "full_outer")
    op_val = F.when(
        F.col("__ch").isNotNull() & F.col("__ch")[op_col].isNull(),
        F.raise_error(
            F.lit("merge_changelog: latest change has NULL op "
                  f"(expected an op or {delete_op!r})")
        ),
    ).otherwise(F.col("__ch")[op_col])
    alive = F.col("__ch").isNull() | (op_val != F.lit(delete_op))
    return merged.filter(alive).select(
        *keys,
        *[
            F.when(F.col("__ch").isNotNull(), F.col("__ch")[c])
            .otherwise(F.col(f"s.{c}"))
            .alias(c)
            for c in value_cols
        ],
    )


def scd2_history(
    snapshot: DataFrame,
    changes: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    op_col: str = "op",
    delete_op: str = "delete",
    snapshot_ts: int = 0,
) -> DataFrame:
    """SCD Type-2 history build: turn a snapshot + keyed changelog into a
    versioned dimension — one row per (key, version) with
    ``valid_from``/``valid_to`` and ``is_current`` — the warehouse
    complement of ``merge_changelog`` (which keeps only the latest state).
    A delete event closes the previous version's interval without
    emitting a row of its own; the open version has ``valid_to`` NULL.

    Implementation: the snapshot enters the event stream as a
    ``snapshot_ts`` upsert, then one ``lead(ts)`` window per key assigns
    each version's end from the next event's start. The window partitions
    by the KEY — key cardinality is the table's size, so the work spreads
    over every executor (this is the good kind of window; the bad kind
    partitions by a handful of values). Equal-ts duplicates order by the
    payload struct, so versioning is deterministic, not partition-order
    luck.
    """
    from pyspark.sql.window import Window

    keys = list(key_cols)
    value_cols = [c for c in snapshot.columns if c not in keys]
    base = snapshot
    for c in changes.columns:
        if c not in base.columns:
            base = base.withColumn(
                c,
                F.lit(snapshot_ts) if c == ts_col
                else F.lit("upsert") if c == op_col
                else F.lit(None),
            )
    ev = base.select(*changes.columns).unionByName(changes)
    payload = F.struct(*[F.col(c) for c in value_cols])
    w = Window.partitionBy(*keys).orderBy(F.col(ts_col), payload)
    h = ev.withColumn("valid_from", F.col(ts_col)).withColumn(
        "valid_to", F.lead(ts_col).over(w)
    )
    # NULL op would three-valued-filter to a silent delete; fail loudly
    # instead (same convention as merge_changelog)
    op_val = F.when(
        F.col(op_col).isNull(),
        F.raise_error(
            F.lit("scd2_history: change event has NULL op "
                  f"(expected an op or {delete_op!r})")
        ),
    ).otherwise(F.col(op_col))
    return h.filter(op_val != delete_op).select(
        *keys,
        *value_cols,
        "valid_from",
        "valid_to",
        F.col("valid_to").isNull().alias("is_current"),
    )


def interval_overlap_join(
    df: DataFrame,
    key_cols: Sequence[str],
    id_col: str,
    start_col: str,
    end_col: str,
    cell: int = 3600,
) -> DataFrame:
    """Exact interval-overlap SELF-join: all pairs of intervals (same
    key, id_a < id_b) with [s_a, e_a] ∩ [s_b, e_b] nonempty (touching
    endpoints count) — the span-reconciliation primitive (overlapping
    sessions, double-booked resources, colliding time ranges) that a
    naive theta join makes quadratic per key.

    Scale shape: each interval explodes to its covered width-``cell``
    grid cells (ceil(len/cell)+1 rows — pick ``cell`` near the typical
    interval length so the blow-up is a small constant); candidates come
    from an EQUI-join on (key, cell); the pair is kept only in the cell
    containing greatest(s_a, s_b), so each overlapping pair is emitted
    EXACTLY once with no post-dedup distinct. A single degenerate
    mega-interval multiplies by its own span/cell only — it cannot make
    any other row quadratic. Returns (key..., id_a, id_b, overlap_len).
    """
    keys = list(key_cols)
    s, e = F.col(start_col), F.col(end_col)
    cells = F.sequence(
        F.floor(s / cell).cast("long"), F.floor(e / cell).cast("long")
    )
    g = df.select(
        *keys,
        F.col(id_col),
        s.alias("__s"),
        e.alias("__e"),
        F.explode(cells).alias("__c"),
    )
    a, b = g.alias("a"), g.alias("b")
    cond = (F.col("a.__c") == F.col("b.__c"))
    for k in keys:
        cond &= F.col(f"a.{k}") == F.col(f"b.{k}")
    cond &= F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    cond &= F.col("a.__s") <= F.col("b.__e")
    cond &= F.col("b.__s") <= F.col("a.__e")
    # meet-once rule: only the cell holding the later start emits the pair
    cond &= F.col("a.__c") == F.floor(
        F.greatest(F.col("a.__s"), F.col("b.__s")) / cell
    ).cast("long")
    return a.join(b, cond).select(
        *[F.col(f"a.{k}") for k in keys],
        F.col(f"a.{id_col}").alias("id_a"),
        F.col(f"b.{id_col}").alias("id_b"),
        (
            F.least(F.col("a.__e"), F.col("b.__e"))
            - F.greatest(F.col("a.__s"), F.col("b.__s"))
        ).alias("overlap_len"),
    )
