"""Sources + E1/E2 pipelines over a reference-shaped file fixture
(FIXTURES.md fx_catalog/fx_pairs semantics, generated deterministically)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from experimentsplan_datapipeline_spark.plans.pipelines import (
    build_vton_dataset,
    evaluation_report,
)
from experimentsplan_datapipeline_spark.sources.catalog import (
    catalog_with_keys,
    read_labels_file,
    read_pairs_file,
    scan_catalog,
)
from experimentsplan_datapipeline_spark.sources.sinks import (
    discover_latest_version,
    read_back_json,
    write_json_results,
    write_versioned_with_latest,
)


@pytest.fixture(scope="module")
def catalog_root(tmp_path_factory):
    """~60 stems as convention-named empty files; 3 difficulties; some stems
    deliberately incomplete; a few non-image files."""
    root = tmp_path_factory.mktemp("dataset_ultimate")
    difficulties = ["easy", "medium", "hard"]
    for i in range(60):
        d = difficulties[i % 3]
        stem = f"{i:05d}"
        base = root / d / "female"
        complete = i % 10 != 7  # every 10th-ish stem missing its vton
        (base / "initial_image").mkdir(parents=True, exist_ok=True)
        (base / "cloth_image").mkdir(parents=True, exist_ok=True)
        (base / "try_on_image").mkdir(parents=True, exist_ok=True)
        (base / "initial_image" / f"{stem}_person.png").write_bytes(b"p" + stem.encode())
        (base / "cloth_image" / f"{stem}_cloth_front.png").write_bytes(b"c" + stem.encode())
        if complete:
            (base / "try_on_image" / f"{stem}_vton.png").write_bytes(b"v" + stem.encode())
    (root / "easy" / "notes.txt").write_text("not an image")
    return str(root)


def test_scan_catalog_glob_pushdown(spark, catalog_root):
    files = scan_catalog(spark, catalog_root, glob="*.png")
    assert files.filter(F.col("path").endswith(".txt")).count() == 0
    assert "content" not in files.columns  # listing-only scan skips GETs
    n = files.count()
    assert n == 60 * 2 + 54  # persons + cloths + complete vtons


def test_catalog_keys_and_difficulty(spark, catalog_root):
    keyed = catalog_with_keys(scan_catalog(spark, catalog_root, glob="*.png"))
    row = keyed.filter(F.col("file_name") == "00000_person.png").collect()[0]
    assert row.stem == "00000"
    assert row.image_type == "initial_image"
    assert row.difficulty == "easy"
    counts = {
        r.difficulty: r.n
        for r in keyed.groupBy("difficulty").agg(F.count("*").alias("n")).collect()
    }
    assert set(counts) == {"easy", "medium", "hard"}


def test_build_vton_dataset_end_to_end(spark, catalog_root):
    ds = build_vton_dataset(spark, [catalog_root])
    rows = ds.collect()
    # only complete triplets survive: 54 of 60 stems
    assert len(rows) == 54
    assert {"stem", "initial_image", "cloth_image", "try_on_image", "difficulty"} <= set(
        ds.columns
    )
    # sampled + deterministic across runs
    t = {"easy": 5, "medium": 5, "hard": 5}
    s1 = build_vton_dataset(spark, [catalog_root], targets=t, seed=1).collect()
    s2 = build_vton_dataset(spark, [catalog_root], targets=t, seed=1).collect()
    assert sorted(r.stem for r in s1) == sorted(r.stem for r in s2)
    assert len(s1) == 15


def test_pairs_and_labels_readers(spark, tmp_path):
    pairs_path = tmp_path / "train_pairs.txt"
    pairs_path.write_text("p1 g1\np2 g2\n\n  \np3 g3\n")
    pairs = read_pairs_file(spark, str(pairs_path))
    assert sorted((r.person_id, r.garment_id) for r in pairs.collect()) == [
        ("p1", "g1"), ("p2", "g2"), ("p3", "g3"),
    ]
    labels_path = tmp_path / "labels.txt"
    labels_path.write_text("img/a.png 5\nimg/b.png 12\n")
    labels = read_labels_file(spark, str(labels_path))
    got = {r.image_path: r.label for r in labels.collect()}
    assert got == {"img/a.png": 5, "img/b.png": 12}
    assert dict(labels.dtypes)["label"] == "bigint"


def test_json_sink_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [("catvton", 0.12, 0.87), ("dit", 0.2, 0.8)], ["model", "lpips", "ssim"]
    )
    out = str(tmp_path / "results")
    write_json_results(df, out)
    back = read_back_json(spark, out)
    assert sorted((r.model, r.lpips, r.ssim) for r in back.collect()) == sorted(
        (r.model, r.lpips, r.ssim) for r in df.collect()
    )


def test_versioned_sink_with_latest(spark, tmp_path):
    root = str(tmp_path / "ckpt")
    df1 = spark.createDataFrame([(1, 0.5)], ["step", "loss"])
    df2 = spark.createDataFrame([(2, 0.4)], ["step", "loss"])
    write_versioned_with_latest(df1, root, 100)
    write_versioned_with_latest(df2, root, 200)
    assert discover_latest_version(spark, root) == 200
    latest = spark.read.parquet(os.path.join(root, "latest")).collect()
    assert latest[0].loss == 0.4
    # history preserved
    old = spark.read.parquet(os.path.join(root, "step=100")).collect()
    assert old[0].loss == 0.5


def test_evaluation_report(spark):
    rows = []
    for model in ["catvton", "dit"]:
        for bench in ["viton-hd", "dresscode"]:
            for i in range(5):
                rows.append((model, bench, 0.1 * (i + 1), 0.8 + 0.01 * i))
    df = spark.createDataFrame(rows, ["model", "benchmark", "lpips", "ssim"])
    stats, pivot = evaluation_report(df, ["lpips", "ssim"])
    srow = stats.filter(
        (F.col("model") == "catvton") & (F.col("benchmark") == "viton-hd")
    ).collect()[0]
    assert abs(srow.lpips_mean - 0.3) < 1e-9
    assert srow.lpips_min == 0.1 and abs(srow.lpips_max - 0.5) < 1e-12
    assert set(pivot.columns) == {"model", "viton-hd", "dresscode"}


def test_partitioned_layout_prunes(spark, tmp_path):
    from experimentsplan_datapipeline_spark.sources.sinks import write_partitioned

    df = spark.createDataFrame(
        [(i, ["easy", "medium", "hard"][i % 3], float(i)) for i in range(60)],
        ["id", "difficulty", "v"],
    )
    path = str(tmp_path / "layout")
    write_partitioned(df, path, ["difficulty"])
    back = spark.read.parquet(path).filter(F.col("difficulty") == "hard")
    plan = back._jdf.queryExecution().executedPlan().toString()
    # the filter must land in PartitionFilters (directory pruning), not in
    # the data filters
    assert "PartitionFilters" in plan and "difficulty" in plan.split("PartitionFilters")[1][:120]
    assert back.count() == 20


def test_write_binary_files(spark, tmp_path):
    import os

    from experimentsplan_datapipeline_spark.sources.sinks import write_binary_files

    df = spark.createDataFrame(
        [("a_result.png", b"\x89PNG-a"), ("b_result.png", b"\x89PNG-b")],
        ["name", "content"],
    )
    out = str(tmp_path / "imgs")
    write_binary_files(df, out)
    assert sorted(os.listdir(out)) == ["a_result.png", "b_result.png"]
    with open(os.path.join(out, "a_result.png"), "rb") as f:
        assert f.read() == b"\x89PNG-a"


def test_write_binary_files_rejects_traversal(spark, tmp_path):
    import pytest as _pytest

    from experimentsplan_datapipeline_spark.sources.sinks import write_binary_files

    df = spark.createDataFrame([("../evil", b"x")], ["name", "content"])
    with _pytest.raises(Exception):
        write_binary_files(df, str(tmp_path / "imgs"))


def test_copy_tree_with_exclusion(spark, tmp_path):
    """S12/S13: recursive distributed copy preserves structure and honors
    both the include glob and the exclusion suffix list."""
    from experimentsplan_datapipeline_spark.sources.sinks import copy_tree

    src = tmp_path / "src"
    (src / "a").mkdir(parents=True)
    (src / "b" / "c").mkdir(parents=True)
    (src / "root.txt").write_bytes(b"root")
    (src / "a" / "one.txt").write_bytes(b"one")
    (src / "a" / "skip.tmp").write_bytes(b"nope")
    (src / "b" / "c" / "deep.txt").write_bytes(b"deep")

    dst = tmp_path / "dst"
    n = copy_tree(spark, str(src), str(dst), exclude_suffixes=(".tmp",))
    assert n == 3
    assert (dst / "root.txt").read_bytes() == b"root"
    assert (dst / "a" / "one.txt").read_bytes() == b"one"
    assert (dst / "b" / "c" / "deep.txt").read_bytes() == b"deep"
    assert not (dst / "a" / "skip.tmp").exists()

    # include-glob variant: only .txt under a/
    dst2 = tmp_path / "dst2"
    n2 = copy_tree(spark, str(src), str(dst2), path_glob="*.txt")
    assert n2 == 3 and not (dst2 / "a" / "skip.tmp").exists()


def test_copy_tree_uri_destination(spark, tmp_path):
    """The object-store code path: a scheme-qualified destination resolves
    through pyarrow.fs (FileSystem.from_uri) — the same branch an s3:// or
    hdfs:// dst_root takes — and a file:/// SOURCE URI (triple-slash form)
    still yields anchored relative paths, never absolute ones."""
    from experimentsplan_datapipeline_spark.sources.sinks import copy_tree

    src = tmp_path / "src"
    (src / "a").mkdir(parents=True)
    (src / "a" / "one.txt").write_bytes(b"one")
    (src / "root.txt").write_bytes(b"root")

    dst = tmp_path / "dst_uri"
    n = copy_tree(spark, f"file://{src}", f"file://{dst}")
    assert n == 2
    assert (dst / "a" / "one.txt").read_bytes() == b"one"
    assert (dst / "root.txt").read_bytes() == b"root"
    # nothing escaped the destination root
    assert not (tmp_path / "one.txt").exists()


def test_write_binary_files_uri_destination(spark, tmp_path):
    from experimentsplan_datapipeline_spark.sources.sinks import write_binary_files

    df = spark.createDataFrame([("x.bin", b"xyz")], ["name", "content"])
    out = tmp_path / "imgs_uri"
    write_binary_files(df, f"file://{out}")
    assert (out / "x.bin").read_bytes() == b"xyz"


def test_compact_zorder_tight_envelopes_and_content(spark, tmp_path):
    """compact_zorder: (a) content survives the rewrite bit-for-bit,
    (b) every output file gets a tight min/max envelope in BOTH clustered
    dimensions — the sum of per-file 2-D envelope areas must be a small
    fraction of what insert-ordered files cover (that envelope is exactly
    what parquet row-group pruning uses for box predicates)."""
    from pyspark.sql import functions as F

    from experimentsplan_datapipeline_spark.sources.sinks import (
        compact_zorder,
    )

    df = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .withColumn("u", F.pmod("user_id", F.lit(256)))
        .withColumn("e", F.pmod("event_id", F.lit(256)))
    )
    zpath = str(tmp_path / "zorder")
    bpath = str(tmp_path / "baseline")
    compact_zorder(df, zpath, "u", "e", n_files=8)
    df.repartition(8).write.mode("overwrite").parquet(bpath)

    back = spark.read.parquet(zpath)
    assert back.count() == df.count()
    hash_of = lambda d: d.agg(  # noqa: E731
        F.sum(F.crc32(F.concat_ws("|", "event_id", "user_id", "event_type")))
    ).first()[0]
    assert hash_of(back) == hash_of(df)

    def envelope_area_sum(path):
        per_file = (
            spark.read.parquet(path)
            .groupBy(F.input_file_name().alias("f"))
            .agg(
                (F.max("u") - F.min("u") + 1).alias("du"),
                (F.max("e") - F.min("e") + 1).alias("de"),
            )
        )
        return per_file.agg(F.sum(F.col("du") * F.col("de"))).first()[0]

    z_area = envelope_area_sum(zpath)
    b_area = envelope_area_sum(bpath)
    assert z_area < b_area / 4, (z_area, b_area)


def test_quantile_bucket_equal_frequency_on_skew(spark):
    """quantile_bucket: a heavily skewed (exponential-ish) column spreads
    ~uniformly over 2^bits buckets (equal frequency, not equal width),
    bucket ids are monotone in the value, nulls land in bucket 0, and the
    full pipeline quantile_bucket -> zorder_key -> compact_zorder keeps
    envelopes tight on data where raw masking could not."""
    import tempfile

    from pyspark.sql import functions as F

    from experimentsplan_datapipeline_spark.operators.util import (
        quantile_bucket,
        zorder_key,
    )
    from experimentsplan_datapipeline_spark.sources.sinks import (
        compact_zorder,
    )

    # skewed: value ~ i^3 concentrates mass near 0 in equal-width terms
    df = spark.range(4000).select(
        F.col("id"), (F.col("id") ** 3).cast("double").alias("v")
    )
    b = quantile_bucket(df, "v", bits=4)
    bucketed = df.withColumn("b", b)
    counts = {r.b: r.c for r in bucketed.groupBy("b").agg(
        F.count(F.lit(1)).alias("c")).collect()}
    assert set(counts) == set(range(16))
    assert max(counts.values()) < 2 * min(counts.values())  # ~equal freq
    # monotone: bucket of a larger value never decreases
    two = bucketed.orderBy("v").select("b").collect()
    bs = [r.b for r in two]
    assert bs == sorted(bs)
    # nulls -> bucket 0
    with_null = spark.createDataFrame(
        [(None,), (1.0,)], "v double"
    ).withColumn("b", quantile_bucket(df, "v", bits=4))
    assert {r.b for r in with_null.collect() if r.v is None} == {0}
    # end-to-end: bucketized dims feed zorder compaction
    dims = df.withColumn("x", quantile_bucket(df, "v", bits=4)).withColumn(
        "y", F.pmod(F.col("id"), F.lit(16))
    )
    with tempfile.TemporaryDirectory() as tmp:
        compact_zorder(dims, tmp + "/z", "x", "y", n_files=4, bits=4)
        back = spark.read.parquet(tmp + "/z")
        assert back.count() == 4000
        per_file = back.groupBy(F.input_file_name()).agg(
            (F.max("x") - F.min("x") + 1).alias("dx"),
            (F.max("y") - F.min("y") + 1).alias("dy"),
        )
        area = per_file.agg(F.sum(F.col("dx") * F.col("dy"))).first()[0]
        assert area < 4 * 16 * 16 / 2  # files cover < half the domain each
