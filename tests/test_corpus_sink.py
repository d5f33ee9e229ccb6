"""Sharded corpus writer (sinks/corpus.py): stable layout, stable shard
membership, and a clean end-to-end pipeline round-trip."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from database2ogr_spark.sinks.corpus import write_corpus_shards


def test_write_corpus_shards_layout_and_roundtrip(spark, tmp_path):
    from database2ogr_spark.operators.sampling import split_corpus

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    split = split_corpus(docs, {"train": 90, "val": 5, "test": 5})
    out = str(tmp_path / "corpus")
    write_corpus_shards(split, out, partition_by=("split",), shards=3)

    # directory layout: one dir per split value, shard dirs beneath, and
    # EXACTLY one data file per (split, shard) cell — the guarantee that
    # cannot depend on spark.sql.shuffle.partitions because file identity
    # is the __shard path, not task placement
    dirs = {os.path.basename(d) for d in glob.glob(os.path.join(out, "split=*"))}
    assert dirs == {"split=train", "split=val", "split=test"}
    for cell in glob.glob(os.path.join(out, "split=*", "__shard=*")):
        files = [f for f in glob.glob(os.path.join(cell, "*")) if "part-" in f]
        assert len(files) == 1, cell

    # round-trip completeness
    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    assert {r.doc_id for r in back.select("doc_id").collect()} == {
        r.doc_id for r in docs.select("doc_id").collect()
    }


def test_write_corpus_shards_membership_is_append_stable(spark, tmp_path):
    base = spark.range(100).select(
        F.col("id").alias("doc_id"), F.lit("train").alias("split")
    )
    out1 = str(tmp_path / "v1")
    write_corpus_shards(base, out1, shards=4)
    first = {
        r.doc_id: r.s
        for r in spark.read.parquet(out1).select(
            "doc_id", F.col("__shard").alias("s")
        ).collect()
    }
    from database2ogr_spark.functions.hashing import stable_hash64

    bigger = spark.range(200).select(
        F.col("id").alias("doc_id"), F.lit("train").alias("split")
    )
    out2 = str(tmp_path / "v2")
    write_corpus_shards(bigger, out2, shards=4)
    shard_of = (
        bigger.select(
            "doc_id",
            (stable_hash64(F.col("doc_id").cast("string"), seed=7) % 4).alias("s"),
        )
        .collect()
    )
    # every original doc keeps the same hash shard in the bigger export,
    # and the WRITTEN __shard path matches the doc-only hash derivation
    small_shards = {
        r.doc_id: r.s for r in shard_of if r.doc_id < 100
    }
    again = {
        r.doc_id: r.s
        for r in base.select(
            "doc_id",
            (stable_hash64(F.col("doc_id").cast("string"), seed=7) % 4).alias("s"),
        ).collect()
    }
    assert small_shards == again
    assert first == again
    assert len(first) == 100


def test_compact_dataset_reduces_files_and_preserves_rows(spark, tmp_path):
    """A fragmented 64-file dataset compacts to the computed file count with
    content intact; sort_within restores within-file ordering."""
    from database2ogr_spark.sinks.corpus import compact_dataset

    frag = str(tmp_path / "frag")
    out = str(tmp_path / "compact")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.repartition(64).write.mode("overwrite").parquet(frag)
    import glob

    assert len(glob.glob(f"{frag}/part-*")) == 64
    # huge target → everything fits in one file
    n_files = compact_dataset(
        spark, frag, out, target_bytes=1 << 40, sort_within=("doc_id",)
    )
    assert n_files == 1
    assert len(glob.glob(f"{out}/part-*")) == 1
    a = sorted(r.doc_id for r in spark.read.parquet(frag).collect())
    b = [r.doc_id for r in spark.read.parquet(out).collect()]
    assert sorted(b) == a
    # sort_within: the single output file is doc_id-ordered on disk
    assert b == sorted(b)


def test_compact_dataset_splits_to_multiple_targets(spark, tmp_path):
    from database2ogr_spark.sinks.corpus import compact_dataset

    frag = str(tmp_path / "frag2")
    out = str(tmp_path / "compact2")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.repartition(16).write.mode("overwrite").parquet(frag)
    import glob, os

    total = sum(os.path.getsize(p) for p in glob.glob(f"{frag}/part-*"))
    # pick a target that forces >1 output file
    n_files = compact_dataset(spark, frag, out, target_bytes=max(1, total // 3))
    assert n_files >= 3
    assert spark.read.parquet(out).count() == docs.count()
