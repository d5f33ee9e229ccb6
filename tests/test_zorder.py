"""Z-order clustering: Morton key correctness, determinism, and the
locality property the layout exists for (bounded per-partition spans on
EVERY indexed column, which is what parquet min/max pruning consumes)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from database2ogr_spark.operators.zorder import cluster_by_zorder, zorder_key


def _interleave2(a: int, b: int, bits: int = 16) -> int:
    z = 0
    for bit in range(bits):
        z |= ((a >> bit) & 1) << (bit * 2)
        z |= ((b >> bit) & 1) << (bit * 2 + 1)
    return z


def test_zorder_key_matches_reference_interleave(spark):
    # 4 corner points of a [0,3]x[0,300] grid: quantization is exact at the
    # corners, so the key must equal the hand-interleaved Morton code
    df = spark.createDataFrame(
        [(0, 0), (1, 300), (2, 0), (3, 300)], "a long, b long"
    )
    out = {
        (r.a, r.b): r.zkey
        for r in zorder_key(df, ["a", "b"], bits=16).collect()
    }
    qa = {0: 0, 1: 21845, 2: 43690, 3: 65535}  # floor(a/3 * 65535)
    qb = {0: 0, 300: 65535}
    for (a, b), z in out.items():
        assert z == _interleave2(qa[a], qb[b])


def test_zorder_key_deterministic_and_total(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    k1 = {r.doc_id: r.zkey for r in zorder_key(docs, ["n_chars", "doc_id"]).collect()}
    k2 = {
        r.doc_id: r.zkey
        for r in zorder_key(docs.repartition(13), ["n_chars", "doc_id"]).collect()
    }
    assert k1 == k2  # min/max + integer interleave: layout-invariant
    assert len(k1) == docs.count()
    assert all(0 <= z < (1 << 32) for z in k1.values())


def test_zorder_rejects_bad_shapes(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    with pytest.raises(ValueError):
        zorder_key(docs, ["n_chars"])
    with pytest.raises(ValueError):
        zorder_key(docs, ["n_chars", "doc_id"], bits=40)


def test_cluster_by_zorder_bounds_every_dimension(spark):
    """The point of the layout: after Morton clustering, EACH partition
    covers a small min/max span on BOTH columns, so a selective filter on
    either column can prune most files.  A single-column sort gives this
    for its sort key only — the second column's span stays ~global."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    n_parts = 8
    clustered = cluster_by_zorder(
        docs, ["n_chars", "doc_id"], num_partitions=n_parts
    )
    spans = (
        clustered.withColumn("p", F.spark_partition_id())
        .groupBy("p")
        .agg(
            (F.max("n_chars") - F.min("n_chars")).alias("span_chars"),
            (F.max("doc_id") - F.min("doc_id")).alias("span_ids"),
        )
        .collect()
    )
    glob = docs.agg(
        (F.max("n_chars") - F.min("n_chars")).alias("gc"),
        (F.max("doc_id") - F.min("doc_id")).alias("gi"),
    ).collect()[0]
    assert len(spans) >= 2
    # average per-partition span must be well under the global span on BOTH
    # dimensions simultaneously — the property a 1-D sort cannot give
    avg_chars = sum(r.span_chars for r in spans) / len(spans)
    avg_ids = sum(r.span_ids for r in spans) / len(spans)
    assert avg_chars < 0.7 * glob.gc
    assert avg_ids < 0.7 * glob.gi
    # contrast: sorting by n_chars alone leaves doc_id spans ~global
    sorted_1d = docs.repartitionByRange(n_parts, "n_chars")
    spans_1d = (
        sorted_1d.withColumn("p", F.spark_partition_id())
        .groupBy("p")
        .agg((F.max("doc_id") - F.min("doc_id")).alias("span_ids"))
        .collect()
    )
    avg_ids_1d = sum(r.span_ids for r in spans_1d) / len(spans_1d)
    assert avg_ids < avg_ids_1d
