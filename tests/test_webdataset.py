import hashlib
import os
import tarfile

from pyspark.sql import functions as F

from database2ogr_spark.sinks.webdataset import read_tar_shards, write_tar_shards


def _docs(spark, n=40):
    rows = [(i, f"text body {i} é中", "en" if i % 2 else "fr") for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_roundtrip_preserves_text_and_meta(spark, tmp_path):
    out = str(tmp_path / "wds")
    manifest = write_tar_shards(
        _docs(spark), out, shards=4, meta_cols=("lang",)
    ).collect()
    assert sorted(m.shard for m in manifest) == sorted({m.shard for m in manifest})
    assert sum(m.n_samples for m in manifest) == 40

    back = read_tar_shards(spark, out).withColumn(
        "lang", F.get_json_object("meta", "$.lang")
    )
    rows = {r.key: (r.text, r.lang) for r in back.collect()}
    orig = {r.doc_id: (r.text, r.lang) for r in _docs(spark).collect()}
    assert rows == orig


def test_shard_membership_stable_across_partitioning(spark, tmp_path):
    d = _docs(spark)
    m1 = write_tar_shards(d.repartition(2), str(tmp_path / "a"), shards=4).collect()
    m2 = write_tar_shards(d.repartition(13), str(tmp_path / "b"), shards=4).collect()
    members = {}
    for out in ("a", "b"):
        for f in os.listdir(tmp_path / out):
            with tarfile.open(tmp_path / out / f) as tar:
                for m in tar.getmembers():
                    members.setdefault(out, {})[m.name] = f
    assert members["a"] == members["b"]
    assert len(m1) == len(m2)


def test_reexport_is_byte_identical(spark, tmp_path):
    d = _docs(spark)
    write_tar_shards(d, str(tmp_path / "x"), shards=3, meta_cols=("lang",)).collect()
    write_tar_shards(d, str(tmp_path / "y"), shards=3, meta_cols=("lang",)).collect()

    def digest(p):
        return {
            f: hashlib.md5((p / f).read_bytes()).hexdigest() for f in os.listdir(p)
        }

    assert digest(tmp_path / "x") == digest(tmp_path / "y")


def test_tar_members_are_normalized_and_sorted(spark, tmp_path):
    out = str(tmp_path / "wds")
    write_tar_shards(_docs(spark, 10), out, shards=1, meta_cols=("lang",)).collect()
    with tarfile.open(os.path.join(out, "shard-00000.tar")) as tar:
        names = [m.name for m in tar.getmembers()]
        stems = [n.rsplit(".", 1)[0] for n in names]
        # key-grouped: stems non-decreasing, payload precedes metadata
        assert stems == sorted(stems)
        assert all(
            names[i].endswith(".txt") and names[i + 1].endswith(".json")
            for i in range(0, len(names), 2)
        )
        assert all(m.mtime == 0 and m.uid == 0 and m.mode == 0o644 for m in tar.getmembers())


def test_null_text_becomes_empty_payload_not_none_string(spark, tmp_path):
    out = str(tmp_path / "wds_null")
    df = spark.createDataFrame(
        [(1, None, "en"), (2, "real", "fr")], "doc_id long, text string, lang string"
    )
    write_tar_shards(df, out, shards=1, meta_cols=("lang",)).collect()
    back = {r.key: r.text for r in read_tar_shards(spark, out).collect()}
    assert back == {1: "", 2: "real"}


def test_string_keys_rejected_with_clear_error(spark, tmp_path):
    import pytest

    df = spark.createDataFrame([("a1", "t")], "doc_id string, text string")
    with pytest.raises(ValueError, match="integer key column"):
        write_tar_shards(df, str(tmp_path / "x"))


def test_reexport_clears_stale_shards(spark, tmp_path):
    out = str(tmp_path / "wds")
    big = spark.createDataFrame(
        [(i, f"t{i}") for i in range(40)], "doc_id long, text string"
    )
    write_tar_shards(big, out, shards=4).collect()
    # shrink to one doc: some shards now empty; their old tars must not
    # survive into the re-export
    small = big.filter("doc_id = 0")
    write_tar_shards(small, out, shards=4).collect()
    back = [r.key for r in read_tar_shards(spark, out).collect()]
    assert back == [0]
