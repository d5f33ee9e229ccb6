"""WebDataset-style tar shard sink — the loader-facing export format for
sample-oriented training pipelines.

The WebDataset convention (public webdataset project / tarp tooling) stores
each sample as adjacent members of a POSIX tar — ``<key>.txt`` payload plus
``<key>.json`` metadata — so a training loader streams samples sequentially
with zero random I/O and shards are the unit of parallelism/checkpointing.

Spark mapping:

- **membership is a pure function of the sample**: shard =
  ``stable_hash64(key) % shards`` — same contract as sinks/corpus.py: a
  re-export after appending docs never moves old docs between shards, so
  loader checkpoints stay valid. Membership never depends on task
  placement or ``spark.sql.shuffle.partitions``.
- **one grouped-map task per shard** writes its tar: ``groupBy(__shard).
  applyInPandas`` gives each task exactly one shard's rows; members are
  written key-sorted with zeroed mtime/uid/gid, so re-exporting identical
  data produces byte-identical tars (diffable exports). The returned
  DataFrame is the manifest (shard, path, n_samples, n_bytes).
- **sizing**: one shard must fit one task's memory; pick ``shards`` ≈
  corpus_bytes / 1 GiB at scale (WebDataset's own guidance) — the
  number of shards, not the corpus size, bounds per-task memory.
- the reader is ``binaryFile`` scan + ``mapInPandas`` tar parse — each
  task unpacks whole shards independently; no driver involvement.
"""

from __future__ import annotations

import io
import json
import os
import tarfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from database2ogr_spark.functions.hashing import stable_hash64


def write_tar_shards(
    df: DataFrame,
    out_dir: str,
    *,
    shards: int = 8,
    key_col: str = "doc_id",
    text_col: str = "text",
    meta_cols: tuple[str, ...] = (),
    seed: int = 7,
) -> DataFrame:
    """Write ``df`` as ``out_dir/shard-NNNNN.tar`` WebDataset shards and
    return the manifest as a DataFrame (shard, path, n_samples, n_bytes).

    Each sample becomes ``<key>.txt`` (utf-8 payload) and ``<key>.json``
    (the ``meta_cols`` as a sorted-key JSON object). Members are ordered by
    key and all tar headers are normalized (mtime=0, uid=gid=0, mode 644),
    so equal data yields byte-equal shards.

    The write happens when the returned manifest is materialized (it IS
    the write job); ``out_dir`` must be visible to every executor (shared
    filesystem or object-store mount — on local mode any path works).
    Existing ``shard-*.tar`` files in ``out_dir`` are removed up front:
    a re-export of a shrunk corpus can leave a shard empty (its grouped
    task never fires), and a stale tar surviving from a previous export
    would silently re-enter the reader's glob as live data.

    Keys must be integers (they zero-pad to 20 digits — the full bigint
    range — so member order is key order); a non-integer id column is
    rejected up front with a clear error rather than failing inside the
    write tasks.
    """
    key_type = dict(df.dtypes)[key_col]
    if key_type not in ("tinyint", "smallint", "int", "bigint"):
        raise ValueError(
            f"write_tar_shards requires an integer key column; {key_col!r} "
            f"is {key_type}. Map string ids to a stable int64 first "
            "(e.g. functions.hashing.stable_hash64)."
        )
    os.makedirs(out_dir, exist_ok=True)
    for f in os.listdir(out_dir):
        if f.startswith("shard-") and f.endswith(".tar"):
            os.remove(os.path.join(out_dir, f))
    shard_col = (
        stable_hash64(F.col(key_col).cast("string"), seed=seed) % shards
    ).cast("int")
    cols = [key_col, text_col, *meta_cols]
    staged = df.select(*cols).withColumn("__shard", shard_col)

    def write_shard(pdf):
        import pandas as pd

        shard = int(pdf["__shard"].iloc[0])
        path = os.path.join(out_dir, f"shard-{shard:05d}.tar")
        pdf = pdf.sort_values(key_col)
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w") as tar:
            for _, row in pdf.iterrows():
                key = f"{int(row[key_col]):020d}"
                # NULL text → empty payload, not the string "None" (one
                # bad row must not silently corrupt a training shard)
                text = row[text_col]
                payload = ("" if text is None else str(text)).encode("utf-8")
                meta = json.dumps(
                    {c: row[c] for c in meta_cols}, sort_keys=True, default=str
                ).encode("utf-8")
                for name, data in ((f"{key}.txt", payload), (f"{key}.json", meta)):
                    ti = tarfile.TarInfo(name=name)
                    ti.size = len(data)
                    ti.mtime = 0
                    ti.uid = ti.gid = 0
                    ti.mode = 0o644
                    tar.addfile(ti, io.BytesIO(data))
        data = buf.getvalue()
        with open(path, "wb") as f:
            f.write(data)
        return pd.DataFrame(
            {
                "shard": [shard],
                "path": [path],
                "n_samples": [len(pdf)],
                "n_bytes": [len(data)],
            }
        )

    return staged.groupBy("__shard").applyInPandas(
        write_shard, schema="shard int, path string, n_samples long, n_bytes long"
    )


def read_tar_shards(spark: SparkSession, out_dir: str) -> DataFrame:
    """Read WebDataset shards back: (key, text, meta) with ``meta`` the raw
    JSON string from the ``.json`` member. Whole-shard parallelism — one
    ``binaryFile`` row per tar, unpacked inside ``mapInPandas``.

    A directory with no shards (an empty corpus was written) reads back
    as an EMPTY frame with the same schema — a partition that produced
    zero shards must not kill the read side with PATH_NOT_FOUND. ONLY
    that condition is absorbed (ADVICE r7): any other analysis-time
    error — corrupt metadata, a misconfigured reader — re-raises, so a
    genuinely broken read can never masquerade as an empty corpus."""
    from pyspark.errors import AnalysisException

    try:
        bins = spark.read.format("binaryFile").load(
            os.path.join(out_dir, "shard-*.tar")
        )
    except AnalysisException as e:
        cond = (
            e.getCondition() if hasattr(e, "getCondition")
            else e.getErrorClass()
        )
        if cond != "PATH_NOT_FOUND":
            raise
        return spark.createDataFrame([], "key long, text string, meta string")

    def parse(batches):
        import pandas as pd

        for pdf in batches:
            keys, texts, metas = [], [], []
            for content in pdf["content"]:
                with tarfile.open(fileobj=io.BytesIO(bytes(content))) as tar:
                    members = {}
                    for m in tar.getmembers():
                        stem, ext = m.name.rsplit(".", 1)
                        members.setdefault(stem, {})[ext] = (
                            tar.extractfile(m).read()
                        )
                    for stem in sorted(members):
                        keys.append(int(stem))
                        texts.append(members[stem]["txt"].decode("utf-8"))
                        metas.append(members[stem]["json"].decode("utf-8"))
            yield pd.DataFrame({"key": keys, "text": texts, "meta": metas})

    return bins.select("content").mapInPandas(
        parse, schema="key long, text string, meta string"
    )
