"""Idempotent micro-batch sink — exactly-once parquet output under
``foreachBatch`` replays.

Structured Streaming's ``foreachBatch`` gives at-least-once delivery: after
a crash between "batch written" and "offsets committed", the SAME batch id
is replayed into the sink function. A sink that blindly appends therefore
duplicates data on recovery. The standard fix (documented in the public
Spark structured-streaming guide) is to make the write idempotent by
keying it on ``batch_id``:

- each batch lands in its own ``__batch_id=N`` directory (dynamic
  partition overwrite of exactly that partition), so a replay of batch N
  overwrites batch N byte-for-byte instead of appending a second copy;
- a ``_committed_N`` marker written AFTER the parquet commit lets the
  sink skip finished batches entirely on replay (cheap no-op instead of
  a rewrite);
- readers simply read the root path; ``__batch_id`` comes back as a
  partition column (drop it or keep it as provenance).

The directory-per-batch layout is also the natural compaction boundary:
a maintenance job can rewrite old batch directories into larger files
without coordinating with the live stream.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class IdempotentParquetSink:
    """``foreachBatch`` callable with exactly-once semantics per batch id.

    Usage::

        sink = IdempotentParquetSink(out_dir)
        stream.writeStream.foreachBatch(sink).start()

    Replaying a batch id that already committed is a no-op; replaying one
    that started but never committed overwrites its partition cleanly.
    """

    def __init__(self, out_dir: str):
        self.out_dir = out_dir

    def _marker(self, batch_id: int) -> str:
        return os.path.join(self.out_dir, f"_committed_{batch_id}")

    def committed_ids(self) -> set[int]:
        if not os.path.isdir(self.out_dir):
            return set()
        return {
            int(f.rsplit("_", 1)[1])
            for f in os.listdir(self.out_dir)
            if f.startswith("_committed_")
        }

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        if os.path.exists(self._marker(batch_id)):
            return  # replay of a finished batch — exactly-once no-op
        (
            batch_df.withColumn("__batch_id", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .partitionBy("__batch_id")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(self.out_dir)
        )
        with open(self._marker(batch_id), "w") as f:
            f.write("")
