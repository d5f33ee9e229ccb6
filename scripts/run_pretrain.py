"""CLI driver for the pretraining-corpus pipeline — the engine's
user-facing executable for its flagship path (the analog of the
reference's run_mapboxing orchestration script, for the training-data
surface instead of the tileset surface).

Usage:
    python scripts/run_pretrain.py DOCS_PARQUET BENCH_PARQUET OUT_DIR \
        [--alpha 0.7] [--shards 8] [--format parquet|webdataset]

Reads the raw corpus and the benchmark (evaluation) documents, runs
plans/pretrain.pretrain_corpus (quality cascade → exact dedup →
13-gram decontamination → temperature mix → train/val split), writes the
result as split-partitioned corpus shards (default) or WebDataset tars
(one directory per split), and prints a one-line JSON manifest to stdout:
instance counts per split/epoch and the output paths.

Everything is the library surface — this script only parses arguments,
wires the plan, and reports; there is no logic here a notebook user
would not get by calling the same functions.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("docs", help="corpus parquet path")
    ap.add_argument("bench", help="benchmark (eval) parquet path to exclude")
    ap.add_argument("out_dir", help="output directory")
    ap.add_argument("--alpha", type=float, default=0.7)
    ap.add_argument("--shards", type=int, default=8)
    ap.add_argument(
        "--format", choices=("parquet", "webdataset"), default="parquet"
    )
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from database2ogr_spark.plans.pretrain import pretrain_corpus
    from database2ogr_spark.session import get_spark
    from database2ogr_spark.sinks.corpus import write_corpus_shards
    from database2ogr_spark.sinks.webdataset import write_tar_shards

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(args.docs)
    bench = spark.read.parquet(args.bench)
    out = pretrain_corpus(docs, bench, alpha=args.alpha)

    paths: dict[str, str] = {}
    if args.format == "parquet":
        write_corpus_shards(
            out, args.out_dir, partition_by=("split",), shards=args.shards
        )
        paths["root"] = args.out_dir
    else:
        # WebDataset wants integer sample keys unique per INSTANCE, not per
        # doc — epoch copies of a doc get distinct keys via (doc_id, epoch)
        keyed = out.withColumn(
            "__sample_id", F.col("doc_id") * 1000 + F.col("epoch")
        )
        for split in [r.split for r in out.select("split").distinct().collect()]:
            d = os.path.join(args.out_dir, f"split={split}")
            write_tar_shards(
                keyed.filter(F.col("split") == split),
                d,
                shards=args.shards,
                key_col="__sample_id",
                meta_cols=("doc_id", "source", "lang", "epoch"),
            ).collect()
            paths[split] = d

    stats = {
        f"{r.split}/epoch{r.epoch}": r["count"]
        for r in out.groupBy("split", "epoch").count().collect()
    }
    print(json.dumps({"instances": stats, "paths": paths, "alpha": args.alpha}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
