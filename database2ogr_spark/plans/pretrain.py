"""End-to-end pretraining-corpus assembly — the flagship composition of the
training-data operator families into one declarative plan:

    raw docs
      → quality-filter cascade (cleaning.quality_filter_flags, keep only)
      → exact dedup, min-id survivors (dedup.dedup_exact_survivors)
      → benchmark decontamination, 13-gram rule (dedup.decontaminate)
      → temperature source rebalancing with upsampling
        (sampling.temperature_resample)
      → deterministic train/val split (sampling.split_corpus)

Because every stage is a lazy DataFrame transform, the WHOLE pipeline is a
single Catalyst plan: the quality-stat expressions, the dedup semi-join,
the broadcast decontamination probe, the broadcast rate join, and the
narrow split/epoch fan-out fuse into one job with exactly the shuffles the
component operators document (stats are narrow; dedup is one fingerprint
agg + semi-join; decontamination broadcasts benchmark grams; resampling
aggregates #sources rows; the split is a narrow CASE). Nothing
materializes between stages unless the caller persists.

Order rationale (the standard pipeline ordering argument):
- dedup runs AFTER the quality filter so survivor selection is not wasted
  on docs the filter would drop anyway, but BEFORE resampling so epoch
  repetition cannot manufacture duplicates;
- decontamination runs after dedup (fewer docs to shingle at k=13);
- the split keys on doc_id alone, so every epoch-copy of a document lands
  in the SAME split — upsampling can never leak a train doc into val.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from database2ogr_spark.operators.cleaning import quality_filter_flags
from database2ogr_spark.operators.dedup import decontaminate, dedup_exact_survivors
from database2ogr_spark.operators.sampling import split_corpus, temperature_resample


def pretrain_corpus(
    docs: DataFrame,
    benchmark: DataFrame,
    *,
    alpha: float = 0.7,
    splits: dict[str, int] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Assemble a training corpus from raw documents and a benchmark
    (evaluation) document set to exclude. Returns one row per training
    INSTANCE: original columns plus ``epoch`` (repetition index from the
    temperature mix) and ``split``.
    """
    splits = {"train": 95, "val": 5} if splits is None else splits
    flags = quality_filter_flags(docs, id_col=id_col, text_col=text_col)
    kept = docs.join(
        flags.filter(F.col("keep")).select(id_col), on=id_col, how="left_semi"
    )
    deduped = dedup_exact_survivors(kept, id_col, text_col)
    clean = decontaminate(deduped, benchmark, id_col, text_col, k=13)
    mixed = temperature_resample(clean, alpha=alpha, id_col=id_col)
    return split_corpus(mixed, splits, id_col=id_col)
