"""JSONL corpus source with corrupt-record quarantine.

Training corpora overwhelmingly arrive as (gzipped) JSON-lines; at 100 TB a
single malformed line must neither kill the job (FAILFAST) nor silently
become a row of NULLs that later stages misread as an empty document
(naive PERMISSIVE). This reader splits the input into (good, quarantine)
up front so every downstream count is over verified rows and the bad lines
stay inspectable.

Scale notes: JSON-lines is splittable (gzip is not — prefer zstd/bzip2 or
many medium gzip files so the scan parallelizes); schema is REQUIRED (schema
inference reads the whole input twice); the quarantine side is the raw line,
so re-parsing after a schema fix needs no re-crawl.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: the engine's document schema on the wire
DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOCUMENTS_SCHEMA,
    *,
    id_col: str = "doc_id",
) -> tuple[DataFrame, DataFrame]:
    """Read JSON-lines into ``(good, quarantine)``.

    - ``good``: rows matching ``schema`` with a non-null ``id_col``
      (a parsed-but-id-less row is as unusable as a corrupt one).
    - ``quarantine``: the raw offending line (``raw`` string column) —
      malformed JSON, schema-mismatched rows, and null-id rows.

    Implemented as ``text`` + ``from_json`` rather than ``spark.read.json``
    with a ``_corrupt_record`` column: the corrupt-record column interacts
    badly with column pruning (a ``count()`` over the good side prunes the
    data columns, the parser then treats EVERY row as corrupt — the
    documented Spark caveat that normally forces a ``cache()``). Parsing the
    raw line in a projection has no such trap, costs one extra narrow stage,
    and keeps the original line for the quarantine side for free.
    """
    full_schema = T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
    )
    parsed = spark.read.text(path).select(
        F.col("value").alias("raw"),
        F.from_json(
            "value",
            full_schema,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
        ).alias("p"),
    )
    bad_predicate = (
        F.col("p").isNull()
        | F.col(f"p.{CORRUPT_COL}").isNotNull()
        | F.col(f"p.{id_col}").isNull()
    )
    good = parsed.filter(~bad_predicate).select("p.*").drop(CORRUPT_COL)
    quarantine = parsed.filter(bad_predicate).select("raw")
    return good, quarantine
