"""CSV corpus source with corrupt-record quarantine — the delimited-text
sibling of ``sources/jsonl.py`` (same trap, same cure).

Same design as the JSONL reader: parse the raw line in a projection
(``from_csv``) instead of ``spark.read.csv`` with a ``_corrupt_record``
column, because the corrupt-record column breaks under column pruning (a
count over the good side prunes the data columns and the parser then
flags every row) — and the raw line rides along for the quarantine side
for free.

CSV-specific contract: records are LINES. Embedded newlines inside quoted
fields (which ``spark.read.csv`` handles only via the non-splittable
``multiLine`` mode) are out of scope here — at 100 TB multiLine CSV
serializes the scan per file and belongs in a re-export step, not a hot
path. Quotes and embedded delimiters are handled normally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from database2ogr_spark.sources.jsonl import CORRUPT_COL, DOCUMENTS_SCHEMA


def read_csv_quarantine(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOCUMENTS_SCHEMA,
    *,
    id_col: str = "doc_id",
    sep: str = ",",
) -> tuple[DataFrame, DataFrame]:
    """Read headerless CSV into ``(good, quarantine)`` — good rows match
    ``schema`` with a non-null ``id_col``; quarantine keeps the raw line
    (malformed, schema-mismatched, or id-less)."""
    full_schema = T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
    )
    parsed = spark.read.text(path).select(
        F.col("value").alias("raw"),
        F.from_csv(
            "value",
            full_schema.simpleString(),
            {
                "mode": "PERMISSIVE",
                "columnNameOfCorruptRecord": CORRUPT_COL,
                "sep": sep,
            },
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
