"""Hot-key-skew oracle-parity probe: the full registry compared against
its DuckDB twins on a deterministically SKEWED corpus.

At 100 TB the keys are skewed: one bot account emits a third of the
event stream, one boilerplate page ("404 not found" and friends) is a
fifth of the crawl, one SKU dominates the order book, and embedding
tables carry large blocks of identical vectors from template content.
Every prior probe ran on roughly-uniform TPC-H-ish keys, so two whole
defect classes were unreachable:

  - hot-group semantics: massive TIE groups in every score/count column
    (a 20%-duplicated corpus makes thousands of rows agree on length,
    token counts, tf-idf, cosine). Any top-k cutoff or window ORDER BY
    whose sort key is not a total order silently disagrees between
    Spark and DuckDB on WHICH tied rows emit — clean-data invariance
    probes cannot see this because clean scores are mostly distinct;
  - hot-key plans: operators whose cost or output is quadratic in the
    largest key group (pair generators, self-joins, connected
    components over a giant duplicate clique) must degrade gracefully —
    the max_df-style guards exist precisely for this corpus shape.

Contract (same as the driver gate, on skewed data): every registry
entry must MATCH its twin bit-for-bit or raise a designed ValueError
guard. A crash or a value/dtype divergence is a FAIL.

Injection is hash-deterministic (no RNG, no Date.now): a row is
skewed when ``xxhash64(pk, seed) % 100 < rate``. Primary keys stay
unique — only foreign keys and value columns are collapsed onto hot
values, which are taken from inside the existing domain (min key) so
referential integrity survives. region/nation stay clean: they are the
reference's semantic fixture tables.

Usage: python scripts/check_skew.py [--exact] [--reuse] [only_query ...]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession, functions as F

import check_oracle
from database2ogr_spark.session import get_spark

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

#: the hot document every skewed text row collapses onto — boilerplate
#: with enough tokens/lines that text operators (shingles, line dedup,
#: quality scores) see a realistic page, not a degenerate stub.
HOT_TEXT = (
    "404 not found\n"
    "the page you requested could not be found on this server\n"
    "please check the address and try again or return to the home page\n"
    "copyright the site operator all rights reserved"
)


def _pick(col: str, pk: str, seed: str, rate: int, hot):
    """Collapse ``rate``% of ``col`` onto ``hot``, chosen by a stable
    hash of the pk (same selection rule as check_nulls)."""
    return F.when(
        F.pmod(F.xxhash64(F.col(pk), F.lit(seed)), F.lit(100)) < rate, hot
    ).otherwise(F.col(col))


def _scalar(df: DataFrame, expr) -> object:
    return df.agg(expr.alias("v")).collect()[0]["v"]


def build_skewed_fixture(spark: SparkSession, out: str, src: str) -> str:
    os.makedirs(out, exist_ok=True)
    for t in TABLES:
        df = spark.read.parquet(f"{src}/{t}.parquet")
        if t == "orders":
            # one whale customer places ~25% of all orders
            hot = F.lit(_scalar(df, F.min("o_custkey")))
            df = df.withColumn(
                "o_custkey", _pick("o_custkey", "o_orderkey", "skew:o_cust", 25, hot)
            )
        elif t == "lineitem":
            # one dominant SKU and one dominant supplier (~20% each,
            # independently chosen so the hot pair co-occurs on ~4%)
            hot_p = F.lit(_scalar(df, F.min("l_partkey")))
            hot_s = F.lit(_scalar(df, F.min("l_suppkey")))
            df = df.withColumn(
                "l_partkey", _pick("l_partkey", "l_orderkey", "skew:l_part", 20, hot_p)
            ).withColumn(
                "l_suppkey", _pick("l_suppkey", "l_orderkey", "skew:l_supp", 20, hot_s)
            )
        elif t == "events":
            # one bot account emits ~30% of the stream
            hot = F.lit(_scalar(df, F.min("user_id")))
            df = df.withColumn(
                "user_id", _pick("user_id", "event_id", "skew:e_user", 30, hot)
            )
        elif t == "documents":
            # one boilerplate page is ~20% of the crawl; n_chars is kept
            # coherent with the replaced text so length-based operators
            # see a consistent row
            sel = F.pmod(F.xxhash64(F.col("doc_id"), F.lit("skew:d_text")), F.lit(100)) < 20
            df = df.withColumn(
                "text", F.when(sel, F.lit(HOT_TEXT)).otherwise(F.col("text"))
            ).withColumn(
                "n_chars",
                F.when(sel, F.lit(len(HOT_TEXT)))
                .otherwise(F.col("n_chars"))
                .cast(df.schema["n_chars"].dataType),
            )
        elif t == "embeddings":
            # ~20% of vectors are the SAME unit vector (template
            # content): cosine ties at exactly 1.0, LSH buckets get one
            # giant cell, near-dup groups get one giant clique
            dim = F.size(F.col("embedding"))
            hot_vec = F.transform(
                F.col("embedding"),
                lambda x: (F.lit(1.0) / F.sqrt(dim.cast("double"))).cast("float"),
            )
            df = df.withColumn(
                "embedding",
                F.when(
                    F.pmod(F.xxhash64(F.col("vec_id"), F.lit("skew:v_hot")), F.lit(100))
                    < 20,
                    hot_vec,
                ).otherwise(F.col("embedding")),
            )
        pq.write_table(df.toArrow(), f"{out}/{t}.parquet")
    return out


def main() -> int:
    flags = {"--exact", "--reuse"}
    args = [a for a in sys.argv[1:] if a not in flags]
    exact = "--exact" in sys.argv[1:]
    reuse = "--reuse" in sys.argv[1:]
    src = os.environ.get("SPARK_GRAFT_SKEW_SRC", "/root/testdata/sf0.001")
    out = os.path.join(tempfile.gettempdir(), "sf_skewed")

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    if not (reuse and os.path.exists(os.path.join(out, "embeddings.parquet"))):
        build_skewed_fixture(spark, out, src)

    # Reuse the driver-faithful compare loop verbatim: same dtype-kind
    # rules, same order-insensitive value sort, same --exact float rule.
    check_oracle.sys.argv = (
        ["check_oracle.py", out] + (["--exact"] if exact else []) + args
    )
    return check_oracle.main()


if __name__ == "__main__":
    raise SystemExit(main())
