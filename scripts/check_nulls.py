"""NULL/NaN-injection oracle-parity probe: the full registry compared
against its DuckDB twins on a deterministically DIRTIED corpus.

At 100 TB the data is dirty: null texts, null timestamps, anonymous
(null-user) events, NaN/Inf metric values, zero-norm and NaN-poisoned
embedding vectors. Every prior sweep ran on clean TPC-H-ish data, so
null-SEMANTICS divergence between the Spark implementation and its
DuckDB oracle twin (the driver's correctness contract) was untested.
The classic divergence classes this probe exists to catch:

  - null ordering: Spark sorts NULLS FIRST on ASC / LAST on DESC;
    DuckDB defaults to NULLS LAST on ASC / FIRST on DESC — any top-k or
    window whose sort key can be null silently disagrees on which rows
    make the cut;
  - nullable-int rendering: a result column that is int64 on one side
    and (because nulls appeared) float64 on the other hash-fails at the
    driver even when values agree;
  - null-vs-NaN arithmetic: x/0.0, aggregates over all-NaN groups,
    cosine of a zero-norm vector;
  - string-kernel null propagation: concat vs concat_ws, split(NULL),
    regexp over NULL.

Contract (same as the driver gate, on dirty data): every registry entry
must either MATCH its twin bit-for-bit or raise a designed ValueError
guard. A crash or a value/dtype divergence is a FAIL.

Injection is hash-deterministic (no RNG, no Date.now): a row is dirtied
when ``xxhash64(pk, col_seed) % 100 < rate``. Key columns stay non-null
except ``events.user_id`` (anonymous events) and ``documents.lang``
(undetected language) — realistic null GROUP KEYS. region/nation stay
clean: they are the reference's semantic fixture tables.

Usage: python scripts/check_nulls.py [--exact] [only_query ...]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import pyarrow.parquet as pq
from pyspark.sql import SparkSession, functions as F

import check_oracle
from database2ogr_spark.session import get_spark

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

#: per-table: (pk column, {column: null-rate-percent})
NULL_PLAN = {
    "customer": ("c_custkey", {"c_name": 8, "c_acctbal": 10, "c_mktsegment": 10}),
    "supplier": ("s_suppkey", {"s_name": 8, "s_acctbal": 10}),
    "part": (
        "p_partkey",
        {"p_name": 8, "p_brand": 10, "p_type": 10, "p_size": 10, "p_retailprice": 10},
    ),
    "orders": (
        "o_orderkey",
        {
            "o_orderstatus": 8,
            "o_totalprice": 10,
            "o_orderdate": 6,
            "o_orderpriority": 10,
        },
    ),
    "lineitem": (
        "l_orderkey",
        {
            "l_quantity": 8,
            "l_extendedprice": 8,
            "l_discount": 8,
            "l_tax": 8,
            "l_returnflag": 6,
            "l_linestatus": 6,
            "l_shipdate": 6,
        },
    ),
    "events": (
        "event_id",
        {"event_type": 8, "value": 10, "props": 10, "ts": 5, "user_id": 5},
    ),
    "documents": ("doc_id", {"text": 6, "lang": 8, "source": 10, "n_chars": 8}),
    "embeddings": ("vec_id", {"label": 10}),
}


def _dirty(col, pk, seed: str, rate: int):
    """NULL out ``rate``% of ``col``, chosen by a stable hash of the pk."""
    return F.when(
        F.pmod(F.xxhash64(F.col(pk), F.lit(seed)), F.lit(100)) < rate, F.lit(None)
    ).otherwise(F.col(col))


def build_nulled_fixture(spark: SparkSession, out: str, src: str) -> str:
    os.makedirs(out, exist_ok=True)
    for t in TABLES:
        df = spark.read.parquet(f"{src}/{t}.parquet")
        pk, plan = NULL_PLAN.get(t, (None, {}))
        for c, rate in plan.items():
            df = df.withColumn(c, _dirty(c, pk, f"null:{t}:{c}", rate).cast(df.schema[c].dataType))
        if t == "events":
            # NaN / ±Inf carriers in the generic metric column (~3% each
            # tail): the values a 100 TB telemetry stream actually contains.
            h = F.pmod(F.xxhash64(F.col(pk), F.lit("nan:events")), F.lit(100))
            df = df.withColumn(
                "value",
                F.when(h == 0, F.lit(float("nan")))
                .when(h == 1, F.lit(float("inf")))
                .when(h == 2, F.lit(float("-inf")))
                .otherwise(F.col("value")),
            )
        if t == "embeddings":
            # 2% null vectors, 2% zero-norm vectors (cosine div-by-zero),
            # 2% vectors with a NaN element, 1% empty arrays.
            h = F.pmod(F.xxhash64(F.col(pk), F.lit("vec:emb")), F.lit(100))
            dim = F.size(F.col("embedding"))
            df = df.withColumn(
                "embedding",
                F.when(h.isin(0, 50), F.lit(None))
                .when(h.isin(1, 51), F.transform(F.col("embedding"), lambda x: F.lit(0.0).cast("float")))
                .when(
                    h.isin(2, 52),
                    F.concat(
                        F.slice(F.col("embedding"), 1, (dim - 1).cast("int")),
                        F.array(F.lit(float("nan")).cast("float")),
                    ),
                )
                .when(h == 3, F.array().cast("array<float>"))
                .otherwise(F.col("embedding")),
            )
        # Single parquet FILE per table (not a Spark output directory):
        # the oracle side reads `read_parquet('{dir}/{t}.parquet')` exactly
        # like the driver does against /root/testdata.
        pq.write_table(df.toArrow(), f"{out}/{t}.parquet")
    return out


def main() -> int:
    flags = {"--exact", "--reuse"}
    args = [a for a in sys.argv[1:] if a not in flags]
    exact = "--exact" in sys.argv[1:]
    reuse = "--reuse" in sys.argv[1:]
    src = os.environ.get("SPARK_GRAFT_NULLS_SRC", "/root/testdata/sf0.001")
    out = os.path.join(tempfile.gettempdir(), "sf_nulled")

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    if not (reuse and os.path.exists(os.path.join(out, "embeddings.parquet"))):
        build_nulled_fixture(spark, out, src)

    # Reuse the driver-faithful compare loop verbatim: same dtype-kind
    # rules, same order-insensitive value sort, same --exact float rule.
    check_oracle.sys.argv = (
        ["check_oracle.py", out] + (["--exact"] if exact else []) + args
    )
    return check_oracle.main()


if __name__ == "__main__":
    raise SystemExit(main())
