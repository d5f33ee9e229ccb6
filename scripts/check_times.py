"""Extreme-timestamp parity probe: the registry re-graded against its
DuckDB twins on a corpus whose event times include the edges a 100 TB
ingest actually sees — epoch zero, pre-1970 timestamps WITH microsecond
fractions, far-future dates, and end-of-day microsecond boundaries.

Two distinct hazard classes this probe exists to catch:

1. **Negative-epoch arithmetic divergence**: second-truncation of a
   pre-1970 timestamp differs between floor (toward -inf) and cast
   (toward zero); every ``unix_timestamp``-vs-``epoch()`` twin pair and
   every day/week bucketing floor is exposed the moment one corrupt
   1965 row arrives.
2. **Data-dependent spine fan-out**: operators that explode a
   min→max time range (gap-fill grids, day spines, rolling windows)
   multiply ONE corrupt 1965/2200 row into 10^5–10^6 spine rows per
   key — not a wrong answer, but a plan whose cost is decided by the
   single dirtiest row in the corpus. The probe's wall-clock makes
   those visible; the fix is a documented time-domain ingestion bound,
   not a faster explode.

Injection is hash-deterministic and SPARSE (≤1% per class) so the
fixture stays realistic: most rows keep their 2024 timestamps.

Usage: python scripts/check_times.py [--exact] [only_query ...]
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

#: (table, pk, ts columns) to dirty
TS_PLAN = {
    "events": ("event_id", ["ts"]),
    "orders": ("o_orderkey", ["o_orderdate"]),
    "lineitem": ("l_orderkey", ["l_shipdate"]),
}

#: the edge values, as timestamp literals (session TZ is pinned UTC)
EDGES = [
    "1969-12-31 23:59:59.500001",  # negative epoch WITH fraction
    "1970-01-01 00:00:00",         # epoch zero
    "1965-03-02 12:00:00.250000",  # deep pre-1970
    "2199-12-31 23:59:59.999999",  # far future, end-of-day µs boundary
]


def build_fixture(spark: SparkSession, out: str, src: str) -> str:
    os.makedirs(out, exist_ok=True)
    for t in TABLES:
        df = spark.read.parquet(f"{src}/{t}.parquet")
        if t in TS_PLAN:
            pk, cols = TS_PLAN[t]
            h = F.pmod(F.xxhash64(F.col(pk), F.lit(f"ts:{t}")), F.lit(400))
            for c in cols:
                edge = F.col(c)
                for i, lit in enumerate(EDGES):
                    edge = F.when(h == i, F.lit(lit).cast("timestamp")).otherwise(edge)
                df = df.withColumn(c, edge.cast(df.schema[c].dataType))
        pq.write_table(df.toArrow(), f"{out}/{t}.parquet")
    return out


def main() -> int:
    flags = {"--exact"}
    args = [a for a in sys.argv[1:] if a not in flags]
    exact = "--exact" in sys.argv[1:]
    src = os.environ.get("SPARK_GRAFT_TIMES_SRC", "/root/testdata/sf0.001")
    out = os.path.join(tempfile.gettempdir(), "sf_times")

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    build_fixture(spark, out, src)

    check_oracle.sys.argv = (
        ["check_oracle.py", out] + (["--exact"] if exact else []) + args
    )
    return check_oracle.main()


if __name__ == "__main__":
    raise SystemExit(main())
