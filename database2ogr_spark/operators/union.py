"""U1 — union-all of heterogeneous per-table results (reference
``src/from-ground-up.js:280-296``: concatenate every query's features into one
FeatureCollection, order = query-list order).

In Spark the per-table DataFrames have different property columns, so the
union happens after normalizing each to a common shape — either the
single-column ``feature`` JSON string (sink-side, via
``sinks.geojson.with_feature``) or ``unionByName(allowMissingColumns=True)``
when a relational union is wanted. Narrow op — no shuffle.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame


def union_by_name(dfs: list[DataFrame]) -> DataFrame:
    """Relational union with missing columns null-filled."""
    if not dfs:
        raise ValueError("union of zero DataFrames")
    return reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), dfs)


def union_features(dfs: list[DataFrame]) -> DataFrame:
    """Union of per-table exports normalized to the ``feature`` string shape."""
    from database2ogr_spark.sinks.geojson import with_feature

    return union_by_name([with_feature(df) for df in dfs])
