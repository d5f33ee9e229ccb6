"""GeoJSON sinks (SURVEY.md §2.10 K1/K2).

``feature_json`` builds the per-row Feature document as a string column —
geometry is spliced in verbatim (it is already GeoJSON text), properties are
``to_json`` of the remaining columns with the special columns removed (P6
column hoist/drop, reference ``src/from-ground-up.js:196-199``), tagged with
the source table (reference ``:205-206``).

Scale stance: the one-file ``FeatureCollection`` (K1) is inherently
driver-bound — the reference builds it in memory (``src/from-ground-up.js:
212-215``) and so must any engine; it exists for parity and small exports.
The scalable default is K2: proper newline-delimited GeoJSON written
distributed via ``df.write.text`` (the reference's GeoJSON-LD writer forgot
the newlines — bug ledger; we write real NDJSON).
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: columns that are hoisted onto the Feature, never into properties
#: (reference src/from-ground-up.js:196-199, :250-251)
SPECIAL = ("geometry", "bounding_box")


def feature_json(df: DataFrame, *, drop: tuple[str, ...] = ()) -> Column:
    """Feature document string: ``{"type":"Feature","geometry":...,
    ["bounding_box":...,] "properties":{...}}``.

    Property bag = all columns except geometry/bounding_box/dropped ones,
    null fields omitted (JS ``JSON.stringify`` behavior the reference relies
    on). The ``table`` tag stays in properties like the reference's merged
    constant (``src/from-ground-up.js:134``).
    """
    from database2ogr_spark.functions.text import slugify

    prop_cols = [c for c in df.columns if c not in SPECIAL and c not in drop]
    # the reference's Feature constructor slugifies the POI `type` property
    # (X1, src/from-ground-up.js:201-203)
    props = F.to_json(
        F.struct(
            *[
                (slugify(c).alias("type") if c == "type" else F.col(c))
                for c in prop_cols
            ]
        )
    )
    parts = [F.lit('{"type":"Feature","geometry":'), F.col("geometry")]
    if "bounding_box" in df.columns:
        parts += [F.lit(',"bounding_box":'), F.col("bounding_box")]
    parts += [F.lit(',"properties":'), props, F.lit("}")]
    return F.concat(*parts)


def with_feature(df: DataFrame) -> DataFrame:
    """Normalize any per-table export DataFrame to a single ``feature``
    string column (the union-ready shape for U1)."""
    return df.select(feature_json(df).alias("feature"))


#: default row cap for the driver-side single-document sinks (K1/K3). A
#: one-file document is assembled in driver memory by definition; past this
#: the export belongs on the distributed NDJSON path (K2).
DRIVER_SINK_MAX_ROWS = 1_000_000


class DriverSinkOverflow(RuntimeError):
    """Raised when a driver-side document sink would collect more rows than
    its cap — the caller should switch to the distributed sink instead."""


def guard_driver_rows(df: DataFrame, *, cap: int, sink: str, alternative: str) -> int:
    """Count-gate a driver-side collect: one cheap aggregation job up front
    (count, not CollectLimit — CollectLimit re-executes the plan in scale-up
    batches) in exchange for never OOM-ing the driver on a fat export."""
    n = df.count()
    if n > cap:
        raise DriverSinkOverflow(
            f"{sink}: {n} rows exceed the driver-side document cap ({cap}); "
            f"write this export with {alternative} instead"
        )
    return n


def feature_collection_json(
    feature_dfs: list[DataFrame], *, max_rows: int = DRIVER_SINK_MAX_ROWS
) -> str:
    """K1 — assemble one FeatureCollection document (driver-side collect;
    small-export path only — see module docstring). Guarded by ``max_rows``
    (total across tables): an over-cap export raises
    :class:`DriverSinkOverflow` pointing at the distributed K2 sink.

    Section order follows the input list order, mirroring the reference's
    query-list ordering guarantee (SURVEY.md §2.7). WITHIN a section,
    rows are ordered by the rendered feature string (bug-ledger pin: the
    reference's within-section order is whatever its DB scan returned —
    accidental; a bare ``collect()`` here would likewise bake the
    partition layout into the document, so the same export could hash
    differently across cluster runs — caught by
    ``scripts/check_invariance.py``).
    """
    budget = max_rows
    chunks: list[str] = []
    for df in feature_dfs:
        budget -= guard_driver_rows(
            df, cap=budget, sink="feature_collection_json (K1)",
            alternative="write_ndjson (K2, distributed)",
        )
        rendered = with_feature(df).orderBy("feature")
        chunks.extend(r[0] for r in rendered.collect())
    return '{"type":"FeatureCollection","features":[' + ",".join(chunks) + "]}"


def write_ndjson(df: DataFrame, out_dir: str, table: str) -> str:
    """K2 — newline-delimited GeoJSON, one directory per table, written
    distributed. Returns the output path. (Fixes the reference's
    missing-newline concatenation, ``src/mapboxing.js:324-330``.)"""
    path = os.path.join(out_dir, table)
    with_feature(df).write.mode("overwrite").text(path)
    return path
