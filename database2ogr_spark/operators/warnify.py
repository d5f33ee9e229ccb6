"""The ``warnify`` operator — the reference's only true aggregation
(``src/from-ground-up.js:221-278``, KML variant ``:506-577``, batch variant
``src/mapboxing.js:252-310``): group decision-point rows (one per warning,
post-join) back into one row per decision point, pivoting warnings by type
into a two-key map.

Pinned semantics (SURVEY.md §7 M3 — the reference is ambiguous here; these
choices are the contract and the oracle encodes them):

(a) group key: the stringified geometry coordinates, exactly like the
    reference (``join(', ')``, ``src/from-ground-up.js:224-234``) — it proxies
    for the decision-point identity lost in the join projection. A saner
    id-keyed variant is supported via ``key_col``.
(b) carry-over columns (id, name, area_id, comments): the reference is
    last-write-wins in JS object iteration order (``:252-256``) — pinned here
    as MIN over the group (deterministic, distribution-safe, SQL-expressible).
(c) both warning types always present, empty list if no warnings of that type
    (``src/from-ground-up.js:239-243``); lists sorted for determinism (the
    reference preserves row order, which Postgres does not guarantee anyway).

Spark shape: a single ``groupBy`` with conditional ``collect_list`` — partial
aggregation happens map-side, so the only shuffle is on the (small) group key.
No UDAF needed (SURVEY.md §2.11).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from database2ogr_spark.functions import geometry as G

#: warning types as stored → slugified map keys
#: (reference src/from-ground-up.js:240-242, :551-554)
WARNING_TYPES = ("Managing risk", "Concern")


def pivoted_warning_lists(warning: Column, wtype: Column) -> list[Column]:
    """A2 — conditional collect_list pivot: one sorted list per warning type.

    ``collect_list`` drops the NULLs produced by the unmatched branch, so each
    list contains exactly the warnings of its type.
    """
    out = []
    for t in WARNING_TYPES:
        slug = t.lower().replace(" ", "-")
        out.append(
            F.sort_array(F.collect_list(F.when(wtype == t, warning))).alias(slug.replace("-", "_"))
        )
    return out


def warnify(
    df: DataFrame,
    *,
    carry_cols: tuple[str, ...] = ("id", "name", "area_id", "comments"),
    warning_col: str = "warning",
    type_col: str = "type",
    geometry_col: str = "geometry",
    key_col: str | None = None,
    rebuild_point: bool = True,
    geometry_format: str = "geojson",
) -> DataFrame:
    """Collapse joined (decision_point x warning) rows to one row per point.

    Output columns: carry_cols (MIN-aggregated), ``warnings`` (JSON string
    ``{"managing-risk":[...],"concern":[...]}`` — the reference's
    ``flatten_warnings = JSON.stringify``, ``src/from-ground-up.js:222``),
    ``geometry`` (Point rebuilt from the group key, ``:266-277``), ``table``.
    """
    # single source of grouping semantics: warnify_raw (same pinned contract
    # serves both serializations — JSON here, HTML in warnify_html)
    base = warnify_raw(
        df,
        carry_cols=carry_cols,
        warning_col=warning_col,
        type_col=type_col,
        geometry_col=geometry_col,
        key_col=key_col,
        geometry_format=geometry_format,
        rebuild_point=rebuild_point,
    )
    # A4 — warnings map → JSON string; struct field order fixes key order to
    # {"managing-risk":[...],"concern":[...]} like the reference.
    warnings_json = F.to_json(
        F.struct(
            F.col("managing_risk").alias("managing-risk"),
            F.col("concern").alias("concern"),
        )
    )
    return base.withColumn("warnings", warnings_json).drop(
        "managing_risk", "concern"
    )


def _rebuild_point(geometry_format: str) -> Column:
    """Point geometry from the 'lon, lat' group key (reference
    ``src/from-ground-up.js:266-277``: split + parseFloat, X3/X5)."""
    parts = F.split(F.col("__key"), ", ")
    lon, lat = parts.getItem(0).cast("double"), parts.getItem(1).cast("double")
    return G.kml_point(lon, lat) if geometry_format == "kml" else G.point_geojson(lon, lat)


#: CSS popup header the reference prepends to the warnings table
#: (src/from-ground-up.js:523-525) — reproduced byte-for-byte.
_POPUP_META = (
    '<meta http-equiv="Content-Type" content="text/html; charset=iso-8859-1">'
    "<style type=\"text/css\"><!--.orange-table {border: 1px solid black; "
    "background-color: #FFC000; font-size:9.0pt; padding: 10px 0; width: 333px;} "
    ".orange-table td, th { padding: 2px 10px; } .orange-table th { font-weight: "
    "bold; border-top: 1px solid black; text-align: left; } .orange-table "
    "th.first { border: none; } .green-check { color:#008A00; font-size:larger; "
    "display: block; float: left; padding-right: 4px; } .red-x { color: red; "
    "font-size: larger; display: block; float: left; padding-right: 4px; } "
    "--></style>"
)


def warnify_html(df: DataFrame, **kwargs) -> DataFrame:
    """KML variant (A5): warnings rendered as the reference's orange-table
    HTML popup (``src/from-ground-up.js:507-529``) — Concern checklist first
    (red ✗), then Managing risk (green), wrapped in the CSS popup header.
    The surrounding (slightly malformed) tr/tbody shape is reproduced exactly
    for golden parity. Same grouping as :func:`warnify`; only serialization
    differs.
    """
    from database2ogr_spark.functions.text import unescape_quotes

    base = warnify_raw(df, **kwargs)

    def checklist(col: Column, bullet: str) -> Column:
        return F.array_join(
            F.transform(
                col,
                lambda w: F.concat(
                    F.lit(f'<tr><td><span class="{bullet}">&#x2717;</span>'),
                    unescape_quotes(w),
                    F.lit("</td></tr>"),
                ),
            ),
            "",
        )

    table = F.concat(
        F.lit('<table class="orange-table"><tbody><tr><th class="first">Concern</th></tr>'),
        checklist(F.col("concern"), "red-x"),
        F.lit("</tr><tr><tr><th>Managing risk</th></tr>"),
        checklist(F.col("managing_risk"), "green-check"),
        F.lit("<tr></tbody></table>"),
    )
    html = F.concat(F.lit(_POPUP_META), table)
    return base.withColumn("warnings", html).drop("managing_risk", "concern")


def warnify_raw(
    df: DataFrame,
    *,
    carry_cols: tuple[str, ...] = ("id", "name", "area_id", "comments"),
    warning_col: str = "warning",
    type_col: str = "type",
    geometry_col: str = "geometry",
    key_col: str | None = None,
    geometry_format: str = "geojson",
    rebuild_point: bool = True,
) -> DataFrame:
    """Like :func:`warnify` but keeps the pivoted lists as array columns
    (``managing_risk``, ``concern``) for callers that serialize differently
    (HTML for KML, JSON for GeoJSON). Holds the single authoritative copy of
    the pinned grouping semantics (module docstring (a)-(c))."""
    key = F.col(key_col) if key_col else G.coords_key(geometry_col)
    grouped = df.groupBy(key.alias("__key")).agg(
        *pivoted_warning_lists(F.col(warning_col), F.col(type_col)),
        *[F.min(c).alias(c) for c in carry_cols],
        F.min("table").alias("table"),
    )
    geometry = _rebuild_point(geometry_format) if rebuild_point else F.col("__key")
    return grouped.withColumn("geometry", geometry).drop("__key")
