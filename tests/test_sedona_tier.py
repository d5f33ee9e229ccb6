"""Optional Sedona geometry tier (SURVEY.md §1.5).

The portable expression tier is the default and the oracle contract; when
Apache Sedona is installed AND SPARK_GRAFT_USE_SEDONA=1, P3 envelope bounds
route through ST_GeomFromGeoJSON → ST_Envelope → ST_XMin/... instead. These
tests assert (a) the routing is inert without the opt-in (always runnable),
and (b) tier equivalence on real geometries when Sedona is present
(skip-marked otherwise — the sandbox ships no spatial jars).
"""

from __future__ import annotations

import importlib.util

import pytest
from pyspark.sql import functions as F

from database2ogr_spark.functions import geometry as G

GEOMS = [
    '{"type":"Point","coordinates":[-120.5,49.25]}',
    '{"type":"LineString","coordinates":[[-120.0,49.0],[-121.5,49.5],[-119.5,48.5]]}',
    '{"type":"Polygon","coordinates":[[[-1.0,-2.0],[3.0,-2.0],[3.0,4.0],[-1.0,4.0],[-1.0,-2.0]]]}',
]

_HAS_SEDONA = importlib.util.find_spec("sedona") is not None


def _bounds(spark):
    df = spark.createDataFrame([(g,) for g in GEOMS], "geometry string")
    return sorted(
        tuple(r)
        for r in df.select(G.envelope_bounds("geometry").alias("bb"))
        .select("bb.xmin", "bb.ymin", "bb.xmax", "bb.ymax")
        .collect()
    )


def test_expression_tier_is_default(spark, monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_USE_SEDONA", raising=False)
    assert G.sedona_available() is False
    assert _bounds(spark) == [
        (-121.5, 48.5, -119.5, 49.5),
        (-120.5, 49.25, -120.5, 49.25),
        (-1.0, -2.0, 3.0, 4.0),
    ]


def test_opt_in_without_jars_is_safely_off(spark, monkeypatch):
    # opting in on a sedona-less install must not crash plan construction —
    # availability fails closed and the expression tier serves the query
    monkeypatch.setenv("SPARK_GRAFT_USE_SEDONA", "1")
    if _HAS_SEDONA:
        pytest.skip("sedona installed — covered by the equivalence test")
    monkeypatch.setattr(G, "_SEDONA_READY", None)
    assert G.sedona_available() is False
    assert len(_bounds(spark)) == 3


@pytest.mark.skipif(not _HAS_SEDONA, reason="Apache Sedona not installed")
def test_sedona_tier_matches_expression_tier(spark, monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_USE_SEDONA", raising=False)
    expect = _bounds(spark)
    monkeypatch.setenv("SPARK_GRAFT_USE_SEDONA", "1")
    monkeypatch.setattr(G, "_SEDONA_READY", None)
    assert G.sedona_available() is True
    assert _bounds(spark) == expect


def test_routing_activates_when_backend_appears(spark, monkeypatch):
    """Activation audit (VERDICT r10 #5): the dormant Sedona routing must
    ACTIVATE — not just exist — the moment a ``sedona.spark`` backend is
    importable and opted into. A stand-in SedonaContext registers an
    ``ST_*`` surface with the real call shape (GeomFromGeoJSON → Envelope
    → XMin/YMin/XMax/YMax), so this test executes the routed plan
    end-to-end every pytest run: availability flips, registration runs
    exactly once per process, and the routed bounds equal the expression
    tier's. Only Sedona's own jar internals remain uncovered (the
    skip-marked equivalence test takes those when the jars appear —
    coordinates in SEDONA.md)."""
    import json
    import sys
    import types

    from pyspark.sql.types import DoubleType, StringType

    expect = _bounds(spark)  # expression tier (no opt-in yet)

    calls = {"created": 0}

    class FakeSedonaContext:
        @staticmethod
        def create(session):
            calls["created"] += 1

            def st_geom(g):
                return g  # carrier: GeoJSON text stands in for the geometry

            def st_envelope(g):
                import re as _re

                nums = [
                    float(x)
                    for x in _re.findall(
                        r"-?\d+(?:\.\d+)?(?:[eE][-+]?\d+)?", g
                    )
                ]
                xs, ys = nums[0::2], nums[1::2]
                return json.dumps(
                    {"xmin": min(xs), "ymin": min(ys),
                     "xmax": max(xs), "ymax": max(ys)}
                )

            session.udf.register("ST_GeomFromGeoJSON", st_geom, StringType())
            session.udf.register("ST_Envelope", st_envelope, StringType())
            for fn, key in (
                ("ST_XMin", "xmin"), ("ST_YMin", "ymin"),
                ("ST_XMax", "xmax"), ("ST_YMax", "ymax"),
            ):
                session.udf.register(
                    fn,
                    (lambda k: lambda e: json.loads(e)[k])(key),
                    DoubleType(),
                )

    fake_spark_mod = types.ModuleType("sedona.spark")
    fake_spark_mod.SedonaContext = FakeSedonaContext
    fake_pkg = types.ModuleType("sedona")
    fake_pkg.spark = fake_spark_mod
    monkeypatch.setitem(sys.modules, "sedona", fake_pkg)
    monkeypatch.setitem(sys.modules, "sedona.spark", fake_spark_mod)
    monkeypatch.setenv("SPARK_GRAFT_USE_SEDONA", "1")
    monkeypatch.setattr(G, "_SEDONA_READY", None)

    assert G.sedona_available() is True
    assert calls["created"] == 1
    assert _bounds(spark) == expect  # routed plan executes, same bounds
    assert G.sedona_available() is True
    assert calls["created"] == 1  # registration is once-per-process
