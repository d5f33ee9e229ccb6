"""Shape-pins for the Postgres dialect of the JDBC tier (VERDICT r9 #6).

The live-JDBC path executes end-to-end against embedded Derby
(test_jdbc_live.py); the reference's actual production target is
Postgres/PostGIS (``src/from-ground-up.js:979``, ``run_mapboxing.bash:4-10``),
which no sandbox server exists for. These tests pin the PG-specific deltas
WITHOUT a server:

- the generated reader options (URL derivation from the reference's env
  contract, credentials pass-through, quoted dbtable) for all 7 ATES tables;
- the quoted-identifier behavior that makes lowercase logical names resolve
  exactly under Postgres' down-folding (and Derby's up-folding);
- the type mapping Spark's shipped PostgresDialect applies in both
  directions for every column of the ATES schema — including the
  PostGIS/geometry transport contract (in-database ``ST_AsGeoJSON`` →
  text reaches Spark as StringType; the engine's ``geom_json`` columns).
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from database2ogr_spark.schemas import ATES_SCHEMAS
from database2ogr_spark.sources.catalog import JdbcCatalog, jdbc_options

ATES_TABLES = (
    "areas_vw",
    "points_of_interest",
    "access_roads",
    "avalanche_paths",
    "decision_points",
    "decision_points_warnings",
    "zones",
)


@pytest.fixture()
def pg_env(monkeypatch):
    """The reference's run_mapboxing.bash env contract."""
    monkeypatch.delenv("ATES_CONNECTION_STRING", raising=False)
    monkeypatch.setenv("PGHOST", "pg.example.org")
    monkeypatch.setenv("PGDATABASE", "ates_prod")
    monkeypatch.setenv("PGUSER", "ates_ro")
    monkeypatch.setenv("PGPASSWORD", "s3cret")


def test_pg_reader_options_golden_for_every_ates_table(pg_env):
    """The exact option map the JDBC source receives, per table: URL from
    PGHOST/PGDATABASE, credentials riding as options, dbtable
    double-quoted so the lowercase logical name resolves exactly under
    PG's unquoted-identifier down-folding."""
    for t in ATES_TABLES:
        opts = jdbc_options(f'"{t}"')
        assert opts == {
            "url": "jdbc:postgresql://pg.example.org/ates_prod",
            "dbtable": f'"{t}"',
            "user": "ates_ro",
            "password": "s3cret",
        }


def test_pg_connection_string_wins_and_is_jdbc_prefixed(pg_env, monkeypatch):
    monkeypatch.setenv(
        "ATES_CONNECTION_STRING", "postgresql://u@h:5433/atesdb"
    )
    assert (
        jdbc_options("x")["url"] == "jdbc:postgresql://u@h:5433/atesdb"
    )
    # an already-jdbc-prefixed string passes through untouched
    monkeypatch.setenv(
        "ATES_CONNECTION_STRING", "jdbc:postgresql://h2/db2"
    )
    assert jdbc_options("x")["url"] == "jdbc:postgresql://h2/db2"


def test_partitioned_scan_options_golden(pg_env):
    opts = jdbc_options(
        '"zones"', partition_column="id", num_partitions=32,
        lower_bound=0, upper_bound=100_000,
    )
    assert opts["partitionColumn"] == "id"
    assert opts["numPartitions"] == "32"
    assert opts["lowerBound"] == "0"
    assert opts["upperBound"] == "100000"


def test_jdbc_catalog_quotes_logical_names(spark, pg_env):
    """JdbcCatalog._name: quoting on by default (PG folds unquoted
    identifiers DOWN, Derby folds them UP — quoting pins both); off for
    schema-qualified or pre-quoted names."""
    cat = JdbcCatalog(spark, "jdbc:postgresql://h/db", tables=list(ATES_TABLES))
    for t in ATES_TABLES:
        assert cat._name(t) == f'"{t}"'
    raw = JdbcCatalog(
        spark, "jdbc:postgresql://h/db", quote_tables=False
    )
    assert raw._name("public.areas_vw") == "public.areas_vw"


def _pg_dialect(spark):
    jvm = spark._jvm
    d = jvm.org.apache.spark.sql.jdbc.JdbcDialects.get(
        "jdbc:postgresql://h/db"
    )
    assert d.canHandle("jdbc:postgresql://h/db")
    return d


def test_pg_write_side_type_mapping_for_ates_schemas(spark):
    """Spark Catalyst type → PG DDL type, via the SHIPPED PostgresDialect
    (no re-implementation; the dialect overrides what differs from the
    common JDBC mapping and defers the rest): every column of all 7 ATES
    schemas maps to the PG type the reference's tables use — INTEGER ids,
    TEXT properties/geometry transport. This is the contract a CREATE
    TABLE round-trip through the JDBC writer would emit. (JdbcType is a
    Scala case class py4j cannot reflect accessors on, so the golden
    compares its toString form.)"""
    jvm = spark._jvm
    d = _pg_dialect(spark)
    types = jvm.org.apache.spark.sql.types.DataTypes
    ju = jvm.org.apache.spark.sql.execution.datasources.jdbc.JdbcUtils

    def effective(catalyst_name: str) -> str:
        jt = getattr(types, catalyst_name)
        opt = d.getJDBCType(jt)
        if not opt.isDefined():  # dialect defers to the common mapping
            opt = ju.getCommonJDBCType(jt)
        assert opt.isDefined(), catalyst_name
        s = str(opt.get())  # e.g. "JdbcType(TEXT,12)"
        return s[s.index("(") + 1 : s.rindex(",")]

    expect = {"IntegerType": "INTEGER", "StringType": "TEXT"}
    seen = set()
    for tname, schema in ATES_SCHEMAS.items():
        if tname not in ATES_TABLES:
            continue
        for f in schema.fields:
            cat_name = type(f.dataType).__name__
            assert cat_name in expect, (tname, f.name, cat_name)
            assert effective(cat_name) == expect[cat_name], (tname, f.name)
            seen.add(cat_name)
    assert seen == set(expect)


def test_pg_read_side_type_mapping_for_reference_columns(spark):
    """PG column type → Catalyst type, via the shipped PostgresDialect:
    the dialect-override types PG exercises (jsonb/uuid under
    java.sql.Types.OTHER) land as StringType, and integer/text defer to
    Spark's generic JDBC mapping (dialect returns None). The PostGIS
    transport contract rides the same pin: geometry is SELECTed through
    ST_AsGeoJSON/ST_AsKML in-database (src/from-ground-up.js:73-90), so
    what crosses JDBC is text → StringType (the engine's geom_json
    column), never a java OTHER blob."""
    jvm = spark._jvm
    d = _pg_dialect(spark)
    Types = jvm.java.sql.Types

    def catalyst(sql_type, type_name, size=0):
        md = jvm.org.apache.spark.sql.types.MetadataBuilder()
        opt = d.getCatalystType(sql_type, type_name, size, md)
        return str(opt.get()) if opt.isDefined() else None

    # dialect overrides PG actually exercises
    assert catalyst(Types.OTHER, "jsonb") == "StringType"
    assert catalyst(Types.OTHER, "uuid") == "StringType"
    # text is dialect-mapped explicitly in Spark 4 (char/varchar
    # semantics); integer defers to the generic JDBC mapping (None)
    assert catalyst(Types.VARCHAR, "text") == "StringType"
    assert catalyst(Types.INTEGER, "int4") is None