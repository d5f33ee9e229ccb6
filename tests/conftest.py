from __future__ import annotations

import pytest

from database2ogr_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("d2o-tests")
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def ates_dir(spark, tmp_path_factory):
    from database2ogr_spark.sources.fixtures import write_ates_fixtures

    out = str(tmp_path_factory.mktemp("ates"))
    return write_ates_fixtures(spark, out)


@pytest.fixture(scope="session")
def ates_catalog(spark, ates_dir):
    from database2ogr_spark.schemas import ATES_SCHEMAS
    from database2ogr_spark.sources.catalog import Catalog

    return Catalog(spark, ates_dir, schemas=ATES_SCHEMAS)
