"""database2ogr_spark — a PySpark-native analytics/ETL engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference geospatial export engine ``aljedaxi/database2ogr``
(see SURVEY.md): parameterized scans, projection with computed geometry
columns, equi-joins, the ``warnify`` group/pivot aggregation, union-to-document
assembly, and GeoJSON / NDJSON / KML / KMZ sinks — plus the large-scale
training-data operators (dedup, similarity search, text analysis, multimodal
plumbing, streaming) the reference does not have.

Design stance (SURVEY.md §7): every operator is a pure
``DataFrame -> DataFrame`` transform built from native Column expressions so
Catalyst/Tungsten keep predicate pushdown, column pruning and whole-stage
codegen; Python UDFs only where semantics genuinely require them (none in the
hot path). Document/archive assembly and HTTP live at the driver edge.
"""

from database2ogr_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
