"""de_final_project_spark — a PySpark-native analytics engine.

A brand-new, Spark-first re-expression of the query and data-processing
capabilities of the reference ELT pipeline (BernadinePierre/de-final-project:
ingest -> star-schema transform -> warehouse load), rebuilt on the
DataFrame/SQL API so Catalyst/Tungsten pick the physical strategy.

Package map
-----------
- ``session``     SparkSession factory (AQE on, sane local defaults)
- ``schemas``     explicit StructTypes: 11 OLTP source tables, star outputs,
                  driver testdata tables
- ``sources``     readers/sinks (CSV bronze, Parquet silver/gold, JDBC,
                  watermark store)
- ``operators``   relational building blocks: keep-latest dedup, surrogate
                  keys, dedup family (exact/MinHash/SimHash), similarity
                  search, windowed analytics
- ``functions``   column-expression helpers (date parts, time strings,
                  text stats, vector math) — built-ins only, no Python UDFs
                  on the parity surface
- ``plans``       composed dataflows: the 8 dim + 3 fact builders, the
                  incremental rebuild DAG, analytics queries
- ``streaming``   Structured Streaming analogs of the reference's
                  micro-batch cadence (watermarks, windows, late data)
"""

__version__ = "0.1.0"
