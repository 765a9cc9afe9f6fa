"""gpi_etl_spark — a PySpark-native analytics engine.

Re-expresses the query / data-processing capabilities of the reference
``josuesolissomoscmi/GPI-ETL`` (a single-threaded pandas Azure Functions
ETL app — see SURVEY.md) on Spark's lazy, distributed DataFrame/SQL
stack, and extends it with large-scale training-data-pipeline operators
(dedup, similarity search, multimodal columns, text analysis).

Layout:
    session     SparkSession factory (AQE on, UTC, tuned for local[N])
    schemas     explicit StructType registry for every table/fixture
    functions/  scalar column-expression kits (strings, dates, math, geo,
                cleaning) — native Catalyst expressions, no UDFs
    operators/  composable dataframe operators (watermark merge, reshape,
                top-k/knn, classify chain, featurize, indicators, window
                kit, dedup, similarity, textstats, multimodal, as-of)
    sources/    driver-side connectors (fixed-width native; http/excel/
                json/places behind injectable fetchers)
    streaming/  Structured Streaming equivalents (tumbling/session aggs,
                watermarked dedup)
    plans/      the reference's 13 entry points as named DataFrame jobs
"""

__version__ = "0.1.0"
