"""Scalar column-expression kits — native Catalyst expressions only.

Everything here returns `pyspark.sql.Column` built from `pyspark.sql
.functions`, so the whole kit stays inside WholeStageCodegen (no Python
in the hot path). Reference citations in each module point at the pandas
code whose semantics the expression reproduces.
"""

from gpi_etl_spark.functions.geo import haversine_meters
from gpi_etl_spark.functions.cleaning import clean_numeric_sentinels, safe_div
from gpi_etl_spark.functions.strings import fold_accents, case_when_chain
from gpi_etl_spark.functions.dates import week_of_year_sunday, month_name_expr

__all__ = [
    "haversine_meters",
    "clean_numeric_sentinels",
    "safe_div",
    "fold_accents",
    "case_when_chain",
    "week_of_year_sunday",
    "month_name_expr",
]
