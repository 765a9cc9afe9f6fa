"""Site-selection scoring — the reference's interactive query family
(HTIPNEXSITE / HTIPPLSITE / HTIPPLSITECR / PGSITE, SURVEY.md §3.3).

One lazy plan per site batch: POIs → clean+classify (40-rule
last-match-wins chain) → geodesic distance → per-category feature
widening → broadcast-model scoring; plus the top-3 nearest existing
stores (J2 kNN). The reference scores one (lat, lon) per HTTP request
with a module-level mutable accumulator (a state-leak bug across warm
invocations — SURVEY §0); this plan is pure and scores any number of
sites in one job.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gpi_etl_spark.functions.geo import haversine_meters
from gpi_etl_spark.functions.strings import fold_accents
from gpi_etl_spark.operators.classify import Rule, apply_classifier
from gpi_etl_spark.operators.featurize import geo_feature_vector
from gpi_etl_spark.operators.geo_knn import knn_join
from gpi_etl_spark.operators.score import score_with_model

#: a representative slice of the reference's ~40-rule chain
#: (HTIPPLSITE/__init__.py:175-312) — rules are data; deployments load
#: the full list. Order matters (last match wins).
DEFAULT_RULES = [
    Rule("RESTAURANT|COMIDA", "OTROS RESTAURANTE", field="poi_type"),
    Rule("BANK|BANCO", "BANCOS"),
    Rule("ATM|CAJERO", "CAJEROS"),
    Rule("CHURCH|IGLESIA", "IGLESIAS"),
    Rule("SCHOOL|ESCUELA|COLEGIO", "ESCUELAS"),
    Rule("PHARMACY|FARMACIA", "FARMACIAS"),
    Rule("SUPERMARKET|SUPER", "SUPERMERCADOS"),
    Rule("GAS|GASOLINERA", "GASOLINERAS"),
    Rule("HOSPITAL|CLINICA", "HOSPITALES"),
    Rule("PIZZA", "PIZZERIAS"),
    Rule("POLLO", "RESTAURANTES DE POLLO"),
]


def default_rules(compat: bool = False) -> list[Rule]:
    """The shipped rule list. ``compat=True`` reproduces the reference's
    field-crossover bugs (type-pattern rules applied to the NAME column,
    HTIPPLSITE/__init__.py:181,234,239) for bug-for-bug parity; the
    default applies them to ``poi_type`` as intended."""
    if not compat:
        return list(DEFAULT_RULES)
    return [
        Rule(r.pattern, r.category, field="poi_name")
        if r.field == "poi_type"
        else r
        for r in DEFAULT_RULES
    ]


def classify_pois(pois: DataFrame, rules: Sequence[Rule] = DEFAULT_RULES) -> DataFrame:
    """Accent-fold + punctuation-strip both match fields (:163-171),
    then the ordered rule chain (F-STR9)."""
    cleaned = pois.withColumn("poi_name", fold_accents("poi_name")).withColumn(
        "poi_type", fold_accents("poi_type")
    )
    return apply_classifier(cleaned, rules)


def poi_features(
    pois_classified: DataFrame,
    site_cols: Sequence[str] = ("rst_cd",),
    categories: Sequence[str] | None = None,
    missing_min: float = 0.0,
) -> DataFrame:
    """Distance column (J3 as a pure expression — no iterrows loop)
    then the GEO_<CAT>_<STAT> widening (A3+R2)."""
    with_dist = pois_classified.withColumn(
        "distance_mtrs",
        haversine_meters("place_ltt", "place_lgt", "poi_ltt", "poi_lgt"),
    ).dropDuplicates()  # the reference dedupes POIs before featurizing (:315)
    return geo_feature_vector(
        with_dist,
        site_cols=list(site_cols),
        category_col="poi_category",
        distance_col="distance_mtrs",
        categories=categories,
        near_threshold=100.0,
        missing_min=missing_min,
    )


def score_sites(
    pois: DataFrame,
    model,
    rules: Sequence[Rule] = DEFAULT_RULES,
    categories: Sequence[str] | None = None,
    missing_min: float = 0.0,
) -> DataFrame:
    """POIs → forecast per site: the full HTIPNEXSITE transform chain
    as one plan (classify → distance → widen → pandas_udf predict)."""
    features = poi_features(classify_pois(pois, rules), ("rst_cd",), categories,
                            missing_min)
    return score_with_model(features, model)


def close_points(
    sites: DataFrame,
    stores: DataFrame,
    category: str | None = None,
    country: str | None = None,
    k: int = 3,
) -> DataFrame:
    """Top-3 nearest existing stores per site — the SQL Server
    STDistance TOP 3 query (:91-130) as Haversine + window top-k."""
    s = stores
    if category is not None:
        s = s.filter(F.col("CTGRY_NM") == category)
    if country is not None:
        s = s.filter(F.col("CNTRY_NM") == country)
    return knn_join(
        sites, s, k=k, query_id="rst_cd", q_lat="place_ltt", q_lon="place_lgt"
    ).select("rst_cd", "POS_NM", "CTGRY_NM", "mdist", "row_index")
