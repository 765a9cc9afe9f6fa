"""Last-match-wins classifier semantics (SURVEY §7 hard part #1)."""

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from gpi_etl_spark.operators.classify import UNMATCHED, Rule, apply_classifier, classify_expr


RULES = [
    Rule("BANK", "BANCOS"),
    Rule("ATM|CAJERO", "CAJEROS"),
    Rule("BANK OF AMERICA", "BANCOS USA"),  # later rule overrides BANCOS
    Rule("CHURCH", "IGLESIAS"),
]


def reference_loop(name: str) -> str:
    """The reference's imperative overwrite loop (HTIPPLSITE/__init__.py
    :175-312), reimplemented as the oracle."""
    import re

    cat = UNMATCHED
    for rule in RULES:
        if re.search(rule.pattern, name):
            cat = rule.category
    return cat


def test_last_match_wins(spark):
    rows = [
        ("BANK PLAZA",),       # only rule 1 → BANCOS
        ("BANK OF AMERICA",),  # rules 1+3 → later wins → BANCOS USA
        ("ATM BANK",),         # rules 1+2 → CAJEROS
        ("PIZZA SHOP",),       # none → UNMATCHED
    ]
    df = spark.createDataFrame(rows, "poi_name string")
    out = {r.poi_name: r.poi_category for r in apply_classifier(df, RULES).collect()}
    assert out["BANK PLAZA"] == "BANCOS"
    assert out["BANK OF AMERICA"] == "BANCOS USA"
    assert out["ATM BANK"] == "CAJEROS"
    assert out["PIZZA SHOP"] == UNMATCHED


@settings(max_examples=20, deadline=None)
@given(st.lists(st.sampled_from(["BANK", "ATM", "BANK OF AMERICA", "CHURCH", "X"]),
                min_size=1, max_size=3))
def test_property_matches_reference_loop(spark, parts):
    name = " ".join(parts)
    df = spark.createDataFrame([(name,)], "poi_name string")
    got = apply_classifier(df, RULES).first().poi_category
    assert got == reference_loop(name)


def test_multi_field_rules(spark):
    rules = [
        Rule("RESTAURANT", "RESTAURANTES", field="poi_type"),
        Rule("SUSHI", "SUSHI BARS", field="poi_name"),
    ]
    df = spark.createDataFrame(
        [("SUSHI GO", "RESTAURANT"), ("TACO", "RESTAURANT"), ("SHOP", "STORE")],
        "poi_name string, poi_type string",
    )
    out = {r.poi_name: r.poi_category for r in apply_classifier(df, rules).collect()}
    assert out == {"SUSHI GO": "SUSHI BARS", "TACO": "RESTAURANTES",
                   "SHOP": UNMATCHED}


def test_classify_sql_escapes_quotes_in_category(spark):
    import duckdb

    from gpi_etl_spark.operators.classify import Rule, classify_sql

    sql = classify_sql([Rule("BANK", "D'ONOFRIO")], default="N'A")
    got = duckdb.sql(f"SELECT {sql.replace('poi_name', chr(39)+'BANK X'+chr(39))} AS c").fetchone()[0]
    assert got == "D'ONOFRIO"


def test_full_rules_compat_flips_only_crossover_rules(spark):
    from gpi_etl_spark.plans.sites import DEFAULT_RULES, full_rules

    fixed = full_rules()
    compat = full_rules(compat=True)
    assert fixed == DEFAULT_RULES
    assert len(fixed) == len(compat) == 47  # the reference chain incl. :227 dup
    flipped = [
        i for i, (f, c) in enumerate(zip(fixed, compat)) if f.field != c.field
    ]
    # exactly the three reference crossover sites (:181, :234, :239)
    assert len(flipped) == 3
    for i in flipped:
        assert fixed[i].field == "poi_type" and compat[i].field == "poi_name"
        assert fixed[i].pattern == compat[i].pattern
    # genuinely-type rules (RESTAURANT/BANK/ATM/CHURCH/GOV) stay on type
    assert sum(1 for r in compat if r.field == "poi_type") == 6


def _reference_chain_loop(name: str, typ: str, rules) -> str:
    """The reference's imperative overwrite loop over the full chain
    (HTIPPLSITE/__init__.py:175-312), reimplemented with ``re`` as the
    oracle for the compiled CASE expression."""
    import re

    cat = UNMATCHED
    for rule in rules:
        value = name if rule.field == "poi_name" else typ
        if re.search(rule.pattern, value):
            cat = rule.category
    return cat


_CHAIN_TOKENS = [
    "BANCO", "BANRURAL", "CAJERO", "ATM", "TIENDA", "FARMACIA", "PLAZA",
    "RESTAURANTE", "POLLO CAMPERO", "CAFE", "CAFETERIA", "MERCADO",
    "ESCUELA", "COLEGIO", "TALLER", "SUPER 24", "PAIZ", "TERMINAL",
    "HOSPITAL", "IGLESIA", "GASOLINERA", "HOTEL", "PARQUE", "X9",
]
_CHAIN_TYPES = ["RESTAURANT", "BANK", "ATM", "CHURCH", "DEPARTMENT_STORE",
                "LOCAL_GOVERNMENT_OFFICE", "STORE", ""]


@settings(max_examples=25, deadline=None)
@given(
    st.lists(st.sampled_from(_CHAIN_TOKENS), min_size=1, max_size=3),
    st.sampled_from(_CHAIN_TYPES),
    st.booleans(),
)
def test_property_full_chain_matches_reference_loop(spark, parts, typ, compat):
    from gpi_etl_spark.plans.sites import full_rules

    rules = full_rules(compat=compat)
    name = " ".join(parts)
    df = spark.createDataFrame([(name, typ)], "poi_name string, poi_type string")
    got = apply_classifier(df, rules).first().poi_category
    assert got == _reference_chain_loop(name, typ, rules)


def test_fold_accents_sql_matches_spark(spark):
    import duckdb

    from gpi_etl_spark.functions.strings import fold_accents, fold_accents_sql

    samples = ["Café 'La Esquina'", "BANCO NACIONAL, S.A.", 'a"b.c', "ÁÉÍÓÚ x"]
    df = spark.createDataFrame([(s,) for s in samples], "s string")
    got = [r["f"] for r in df.select(fold_accents("s").alias("f")).collect()]
    want = [
        duckdb.sql(f"SELECT {fold_accents_sql('s')} AS f FROM (SELECT ? AS s)",
                   params=[s]).fetchone()[0]
        for s in samples
    ]
    assert got == want
