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


def test_default_rules_compat_reproduces_field_crossover(spark):
    from gpi_etl_spark.plans.sites import DEFAULT_RULES, default_rules

    fixed = default_rules()
    compat = default_rules(compat=True)
    assert [r.field for r in fixed] == [r.field for r in DEFAULT_RULES]
    crossed = [r for r in compat if r.field == "poi_type"]
    assert crossed == []  # every type-rule now (buggily) reads poi_name
    assert len(compat) == len(fixed)


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
