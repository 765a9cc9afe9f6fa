"""String kit: accent folding, punctuation strip, ordered CASE builders.

Reference sites: accent/punctuation normalization before POI
classification (HTIPPLSITE/__init__.py:163-171, nine sequential
``re.sub`` passes), and the CASE-WHEN ticker→commodity key extraction
pushed to SQL Server (HTGPIPROPHEDEX/__init__.py:78-87).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

# the exact fold set the reference normalizes (upper-case Spanish accents
# + Ü/Ñ left intact by the reference, so left intact here too)
_ACCENT_SRC = "ÁÉÍÓÚ"
_ACCENT_DST = "AEIOU"
_PUNCT_PATTERN = r"['\",.]"


def fold_accents(col: Column | str, strip_punct: bool = True) -> Column:
    """Upper-case, fold Á→A … Ú→U, optionally strip ``' " , .``.

    One ``translate`` + one ``regexp_replace`` replaces the reference's
    nine regex passes; both are codegen'd JVM expressions.
    """
    c = F.col(col) if isinstance(col, str) else col
    c = F.upper(c)
    c = F.translate(c, _ACCENT_SRC, _ACCENT_DST)
    if strip_punct:
        c = F.regexp_replace(c, _PUNCT_PATTERN, "")
    return c


def fold_accents_sql(expr: str, strip_punct: bool = True) -> str:
    """ANSI-SQL twin of :func:`fold_accents` (for DuckDB oracles) —
    kept textually parallel so both engines fold identically; extend
    ``_ACCENT_SRC``/``_PUNCT_PATTERN`` and both sides move together."""
    out = f"translate(upper({expr}), '{_ACCENT_SRC}', '{_ACCENT_DST}')"
    if strip_punct:
        out = f"regexp_replace({out}, '['',\",.]', '', 'g')"
    return out


def case_when_chain(
    rules: Sequence[tuple[Column, Column | str]],
    default: Column | str,
) -> Column:
    """First-match-wins ``when`` chain from (condition, value) pairs.

    The SQL-style CASE: earlier rules win. For the reference's
    *last-match-wins* loops see ``operators.classify`` which reverses
    the rule list before calling this.
    """
    out = None
    for cond, value in rules:
        value = F.lit(value) if isinstance(value, str) else value
        out = F.when(cond, value) if out is None else out.when(cond, value)
    default = F.lit(default) if isinstance(default, str) else default
    return default if out is None else out.otherwise(default)


def ticker_commodity_key(symbol: Column | str) -> Column:
    """Commodity key from a futures ticker symbol.

    Reproduces the watermark SQL's CASE exactly (HTGPIPROPHEDEX/
    __init__.py:78-87): symbols of length 5 or 7 take ``RIGHT(LEFT(s,
    2), 1)`` — the SECOND character only (so ``@CU25`` → ``C``);
    otherwise ``@``-prefixed symbols take the two characters after the
    ``@`` (``RIGHT(LEFT(s, 3), 2)``); other symbols take their first
    three characters. Note the length rule fires before the ``@`` rule,
    as in the reference.
    """
    s = F.upper(F.trim(F.col(symbol) if isinstance(symbol, str) else symbol))
    return case_when_chain(
        [
            (F.length(s).isin(5, 7), F.substring(s, 2, 1)),
            (F.substring(s, 1, 1) == "@", F.substring(s, 2, 2)),
        ],
        F.substring(s, 1, 3),
    )


def ticker_commodity_key_sql(symbol_sql: str) -> str:
    """ANSI-SQL text equivalent of :func:`ticker_commodity_key`."""
    s = f"upper(trim({symbol_sql}))"
    return (
        f"CASE WHEN length({s}) IN (5, 7) THEN substring({s}, 2, 1) "
        f"WHEN substring({s}, 1, 1) = '@' THEN substring({s}, 2, 2) "
        f"ELSE substring({s}, 1, 3) END"
    )
