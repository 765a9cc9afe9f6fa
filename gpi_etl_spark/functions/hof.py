"""Higher-order-function helpers.

Spark evaluates a higher-order function's ARGUMENT arrays once, but any
expression a lambda body closes over is re-evaluated on every element —
so ``transform(sequence(0, size(toks)-n), i -> slice(toks, …))`` re-runs
the whole tokenizer split per index, turning a linear scan into
O(tokens²) per row (measured: 59 s → 3 s on the sf0.1 curation DAG when
the n-gram builder stopped closing over the tokenizer; see
docs/ROUND4_NOTES.md).

:func:`let_` is the general antidote: a poor-man's let-binding that
evaluates an expression once per row and hands the VALUE to the body as
a lambda variable, which costs nothing to reference from nested lambdas.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


def let_(bound: Column, body: Callable[[Column], Column]) -> Column:
    """Evaluate ``bound`` once per row; ``body`` receives it as a bound
    lambda variable.

    Implemented as ``element_at(transform(array(bound), body), 1)`` —
    the single-element transform is the binding site. Use whenever a
    lambda passed to ``transform``/``filter``/``aggregate``/``zip_with``
    would otherwise close over a non-trivial expression (a split, a
    regexp, a decoded struct): referencing the lambda variable reads the
    already-computed value, while closing over the expression re-runs it
    per element.

    CAVEAT — do NOT use inside an expression that becomes a Python/
    pandas UDF *argument*. Spark's Python-UDF extraction can fail to
    lift a Filter UDF whose argument contains nested lambda variables
    (observed on Spark 4.1: the plan keeps the UDF inside FilterExec and
    every task dies with ``INTERNAL_ERROR Cannot evaluate expression``;
    whether it triggers depends on session history, so it can pass in
    one test and fail in a suite). For UDF-feeding expressions use flat
    ``zip_with`` forms instead — argument arrays get the same
    evaluate-once guarantee without nesting (see
    ``operators/curation.py::shingle_hashes``).
    """
    return F.element_at(F.transform(F.array(bound), body), 1)
