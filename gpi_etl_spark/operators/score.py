"""Batch model scoring via broadcast + pandas_udf (U1).

The reference deserializes a scikit-learn RandomForest from blob
storage and calls ``rf.predict`` on a one-row feature frame
(HTIPNEXSITE/__init__.py:354-358; HTIPPLSITE/__init__.py:388-399). At
scale the same call becomes: broadcast the fitted model once, select
the ``GEO_*`` feature columns, and run an Arrow-batched pandas_udf so
every executor scores its partitions locally — no driver round-trips,
no per-row Python.

The model only needs a sklearn-style ``predict(ndarray) -> ndarray``;
sklearn itself is optional (not present in this container — tests use
a hand-rolled stand-in).
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


class ThresholdModel:
    """Minimal sklearn-style model (``predict(ndarray) -> ndarray``):
    1.0 when the selected feature exceeds ``threshold``. Used as the
    broadcastable stand-in where sklearn isn't installed; a real
    RandomForest drops in unchanged."""

    def __init__(self, feature_index: int, threshold: float = 0.0):
        self.feature_index = feature_index
        self.threshold = threshold

    def predict(self, X):
        return (X[:, self.feature_index] > self.threshold).astype(float)


class LinearModel:
    """sklearn-style linear scorer: ``predict(X) = X @ w + b``. Exactly
    SQL-expressible, so the pandas_udf scoring path can be hash-checked
    against a dot-product oracle (a RandomForest can't be)."""

    def __init__(self, weights, bias: float = 0.0):
        import numpy as np

        self.w = np.asarray(weights, dtype=float)
        self.b = float(bias)

    def predict(self, X):
        return X @ self.w + self.b


def load_model(source):
    """S12: bytes → fitted model (the reference's blob-artifact path:
    ``get_blob_to_stream`` into a ``BytesIO`` then ``joblib.load``,
    HTIPNEXSITE/__init__.py:72-90,354-358).

    ``source`` may be raw ``bytes``, a binary file-like (the stream the
    reference passes), or a filesystem path. Tries joblib first (the
    reference's serializer; sklearn artifacts need it) and falls back
    to stdlib pickle when joblib isn't installed. Only load artifacts
    you trust — pickle executes code on deserialization.
    """
    import io
    import os
    import pickle

    try:
        import joblib  # not in this container; present on real deployments
        loader = joblib.load
    except ImportError:
        loader = pickle.load

    if isinstance(source, (bytes, bytearray)):
        stream = io.BytesIO(source)
    elif isinstance(source, (str, os.PathLike)):
        with open(source, "rb") as fh:
            return loader(fh)
    else:
        stream = source
        stream.seek(0)
    return loader(stream)


def ensure_model(model):
    """Accept a fitted model, raw artifact bytes, a stream, or a path —
    anything without a ``predict`` goes through :func:`load_model`."""
    return model if hasattr(model, "predict") else load_model(model)


def score_vector_column(
    df: DataFrame,
    model,
    vec_col: str = "embedding",
    out_col: str = "forecast",
) -> DataFrame:
    """U1 scoring over an ``array<double>`` feature column (embedding
    models, featurized vectors): broadcast model + Arrow-batched
    pandas_udf, one ndarray per batch."""
    bc_model = df.sparkSession.sparkContext.broadcast(model)

    @F.pandas_udf(T.DoubleType())
    def predict(vecs: pd.Series) -> pd.Series:
        import numpy as np

        mask = vecs.notna()
        out = pd.Series(np.nan, index=vecs.index, dtype=float)
        if mask.any():  # score non-null rows; NULL vectors → NULL score
            X = np.vstack(vecs[mask].to_numpy())
            out[mask] = bc_model.value.predict(X)
        return out

    return df.withColumn(out_col, predict(F.col(vec_col)))


def feature_columns(df: DataFrame, prefix: str = "GEO_") -> list[str]:
    """The reference's regex feature selection (`GEO_.` match,
    HTIPPLSITE/__init__.py:392-394), order-stable."""
    return [c for c in df.columns if c.startswith(prefix)]


def score_with_model(
    df: DataFrame,
    model,
    feature_cols: Sequence[str] | None = None,
    prefix: str = "GEO_",
    out_col: str = "forecast",
    out_type: T.DataType = T.DoubleType(),
) -> DataFrame:
    """Append ``model.predict`` output as a column.

    The model is broadcast once per job (Spark pickles the closure per
    task otherwise — the classic re-serialization trap); each Arrow
    batch scores vectorized.
    """
    cols = list(feature_cols or feature_columns(df, prefix))
    if not cols:
        raise ValueError(f"no feature columns with prefix {prefix!r}")
    bc_model = df.sparkSession.sparkContext.broadcast(model)

    @F.pandas_udf(out_type)
    def predict(*series: pd.Series) -> pd.Series:
        features = pd.concat(series, axis=1)
        features.columns = cols
        return pd.Series(bc_model.value.predict(features.values)).astype(float)

    return df.withColumn(out_col, predict(*[F.col(f"`{c}`") for c in cols]))
