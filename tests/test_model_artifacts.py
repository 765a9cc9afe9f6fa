"""S12 model-artifact loading + K2 raw binary sink round-trips."""

import io
import pickle

import pytest

from gpi_etl_spark.operators.score import LinearModel, ensure_model, load_model
from gpi_etl_spark.sources.connectors import raw_binary_get, raw_binary_put


@pytest.fixture()
def artifact() -> bytes:
    """A recorded model artifact: pickled LinearModel bytes, exactly
    what the reference's blob fetch streams back."""
    return pickle.dumps(LinearModel([2.0, 3.0], bias=1.0))


def test_load_model_from_bytes_stream_and_path(tmp_path, artifact):
    for src in (
        artifact,
        io.BytesIO(artifact),
        str(tmp_path / "m.sav"),
    ):
        if isinstance(src, str):
            raw_binary_put(src, artifact)
        m = load_model(src)
        assert list(m.predict([[1.0, 1.0]])) == [6.0]


def test_load_model_rewinds_consumed_stream(artifact):
    stream = io.BytesIO(artifact)
    stream.read()  # consumed — the reference never rewinds; we must
    assert list(load_model(stream).predict([[0.0, 0.0]])) == [1.0]


def test_ensure_model_passthrough_and_load(artifact):
    fitted = LinearModel([1.0], bias=0.0)
    assert ensure_model(fitted) is fitted
    assert list(ensure_model(artifact).predict([[2.0, 1.0]])) == [8.0]


def test_raw_binary_put_get_roundtrip_and_overwrite(tmp_path):
    p = str(tmp_path / "sub" / "blob.bin")
    raw_binary_put(p, b"\x00\x01\xffpayload")
    assert raw_binary_get(p) == b"\x00\x01\xffpayload"
    raw_binary_put(p, b"v2")  # atomic replace
    assert raw_binary_get(p) == b"v2"
    # no temp files left behind
    import os

    assert os.listdir(tmp_path / "sub") == ["blob.bin"]


def test_site_endpoint_accepts_artifact_bytes(spark, artifact):
    from gpi_etl_spark import engine
    from gpi_etl_spark.schemas import POIS

    model = pickle.dumps(
        # forecast = first feature (GEO_BANCO_300M_CNT) count
        LinearModel([1.0] + [0.0] * 9, bias=0.0)
    )
    pois = spark.createDataFrame(
        [("N1", 9.93, -84.08, "p1", "BANCO NACIONAL", "BANK", 9.9305, -84.08)],
        POIS,
    )
    out = engine.run(
        "HTIPNEXSITE", pois=pois, model=model, categories=["BANCO", "HOTEL"]
    )
    assert out.scored.first().forecast == 1.0
