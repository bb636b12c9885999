"""Discovery sources (A11/B7), message normaliser (B10), date
serialisation parity (reference tests/test_io.py:62-67), resampling."""

import datetime as dt

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from dea_conflux_spark.core import dates, resample
from dea_conflux_spark.sources import discovery


def test_find_parquet_with_name_filter(spark, tiles, tmp_path):
    base = tmp_path / "pq"
    tiles.limit(4).write.parquet(str(base / "a"))
    tiles.limit(4).write.parquet(str(base / "b"))
    all_df = discovery.find_parquet(spark, str(base / "*"))
    assert all_df.count() == 8
    only_a = discovery.find_parquet(spark, str(base / "*"),
                                    name_pattern=r"^part-.*\.parquet$")
    assert only_a.count() == 8  # parquet part files match
    none = discovery.find_parquet(spark, str(base / "*"),
                                  name_pattern=r"^nomatch")
    assert none.count() == 0


def test_normalise_ids_mixed_shapes(spark):
    uuid = "12345678-1234-1234-1234-123456789012"
    wrapped = '{"Message": "{\\"id\\": \\"abc-id\\"}"}'
    df = spark.createDataFrame([(uuid,), (wrapped,), ("junk",)],
                               "body string")
    out = {r.id for r in discovery.normalise_ids(df).collect()}
    assert out == {uuid, "abc-id"}


@given(st.datetimes(min_value=dt.datetime(1970, 1, 1),
                    max_value=dt.datetime(2100, 1, 1)))
@settings(max_examples=100, deadline=None)
def test_date_roundtrip_property(d):
    """The reference's only property test, reproduced: 100 random
    timestamps round-trip through the filename format."""
    assert dates.string_to_date(dates.date_to_string(d)) == d


def test_scene_pq_name():
    d = dt.datetime(2021, 3, 9, 23, 59, 54, 123456)
    name = dates.scene_pq_name("waterbodies", "abcd-ef", d)
    assert name == "20210309/waterbodies_abcd-ef_20210309-235954-123456.pq"
    assert dates.day_prefix("2021-03-09T23:59:54Z") == "2021-03-09"


def test_resample_nearest_identity_and_downscale():
    a = np.arange(16, dtype=np.uint8).reshape(4, 4)
    assert (resample.resample(a, 4, 4) is a)
    down = resample.resample(a, 2, 2, "nearest")
    assert down.shape == (2, 2)
    # centres of 2x2 output map to input pixels (1,1),(1,3)...
    assert down[0, 0] in a[0:2, 0:2]


def test_resample_bilinear_constant_preserved():
    a = np.full((8, 8), 7.0)
    up = resample.resample(a, 16, 16, "bilinear")
    np.testing.assert_allclose(up, 7.0)
    grad = np.tile(np.arange(8, dtype=float), (8, 1))
    up2 = resample.resample(grad, 8, 16, "bilinear")
    assert (np.diff(up2[0]) >= -1e-9).all()  # monotone along gradient


def test_resample_bands_spec():
    bands = {"water": np.arange(16, dtype=np.uint8).reshape(4, 4),
             "red": np.arange(16, dtype=float).reshape(4, 4)}
    out = resample.resample_bands(bands, 8, 8,
                                  {"water": "nearest", "*": "bilinear"})
    assert out["water"].dtype == np.uint8
    assert out["red"].dtype == np.float64
