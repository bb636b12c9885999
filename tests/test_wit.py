"""WIT multiband drill vs oracle + multiband codec roundtrip."""

import numpy as np
import pandas as pd
import pytest

from dea_conflux_spark import datagen, oracle
from dea_conflux_spark.core import codec
from dea_conflux_spark.operators import drill as drill_op
from dea_conflux_spark.plugins import get_plugin
from dea_conflux_spark.plugins.wit import WIT_BANDS


def test_encode_decode_bands_roundtrip():
    rng = np.random.default_rng(3)
    bands = {
        "water": rng.integers(0, 255, (16, 16), dtype=np.uint8),
        **{n: rng.integers(-500, 8000, (16, 16)).astype(np.int16)
           for n, d in WIT_BANDS if d == "i2"},
        "bs": rng.integers(0, 120, (16, 16), dtype=np.uint8),
        "pv": rng.integers(0, 120, (16, 16), dtype=np.uint8),
        "npv": rng.integers(0, 120, (16, 16), dtype=np.uint8),
    }
    data = codec.encode_bands(bands, WIT_BANDS)
    dec = codec.decode_bands(data, 16, 16, WIT_BANDS)
    for n, _ in WIT_BANDS:
        assert (dec[n] == bands[n]).all(), n


@pytest.fixture(scope="module")
def wit_tiles_pdf(grid, polys):
    return datagen.make_wit_tiles_pdf(grid, polys)


@pytest.mark.parametrize("name", ["wit_ls9", "wit_ls8", "wit_ls7",
                                  "wit_ls5"])
def test_wit_drill_matches_oracle(spark, grid, polys, polygons,
                                  wit_tiles_pdf, name):
    plugin = get_plugin(name)
    tiles = spark.createDataFrame(wit_tiles_pdf, schema=datagen.TILE_SCHEMA)
    got = drill_op.drill(tiles, polygons, plugin, grid,
                         partial=False).toPandas()
    exp = oracle.oracle_drill(grid, polys, wit_tiles_pdf, plugin,
                              partial=False)
    got = got.sort_values(["poly_id", "ts"]).reset_index(drop=True)
    exp = exp.sort_values(["poly_id", "ts"]).reset_index(drop=True)
    assert list(got["poly_id"]) == list(exp["poly_id"])
    for m in ["water", "wet", "bs", "pv", "npv", "pc_missing"]:
        np.testing.assert_allclose(got[m].astype(float),
                                   exp[m].astype(float),
                                   rtol=1e-9, atol=1e-12, equal_nan=True,
                                   err_msg=m)


def test_wit_wet_fraction_nontrivial(grid, polys, wit_tiles_pdf):
    """The synthetic reflectance must actually straddle the TCW threshold
    (otherwise the wet band is degenerate and the test proves nothing)."""
    plugin = get_plugin("wit_ls9")
    r = wit_tiles_pdf.iloc[0]
    bands = plugin.transform(plugin.decode(r["bytes"], int(r["h"]),
                                           int(r["w"]), r["fmt"]))
    wet = bands["wet"]
    frac = np.nanmean(wet)
    assert 0.02 < frac < 0.98
