"""FIXTURES.md invariant 5: the huge-polygon run produces identical results
with the salted shuffle-hash cover join and with the broadcast join."""

import numpy as np
import pandas as pd

from dea_conflux_spark.operators import drill as drill_op
from dea_conflux_spark.operators.cover import polygon_cover_df
from dea_conflux_spark.operators.drill import (footprint_candidates,
                                               footprint_candidates_salted)
from dea_conflux_spark.operators.tilecells import tile_meta
from dea_conflux_spark.plugins import get_plugin


def _norm(df):
    return (df.assign(cand_polys=df["cand_polys"].map(sorted))
            .sort_values(["gx", "gy"]).reset_index(drop=True))


def test_salted_candidates_equal_broadcast(spark, tiles, polygons, grid):
    cover = polygon_cover_df(polygons)
    meta = tile_meta(tiles, grid)
    b = _norm(footprint_candidates(meta, cover, grid).toPandas())
    s = _norm(footprint_candidates_salted(meta, cover, grid,
                                          n_salt=8).toPandas())
    pd.testing.assert_frame_equal(b, s)


def test_drill_salted_equals_broadcast(spark, tiles, polygons, grid):
    plugin = get_plugin("waterbodies_c3")
    a = (drill_op.drill(tiles, polygons, plugin, grid, partial=False,
                        broadcast_cover=True)
         .toPandas().sort_values(["poly_id", "ts"]).reset_index(drop=True))
    b = (drill_op.drill(tiles, polygons, plugin, grid, partial=False,
                        broadcast_cover=False)
         .toPandas().sort_values(["poly_id", "ts"]).reset_index(drop=True))
    assert list(a["poly_id"]) == list(b["poly_id"])
    for m in ["px_wet", "pc_wet", "pc_missing"]:
        np.testing.assert_allclose(a[m], b[m], equal_nan=True, err_msg=m)
