"""Golden tests: the distributed drill must reproduce the numpy oracle
row-for-row (reference parity: tests/test_drill.py asserts row counts and
golden pixel sums against notebook-computed values)."""

import numpy as np
import pandas as pd
import pytest

from dea_conflux_spark import oracle
from dea_conflux_spark.operators import drill as drill_op
from dea_conflux_spark.plugins import get_plugin


def _compare(got: pd.DataFrame, exp: pd.DataFrame, metrics):
    got = got.sort_values(["poly_id", "ts"]).reset_index(drop=True)
    exp = exp.sort_values(["poly_id", "ts"]).reset_index(drop=True)
    assert list(got["poly_id"]) == list(exp["poly_id"])
    assert list(pd.to_datetime(got["ts"])) == list(pd.to_datetime(exp["ts"]))
    for m in metrics:
        g = got[m].to_numpy(dtype=float)
        e = exp[m].to_numpy(dtype=float)
        np.testing.assert_allclose(g, e, rtol=1e-12, atol=1e-12,
                                   equal_nan=True, err_msg=m)


@pytest.fixture(scope="module")
def c3_result(tiles, polygons, grid):
    plugin = get_plugin("waterbodies_c3")
    return drill_op.drill(tiles, polygons, plugin, grid,
                          partial=True).toPandas()


def test_waterbodies_c3_matches_oracle(c3_result, grid, polys, tiles_pdf):
    plugin = get_plugin("waterbodies_c3")
    exp = oracle.oracle_drill(grid, polys, tiles_pdf, plugin, partial=True)
    assert len(c3_result) == len(exp) > 0
    _compare(c3_result, exp, ["px_wet", "pc_wet", "pc_missing"])


def test_waterbodies_c3_edge_flags(c3_result, grid, polys, tiles_pdf):
    plugin = get_plugin("waterbodies_c3")
    exp = oracle.oracle_drill(grid, polys, tiles_pdf, plugin, partial=True)
    got = c3_result.sort_values(["poly_id", "ts"]).reset_index(drop=True)
    exp = exp.sort_values(["poly_id", "ts"]).reset_index(drop=True)
    for c in drill_op.FLAG_COLS:
        assert list(got[c].astype(bool)) == list(exp[c].astype(bool)), c
    # the fixture plants boundary-overflow polygons: the parity check must
    # not be vacuous — at least one flag is TRUE in each direction set
    assert got[drill_op.FLAG_COLS].to_numpy().any(), \
        "edge-flag fixture is vacuous (no polygon overflows the extent)"


def test_sum_wet_matches_oracle(tiles, polygons, grid, polys, tiles_pdf):
    plugin = get_plugin("sum_wet")
    got = drill_op.drill(tiles, polygons, plugin, grid, partial=False).toPandas()
    exp = oracle.oracle_drill(grid, polys, tiles_pdf, plugin, partial=False)
    assert len(got) == len(exp) > 0
    _compare(got, exp, ["water"])


@pytest.mark.parametrize("name", ["ga_ls_wo_3_flags", "wofs_albers_flags"])
def test_wo_flags_matches_oracle(tiles, polygons, grid, polys, tiles_pdf,
                                 name):
    plugin = get_plugin(name)
    got = drill_op.drill(tiles, polygons, plugin, grid, partial=False).toPandas()
    exp = oracle.oracle_drill(grid, polys, tiles_pdf, plugin, partial=False)
    assert len(got) == len(exp) > 0
    _compare(got, exp, [c for c, _ in plugin.output_fields])
    if name == "wofs_albers_flags":
        # C2 flag names present (reference wofs_albers_flags.conflux.py:19-28)
        assert {"sea", "terrain_or_low_angle"} <= set(got.columns)


def test_waterbodies_c2_matches_oracle(tiles, polygons, grid, polys,
                                       tiles_pdf):
    """C2 'waterbodies' plugin alias (reference waterbodies.conflux.py):
    same wet/dry/missing drill semantics as C3."""
    plugin = get_plugin("waterbodies")
    got = drill_op.drill(tiles, polygons, plugin, grid,
                         partial=False).toPandas()
    exp = oracle.oracle_drill(grid, polys, tiles_pdf, plugin, partial=False)
    assert len(got) == len(exp) > 0
    _compare(got, exp, ["px_wet", "pc_wet", "pc_missing"])
    assert plugin.resolution == (-25, 25)


def test_tile_assignments_match_oracle(tiles, polygons, grid, polys):
    """Exact tile->polygon assignment parity: per-(poly, tile) pixel counts
    from the engine's partials equal the oracle's global rasterisation."""
    plugin = get_plugin("waterbodies_c3")
    parts = drill_op.drill_partials(tiles, polygons, plugin, grid).toPandas()
    parts["gx"] = parts["image_id"].str.extract(r"_x(\d+)_").astype(int)
    parts["gy"] = parts["image_id"].str.extract(r"_y(\d+)$").astype(int)
    got = (parts[parts["image_id"].str.startswith("t0000")]
           [["poly_id", "gx", "gy", "n_px"]]
           .sort_values(["poly_id", "gx", "gy"]).reset_index(drop=True))
    exp = oracle.oracle_assignments(grid, polys)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_overlapping_polygons_last_wins(polys, grid):
    """The overlap pair must not double-count pixels: total assigned pixels
    across the pair is <= the union of their areas in px."""
    exp = oracle.oracle_assignments(grid, polys)
    a = next(p for p in polys if p["kind"] == "overlap_a")
    b = next(p for p in polys if p["kind"] == "overlap_b")
    na = exp[exp.poly_id == a["poly_id"]]["n_px"].sum()
    nb = exp[exp.poly_id == b["poly_id"]]["n_px"].sum()
    # b has the higher ordinal -> wins the overlap; a loses pixels
    assert nb > 0
    px_area_a = a["area"] / (grid.px_res ** 2)
    assert na < px_area_a * 1.02  # a lost the shared pixels


def test_outside_polygon_absent(c3_result, polys):
    out_pid = next(p for p in polys if p["kind"] == "outside")["poly_id"]
    assert out_pid not in set(c3_result["poly_id"])


def test_drill_100k_polygons_no_driver_collect(spark):
    """Scale path: the drill must handle a 100k-polygon layer with rings
    delivered through the candidate join (``rings="join"``) — no
    driver-side collect() or whole-layer broadcast (the round-1 scale
    ceiling).  Driver memory is bounded by the footprint-candidate table,
    not the polygon count."""
    from dea_conflux_spark import datagen as dg

    assert not hasattr(drill_op, "_prepared_polys")  # the collect path is gone
    big_grid = dg.GridSpec(G=8, T=1, w=32, h=32)
    big_polys = dg.make_polygons(big_grid, n_small=100_000, n_medium=0,
                                 n_huge=0)
    tiles = dg.tiles_df(spark, big_grid, big_polys)
    polygons = dg.polygons_df(spark, big_polys)
    res = drill_op.drill(tiles, polygons, get_plugin("sum_wet"), big_grid,
                         partial=False, rings="join")
    n = res.count()
    # last-wins rasterisation over a dense overlapping layer: thousands of
    # polygons own pixels, bounded by the total pixel budget
    assert 0 < n <= big_grid.G ** 2 * 32 * 32


def test_rings_join_and_dim_modes_identical(spark, tiles, polygons, grid):
    """The two ring-delivery strategies (candidate-join payload vs pruned
    dimension broadcast) must produce bit-identical drill output."""
    plugin = get_plugin("waterbodies_c3")
    a = (drill_op.drill(tiles, polygons, plugin, grid, rings="join")
         .toPandas().sort_values(["poly_id", "ts"]).reset_index(drop=True))
    b = (drill_op.drill(tiles, polygons, plugin, grid, rings="dim")
         .toPandas().sort_values(["poly_id", "ts"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
