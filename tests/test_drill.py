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


def _fmt_plan(df):
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _assert_no_bytes_exchange_no_rings_broadcast(plan):
    """The scale-plan contract: tile bytes never ride an Exchange, and
    polygon geometry (rings / ring-attached candidate lists) never rides
    a BROADCAST exchange (shuffling geometry on the footprint key is the
    intended movement)."""
    import re

    blocks = [b for b in plan.split("\n\n") if b.strip().startswith("(")]
    assert blocks, "formatted plan did not parse into node blocks"
    for b in blocks:
        head = b.strip().splitlines()[0]
        if re.match(r"\(\d+\) BroadcastExchange", head):
            assert "rings#" not in b and "cand_polys#" not in b, head + b
        elif re.match(r"\(\d+\) Exchange", head):
            assert "bytes#" not in b, head + b


def test_drill_100k_polygons_no_driver_collect(spark):
    """Scale path: the drill must handle a 100k-polygon layer with rings
    delivered through the candidate join (``rings="join"``) — no
    driver-side collect() or whole-layer broadcast (the round-1 scale
    ceiling).  Driver memory is bounded by the footprint-candidate table,
    not the polygon count.  The cogrouped huge-layer path must produce
    the same result from a plan with NO rings broadcast at all."""
    from dea_conflux_spark import datagen as dg

    assert not hasattr(drill_op, "_prepared_polys")  # the collect path is gone
    big_grid = dg.GridSpec(G=8, T=1, w=32, h=32)
    big_polys = dg.make_polygons(big_grid, n_small=100_000, n_medium=0,
                                 n_huge=0)
    tiles = dg.tiles_df(spark, big_grid, big_polys)
    polygons = dg.polygons_df(spark, big_polys)
    res = drill_op.drill(tiles, polygons, get_plugin("sum_wet"), big_grid,
                         partial=False, rings="join")
    got_join = (res.toPandas().sort_values(["poly_id", "ts"])
                .reset_index(drop=True))
    n = len(got_join)
    # last-wins rasterisation over a dense overlapping layer: thousands of
    # polygons own pixels, bounded by the total pixel budget
    assert 0 < n <= big_grid.G ** 2 * 32 * 32

    # huge-layer plan shape (VERDICT r2 #1): the cogrouped path over a
    # bucketed tile layout broadcasts NO geometry and shuffles NO bytes —
    # and returns the identical drill result
    spark.sql("DROP TABLE IF EXISTS tiles_100k_bucketed")
    drill_op.write_tiles_bucketed(tiles, "tiles_100k_bucketed", n_buckets=8)
    bt = spark.table("tiles_100k_bucketed")
    cg = drill_op.drill_cogrouped(bt, polygons, get_plugin("sum_wet"),
                                  big_grid, partial=False)
    _assert_no_bytes_exchange_no_rings_broadcast(_fmt_plan(cg))
    got_cg = (cg.toPandas().sort_values(["poly_id", "ts"])
              .reset_index(drop=True))
    pd.testing.assert_frame_equal(got_cg, got_join)


def test_drill_cogrouped_matches_dim_modes(spark, tiles, polygons, grid):
    """The cogrouped execution path (derived keys, with and without time
    bucketing) is bit-identical to the pruned-dimension path."""
    plugin = get_plugin("waterbodies_c3")
    base = (drill_op.drill(tiles, polygons, plugin, grid, rings="dim")
            .toPandas().sort_values(["poly_id", "ts"])
            .reset_index(drop=True))
    for ntb in (1, 2):
        got = (drill_op.drill_cogrouped(tiles, polygons, plugin, grid,
                                        n_time_buckets=ntb)
               .toPandas().sort_values(["poly_id", "ts"])
               .reset_index(drop=True))
        pd.testing.assert_frame_equal(got, base)
    # the fully broadcast-free configuration (salted shuffle-hash cover
    # join feeding the cogroup — the plan a layer too large for ANY
    # broadcast runs) is bit-identical too
    got = (drill_op.drill_cogrouped(tiles, polygons, plugin, grid,
                                    broadcast_cover=False)
           .toPandas().sort_values(["poly_id", "ts"])
           .reset_index(drop=True))
    pd.testing.assert_frame_equal(got, base)


def test_drill_cogrouped_bucketed_tiles_exchange_free(spark, tiles,
                                                      polygons, grid):
    """Over the bucketed (gx, gy, tb) tile layout the cogroup's tile side
    needs no Exchange at all: the only shuffles in the partials plan are
    geometry/metadata (footprint-candidate build + the candidate row
    stream), asserted by scanning every Exchange block for the bytes
    column; the partials themselves equal the default path's."""
    plugin = get_plugin("waterbodies_c3")
    spark.sql("DROP TABLE IF EXISTS tiles_cg_bucketed")
    drill_op.write_tiles_bucketed(tiles, "tiles_cg_bucketed", n_buckets=4)
    bt = spark.table("tiles_cg_bucketed")
    parts = drill_op.drill_partials_cogrouped(bt, polygons, plugin, grid)
    plan = _fmt_plan(parts)
    # round 6: the cogroup UDF moved to the Arrow API (zero-copy tile
    # stacks); the plan node is FlatMapCoGroupsInArrow now
    assert "FlatMapCoGroupsInArrow" in plan
    _assert_no_bytes_exchange_no_rings_broadcast(plan)
    got = (parts.toPandas()
           .sort_values(["poly_id", "image_id"]).reset_index(drop=True))
    exp = (drill_op.drill_partials(tiles, polygons, plugin, grid)
           .toPandas()
           .sort_values(["poly_id", "image_id"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp)


def test_drill_cogrouped_stored_tb_layout_mismatch(spark, tiles, polygons,
                                                   grid):
    """A table written with write_tiles_bucketed(n_time_buckets=4) drilled
    with the default n_time_buckets=1 must still produce every row: the
    candidate replication range is derived from the STORED tb values, not
    from the call argument (a mismatch used to cogroup tiles with tb >= 1
    against an empty candidate side and silently drop them)."""
    plugin = get_plugin("waterbodies_c3")
    spark.sql("DROP TABLE IF EXISTS tiles_cg_tb4")
    drill_op.write_tiles_bucketed(tiles, "tiles_cg_tb4", n_buckets=4,
                                  n_time_buckets=4)
    bt = spark.table("tiles_cg_tb4")
    got = (drill_op.drill_cogrouped(bt, polygons, plugin, grid)  # ntb=1
           .toPandas().sort_values(["poly_id", "ts"])
           .reset_index(drop=True))
    exp = (drill_op.drill(tiles, polygons, plugin, grid, rings="dim")
           .toPandas().sort_values(["poly_id", "ts"])
           .reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp)


def test_rings_join_and_dim_modes_identical(spark, tiles, polygons, grid):
    """The two ring-delivery strategies (candidate-join payload vs pruned
    dimension broadcast) must produce bit-identical drill output."""
    plugin = get_plugin("waterbodies_c3")
    a = (drill_op.drill(tiles, polygons, plugin, grid, rings="join")
         .toPandas().sort_values(["poly_id", "ts"]).reset_index(drop=True))
    b = (drill_op.drill(tiles, polygons, plugin, grid, rings="dim")
         .toPandas().sort_values(["poly_id", "ts"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


def test_mini_drill_fixture_matches_duckdb_oracle(spark):
    """The driver-gate mini fixture (convex polygons -> half-plane SQL)
    agrees with the engine drill row-for-row — the flagship semantics
    checked by a second, independent engine."""
    import duckdb

    from dea_conflux_spark import minidrill

    got = (minidrill.mini_drill(spark, "")
           .toPandas().sort_values(["poly_id", "ts"])
           .reset_index(drop=True))
    exp = (duckdb.connect().execute(minidrill.mini_drill_oracle_sql()).df()
           .sort_values(["poly_id", "ts"]).reset_index(drop=True))
    assert len(got) == 10  # 5 fixture polygons x 2 timesteps
    pd.testing.assert_frame_equal(
        got.astype({"ts": "datetime64[ns]"}),
        exp.astype({"ts": "datetime64[ns]"}))
