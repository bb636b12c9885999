"""Catalog lookup/search and companion-scene join tests."""

import datetime as dt

import pandas as pd

from dea_conflux_spark.operators import catalog
from dea_conflux_spark.operators.tilecells import tile_meta


def test_lookup_and_search(spark, tiles, grid):
    meta = tile_meta(tiles, grid)
    one = catalog.lookup(meta, "t0000_x000_y000").collect()
    assert len(one) == 1
    x0, y0, x1, y1 = grid.extent
    hits = catalog.search(meta, ts_min="2020-01-02",
                          bbox=(x0, y0, x0 + 1, y0 + 1), limit=5)
    rows = hits.collect()
    assert 1 <= len(rows) <= 5
    assert all(r.gx == 0 and r.gy == 0 for r in rows)


def test_companion_join_same_instant(spark, tiles, grid):
    meta = tile_meta(tiles, grid)
    got = catalog.companion_join(meta, meta, tolerance_s=0).toPandas()
    # every scene's nearest companion at tolerance 0 is itself
    assert (got["primary_id"] == got["companion_id"]).all()
    assert len(got) == meta.count()


def test_companion_join_nearest_within_window(spark, tiles, grid):
    meta = tile_meta(tiles, grid)
    primary = meta.filter("ts_idx = 1")
    companion = meta.filter("ts_idx != 1")  # +/- 1 day neighbours
    got = catalog.companion_join(primary, companion,
                                 tolerance_s=86400 * 2).toPandas()
    assert len(got) == primary.count()
    deltas = (pd.to_datetime(got["c_ts"]) - pd.to_datetime(got["p_ts"])).abs()
    assert (deltas == pd.Timedelta(days=1)).all()
    # deterministic tie-break: |dt| equal for t0 and t2 -> smaller image_id
    assert got["companion_id"].str.startswith("t0000").all()
