"""Screening filters, validation/quarantine, and checkpoint-resume tests."""

import os

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from dea_conflux_spark import datagen, oracle
from dea_conflux_spark.operators import drill as drill_op
from dea_conflux_spark.operators import filters, ledger
from dea_conflux_spark.operators.cover import polygon_cover_df
from dea_conflux_spark.plugins import get_plugin


def test_quick_filter(spark, polygons, grid):
    x0, y0, x1, y1 = grid.extent
    inside = filters.quick_filter(polygons, x0, y0, x1, y1).toPandas()
    allp = polygons.toPandas()
    exp = allp[(allp.cx >= x0) & (allp.cx <= x1)
               & (allp.cy >= y0) & (allp.cy <= y1)]
    assert set(inside.poly_id) == set(exp.poly_id)


def test_bbox_filter_excludes_outside(spark, polygons, polys, grid):
    x0, y0, x1, y1 = grid.extent
    kept = filters.bbox_intersects_filter(polygons, x0, y0, x1, y1).toPandas()
    out_pid = next(p for p in polys if p["kind"] == "outside")["poly_id"]
    assert out_pid not in set(kept.poly_id)


def test_overedge_interior_filter(spark, polygons, grid):
    x0, y0, x1, y1 = grid.extent
    kept = filters.overedge_interior_filter(polygons, x0, y0, x1, y1)
    w, h = x1 - x0, y1 - y0
    pdf = kept.toPandas()
    assert (pdf.xmin > x0 - w).all() and (pdf.xmax < x1 + w).all()


def test_screen_tiles_no_false_negatives(spark, tiles, polygons, grid, polys):
    poly_cells = polygon_cover_df(polygons)
    kept = set(r.image_id for r in
               filters.screen_tiles(tiles, poly_cells, grid)
               .select("image_id").collect())
    assigned = oracle.oracle_assignments(grid, polys)
    for r in assigned.itertuples():
        for t in range(grid.T):
            iid = datagen.image_id(t, r.gx, r.gy)
            assert iid in kept, f"screen dropped a tile with pixels: {iid}"


def test_validate_and_quarantine(spark, tiles_pdf):
    bad = tiles_pdf.copy()
    # corrupt one row's phash and another's caption
    bad.loc[0, "phash"] = np.int64(12345)
    bad.loc[1, "caption"] = "wrong"
    df = spark.createDataFrame(bad, schema=datagen.TILE_SCHEMA)
    q = ledger.quarantine(df).toPandas()
    assert set(q["image_id"]) == {bad.loc[0, "image_id"], bad.loc[1, "image_id"]}
    ok = ledger.valid_tiles(df)
    assert ok.count() == len(bad) - 2


def test_resumable_drill_converges(spark, tiles, polygons, grid, polys,
                                   tiles_pdf, tmp_path):
    """FIXTURES.md invariant 6: a run killed after a partial write converges
    to identical output on rerun."""
    plugin = get_plugin("waterbodies_c3")
    out = str(tmp_path / "partials")
    led = str(tmp_path / "ledger")

    # simulate a partial (killed) run: only half the tiles
    half_ids = sorted(tiles_pdf["image_id"])[: len(tiles_pdf) // 2]
    half = tiles.filter(F.col("image_id").isin(half_ids))
    n1 = ledger.run_drill_resumable(half, polygons, plugin, grid, out, led)
    assert n1 == len(half_ids)

    # resume with the full work list: only the remainder is drilled
    n2 = ledger.run_drill_resumable(tiles, polygons, plugin, grid, out, led)
    assert n2 == tiles.count() - n1

    # third run: nothing left
    assert ledger.run_drill_resumable(tiles, polygons, plugin, grid, out, led) == 0

    final = ledger.finalize_drill(spark, out, plugin).toPandas()
    exp = oracle.oracle_drill(grid, polys, tiles_pdf, plugin, partial=False)
    final = final.sort_values(["poly_id", "ts"]).reset_index(drop=True)
    exp = exp.sort_values(["poly_id", "ts"]).reset_index(drop=True)
    assert list(final["poly_id"]) == list(exp["poly_id"])
    np.testing.assert_allclose(final["px_wet"], exp["px_wet"], equal_nan=True)
    np.testing.assert_allclose(final["pc_missing"], exp["pc_missing"],
                               equal_nan=True)


def test_lineage_metrics(spark, tiles, polygons, grid):
    plugin = get_plugin("waterbodies_c3")
    parts = drill_op.drill_partials(tiles, polygons, plugin, grid)
    lin = ledger.lineage_metrics(parts).toPandas()
    assert (lin["n_polys"] >= 1).all()
    assert (lin["n_px_assigned"] > 0).all()


def test_resumable_drill_crash_after_write_no_double_count(
        spark, tiles, polygons, grid, polys, tiles_pdf, tmp_path,
        monkeypatch):
    """ADVICE round-1: a crash AFTER the partials commit but BEFORE
    mark_done must not double-count on retry — the retried batch reuses
    the same batch id and dynamically overwrites its own partitions."""
    plugin = get_plugin("waterbodies_c3")
    out = str(tmp_path / "partials")
    led = str(tmp_path / "ledger")

    # crash injection: first mark_done dies after the output commit
    real_mark_done = ledger.Ledger.mark_done
    calls = {"n": 0}

    def dying_mark_done(self, image_ids, batch=0):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("simulated crash before ledger append")
        return real_mark_done(self, image_ids, batch)

    monkeypatch.setattr(ledger.Ledger, "mark_done", dying_mark_done)
    with pytest.raises(RuntimeError, match="simulated crash"):
        ledger.run_drill_resumable(tiles, polygons, plugin, grid, out, led)
    # retry: ledger did not advance -> same batch id -> overwrite, not dup
    n = ledger.run_drill_resumable(tiles, polygons, plugin, grid, out, led)
    assert n == tiles.count()

    final = ledger.finalize_drill(spark, out, plugin).toPandas()
    exp = oracle.oracle_drill(grid, polys, tiles_pdf, plugin, partial=False)
    final = final.sort_values(["poly_id", "ts"]).reset_index(drop=True)
    exp = exp.sort_values(["poly_id", "ts"]).reset_index(drop=True)
    assert list(final["poly_id"]) == list(exp["poly_id"])
    np.testing.assert_allclose(final["px_wet"], exp["px_wet"],
                               equal_nan=True)
    # and the raw partials hold no duplicate (poly, tile) rows
    parts = spark.read.parquet(out)
    assert parts.count() == parts.dropDuplicates(
        ["poly_id", "image_id"]).count()


def test_lineage_appends_incrementally(spark, tiles, polygons, grid,
                                       tiles_pdf, tmp_path):
    """VERDICT round-1 #10: lineage rows are computed from each batch's
    partials only and appended — two batches yield per-batch lineage whose
    union covers exactly the drilled tiles."""
    plugin = get_plugin("waterbodies_c3")
    out = str(tmp_path / "partials")
    led = str(tmp_path / "ledger")
    half_ids = sorted(tiles_pdf["image_id"])[: len(tiles_pdf) // 2]
    half = tiles.filter(F.col("image_id").isin(half_ids))

    ledger.run_drill_resumable(half, polygons, plugin, grid, out, led)
    lin1 = spark.read.parquet(out + "_lineage").toPandas()
    assert set(lin1["batch"]) == {0}
    n_batch1 = len(lin1)

    ledger.run_drill_resumable(tiles, polygons, plugin, grid, out, led)
    lin2 = spark.read.parquet(out + "_lineage").toPandas()
    assert set(lin2["batch"]) == {0, 1}
    # batch-0 rows untouched (append, not a full-history rewrite)
    assert len(lin2[lin2["batch"] == 0]) == n_batch1
    # batch-1 lineage covers only batch-1 tiles
    b1_tiles = set(lin2[lin2["batch"] == 1]["image_id"])
    assert b1_tiles.isdisjoint(set(lin1["image_id"]))


def test_lineage_not_duplicated_on_crash_retry(spark, tiles, polygons, grid,
                                               tmp_path, monkeypatch):
    """ADVICE round-2: a crash BETWEEN the lineage write and mark_done must
    not leave duplicate lineage rows — the retried batch dynamically
    overwrites its own batch=<id> lineage partition."""
    plugin = get_plugin("waterbodies_c3")
    out = str(tmp_path / "partials")
    led = str(tmp_path / "ledger")

    real_mark_done = ledger.Ledger.mark_done
    calls = {"n": 0}

    def dying_mark_done(self, image_ids, batch=0):
        calls["n"] += 1
        if calls["n"] == 1:
            # lineage for the batch is already on disk at this point
            raise RuntimeError("simulated crash after lineage write")
        return real_mark_done(self, image_ids, batch)

    monkeypatch.setattr(ledger.Ledger, "mark_done", dying_mark_done)
    with pytest.raises(RuntimeError, match="simulated crash"):
        ledger.run_drill_resumable(tiles, polygons, plugin, grid, out, led)
    lin_crash = spark.read.parquet(out + "_lineage").toPandas()
    assert len(lin_crash) > 0  # the crash happened AFTER the lineage write
    ledger.run_drill_resumable(tiles, polygons, plugin, grid, out, led)
    lin = spark.read.parquet(out + "_lineage").toPandas()
    # retry replaced (not appended) batch 0's lineage: one row per tile
    assert set(lin["batch"]) == {0}
    assert lin["image_id"].is_unique
    assert len(lin) == len(lin_crash)


def test_next_batch_id_pre_batch_schema(spark, tmp_path):
    """ADVICE round-2: a ledger written by the old image_id-only schema
    must resume as batch 0 instead of raising on the missing column."""
    path = str(tmp_path / "old_ledger")
    spark.createDataFrame([("t0000_x000_y000",)], "image_id string") \
        .write.parquet(path)
    led = ledger.Ledger(spark, path)
    assert led.next_batch_id() == 0
    assert led.completed().count() == 1


def test_lineage_legacy_flat_layout_migrated(spark, tiles, polygons, grid,
                                             tiles_pdf, tmp_path):
    """ADVICE round-3: a lineage dir written by the old flat layout (root
    parquet files, batch as a DATA column) is migrated to the batch=<id>
    partitioned layout before the first partitioned write lands next to
    it, so resumed runs that span the upgrade keep readable lineage."""
    plugin = get_plugin("waterbodies_c3")
    out = str(tmp_path / "partials")
    led = str(tmp_path / "ledger")
    ldir = out + "_lineage"
    # fabricate the legacy layout: flat append with batch as data column
    legacy = spark.createDataFrame(
        [("t9999_x999_y999", 3, 42, "waterbodies_c3", 0)],
        "image_id string, n_polys bigint, n_px_assigned bigint, "
        "run_plugin string, batch int")
    legacy.coalesce(1).write.mode("append").parquet(ldir)
    assert any(f.endswith(".parquet") for f in os.listdir(ldir))
    # the legacy run's ledger recorded its tile under batch 0, so the
    # resumed run allocates batch 1 (state consistent with the upgrade)
    ledger.Ledger(spark, led).mark_done(
        spark.createDataFrame([("t9999_x999_y999",)], "image_id string"),
        batch=0)

    half_ids = sorted(tiles_pdf["image_id"])[: len(tiles_pdf) // 2]
    half = tiles.filter(F.col("image_id").isin(half_ids))
    ledger.run_drill_resumable(half, polygons, plugin, grid, out, led)
    # no data files left at the root; discovery sees one clean layout
    assert not any(f.endswith(".parquet") and
                   os.path.isfile(os.path.join(ldir, f))
                   for f in os.listdir(ldir))
    lin = spark.read.parquet(ldir).toPandas()
    assert "batch" in lin.columns
    # the legacy row survived under batch=0 alongside the new batch rows
    assert "t9999_x999_y999" in set(lin["image_id"])
    assert len(lin[lin["image_id"] != "t9999_x999_y999"]) > 0


def test_migrate_legacy_lineage_resumes_across_crash(spark, tmp_path):
    """ADVICE round-4: the legacy-layout migration must be resumable at
    every crash point.  The worst window — temp copy fully written
    (_SUCCESS) but legacy root files not yet removed/moved — previously
    stranded the legacy rows in the orphaned temp dir on re-run."""
    import shutil

    ldir = str(tmp_path / "lineage")
    pdf = pd.DataFrame({"image_id": [f"t{i:04d}_x000_y000"
                                     for i in range(6)],
                        "n_polys": [1] * 6,
                        "batch": [0, 0, 0, 1, 1, 1]})
    # legacy flat layout: root parquet files, batch as a DATA column
    spark.createDataFrame(pdf).coalesce(1).write.mode(
        "append").parquet(ldir)
    for f in os.listdir(ldir):  # flatten Spark's marker files away
        if not f.endswith(".parquet"):
            os.remove(os.path.join(ldir, f))

    # reproduce the crash state: temp copy committed, root untouched
    tmp = ldir + "__legacy_migration"
    spark.read.parquet(ldir).write.mode("overwrite").partitionBy(
        "batch").parquet(tmp)
    assert os.path.exists(os.path.join(tmp, "_SUCCESS"))

    n = ledger.migrate_legacy_lineage(spark, ldir)
    assert n == 1  # the one remaining root file was finished off
    assert not os.path.isdir(tmp)
    got = spark.read.parquet(ldir).toPandas()
    assert len(got) == 6 and got["image_id"].is_unique
    assert sorted(os.listdir(ldir)) == ["batch=0", "batch=1"]

    # an INCOMPLETE temp dir (no _SUCCESS: crash mid-write) is discarded
    # and the normal path re-migrates from the root
    ldir2 = str(tmp_path / "lineage2")
    spark.createDataFrame(pdf).coalesce(1).write.mode(
        "append").parquet(ldir2)
    for f in os.listdir(ldir2):
        if not f.endswith(".parquet"):
            os.remove(os.path.join(ldir2, f))
    tmp2 = ldir2 + "__legacy_migration"
    os.makedirs(os.path.join(tmp2, "batch=0"))  # torn write, no _SUCCESS
    n2 = ledger.migrate_legacy_lineage(spark, ldir2)
    assert n2 == 1
    got2 = spark.read.parquet(ldir2).toPandas()
    assert len(got2) == 6 and got2["image_id"].is_unique
    assert not os.path.isdir(tmp2)
