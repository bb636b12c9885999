"""Structured-streaming surface: NRT incremental drill (foreachBatch) and
windowed counts, driven to completion with availableNow triggers."""

import numpy as np
import pytest

from dea_conflux_spark import oracle
from dea_conflux_spark.operators.ledger import finalize_drill
from dea_conflux_spark.plugins import get_plugin
from dea_conflux_spark.streaming import incremental


@pytest.fixture(scope="module")
def tiles_path(tiles, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("stream_src") / "tiles")
    tiles.write.mode("overwrite").parquet(p)
    return p


def test_nrt_drill_stream_matches_batch(spark, tiles_path, polygons, grid,
                                        polys, tiles_pdf, tmp_path):
    plugin = get_plugin("waterbodies_c3")
    out = str(tmp_path / "parts")
    ckpt = str(tmp_path / "ckpt")
    q = incremental.nrt_drill_stream(spark, tiles_path, polygons, plugin,
                                     grid, out, ckpt)
    q.awaitTermination(120)
    final = finalize_drill(spark, out, plugin).toPandas()
    exp = oracle.oracle_drill(grid, polys, tiles_pdf, plugin, partial=False)
    final = final.sort_values(["poly_id", "ts"]).reset_index(drop=True)
    exp = exp.sort_values(["poly_id", "ts"]).reset_index(drop=True)
    assert list(final["poly_id"]) == list(exp["poly_id"])
    np.testing.assert_allclose(final["px_wet"], exp["px_wet"], equal_nan=True)

    # restart with the same checkpoint: no tile is re-drilled
    n_before = spark.read.parquet(out).count()
    q2 = incremental.nrt_drill_stream(spark, tiles_path, polygons, plugin,
                                      grid, out, ckpt)
    q2.awaitTermination(60)
    assert spark.read.parquet(out).count() == n_before


def test_windowed_tile_counts(spark, tiles_path, grid):
    agg = incremental.windowed_tile_counts(spark, tiles_path)
    q = (agg.writeStream.outputMode("complete").format("memory")
         .queryName("win_counts").trigger(availableNow=True).start())
    q.awaitTermination(60)
    out = spark.sql("select * from win_counts").toPandas()
    assert len(out) == grid.T
    assert (out["n_tiles"] == grid.G * grid.G).all()


def test_nrt_epoch_retry_overwrites_not_appends(spark, tiles_path, polygons,
                                                grid, polys, tiles_pdf,
                                                tmp_path):
    """ADVICE round-1: a retried micro-batch (same epoch ids, e.g. after a
    mid-write failure) must replace its own epoch partitions, not append
    them twice.  Simulated by re-running the stream with a FRESH
    checkpoint over the same source and sink: every epoch re-fires with
    the same ids/data and must dynamically overwrite itself."""
    plugin = get_plugin("waterbodies_c3")
    out = str(tmp_path / "parts")
    q = incremental.nrt_drill_stream(spark, tiles_path, polygons, plugin,
                                     grid, out, str(tmp_path / "ckpt1"))
    q.awaitTermination(120)
    n_first = spark.read.parquet(out).count()
    q2 = incremental.nrt_drill_stream(spark, tiles_path, polygons, plugin,
                                      grid, out, str(tmp_path / "ckpt2"))
    q2.awaitTermination(120)
    parts = spark.read.parquet(out)
    assert parts.count() == n_first  # overwritten, not doubled
    assert parts.count() == parts.dropDuplicates(
        ["poly_id", "image_id"]).count()
    final = finalize_drill(spark, out, plugin).toPandas()
    exp = oracle.oracle_drill(grid, polys, tiles_pdf, plugin, partial=False)
    assert len(final) == len(exp)
