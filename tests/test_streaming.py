"""Structured-streaming surface: NRT incremental drill (foreachBatch) and
windowed counts, driven to completion with availableNow triggers."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

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


def test_dedup_docs_stream_first_arrival_wins(spark, tmp_path):
    """Two waves of documents land in the stream source; wave 2 repeats
    half of wave 1's content under new doc_ids.  The accepted corpus
    holds each fingerprint exactly once, keeping the FIRST-arrived
    (min-id within a batch, earlier-epoch across batches); re-running
    the drained stream with the same checkpoint is a no-op."""
    import pandas as pd
    from pyspark.sql import functions as F

    src = str(tmp_path / "docs_src")
    out = str(tmp_path / "docs_out")
    ckpt = str(tmp_path / "ckpt")
    schema = incremental.DOC_SCHEMA

    def wave(ids_texts, name):
        pdf = pd.DataFrame(
            [(i, t, "en", "s", len(t)) for i, t in ids_texts],
            columns=["doc_id", "text", "lang", "source", "n_chars"])
        (spark.createDataFrame(pdf, schema)
         .coalesce(1).write.mode("append").parquet(src))

    wave([(1, "alpha beta gamma"), (2, "delta epsilon zeta"),
          (3, "alpha beta gamma")], "w1")  # 3 an in-batch dup of 1
    q = incremental.dedup_docs_stream(spark, src, out, ckpt)
    q.awaitTermination(120)

    wave([(10, "alpha beta gamma!!!"),  # normalises equal to doc 1
          (11, "brand new content here")], "w2")
    q = incremental.dedup_docs_stream(spark, src, out, ckpt)
    q.awaitTermination(120)

    got = (spark.read.parquet(out)
           .select("doc_id", "fp").toPandas().sort_values("doc_id"))
    # fingerprints unique; doc 1 beat 3 (in-batch) and 10 (cross-batch)
    assert got["fp"].is_unique
    assert set(got["doc_id"]) == {1, 2, 11}
    # drained re-run with same checkpoint: no change
    q = incremental.dedup_docs_stream(spark, src, out, ckpt)
    q.awaitTermination(120)
    again = spark.read.parquet(out).select("doc_id").toPandas()
    assert sorted(again["doc_id"]) == [1, 2, 11]


def _doc_wave(spark, src, ids_texts):
    import pandas as pd

    pdf = pd.DataFrame(
        [(i, t, "en", "s", len(t)) for i, t in ids_texts],
        columns=["doc_id", "text", "lang", "source", "n_chars"])
    (spark.createDataFrame(pdf, incremental.DOC_SCHEMA)
     .coalesce(1).write.mode("append").parquet(src))


def test_dedup_docs_stream_novelty_from_ledger_not_output(spark, tmp_path):
    """The cross-batch novelty check must read ONLY the fingerprint
    ledger, never the accumulated corpus output: archive the output dir
    between waves (ledger + checkpoint intact) and a wave-2 duplicate of
    wave-1 content is still suppressed."""
    import shutil

    src = str(tmp_path / "docs_src")
    out = str(tmp_path / "docs_out")
    ckpt = str(tmp_path / "ckpt")

    _doc_wave(spark, src, [(1, "seen this text"), (2, "other text")])
    q = incremental.dedup_docs_stream(spark, src, out, ckpt)
    q.awaitTermination(120)

    # the accepted corpus moves away (e.g. archived to cold storage);
    # per-batch cost must not depend on it being readable
    shutil.move(out, out + "_archived")
    assert os.path.isdir(incremental.fp_ledger_dir(out))

    _doc_wave(spark, src, [(10, "seen this text"),  # dup of doc 1
                           (11, "fresh content")])
    q = incremental.dedup_docs_stream(spark, src, out, ckpt)
    q.awaitTermination(120)

    got = spark.read.parquet(out).select("doc_id").toPandas()
    assert sorted(got["doc_id"]) == [11]  # dup suppressed by ledger alone
    # ledger rows are fp-only (no document payload ever re-scanned)
    led = spark.read.parquet(incremental.fp_ledger_dir(out))
    assert set(led.columns) == {"fp", "epoch"}


def test_compact_fp_ledger_keeps_dedup_and_bounds_partitions(spark,
                                                            tmp_path):
    """Compaction collapses the ledger to one epoch=-1 base partition
    (file count O(1), not O(epochs)) and later waves still dedup against
    it."""
    src = str(tmp_path / "docs_src")
    out = str(tmp_path / "docs_out")
    ckpt = str(tmp_path / "ckpt")

    _doc_wave(spark, src, [(1, "aaa bbb"), (2, "ccc ddd")])
    q = incremental.dedup_docs_stream(spark, src, out, ckpt)
    q.awaitTermination(120)
    _doc_wave(spark, src, [(3, "eee fff")])
    q = incremental.dedup_docs_stream(spark, src, out, ckpt)
    q.awaitTermination(120)

    n = incremental.compact_fp_ledger(spark, out)
    assert n == 3
    ldir = incremental.fp_ledger_dir(out)
    parts = [d for d in os.listdir(ldir) if d.startswith("epoch=")]
    assert parts == ["epoch=-1"]

    _doc_wave(spark, src, [(20, "aaa bbb!"),  # normalises equal to doc 1
                           (21, "new after compaction")])
    q = incremental.dedup_docs_stream(spark, src, out, ckpt)
    q.awaitTermination(120)
    got = spark.read.parquet(out).select("doc_id").toPandas()
    assert sorted(got["doc_id"]) == [1, 2, 3, 21]


def test_dedup_docs_stream_bootstraps_ledger_from_output(spark, tmp_path):
    """Upgrade path: an out_dir accepted by a pre-ledger scheme exists but
    the fp ledger does not.  The first post-upgrade batch must bootstrap
    the ledger from the output's fp column instead of treating the stream
    as brand new — otherwise duplicates of every pre-upgrade doc are
    silently re-accepted."""
    import shutil

    src = str(tmp_path / "docs_src")
    out = str(tmp_path / "docs_out")
    ckpt = str(tmp_path / "ckpt")

    _doc_wave(spark, src, [(1, "legacy text one"), (2, "legacy text two")])
    q = incremental.dedup_docs_stream(spark, src, out, ckpt)
    q.awaitTermination(120)
    # simulate the pre-upgrade deployment: accepted output, no fp ledger
    shutil.rmtree(incremental.fp_ledger_dir(out))

    _doc_wave(spark, src, [(10, "legacy text one"),  # dup of doc 1
                           (11, "post upgrade fresh")])
    q = incremental.dedup_docs_stream(spark, src, out, ckpt)
    q.awaitTermination(120)

    got = spark.read.parquet(out).select("doc_id").toPandas()
    assert sorted(got["doc_id"]) == [1, 2, 11]
    # the bootstrap left a real ledger behind (epoch=-1 base partition)
    led = spark.read.parquet(incremental.fp_ledger_dir(out))
    assert led.filter("epoch = -1").count() >= 2


def test_compact_fp_ledger_crash_windows_are_recoverable(spark, tmp_path):
    """The compaction swap is resumable across every crash window: the
    worst one (old ledger moved aside, compacted replacement not yet
    moved in) is repaired both by the next compact call and by the next
    micro-batch, with no fingerprint loss."""
    import os as _os
    import shutil

    src = str(tmp_path / "docs_src")
    out = str(tmp_path / "docs_out")
    ckpt = str(tmp_path / "ckpt")

    _doc_wave(spark, src, [(1, "crash aaa"), (2, "crash bbb")])
    q = incremental.dedup_docs_stream(spark, src, out, ckpt)
    q.awaitTermination(120)

    ledger = incremental.fp_ledger_dir(out)
    tmp = incremental._compact_tmp_dir(ledger)
    # reproduce the mid-swap crash state: compacted data fully written,
    # old ledger renamed away, replacement rename never happened
    fps = (spark.read.parquet(ledger).select("fp").distinct()
           .withColumn("epoch", F.lit(-1).cast("long")))
    fps.write.mode("overwrite").partitionBy("epoch").parquet(tmp)
    shutil.move(ledger, ledger + "__compact_old")

    # a batch arriving in this state repairs the swap and still dedups
    _doc_wave(spark, src, [(10, "crash aaa"), (11, "post crash new")])
    q = incremental.dedup_docs_stream(spark, src, out, ckpt)
    q.awaitTermination(120)
    got = spark.read.parquet(out).select("doc_id").toPandas()
    assert sorted(got["doc_id"]) == [1, 2, 11]
    assert _os.path.isdir(ledger) and not _os.path.isdir(tmp)

    # and a straight compact call on the repaired state works
    assert incremental.compact_fp_ledger(spark, out) == 3
