"""Checkpoint ledger, quarantine, and lineage/metrics tables.

The reference's ops surface — SQS work queue + visibility timeout +
dead-letter queue + existence-probe skip (reference queues.py:12-37,
__main__.py:922-1019, io.py:103-143) — collapses into three small tables:

* **ledger** — completed ``image_id``s; resuming a run anti-joins the work
  list against it (idempotent, kill-safe: the ledger row is appended only
  after the partition's output commit).
* **quarantine** — rows that failed validation (undecodable bytes, phash or
  caption mismatch), the dead-letter-queue parity; the drill simply never
  sees them (semi-join on the validated set).
* **lineage** — per-(image_id) drill metrics (candidate polygons, pixels
  assigned) appended per run, the reference's per-run progress logging
  (drill.py:524-552) made queryable.
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..core import codec


def validate_tiles(tiles: DataFrame) -> DataFrame:
    """(image_id, ok, error) — decode + integrity check per tile.

    A tile is valid iff its bytes decode to (h, w), the stored ``phash``
    matches the decoded pixels, and the caption embeds the image_id
    (the per-row caption-equality invariant from BASELINE.json input_hint).
    Errors are captured per row, not raised — the reference's
    warnings-as-errors policy (drill.py:652-655) routed to data instead of
    exceptions.
    """

    def run(batches):
        for pdf in batches:
            ids, oks, errs = [], [], []
            for row in pdf.itertuples():
                err = None
                try:
                    arr = codec.decode(row.bytes, int(row.h), int(row.w),
                                       row.fmt)
                    if row.fmt == "raw" and codec.phash64(arr) != int(row.phash):
                        err = "phash mismatch"
                    elif row.image_id not in (row.caption or ""):
                        err = "caption mismatch"
                except Exception as e:  # noqa: BLE001 — route to quarantine
                    err = f"{type(e).__name__}: {e}"
                ids.append(row.image_id)
                oks.append(err is None)
                errs.append(err or "")
            yield pd.DataFrame({"image_id": ids, "ok": oks, "error": errs})

    return tiles.mapInPandas(run, schema="image_id string, ok boolean, error string")


def quarantine(tiles: DataFrame) -> DataFrame:
    """Dead-letter rows (reference queues.py:30-37 parity)."""
    v = validate_tiles(tiles)
    return v.filter(~F.col("ok")).select("image_id", "error")


def valid_tiles(tiles: DataFrame) -> DataFrame:
    v = validate_tiles(tiles).filter("ok").select("image_id")
    return tiles.join(v, "image_id", "left_semi")


class Ledger:
    """Parquet-backed completed-work ledger (reference io.py:103-143
    existence probe, as an anti-join instead of per-file S3 HEADs).

    Rows carry the ``batch`` that completed them; ``next_batch_id`` is
    max(batch)+1, so a run that crashed AFTER writing output but BEFORE
    ``mark_done`` reuses the same batch id on retry — output keyed by
    batch id can dynamically overwrite itself instead of duplicating."""

    def __init__(self, spark, path: str):
        self.spark = spark
        self.path = path

    def _df(self) -> DataFrame:
        if not os.path.exists(self.path):
            return self.spark.createDataFrame(
                [], "image_id string, batch int")
        return self.spark.read.parquet(self.path)

    def completed(self) -> DataFrame:
        return self._df().select("image_id").distinct()

    def next_batch_id(self) -> int:
        df = self._df()
        if "batch" not in df.columns:
            # ledger written by a pre-batch schema version: resume as batch 0
            return 0
        row = df.agg(F.max("batch").alias("m")).first()
        return 0 if row["m"] is None else int(row["m"]) + 1

    def remaining(self, tiles: DataFrame) -> DataFrame:
        """Work not yet done — left-anti against the ledger (SURVEY.md A10)."""
        return tiles.join(self.completed(), "image_id", "left_anti")

    def mark_done(self, image_ids: DataFrame, batch: int = 0) -> None:
        (image_ids.select("image_id").distinct()
         .withColumn("batch", F.lit(batch).cast("int"))
         .write.mode("append").parquet(self.path))


def migrate_legacy_lineage(spark, lineage_dir: str) -> int:
    """Upgrade a lineage directory written by the pre-partitioned layout
    (flat ``*.parquet`` files at the root with ``batch`` as a DATA column)
    to the current ``batch=<id>/`` partitioned layout.

    Spark's partition discovery on a MIXED layout (root data files next to
    ``batch=N`` subdirectories) drops or conflicts on the batch column, so
    a resumed run that spans the layout upgrade would break its lineage
    reads.  Each legacy root file is re-written under its batch partition
    (missing batch column -> batch 0) and then removed; already-partitioned
    subdirectories are left untouched.  Idempotent; returns the number of
    legacy files migrated.

    Resumable across crashes at every point: the migrated copy is fully
    written (``_SUCCESS``) to a sibling temp dir before any legacy file
    is removed, and a re-run that finds a COMPLETE temp dir first
    finishes the pending remove+move (the temp copy covers every legacy
    root file that still exists) instead of re-reading the root — so no
    crash window can strand legacy rows in the orphaned temp dir."""
    import shutil

    if not os.path.isdir(lineage_dir):
        return 0
    tmp = lineage_dir.rstrip("/") + "__legacy_migration"

    def flat_files():
        return [os.path.join(lineage_dir, f)
                for f in os.listdir(lineage_dir)
                if f.endswith(".parquet")
                and os.path.isfile(os.path.join(lineage_dir, f))]

    def finish_move(flat):
        # legacy root files are a subset of what tmp holds (tmp was
        # completely written before the first remove) — drop them, then
        # move/merge tmp's batch=<id> dirs next to post-upgrade ones
        for f in flat:
            os.remove(f)
        for name in os.listdir(tmp):
            if name.startswith("batch="):
                dst = os.path.join(lineage_dir, name)
                if os.path.exists(dst):  # collision: merge files into dst
                    for part in os.listdir(os.path.join(tmp, name)):
                        if part.endswith(".parquet"):
                            os.rename(os.path.join(tmp, name, part),
                                      os.path.join(dst, part))
                else:
                    os.rename(os.path.join(tmp, name), dst)
        shutil.rmtree(tmp, ignore_errors=True)

    if os.path.exists(os.path.join(tmp, "_SUCCESS")):
        # a prior migration crashed after its temp write committed:
        # complete the pending remove+move before looking at the root
        flat = flat_files()
        finish_move(flat)
        return len(flat)

    flat = flat_files()
    if not flat:
        shutil.rmtree(tmp, ignore_errors=True)  # incomplete stale attempt
        return 0
    legacy = spark.read.parquet(*flat)
    if "batch" not in legacy.columns:
        legacy = legacy.withColumn("batch", F.lit(0).cast("int"))
    shutil.rmtree(tmp, ignore_errors=True)
    legacy.write.mode("overwrite").partitionBy("batch").parquet(tmp)
    finish_move(flat)
    return len(flat)


def lineage_metrics(partials: DataFrame) -> DataFrame:
    """Per-tile drill lineage from the partial rows: how many polygons and
    pixels each tile contributed (reference's per-scene found-polygon
    logging, drill.py:598, as a table)."""
    agg = [F.countDistinct("poly_id").alias("n_polys")]
    if "n_px" in partials.columns:
        agg.append(F.sum("n_px").alias("n_px_assigned"))
    return partials.groupBy("image_id").agg(*agg)


def run_drill_resumable(tiles: DataFrame, polygons: DataFrame, plugin, grid,
                        out_dir: str, ledger_path: str,
                        batch_partitions: int | None = None) -> int:
    """Checkpoint-resumable drill run (FIXTURES.md invariant 6).

    Drills only tiles absent from the ledger, writes partial-aggregate
    output under a ``batch=<id>`` partition, then appends the processed
    ids (with the batch id) to the ledger.  Kill-safety at every point:

    * crash BEFORE the output commit — nothing written, rerun redoes the
      batch under the same id;
    * crash AFTER the output commit but BEFORE ``mark_done`` — the rerun
      reuses the same batch id (``next_batch_id`` is derived from the
      ledger, which did not advance) and DYNAMICALLY OVERWRITES that
      batch's partitions, so retried partials replace rather than
      duplicate (no double-counted pixels in the final SUM);
    * crash after ``mark_done`` — the anti-join skips the batch entirely.

    Lineage/metrics rows are computed from THIS batch's partials only and
    written under a ``batch=<id>`` partition with dynamic overwrite —
    O(batch) per increment, and a retried batch replaces (never
    duplicates) its own lineage rows.

    Returns the number of tiles drilled this invocation.
    """
    from .drill import drill_partials

    spark = tiles.sparkSession
    led = Ledger(spark, ledger_path)
    todo = led.remaining(tiles)
    n = todo.count()
    if n == 0:
        return 0
    batch_id = led.next_batch_id()
    parts = drill_partials(todo, polygons, plugin, grid)
    parts = (parts.withColumn("day", F.date_format("ts", "yyyyMMdd"))
             .withColumn("batch", F.lit(batch_id).cast("int")))
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode",
                          "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (parts.write.mode("overwrite").partitionBy("batch", "day")
         .parquet(out_dir))
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    # per-batch lineage/metrics rows (north rule: lineage + metrics
    # tables) — computed from the just-committed batch partition only
    # (partition-pruned read).  Written with the SAME batch-keyed dynamic
    # partition overwrite as the partials: a crash between this write and
    # ``mark_done`` reuses the batch id on retry and REPLACES the batch's
    # lineage partition instead of appending it twice (the retry-duplicate
    # gap a plain append would leave).
    batch_parts = spark.read.parquet(out_dir).filter(
        F.col("batch") == batch_id)
    lineage = (lineage_metrics(batch_parts)
               .withColumn("run_plugin", F.lit(plugin.name))
               .withColumn("batch", F.lit(batch_id).cast("int")))
    # back-compat: a lineage dir written by the old flat (append) layout
    # must be re-partitioned before the first batch=keyed write lands next
    # to it (same upgrade guard as next_batch_id's schema check)
    migrate_legacy_lineage(spark, out_dir + "_lineage")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (lineage.write.mode("overwrite").partitionBy("batch")
         .parquet(out_dir + "_lineage"))
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    led.mark_done(todo.select("image_id"), batch_id)
    return n


def finalize_drill(spark, out_dir: str, plugin) -> DataFrame:
    """Final combine over accumulated partials (safe to run any time).

    ``dropDuplicates`` on the (poly_id, image_id) grain makes the combine
    idempotent even if an interrupted batch left duplicate partial rows
    (partials are deterministic per tile, so duplicates are identical)."""
    parts = spark.read.parquet(out_dir)
    return (parts.dropDuplicates(["poly_id", "image_id"])
            .groupBy("poly_id", "ts").agg(*plugin.final_aggs()))
