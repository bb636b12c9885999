"""Time-series stacking: dedup, WIT normalisation, rounding, sinks.

Spark re-expression of the reference's ``stack`` entry point
(reference stack.py:737-779): instead of per-polygon pandas loops under
thread pools, one DataFrame job reads every drill output at once, windows
per polygon, and writes partitioned output — one shuffle total.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def dedup_timeseries(df: DataFrame, key: str = "poly_id",
                     ts_col: str = "ts",
                     quality_col: str = "pc_missing") -> DataFrame:
    """Quality-based day-dedup (reference stack.py:174-205):

    1. per (polygon, UTC day) keep the observation with the lowest
       ``pc_missing`` (ranking window — the reference's sort +
       drop_duplicates(DAY, keep='first')),
    2. then drop any surviving row whose successor (next surviving row in
       time order for the same polygon) is less than 60 s later — the
       midnight-wrap duplicate rule (reference shift(-1) < 60 s drops the
       EARLIER row).

    Ties on quality break deterministically by ``ts``.

    One exchange for both windows (and for the per-polygon sink write
    that follows in the stack paths): rows are hash-partitioned on
    ``key`` up front, which satisfies window 1's (key, day) clustering
    (hash on a subset of the keys), window 2's key clustering, AND the
    sink's ``repartition(key)`` — the previous plan paid an exchange per
    window plus the sink's.
    """
    par = df.sparkSession.sparkContext.defaultParallelism
    df = df.repartition(max(8, 2 * par), key)
    day = F.date_format(F.col(ts_col), "yyyy-MM-dd")
    w1 = W.partitionBy(key, day.alias("day")).orderBy(
        F.col(quality_col).asc_nulls_last(), F.col(ts_col).asc())
    ranked = df.withColumn("_rn", F.row_number().over(w1)).filter(
        F.col("_rn") == 1).drop("_rn")
    w2 = W.partitionBy(key).orderBy(F.col(ts_col).asc())
    nxt = F.lead(F.col(ts_col)).over(w2)
    keep = nxt.isNull() | (
        nxt.cast("double") - F.col(ts_col).cast("double") >= 60.0)
    return ranked.withColumn("_keep", keep).filter("_keep").drop("_keep")


def wit_normalise(df: DataFrame) -> DataFrame:
    """WIT vegetation normalisation (reference stack.py:254-286):
    ``veg_areas = 1 - water - wet``; ``norm_b = b / (pv+npv+bs) * veg_areas``
    for b in (pv, npv, bs), guarded when the denominator is zero (then
    ``norm_b = b`` unchanged)."""
    veg_areas = F.lit(1.0) - F.col("water") - F.col("wet")
    total = F.col("pv") + F.col("npv") + F.col("bs")
    out = df
    for band in ("pv", "npv", "bs"):
        out = out.withColumn(
            f"norm_{band}",
            F.when(total != 0, F.col(band) / total * veg_areas)
            .otherwise(F.col(band)))
    return out


def round_metrics(df: DataFrame, cols, precision: int = 4) -> DataFrame:
    """Delivery precision reduction (reference stack.py:340-357, default
    --precision 4)."""
    out = df
    for c in cols:
        out = out.withColumn(c, F.round(F.col(c), precision))
    return out


def stack_waterbodies(drill_df: DataFrame, out_dir: str,
                      dedup: bool = True) -> None:
    """Per-polygon time-series sink (reference stack.py:441-489): partition
    the observations by polygon id and write time-sorted CSV — the
    ``{uid[:4]}/{uid}.csv`` layout becomes ``poly_id=<uid>/`` Hive
    partitions."""
    df = dedup_timeseries(drill_df) if dedup else drill_df
    (df.repartition("poly_id")
       .sortWithinPartitions("poly_id", "ts")
       .write.mode("overwrite").partitionBy("poly_id")
       .option("header", True).csv(out_dir))


WIT_STACK_COLS = ["water", "wet", "pv", "npv", "bs", "pc_missing",
                  "norm_pv", "norm_npv", "norm_bs"]


def stack_wit(drill_df: DataFrame, out_dir: str,
              dedup: bool = True) -> DataFrame:
    """WIT stacking (reference stack.py:367-439 ``stack_wit_tooling`` +
    save_df_as_csv:228-291): quality day-dedup (same 60 s midnight-wrap
    rule as waterbodies, reference stack.py:174-205), then the WIT
    vegetation normalisation, then one time-sorted CSV partition per
    polygon — the reference's ``{feature_id}.csv`` files become
    ``poly_id=<uid>/`` Hive partitions written by ONE distributed job
    instead of a thread pool over per-polygon pandas frames.

    Returns the stacked DataFrame (also written to ``out_dir``)."""
    df = dedup_timeseries(drill_df) if dedup else drill_df
    df = wit_normalise(df)
    out = df.select("poly_id", "ts", *WIT_STACK_COLS)
    (out.repartition("poly_id")
        .sortWithinPartitions("poly_id", "ts")
        .write.mode("overwrite").partitionBy("poly_id")
        .option("header", True).csv(out_dir))
    return out


def observations_fact(drill_df: DataFrame) -> DataFrame:
    """The observations fact table (reference db.py:70-84 schema):
    (poly_id, px_wet, pc_wet, pc_missing, platform, ts).  Surrogate int
    keys are deliberately dropped — Spark joins on the natural key."""
    return drill_df.select(
        "poly_id", "px_wet", "pc_wet", "pc_missing",
        F.lit("ls").alias("platform"), "ts")


def waterbodies_dim(polygons: DataFrame) -> DataFrame:
    """The waterbodies dimension (reference db.py:58-67): centroid lat/lon
    decoded from the geohash polygon id (reference stack.py:497-499) via a
    vectorized batch UDF over the small dim table."""
    import pandas as pd

    from ..core.geom import geohash_decode

    def dec(batches):
        for pdf in batches:
            lat, lon = [], []
            for pid in pdf["poly_id"]:
                la, lo = geohash_decode(pid.rstrip("x"))
                lat.append(la)
                lon.append(lo)
            yield pd.DataFrame({
                "poly_id": pdf["poly_id"], "wb_name": pdf["poly_id"],
                "centroid_lat": lat, "centroid_lon": lon})

    return polygons.select("poly_id").mapInPandas(
        dec, schema=("poly_id string, wb_name string, centroid_lat double, "
                     "centroid_lon double"))


def db_to_csv(observations: DataFrame, out_dir: str, split_num: int = 1,
              index_num: int = 0, dedup: bool = True) -> DataFrame:
    """Sharded observations -> per-polygon CSV export (reference
    stack.py:595-734 ``stack_waterbodies_db_to_csv``): the waterbody id
    list is split into ``split_num`` contiguous chunks (np.array_split
    semantics, reference stack.py:723 — ntile over the ordered id dim)
    and only chunk ``index_num`` is exported, one time-sorted CSV
    partition per polygon under the reference's ``{uid[:4]}/{uid}``
    prefix layout (stack.py:702-706).

    The ntile window runs on the distinct-id DIM table only (single
    partition of polygon ids, never the fact rows), then a broadcast
    semi-join prunes the observations — shard selection costs one pass
    over ids, not a shuffle of observations.

    Returns the selected id frame (for callers orchestrating shards)."""
    ids = observations.select("poly_id").distinct()
    chunk = ids.withColumn(
        "_chunk", F.ntile(split_num).over(W.orderBy("poly_id")) - 1)
    sel = chunk.filter(F.col("_chunk") == index_num).select("poly_id")
    obs = observations.join(F.broadcast(sel), "poly_id", "left_semi")
    if dedup:
        obs = dedup_timeseries(obs)
    out = obs.withColumn("uid4", F.substring("poly_id", 1, 4))
    (out.repartition("poly_id")
        .sortWithinPartitions("poly_id", "ts")
        .write.mode("overwrite").partitionBy("uid4", "poly_id")
        .option("header", True).csv(out_dir))
    return sel


def jdbc_write_observations(df: DataFrame, url: str,
                            table: str = "waterbody_observations",
                            mode: str = "append",
                            properties: dict | None = None) -> None:
    """JDBC observations sink (reference stack.py:509-592
    ``stack_waterbodies_db`` + db.py:87-96 engine wiring): one distributed
    ``write.jdbc`` instead of per-row SQLAlchemy sessions.

    Exercised end-to-end in tests against embedded Apache Derby
    (``jdbc:derby:<path>;create=true`` with
    ``org.apache.derby.jdbc.EmbeddedDriver`` — Spark bundles the Derby
    jars for its Hive metastore, so the write path moves real rows with
    no extra dependencies); production deployments point the same call at
    PostgreSQL (the reference's target) by swapping url + driver."""
    df.write.jdbc(url=url, table=table, mode=mode,
                  properties=properties or {})


def single_file_delivery(df: DataFrame, out_dir: str, metric_cols,
                         precision: int = 4) -> None:
    """Single-file delivery sink (reference stack.py:295-364): round and
    coalesce to one CSV + one parquet."""
    out = round_metrics(df, metric_cols, precision).coalesce(1)
    out.write.mode("overwrite").option("header", True).csv(f"{out_dir}/csv")
    out.write.mode("overwrite").parquet(f"{out_dir}/pq")
