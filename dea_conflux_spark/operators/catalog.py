"""Catalog operators: scene lookup/search and companion-scene joins.

The reference resolves scenes through a live ODC Postgres index
(``dc.index.datasets.get`` reference drill.py:521, ``dc.find_datasets``
drill.py:250-252, hopper.py:17-65); here the catalog is just the tile
metadata DataFrame, so lookups are filters and companion resolution is a
join — Catalyst prunes and pushes everything down.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def lookup(meta: DataFrame, image_ids) -> DataFrame:
    """A4: scene metadata by id (broadcast semi-join for id lists)."""
    if isinstance(image_ids, str):
        return meta.filter(F.col("image_id") == image_ids)
    return meta.filter(F.col("image_id").isin(list(image_ids)))


def search(meta: DataFrame, *, ts_min=None, ts_max=None, bbox=None,
           limit: int | None = None) -> DataFrame:
    """A5/A6: datasets by time range + bbox overlap, with an optional
    limit (reference hopper.py:56-58)."""
    out = meta
    if ts_min is not None:
        out = out.filter(F.col("ts") >= F.lit(ts_min))
    if ts_max is not None:
        out = out.filter(F.col("ts") <= F.lit(ts_max))
    if bbox is not None:
        bx0, by0, bx1, by1 = bbox
        out = out.filter((F.col("x1") > bx0) & (F.col("x0") < bx1)
                         & (F.col("y1") > by0) & (F.col("y0") < by1))
    if limit is not None:
        out = out.limit(limit)
    return out


def companion_join(primary: DataFrame, companion: DataFrame,
                   tolerance_s: float = 3600.0) -> DataFrame:
    """C4: for each primary scene, the same-footprint companion-product
    scene nearest in time within ``tolerance_s`` (the reference finds the
    dataset at the same center_time overlapping the extent,
    drill.py:223-265; tolerance generalises the same-instant case).

    Equi-join on footprint + range predicate on time, nearest kept with a
    ranking window; duplicate companions (the reference warns and picks
    one, drill.py:253-259) resolve deterministically by (|dt|, image_id).
    """
    p = primary.select(
        F.col("image_id").alias("primary_id"), "gx", "gy",
        F.col("ts").alias("p_ts"))
    c = companion.select(
        F.col("image_id").alias("companion_id"),
        F.col("gx").alias("cgx"), F.col("gy").alias("cgy"),
        F.col("ts").alias("c_ts"))
    dt = F.abs(F.unix_micros(F.col("c_ts").cast("timestamp"))
               - F.unix_micros(F.col("p_ts").cast("timestamp")))
    j = p.join(c, (p.gx == c.cgx) & (p.gy == c.cgy)
               & (dt <= int(tolerance_s * 1e6)))
    w = W.partitionBy("primary_id").orderBy(dt.asc(), F.col("companion_id"))
    return (j.withColumn("rn", F.row_number().over(w)).filter("rn = 1")
            .select("primary_id", "companion_id", "p_ts", "c_ts"))
