"""kNN nearest-polygon assignment (SURVEY.md §2.C7).

Cell-ring expansion: polygon centroids are indexed into grid cells at a
chosen resolution; each query point joins the (2R+1)² ring of cells around
its own cell (ring offsets emitted JVM-side with ``sequence``/``explode``),
distances are computed natively, and a ranking window keeps the top-k.
Queries that find fewer than k neighbours within the ring radius fall back
to a broadcast brute-force pass (rare — only in sparse regions).

The guarantee: if a query found >= k candidates in the ring join AND its
k-th distance <= ring_radius_cells * cell_size (the minimum distance at
which a neighbour could hide outside the searched ring), the result equals
exact brute force; otherwise the fallback recomputes it exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from ..config import WORLD


def _cell_expr(res: int, x, y):
    s = WORLD / (1 << res)
    ix = F.floor(x / F.lit(s))
    iy = F.floor(y / F.lit(s))
    return ix, iy


def knn_nearest(queries: DataFrame, polygons: DataFrame, k: int = 1,
                res: int = 9, ring: int = 1,
                broadcast_index="auto",
                broadcast_threshold: int = 1_000_000) -> DataFrame:
    """(qid, poly_id, dist, rank) — the k nearest polygon centroids for
    each query point.  ``queries``: (qid string, qx double, qy double).

    ``broadcast_index`` selects the join strategy for the centroid index
    (the same size-gated switch as the drill's ``broadcast_cover``):

    * ``True`` — broadcast the (poly_id, cx, cy, cell) index; right for
      layers up to ~10^6 centroids (tens of MB).
    * ``False`` — the scale path: shuffle join on the (pix, piy) cell key,
      and the exactness-fallback broadcasts the (small) unresolved query
      set against the distributed layer instead of broadcasting the layer.
    * ``"auto"`` (default) — ``True`` while the layer holds at most
      ``broadcast_threshold`` centroids (one narrow count on the dim
      table)."""
    if broadcast_index == "auto":
        broadcast_index = polygons.count() <= broadcast_threshold
    s = WORLD / (1 << res)
    pix, piy = _cell_expr(res, F.col("cx"), F.col("cy"))
    pidx = polygons.select(
        "poly_id", "cx", "cy", pix.alias("pix"), piy.alias("piy"))

    qix, qiy = _cell_expr(res, F.col("qx"), F.col("qy"))
    qcells = (
        queries.select("qid", "qx", "qy", qix.alias("qix"), qiy.alias("qiy"))
        .withColumn("dx", F.explode(F.sequence(F.lit(-ring), F.lit(ring))))
        .withColumn("dy", F.explode(F.sequence(F.lit(-ring), F.lit(ring))))
        .select("qid", "qx", "qy",
                (F.col("qix") + F.col("dx")).alias("pix"),
                (F.col("qiy") + F.col("dy")).alias("piy"))
    )
    dist = F.sqrt(
        (F.col("qx") - F.col("cx")) ** 2 + (F.col("qy") - F.col("cy")) ** 2)
    pidx_j = F.broadcast(pidx) if broadcast_index else pidx
    cand = (qcells.join(pidx_j, ["pix", "piy"])
            .select("qid", "qx", "qy", "poly_id", dist.alias("dist")))
    w = W.partitionBy("qid").orderBy(F.col("dist").asc(), F.col("poly_id"))
    topk = (cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))
    # Exactness guard: a ring of radius R guarantees no unseen neighbour
    # closer than R * cell_size.  Queries whose k-th hit is farther (or that
    # found < k) are re-answered by brute force.
    guard = float(ring) * s
    counts = topk.groupBy("qid").agg(
        F.count("*").alias("n"), F.max("dist").alias("dmax"))
    ok_ids = counts.filter((F.col("n") >= k) & (F.col("dmax") <= guard)) \
        .select("qid")
    # the resolved-query id set scales with the query table: broadcast it
    # only alongside a broadcastable layer; on the scale path let the
    # planner shuffle the semi/anti joins on qid
    ok_b = F.broadcast(ok_ids) if broadcast_index else ok_ids
    good = topk.join(ok_b, "qid", "left_semi")
    bad_q = queries.join(ok_b, "qid", "left_anti")
    if broadcast_index:
        fallback = bad_q.crossJoin(
            F.broadcast(polygons.select("poly_id", "cx", "cy")))
    else:
        # huge layer: broadcast the (rare, sparse-region) unresolved
        # queries instead and scan the layer distributed — the layer-side
        # broadcast ceiling is gone
        fallback = (polygons.select("poly_id", "cx", "cy")
                    .crossJoin(F.broadcast(bad_q)))
    brute = (fallback
             .select("qid", "qx", "qy", "poly_id", dist.alias("dist"))
             .withColumn("rank", F.row_number().over(w))
             .filter(F.col("rank") <= k))
    return good.unionByName(brute).select("qid", "poly_id", "dist", "rank")
