"""The polygon drill — the engine's flagship pipeline.

Spark-first re-expression of the reference's scene drill
(reference drill.py:508-703); one DataFrame job drills *all* tiles at once:

1. ``tile_meta`` / ``tile_cells`` — placement + covering cells derived from
   ``image_id`` JVM-side (bytes column pruned out of the scan).
2. candidate pairs — equi-join ``tile_cells ⋈ polygon_cover`` on ``cell``
   (broadcast when the cover table is small, shuffle-hash otherwise), then
   ``distinct`` to (image_id, poly_id).  This subsumes the reference's
   quick-bbox + exact-intersects filter cascade (drill.py:302-340,282-299):
   the cell join IS the cheap prefilter.
3. candidate lists — group candidates per tile so each tile's ``bytes`` is
   shuffled (or broadcast-joined) exactly once, never once per polygon.
4. drill UDF (``mapInPandas``, Arrow batches) — decode tile, run the
   plugin's vectorized ``transform``, assign pixels to polygons by exact
   ray-cast PIP on pixel centres with ascending-ordinal overwrite (matching
   rasterio last-wins, reference drill.py:85-90), and emit per-(polygon,
   tile) **partial aggregates** — pixels never leave the task.
5. final combine — native ``groupBy(poly_id, ts).agg`` (codegen'd partial →
   final, the reference's per-polygon summarise loop drill.py:675-686).
6. optional edge-direction flags left join (reference drill.py:604-616,
   697-703).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..config import BASE_RES, EPOCH
from ..core import codec, geom
from ..datagen import GridSpec
from ..plugins.base import DrillSpec
from .cover import polygon_cover_df
from .tilecells import extents_by_ts, tile_cells, tile_meta

_ID_RE = re.compile(r"^t(\d+)_x(\d+)_y(\d+)$")

FLAG_COLS = ["conflux_n", "conflux_s", "conflux_e", "conflux_w"]


def _prepared_polys(polygons: DataFrame) -> dict:
    """Collect + prepare the polygon dim table for broadcast: poly_id ->
    (ordinal, Prepared).  The polygon layer is the small dimension side —
    the same assumption the reference makes when it ships the whole
    shapefile to every worker (reference __main__.py:902-906)."""
    rows = polygons.select("poly_id", "ordinal", "rings").collect()
    return {r["poly_id"]: (int(r["ordinal"]), geom.prepare(r["rings"]))
            for r in rows}


def candidate_pairs(tiles: DataFrame, poly_cells: DataFrame, grid: GridSpec,
                    base_res: int = BASE_RES,
                    broadcast_cover: bool = True) -> DataFrame:
    """(image_id, poly_id) pairs whose tile bbox overlaps the polygon's cell
    cover."""
    meta = tile_meta(tiles, grid)
    tcells = tile_cells(meta, base_res=base_res)
    cover = poly_cells.select("cell", "poly_id")
    if broadcast_cover:
        cover = F.broadcast(cover)
    return (tcells.join(cover, "cell")
            .select("image_id", "poly_id").distinct())


def drill_partials(tiles: DataFrame, polygons: DataFrame, plugin: DrillSpec,
                   grid: GridSpec, *, base_res: int = BASE_RES,
                   broadcast_cover: bool = True,
                   broadcast_cands: bool = True) -> DataFrame:
    """Per-(polygon, tile) partial aggregates:
    ``(poly_id, image_id, ts, <partial cols>)``.  This is the map-side
    combine stage; ``drill`` folds it into final metrics.  Exposed
    separately because the rows double as the tile->polygon assignment
    record (lineage + golden tests)."""
    spark = tiles.sparkSession
    sc = spark.sparkContext

    poly_cells = polygon_cover_df(polygons, base_res=base_res)
    cand = candidate_pairs(tiles, poly_cells, grid, base_res, broadcast_cover)
    cand_lists = cand.groupBy("image_id").agg(
        F.collect_list("poly_id").alias("cand_polys"))
    if broadcast_cands:
        cand_lists = F.broadcast(cand_lists)
    work = tiles.join(cand_lists, "image_id")

    polys_b = sc.broadcast(_prepared_polys(polygons))
    grid_b = sc.broadcast(grid)
    schema = plugin.partial_schema

    def run(batches):
        g: GridSpec = grid_b.value
        pmap = polys_b.value
        epoch = pd.Timestamp(EPOCH)
        for pdf in batches:
            out = {"poly_id": [], "image_id": [], "ts": []}
            for name, _ in plugin.partial_fields:
                out[name] = []
            for row in pdf.itertuples():
                m = _ID_RE.match(row.image_id)
                if not m:
                    continue
                ts_idx, gx, gy = (int(m.group(1)), int(m.group(2)),
                                  int(m.group(3)))
                h, w = int(row.h), int(row.w)
                raw = codec.decode(row.bytes, h, w, row.fmt)
                x0, y0 = g.tile_origin(gx, gy)
                tx1 = x0 + w * g.px_res
                ty1 = y0 + h * g.px_res
                xs = x0 + (np.arange(w) + 0.5) * g.px_res
                ys = y0 + (np.arange(h) + 0.5) * g.px_res
                cands = sorted(
                    ((pmap[p][0], p) for p in row.cand_polys
                     if p in pmap), key=lambda t: t[0])
                owner = np.full((h, w), -1, dtype=np.int32)
                for ordinal, pid in cands:
                    prep = pmap[pid][1]
                    bx0, by0, bx1, by1 = prep.bbox
                    if bx1 <= x0 or bx0 >= tx1 or by1 <= y0 or by0 >= ty1:
                        continue
                    if (bx0 <= x0 and bx1 >= tx1 and by0 <= y0
                            and by1 >= ty1
                            and geom.rect_fully_inside(prep, x0, y0, tx1, ty1)):
                        owner[:, :] = ordinal  # interior fast path: no PIP
                        continue
                    j0 = int(np.searchsorted(xs, bx0))
                    j1 = int(np.searchsorted(xs, bx1))
                    i0 = int(np.searchsorted(ys, by0))
                    i1 = int(np.searchsorted(ys, by1))
                    if j0 >= j1 or i0 >= i1:
                        continue
                    sub = geom.contains_grid(prep, xs[j0:j1], ys[i0:i1])
                    view = owner[i0:i1, j0:j1]
                    view[sub] = ordinal
                bands = plugin.transform(raw)
                ts = epoch + pd.Timedelta(days=ts_idx)
                for ordinal, pid in cands:
                    mask = owner == ordinal
                    if not mask.any():
                        continue
                    vals = plugin.partials(bands, mask)
                    out["poly_id"].append(pid)
                    out["image_id"].append(row.image_id)
                    out["ts"].append(ts)
                    for (name, _), v in zip(plugin.partial_fields, vals):
                        out[name].append(v)
            yield pd.DataFrame(out)

    return work.mapInPandas(run, schema=schema)


def drill(tiles: DataFrame, polygons: DataFrame, plugin: DrillSpec,
          grid: GridSpec, *, partial: bool = True,
          base_res: int = BASE_RES, broadcast_cover: bool = True,
          broadcast_cands: bool = True) -> DataFrame:
    """Run one drill over every tile; returns
    ``(poly_id, ts, <plugin metrics>[, conflux_n/s/e/w])``."""
    partials = drill_partials(tiles, polygons, plugin, grid,
                              base_res=base_res,
                              broadcast_cover=broadcast_cover,
                              broadcast_cands=broadcast_cands)
    result = partials.groupBy("poly_id", "ts").agg(*plugin.final_aggs())

    if partial:
        meta = tile_meta(tiles, grid)
        flags = edge_flags_df(polygons, extents_by_ts(meta))
        result = result.join(F.broadcast(flags), ["poly_id", "ts"], "left")
        result = result.fillna(False, subset=FLAG_COLS)
    return result


def edge_flags_df(polygons: DataFrame, extents: DataFrame) -> DataFrame:
    """Per (poly_id, ts): in which compass directions the polygon overflows
    the observed extent (reference drill.py:104-220 rule, numpy port)."""
    j = polygons.select("poly_id", "rings").crossJoin(extents)
    schema = ("poly_id string, ts timestamp, conflux_n boolean, "
              "conflux_s boolean, conflux_e boolean, conflux_w boolean")

    def run(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                d = geom.edge_directions(r.rings, r.ex0, r.ey0, r.ex1, r.ey1)
                rows.append((r.poly_id, r.ts, d["North"], d["South"],
                             d["East"], d["West"]))
            yield pd.DataFrame(rows, columns=[
                "poly_id", "ts", "conflux_n", "conflux_s", "conflux_e",
                "conflux_w"])

    return j.mapInPandas(run, schema=schema)
