"""The polygon drill — the engine's flagship pipeline.

Spark-first re-expression of the reference's scene drill
(reference drill.py:508-703); one DataFrame job drills *all* tiles at once:

1. ``tile_meta`` / ``tile_cells`` — placement + covering cells derived from
   ``image_id`` JVM-side (bytes column pruned out of the scan).
2. footprint candidates — equi-join ``tile_cells ⋈ polygon_cover`` on
   ``cell`` per DISTINCT tile footprint (broadcast cover when small,
   salted shuffle-hash otherwise), grouped to one candidate list per
   footprint.  This subsumes the reference's quick-bbox +
   exact-intersects filter cascade (drill.py:302-340,282-299): the cell
   join IS the cheap prefilter.
3. candidate attach — rings join onto the footprint-candidate table
   (``attach_rings``: geometry travels only to footprints that need it;
   no driver collect, no whole-layer broadcast), then a broadcast join
   onto tiles by (gx, gy): tile ``bytes`` are never shuffled and reach
   the UDF exactly once, never once per polygon.
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
from ..core import geom
from ..datagen import GridSpec
from ..plugins.base import DrillSpec
from .cover import polygon_cover_df
from .tilecells import extents_by_ts, tile_cells, tile_meta

_ID_RE = re.compile(r"^t(\d+)_x(\d+)_y(\d+)$")

FLAG_COLS = ["conflux_n", "conflux_s", "conflux_e", "conflux_w"]


def _make_driller(plugin: DrillSpec, g: GridSpec, rmap: dict | None = None):
    """Per-task drill state shared by both execution paths (the joined
    stream ``mapInPandas`` and the cogrouped ``applyInPandas``): a
    prepared-geometry cache, an owner-raster cache, a per-footprint
    candidate-list cache, and the per-tile drill step.  Returns
    ``(drill_one, cands_for, owner_for, prep_cache)``.

    * ``prep_cache`` — tiles of the same footprint reuse the Prepared edge
      arrays instead of rebuilding them per tile.
    * owner cache — the pixel->polygon assignment depends only on the
      footprint geometry and candidate set, so every timestep of a grid
      slot reuses it: rasterisation cost is O(distinct footprints), not
      O(tiles).  Small cap; adjacency (partition-local sort / grouping)
      makes repeats adjacent so a handful of entries achieves ~full reuse.
    * candidate cache (``cands_for``) — the per-row candidate payload is
      identical for every timestep of a footprint, so the decode of the
      Arrow struct list, the prep inserts, and the ordinal sort run once
      per footprint instead of once per tile row (~candidates x tiles
      dict/list operations saved).  The per-slot scratch also memoizes the
      {ordinal: poly_id} output map and the ordinal list.

    The three caches evict TOGETHER (inside the owner build): a candidate
    cache hit therefore implies its Prepared geometries are still
    resident."""
    prep_cache: dict = {}
    owner_cache: dict = {}
    cands_cache: dict = {}

    def cands_for(gx, gy, payload):
        """Ascending [(ordinal, poly_id)] for a footprint, memoized; on a
        miss the Prepared geometries are (re)inserted into prep_cache."""
        key = (gx, gy)
        c = cands_cache.get(key)
        if c is not None:
            return c
        c = []
        if rmap is None:
            # rings inside the candidate join payload (already in
            # ascending-ordinal order via sort_array)
            for s in payload:
                ordinal, pid = int(s["ordinal"]), s["poly_id"]
                if pid not in prep_cache:
                    prep_cache[pid] = geom.prepare(s["rings"])
                c.append((ordinal, pid))
        else:
            # id-only payload; geometry from the pruned-dimension
            # broadcast, sorted to ascending drill order
            for pid in payload:
                ordinal, rings_v = rmap[pid]
                if pid not in prep_cache:
                    prep_cache[pid] = geom.prepare(rings_v)
                c.append((ordinal, pid))
            c.sort()
        cands_cache[key] = c
        return c

    def owner_for(gx, gy, h, w, cands):
        """-> (owner raster, per-slot scratch dict).  The scratch dict
        shares the owner's cache lifetime; plugins memoize owner-derived
        index structures in it (base.owner_index)."""
        key = (gx, gy, h, w)
        cached = owner_cache.get(key)
        if cached is not None:
            return cached
        x0, y0 = g.tile_origin(gx, gy)
        tx1 = x0 + w * g.px_res
        ty1 = y0 + h * g.px_res
        xs = x0 + (np.arange(w) + 0.5) * g.px_res
        ys = y0 + (np.arange(h) + 0.5) * g.px_res
        # owner holds the DENSE candidate position (0..len(cands)-1), not
        # the layer-global ordinal: cands ascend by ordinal, so ascending
        # position overwrite preserves rasterize-last-wins, while the
        # per-tile count arrays (bincount minlength) shrink from the
        # global ordinal RANGE (10^4+ on a dense layer -> 100s of KB
        # zeroed per tile) to the candidate count (~10).  ``o2p`` in the
        # slot scratch maps positions back to poly_ids for the output.
        owner = np.full((h, w), -1, dtype=np.int32)
        for pos, (ordinal, pid) in enumerate(cands):
            prep = prep_cache[pid]
            bx0, by0, bx1, by1 = prep.bbox
            if bx1 <= x0 or bx0 >= tx1 or by1 <= y0 or by0 >= ty1:
                continue
            if (bx0 <= x0 and bx1 >= tx1 and by0 <= y0
                    and by1 >= ty1
                    and geom.rect_fully_inside(prep, x0, y0, tx1, ty1)):
                owner[:, :] = pos  # interior fast path: no PIP
                continue
            j0 = int(np.searchsorted(xs, bx0))
            j1 = int(np.searchsorted(xs, bx1))
            i0 = int(np.searchsorted(ys, by0))
            i1 = int(np.searchsorted(ys, by1))
            if j0 >= j1 or i0 >= i1:
                continue
            sub = geom.contains_grid(prep, xs[j0:j1], ys[i0:i1])
            view = owner[i0:i1, j0:j1]
            view[sub] = pos
        if len(owner_cache) >= 64:
            owner_cache.clear()
            # evict the prepared geometries AND candidate lists with the
            # owners: adjacency makes footprint repeats contiguous, so
            # needed entries re-insert lazily on the next row while a
            # long task no longer accumulates one Prepared per distinct
            # polygon it ever saw
            prep_cache.clear()
            cands_cache.clear()
        entry = (owner, {"o2p": {i: pid
                                 for i, (_, pid) in enumerate(cands)},
                         "ords": list(range(len(cands)))})
        owner_cache[key] = entry
        return entry

    def drill_one(image_id, ts_idx, gx, gy, byts, h, w, fmt, cands, out):
        """Drill one tile into the ``out`` chunk accumulator (see
        ``_flush``).  ``cands`` is the ascending [(ordinal, poly_id)]
        candidate list whose Prepared geometries are present in
        ``prep_cache`` (guaranteed by ``cands_for`` / the caller)."""
        raw = plugin.decode(byts, h, w, fmt)
        owner, scratch = owner_for(gx, gy, h, w, cands)
        ords = scratch["ords"]
        grouped = plugin.partials_grouped_raw(raw, owner, ords,
                                              scratch=scratch)
        if grouped is None:
            bands = plugin.transform(raw)
            grouped = plugin.partials_grouped(bands, owner, ords,
                                              scratch=scratch)
        if not grouped:
            return
        o2p = scratch["o2p"]
        vals = list(grouped.values())
        out["poly_id"].append([o2p[o] for o in grouped])
        out["_meta"].append((image_id, ts_idx, len(vals)))
        for i, (name, typ) in enumerate(plugin.partial_fields):
            out[name].append(np.fromiter((v[i] for v in vals),
                                         dtype=_DTYPES[typ],
                                         count=len(vals)))

    return drill_one, cands_for, owner_for, prep_cache


_DTYPES = {"long": np.int64, "double": np.float64}
_NS_PER_DAY = 86_400_000_000_000


def _empty_out(plugin: DrillSpec) -> dict:
    """Per-batch chunk accumulator: ``poly_id`` holds one id-list chunk
    per tile, ``_meta`` one ``(image_id, ts_idx, n_rows)`` tuple per
    tile, each partial field one small numpy array per tile.  ``_flush``
    assembles the columns with ``np.repeat``/``concatenate`` — the
    output build is vectorised instead of ~10 python appends per output
    row (and no per-row ``pd.Timestamp`` objects)."""
    out = {"poly_id": [], "_meta": []}
    for name, _ in plugin.partial_fields:
        out[name] = []
    return out


def _flush(plugin: DrillSpec, out: dict) -> pd.DataFrame:
    metas = out["_meta"]
    fields = plugin.partial_fields
    if not metas:
        data = {"poly_id": np.empty(0, dtype=object),
                "image_id": np.empty(0, dtype=object),
                # pandas would infer float64 for an empty ts column,
                # which Arrow cannot cast to timestamp — pin the dtype
                "ts": np.empty(0, dtype="datetime64[ns]")}
        for name, typ in fields:
            data[name] = np.empty(0, dtype=_DTYPES[typ])
        return pd.DataFrame(data)
    counts = np.array([m[2] for m in metas])
    ts_days = np.array([m[1] for m in metas], dtype=np.int64)
    ts_vals = (np.datetime64(EPOCH, "ns")
               + ts_days * np.timedelta64(_NS_PER_DAY, "ns"))
    data = {
        "poly_id": np.concatenate(
            [np.asarray(c, dtype=object) for c in out["poly_id"]]),
        "image_id": np.repeat(
            np.array([m[0] for m in metas], dtype=object), counts),
        "ts": np.repeat(ts_vals, counts),
    }
    for name, typ in fields:
        data[name] = np.concatenate(out[name])
    return pd.DataFrame(data)


def attach_rings(fc: DataFrame, polygons: DataFrame,
                 allow_broadcast_dim: bool = True) -> DataFrame:
    """(gx, gy, cand_polys array<struct<ordinal, poly_id, rings>>) —
    candidate lists with ring geometry attached through the candidate join.

    Rings travel ONLY to the footprints whose cell cover they intersect
    (an equi-join on poly_id + re-group), replacing the reference's
    ship-the-whole-shapefile-to-every-worker pattern
    (reference __main__.py:902-906) and the round-1 driver-side
    ``collect()`` + ``sc.broadcast`` of every polygon: driver memory and
    broadcast size now scale with candidate geometry actually needed per
    footprint, not with the total polygon count.  ``sort_array`` over the
    (ordinal-first) structs yields ascending drill order for the
    rasterize-last-wins overwrite."""
    pairs = fc.select("gx", "gy", F.explode("cand_polys").alias("poly_id"))
    dim = polygons.select("poly_id", "ordinal", "rings")
    if not allow_broadcast_dim:
        # huge-layer contract (cogrouped path): polygon geometry must
        # SHUFFLE on poly_id, never broadcast — Catalyst would happily
        # auto-broadcast a layer whose estimated size sneaks under the
        # threshold, which is exactly the ceiling this path removes
        dim = dim.hint("shuffle_hash")
    return (pairs.join(dim, "poly_id")
            .groupBy("gx", "gy")
            .agg(F.sort_array(F.collect_list(
                F.struct("ordinal", "poly_id", "rings")))
                .alias("cand_polys")))


def footprint_candidates(meta: DataFrame, poly_cells: DataFrame,
                         grid: GridSpec, base_res: int = BASE_RES,
                         broadcast_cover: bool = True) -> DataFrame:
    """(gx, gy, cand_polys array<string>) per DISTINCT tile footprint.

    Tiles at the same grid slot share one bbox regardless of timestep, so
    the cell join runs once per footprint, not once per tile — the
    candidate table stays tiny (grid-slot cardinality) and broadcasts
    cheaply no matter how many timesteps the tile table holds.  ``meta``
    is the placement table from ``tile_meta`` (callers with an external
    catalog can pass a cheap metadata-only source instead of re-scanning
    the full tile table)."""
    fps = meta.select("gx", "gy", "x0", "y0", "x1", "y1").distinct()
    fps = fps.withColumn(
        "image_id", F.format_string("t0000_x%03d_y%03d", "gx", "gy"))
    fcells = tile_cells(fps, base_res=base_res)
    fcells = fcells.select(
        F.regexp_extract("image_id", r"_x(\d+)_", 1).cast("int").alias("gx"),
        F.regexp_extract("image_id", r"_y(\d+)$", 1).cast("int").alias("gy"),
        "cell")
    cover = poly_cells.select("cell", "poly_id")
    if broadcast_cover:
        cover = F.broadcast(cover)
    return (fcells.join(cover, "cell")
            .groupBy("gx", "gy")
            .agg(F.collect_set("poly_id").alias("cand_polys")))


def footprint_candidates_salted(meta: DataFrame, poly_cells: DataFrame,
                                grid: GridSpec, base_res: int = BASE_RES,
                                n_salt: int = 8) -> DataFrame:
    """Shuffle-hash variant of :func:`footprint_candidates` with hot-cell
    salting — the scale path when the polygon cover table outgrows the
    broadcast threshold (SURVEY.md §4 O5/O6).

    Hot cells (coarse interior cells of huge polygons, or dense urban
    lake fields) would funnel every matching tile-cell row into one
    reducer; salting splits each cell's tile stream across ``n_salt``
    reducers and replicates the (small per-cell) cover rows to every
    salt, so the join key becomes (cell, salt).  AQE skew-join splitting
    stays on as the second line of defence.
    """
    spark = meta.sparkSession
    fps = meta.select("gx", "gy", "x0", "y0", "x1", "y1").distinct()
    fps = fps.withColumn(
        "image_id", F.format_string("t0000_x%03d_y%03d", "gx", "gy"))
    fcells = tile_cells(fps, base_res=base_res).select(
        F.regexp_extract("image_id", r"_x(\d+)_", 1).cast("int").alias("gx"),
        F.regexp_extract("image_id", r"_y(\d+)$", 1).cast("int").alias("gy"),
        "cell")
    fcells = fcells.withColumn(
        "salt", F.pmod(F.xxhash64("gx", "gy", "cell"), F.lit(n_salt)))
    salts = spark.range(n_salt).select(F.col("id").cast("int").alias("salt"))
    cover = (poly_cells.select("cell", "poly_id")
             .crossJoin(F.broadcast(salts)))
    joined = fcells.hint("shuffle_hash").join(cover, ["cell", "salt"])
    return (joined.groupBy("gx", "gy")
            .agg(F.collect_set("poly_id").alias("cand_polys")))


def candidate_pairs(tiles: DataFrame, poly_cells: DataFrame, grid: GridSpec,
                    base_res: int = BASE_RES,
                    broadcast_cover: bool = True) -> DataFrame:
    """(image_id, poly_id) pairs whose tile bbox overlaps the polygon's cell
    cover."""
    meta = tile_meta(tiles, grid)
    fc = footprint_candidates(meta, poly_cells, grid, base_res,
                              broadcast_cover)
    return (meta.select("image_id", "gx", "gy")
            .join(F.broadcast(fc), ["gx", "gy"])
            .select("image_id", F.explode("cand_polys").alias("poly_id")))


def drill_partials(tiles: DataFrame, polygons: DataFrame, plugin: DrillSpec,
                   grid: GridSpec, *, base_res: int = BASE_RES,
                   broadcast_cover: bool = True,
                   broadcast_cands: bool = True,
                   rings: str = "auto",
                   meta: DataFrame | None = None) -> DataFrame:
    """Per-(polygon, tile) partial aggregates:
    ``(poly_id, image_id, ts, <partial cols>)``.  This is the map-side
    combine stage; ``drill`` folds it into final metrics.  Exposed
    separately because the rows double as the tile->polygon assignment
    record (lineage + golden tests).

    ``rings`` selects how candidate geometry reaches the workers:

    * ``"dim"`` — one torrent broadcast of the CANDIDATE-PRUNED polygon
      dimension ({poly_id: (ordinal, rings)}); the per-tile join payload
      is then just the candidate id list.  A per-footprint ring set
      attached through the join is re-serialised across the Arrow
      boundary for EVERY timestep row of the footprint (measured ~2.4x
      the no-rings floor at 512 timesteps); the dimension broadcast ships
      each ring set to each executor once.  Geometry is pruned to
      polygons that are a candidate of at least one footprint in this
      drill, so broadcast size tracks the queried region, not the layer.
    * ``"join"`` — rings travel inside the candidate join (attach_rings);
      nothing is collected at the driver.  NB with the default
      ``broadcast_cands=True`` the ring-attached candidate table is still
      BROADCAST — since rings are nested per footprint, that broadcast is
      at least as large as the pruned dimension, so this mode trades
      driver memory for executor broadcast memory without removing the
      size ceiling.  When the candidate GEOMETRY itself outgrows the
      broadcast budget, use :func:`drill_partials_cogrouped` over a
      bucketed tile layout — Exchange-free on the tile side, geometry
      shuffled (not broadcast) on the footprint key.
    * ``"auto"`` (default) — ``dim`` while the pruned candidate dimension
      is ≤ ~100k polygons (a narrow count on the dim table), else
      ``join`` — same size-gated strategy switch as broadcast_cover.
    """
    if rings not in ("auto", "dim", "join"):
        raise ValueError(f"rings must be 'auto', 'dim' or 'join', got "
                         f"{rings!r}")
    spark = tiles.sparkSession
    sc = spark.sparkContext

    # The cover table is the small join side — cache it so the several
    # actions inside one drill (candidate join, partials, final agg) don't
    # recompute the quadtree covers.
    poly_cells = polygon_cover_df(polygons, base_res=base_res)
    meta_src = meta if meta is not None else tile_meta(tiles, grid)
    if broadcast_cover == "auto":
        # size-based strategy switch (SURVEY.md §4 O5): broadcast while the
        # cover table is comfortably under the broadcast budget, salted
        # shuffle-hash beyond it.  The count is a narrow job over the small
        # polygon table, amortised by the cover cache.
        poly_cells = poly_cells.cache()
        broadcast_cover = poly_cells.count() <= 2_000_000
    if broadcast_cover:
        fc = footprint_candidates(meta_src, poly_cells, grid, base_res,
                                  broadcast_cover=True)
    else:
        fc = footprint_candidates_salted(meta_src, poly_cells, grid,
                                         base_res)
    rings_b = None
    if rings in ("auto", "dim"):
        # fc feeds up to three actions on these paths (dim count, dim
        # collect, the tile join) — materialise it once instead of
        # re-deriving the footprint-candidate join per action.  fc is the
        # small footprint-grain table (id lists only, no geometry).
        fc = fc.localCheckpoint(eager=True)
    if rings == "auto":
        # candidate-pruned dimension: only polygons that are a candidate
        # of at least one footprint in this drill
        cand_ids = fc.select(
            F.explode("cand_polys").alias("poly_id")).distinct()
        dim = polygons.join(cand_ids, "poly_id").select(
            "poly_id", "ordinal", "rings")
        rings = "dim" if dim.count() <= 100_000 else "join"
    elif rings == "dim":
        cand_ids = fc.select(
            F.explode("cand_polys").alias("poly_id")).distinct()
        dim = polygons.join(cand_ids, "poly_id").select(
            "poly_id", "ordinal", "rings")
    if rings == "dim":
        rings_b = sc.broadcast({
            r["poly_id"]: (int(r["ordinal"]), r["rings"])
            for r in dim.collect()})
        fc = fc.select("gx", "gy",
                       F.sort_array("cand_polys").alias("cand_polys"))
    else:
        fc = attach_rings(fc, polygons)
    if broadcast_cands:
        fc = F.broadcast(fc)
    # Only the columns the UDF needs cross the Arrow boundary: caption and
    # phash stay JVM-side (columnar pruning keeps them out of the scan too).
    # The candidate attach is a broadcast equi-join on the (gx, gy)
    # footprint parsed JVM-side from image_id — no shuffle of tile bytes;
    # candidate RINGS arrive via the pruned-dimension broadcast or (scale
    # path) through the same join — see the ``rings`` docstring above.
    work = (tiles.select("image_id", "bytes", "w", "h", "fmt")
            .withColumn("gx", F.regexp_extract(
                "image_id", r"_x(\d+)_", 1).cast("int"))
            .withColumn("gy", F.regexp_extract(
                "image_id", r"_y(\d+)$", 1).cast("int"))
            .join(fc, ["gx", "gy"]))

    # Co-locate same-footprint tiles inside each partition: ownership
    # (pixel -> polygon) is timestep-invariant per grid slot, so adjacent
    # footprint repeats turn the per-tile rasterisation into a cache hit.
    # Partition-local sort — no shuffle, tile bytes stay put.
    work = work.sortWithinPartitions("gx", "gy")

    grid_b = sc.broadcast(grid)
    schema = plugin.partial_schema

    def run(batches):
        g: GridSpec = grid_b.value
        rmap = rings_b.value if rings_b is not None else None
        driller = _make_driller(plugin, g, rmap)

        for rb in batches:
            out = _empty_out(plugin)
            _drill_rows_arrow(plugin, rb, driller, out)
            yield _flush_arrow(plugin, out)

    return work.mapInArrow(run, schema=schema)


def _flush_arrow(plugin: DrillSpec, out: dict):
    """Arrow twin of :func:`_flush`: assemble the chunk accumulator
    straight into a RecordBatch — no intermediate pandas frame, no
    per-row object boxing on the way back to the JVM."""
    import pyarrow as pa

    pdf = _flush(plugin, out)
    arrays = [pa.array(pdf["poly_id"], type=pa.string()),
              pa.array(pdf["image_id"], type=pa.string()),
              # naive datetime64 values are UTC wall times (session tz);
              # Spark's arrow verifier wants timestamp[us, tz=UTC]
              pa.array(pdf["ts"]).cast(pa.timestamp("us"))
              .cast(pa.timestamp("us", tz="UTC"))]
    names = ["poly_id", "image_id", "ts"]
    for name, typ in plugin.partial_fields:
        arrays.append(pa.array(pdf[name]))
        names.append(name)
    return pa.RecordBatch.from_arrays(arrays, names)


def _drill_rows_arrow(plugin: DrillSpec, rb, driller, out: dict) -> None:
    """Drill every row of one pyarrow RecordBatch into ``out``.

    Rows arrive grouped by footprint (the partition-local sort / the
    cogroup key), so consecutive same-(slot, shape, fmt) runs form a
    TIME STACK fed to the plugin's batch kernel
    (``partials_grouped_raw_batch``) — per-tile python/numpy dispatch is
    paid once per run, not once per tile.  Rows in any other
    configuration (lossy codecs, multiband plugins, malformed ids) take
    the unchanged per-tile ``drill_one`` path; both paths are
    bit-identical (golden-tested).

    The payload column stays in the Arrow buffer: a consecutive run of
    same-shape fmt='raw' tiles is a CONTIGUOUS byte region there, so
    the (T, h*w) time stack the plugin kernel wants is a zero-copy
    reshape of that region — no per-row bytes objects, no pandas
    materialisation of 16 KB cells (measured ~40% of the old per-tile
    boundary cost).  Non-contiguous / non-raw rows fall back to the
    per-tile path on materialised bytes."""
    import pyarrow as pa

    drill_one, cands_for, owner_for, _ = driller
    n = rb.num_rows
    if not n:
        return
    cols = {name: rb.column(i) for i, name in enumerate(rb.schema.names)}
    iids = cols["image_id"].to_pylist()
    gxs = cols["gx"].to_numpy()
    gys = cols["gy"].to_numpy()
    hs = cols["h"].to_numpy()
    ws = cols["w"].to_numpy()
    fmts = cols["fmt"].to_pylist()
    cand_col = cols["cand_polys"]
    bcol = cols["bytes"]
    if isinstance(bcol, pa.ChunkedArray):
        bcol = bcol.combine_chunks()
    if pa.types.is_large_binary(bcol.type):
        off_dt = np.int64
    else:
        off_dt = np.int32
    bufs = bcol.buffers()
    offs = np.frombuffer(bufs[1], dtype=off_dt)[
        bcol.offset:bcol.offset + len(bcol) + 1]
    data = np.frombuffer(bufs[2], dtype=np.uint8)
    fields = plugin.partial_fields
    i = 0
    while i < n:
        j = i + 1
        while (j < n and gxs[j] == gxs[i] and gys[j] == gys[i]
               and hs[j] == hs[i] and ws[j] == ws[i]
               and fmts[j] == fmts[i]):
            j += 1
        gx, gy = int(gxs[i]), int(gys[i])
        h, w, fmt = int(hs[i]), int(ws[i]), fmts[i]
        cands = cands_for(gx, gy, cand_col[i].as_py())
        metas = []
        rows = []
        for k in range(i, j):
            iid = iids[k]
            cut = iid.find("_")
            if cut < 2 or iid[0] != "t" or not iid[1:cut].isdigit():
                continue
            metas.append((iid, int(iid[1:cut])))
            rows.append(k)
        if metas and fmt == "raw":
            sz = h * w
            contiguous = (len(rows) == j - i
                          and int(offs[j]) - int(offs[i]) == sz * (j - i))
            if contiguous:
                raws2d = data[offs[i]:offs[j]].reshape(j - i, sz)
            else:
                raws2d = np.stack(
                    [data[offs[k]:offs[k + 1]] for k in rows]) \
                    if all(offs[k + 1] - offs[k] == sz for k in rows) \
                    else None
            if raws2d is not None:
                owner, scratch = owner_for(gx, gy, h, w, cands)
                res = plugin.partials_grouped_raw_batch(
                    raws2d, owner, scratch=scratch)
                if res is not None:
                    ords_out = res[0]
                    if ords_out:
                        o2p = scratch["o2p"]
                        pids = np.array([o2p[o] for o in ords_out],
                                        dtype=object)
                        out["poly_id"].append(np.tile(pids, len(metas)))
                        for iid, ts_idx in metas:
                            out["_meta"].append((iid, ts_idx,
                                                 len(ords_out)))
                        for (name, typ), arr in zip(fields, res[1:]):
                            out[name].append(np.ascontiguousarray(
                                arr, dtype=_DTYPES[typ]).ravel())
                    i = j
                    continue
        for k, (iid, ts_idx) in zip(rows, metas):
            drill_one(iid, ts_idx, gx, gy,
                      data[offs[k]:offs[k + 1]].tobytes(), h, w, fmt,
                      cands, out)
        i = j


def drill(tiles: DataFrame, polygons: DataFrame, plugin: DrillSpec,
          grid: GridSpec, *, partial: bool = True,
          base_res: int = BASE_RES, broadcast_cover: bool = True,
          broadcast_cands: bool = True, rings: str = "auto",
          meta: DataFrame | None = None) -> DataFrame:
    """Run one drill over every tile; returns
    ``(poly_id, ts, <plugin metrics>[, conflux_n/s/e/w])``.

    ``meta`` optionally supplies the placement table (tile_meta shape) from
    a lightweight catalog source so the metadata passes (footprints,
    extents) never scan the heavy bytes column."""
    partials = drill_partials(tiles, polygons, plugin, grid,
                              base_res=base_res,
                              broadcast_cover=broadcast_cover,
                              broadcast_cands=broadcast_cands,
                              rings=rings,
                              meta=meta)
    result = partials.groupBy("poly_id", "ts").agg(*plugin.final_aggs())

    if partial:
        meta_src = meta if meta is not None else tile_meta(tiles, grid)
        result = attach_edge_flags(result, polygons, extents_by_ts(meta_src))
    return result


def with_slot_keys(tiles: DataFrame, n_time_buckets: int = 1) -> DataFrame:
    """Add the (gx, gy, tb) grid-slot/time-bucket key columns derived from
    ``image_id`` — the physical co-location key of the cogrouped drill.
    At ingest these are STORED columns of the bucketed tile layout (see
    :func:`write_tiles_bucketed`); this helper is the derive-on-read
    fallback for ad-hoc frames."""
    ts = F.regexp_extract("image_id", r"^t(\d+)_", 1).cast("int")
    return (tiles
            .withColumn("gx", F.regexp_extract(
                "image_id", r"_x(\d+)_", 1).cast("int"))
            .withColumn("gy", F.regexp_extract(
                "image_id", r"_y(\d+)$", 1).cast("int"))
            .withColumn("tb", (ts % n_time_buckets).cast("int")))


def write_tiles_bucketed(tiles: DataFrame, table: str, n_buckets: int = 64,
                         n_time_buckets: int = 1) -> None:
    """Persist the tile table hash-bucketed on (gx, gy, tb) — the one-time
    layout that makes :func:`drill_cogrouped` Exchange-free on the tile
    side (the batch analogue of a grid-partitioned Iceberg write: at
    10^12-image scale the image table is laid out by grid slot anyway).

    ``n_time_buckets`` splits each grid slot's time series across ``tb``
    groups so a cogroup group (one pandas frame in the drill UDF) holds
    1/n_time_buckets of a slot's timesteps — size the groups to executor
    memory for deep time stacks."""
    from .tables import write_bucketed

    t = with_slot_keys(tiles, n_time_buckets)
    write_bucketed(t, table, ["gx", "gy", "tb"], n_buckets)


def drill_partials_cogrouped(tiles: DataFrame, polygons: DataFrame,
                             plugin: DrillSpec, grid: GridSpec, *,
                             base_res: int = BASE_RES,
                             broadcast_cover: bool = True,
                             n_time_buckets: int = 1,
                             meta: DataFrame | None = None) -> DataFrame:
    """Exchange-free huge-layer drill: per-(polygon, tile) partials via a
    Pandas COGROUP on the (gx, gy, tb) grid-slot key instead of a
    candidate join.

    This is the scale path when even the candidate-pruned polygon
    dimension outgrows the broadcast budget (>~100k candidate polygons —
    the ceiling of both ``rings="dim"`` and ``rings="join"``, which
    broadcast geometry one way or the other).  Shape of the plan:

    * tiles come from a table bucketed on (gx, gy, tb)
      (:func:`write_tiles_bucketed`): the scan's HashPartitioning already
      satisfies the cogroup's clustering, so tile ``bytes`` move through
      NEITHER a shuffle NOR a broadcast — only a partition-local sort.
    * the ring-attached candidate table (one row per footprint,
      :func:`attach_rings`) shuffles on the same key — geometry-only
      rows, size tracks the queried footprints.
    * ``applyInPandas`` receives each footprint's tiles and its candidate
      row together, so ring geometry crosses the Arrow boundary ONCE per
      (footprint, time-bucket) group instead of once per tile row (the
      measured ~2.4x per-row nesting tax of the join payload) and never
      rides a broadcast (the ``rings="join"`` + ``broadcast_cands`` size
      ceiling).

    Replaces the reference's ship-the-whole-shapefile-to-every-worker
    pattern (reference __main__.py:902-906) with geometry movement that is
    O(candidate footprint geometry), partitioned, and never resident on
    the driver.  Output and semantics are bit-identical to
    :func:`drill_partials` (golden-tested).

    If ``tiles`` lacks the stored (gx, gy, tb) columns they are derived
    from ``image_id`` — correct, but the cogroup then shuffles the tile
    bytes once; use the bucketed layout at scale."""
    spark = tiles.sparkSession
    derived_tb = "gx" not in tiles.columns or "tb" not in tiles.columns
    if derived_tb:
        tiles = with_slot_keys(tiles, n_time_buckets)
    poly_cells = polygon_cover_df(polygons, base_res=base_res)
    meta_src = meta if meta is not None else tile_meta(tiles, grid)
    if broadcast_cover:
        fc = footprint_candidates(meta_src, poly_cells, grid, base_res,
                                  broadcast_cover=True)
    else:
        fc = footprint_candidates_salted(meta_src, poly_cells, grid,
                                         base_res)
    fcr = attach_rings(fc, polygons, allow_broadcast_dim=False)
    if derived_tb:
        # we minted tb ourselves: values are exactly [0, n_time_buckets)
        tb_vals = list(range(n_time_buckets))
    else:
        # STORED layout: the tb range is a property of the table's write
        # (write_tiles_bucketed(n_time_buckets=K)), not of this call's
        # ``n_time_buckets`` argument.  Replicating candidates only to
        # [0, n_time_buckets) would cogroup any tile with tb >= that
        # bound against an EMPTY candidate side and silently drop its
        # rows — so the replication range comes from the tb values
        # actually present (one column-pruned distinct over the stored
        # int column, negligible next to the drill itself).
        tb_vals = sorted(int(r["tb"])
                         for r in tiles.select("tb").distinct().collect())
        if tb_vals and (tb_vals[0] < 0 or len(tb_vals) > 65536):
            raise ValueError(
                f"stored tb column looks corrupt: {len(tb_vals)} distinct "
                f"values, min {tb_vals[0]}")
        if not tb_vals:  # empty tile table: keep the plan analysable
            tb_vals = [0]
    # replicate the footprint's candidate row to every time bucket —
    # bounded geometry duplication (x len(tb_vals)), traded for bounded
    # group memory
    fcr = fcr.withColumn("tb", F.explode(F.array(
        *[F.lit(v).cast("int") for v in tb_vals])))
    keys = ["gx", "gy", "tb"]
    left = tiles.select(*keys, "image_id", "bytes", "w", "h", "fmt")

    grid_b = spark.sparkContext.broadcast(grid)
    schema = plugin.partial_schema
    holder: dict = {}  # per-python-worker drill state across groups

    def run_cg(ltab, rtab):
        import pyarrow as pa

        if "d" not in holder:
            holder["d"] = _make_driller(plugin, grid_b.value)
        drill_one, _, owner_for, prep_cache = holder["d"]
        out = _empty_out(plugin)
        if ltab.num_rows and rtab.num_rows:
            # one candidate row per group: rings decoded from Arrow once
            # per (footprint, time bucket), reused for every tile row.
            # Preps are (re)inserted once per group — the only point an
            # eviction can strike is inside the first row's owner build,
            # after which this group's preps are no longer needed.
            cands = []
            for c in rtab.column("cand_polys")[0].as_py():
                ordinal, pid = int(c["ordinal"]), c["poly_id"]
                if pid not in prep_cache:
                    prep_cache[pid] = geom.prepare(c["rings"])
                cands.append((ordinal, pid))
            # a cogroup group IS one grid slot's time stack — the shared
            # row driver feeds it to the plugin's stacked kernel
            # zero-copy from the Arrow buffers (per-tile fallback inside)
            driller = (drill_one, lambda gx, gy, payload: cands,
                       owner_for, prep_cache)
            for rb in ltab.combine_chunks().to_batches():
                rb = rb.append_column("cand_polys", pa.nulls(rb.num_rows))
                _drill_rows_arrow(plugin, rb, driller, out)
        return pa.Table.from_batches([_flush_arrow(plugin, out)])

    return (left.groupBy(*keys)
            .cogroup(fcr.groupBy(*keys))
            .applyInArrow(run_cg, schema=schema))


def drill_cogrouped(tiles: DataFrame, polygons: DataFrame, plugin: DrillSpec,
                    grid: GridSpec, *, partial: bool = True,
                    base_res: int = BASE_RES, broadcast_cover: bool = True,
                    n_time_buckets: int = 1,
                    meta: DataFrame | None = None) -> DataFrame:
    """:func:`drill` over the cogrouped Exchange-free partials path (see
    :func:`drill_partials_cogrouped`) — same output contract."""
    partials = drill_partials_cogrouped(
        tiles, polygons, plugin, grid, base_res=base_res,
        broadcast_cover=broadcast_cover, n_time_buckets=n_time_buckets,
        meta=meta)
    result = partials.groupBy("poly_id", "ts").agg(*plugin.final_aggs())
    if partial:
        meta_src = meta if meta is not None else tile_meta(tiles, grid)
        result = attach_edge_flags(result, polygons, extents_by_ts(meta_src))
    return result


def _edge_flags_per_extent(polygons: DataFrame,
                           extents: DataFrame) -> DataFrame:
    """(poly_id, ex0, ey0, ex1, ey1, conflux_n/s/e/w) — the edge-overflow
    flags per (polygon, DISTINCT extent): the O(polygons x distinct
    extents) core of the edge-flag rule (reference drill.py:104-220,
    numpy port).  The polygon pass is repartitioned so the geometry work
    parallelises instead of riding a single-partition crossJoin."""
    spark = polygons.sparkSession
    ext_d = extents.select("ex0", "ey0", "ex1", "ey1").distinct()
    j = (polygons.select("poly_id", "rings").crossJoin(F.broadcast(ext_d))
         .repartition(spark.sparkContext.defaultParallelism))
    schema = ("poly_id string, ex0 double, ey0 double, ex1 double, "
              "ey1 double, conflux_n boolean, conflux_s boolean, "
              "conflux_e boolean, conflux_w boolean")

    def run(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                d = geom.edge_directions(r.rings, r.ex0, r.ey0, r.ex1, r.ey1)
                rows.append((r.poly_id, r.ex0, r.ey0, r.ex1, r.ey1,
                             d["North"], d["South"], d["East"], d["West"]))
            yield pd.DataFrame(rows, columns=[
                "poly_id", "ex0", "ey0", "ex1", "ey1", "conflux_n",
                "conflux_s", "conflux_e", "conflux_w"])

    return j.mapInPandas(run, schema=schema)


def edge_flags_df(polygons: DataFrame, extents: DataFrame) -> DataFrame:
    """Per (poly_id, ts): in which compass directions the polygon overflows
    the observed extent (reference drill.py:104-220 rule, numpy port).

    Computed per DISTINCT extent (usually one — the grid bbox is
    time-invariant) and joined back to the timesteps, so compute cost is
    O(polygons x distinct extents), not O(polygons x timesteps).  NB the
    RESULT of this helper is O(polygons x timesteps) rows — drill()
    attaches flags via :func:`attach_edge_flags` instead, which never
    materialises (or broadcasts) that product."""
    per_extent = _edge_flags_per_extent(polygons, extents)
    return (extents.join(per_extent, ["ex0", "ey0", "ex1", "ey1"])
            .select("poly_id", "ts", *FLAG_COLS))


def attach_edge_flags(result: DataFrame, polygons: DataFrame,
                      extents: DataFrame) -> DataFrame:
    """Left-attach the edge flags to a (poly_id, ts)-grain result through
    TWO tiny broadcasts — the timestep->extent map (one row per
    timestep) and the per-(polygon, distinct extent) flag table — instead
    of broadcasting the materialised (polygons x timesteps) flag product
    (~6M rows / hundreds of MB at the bench config; the driver-side
    collect + hash-relation build of that broadcast was measured as THE
    dominant cost of the whole drill, ~11 s of an 18 s run).  Join
    equivalence: a result row's ts resolves its extent (or null), and
    (poly_id, extent) resolves the same flag row the materialised
    product would have carried; misses null-fill to False exactly as
    before."""
    per_extent = _edge_flags_per_extent(polygons, extents)
    ext_cols = ["ex0", "ey0", "ex1", "ey1"]
    return (result
            .join(F.broadcast(extents.select("ts", *ext_cols)),
                  "ts", "left")
            .join(F.broadcast(per_extent),
                  ["poly_id", *ext_cols], "left")
            .drop(*ext_cols)
            .fillna(False, subset=FLAG_COLS))
