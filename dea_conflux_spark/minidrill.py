"""Deterministic mini drill fixture with a DuckDB-expressible oracle.

The flagship drill's correctness is golden-tested against the in-repo
numpy oracle, but the driver's DuckDB gate could not see it: the drill's
inputs (tile bytes + polygon rings) are not relational.  This module makes
the flagship semantics independently checkable by a SECOND engine:

* polygons are CONVEX, so point-in-polygon is a conjunction of half-plane
  tests ``a*x + b*y <= c`` — plain SQL;
* the same deterministic pixel arrays are written twice: once ENCODED as
  the engine's tile table (``mini_tiles.parquet`` — what the Spark drill
  decodes and drills) and once EXPLODED as a relational pixel table
  (``mini_pixels.parquet`` — what DuckDB aggregates);
* overlap resolution (rasterise-last-wins, reference drill.py:85-90) is
  ``arg_max(poly_id, ordinal)`` per pixel.

Vertex coordinates are chosen off the pixel-centre lattice (fractional
offsets) so no pixel centre lies on a polygon edge — ray-cast PIP and the
half-plane conjunction agree exactly.  Pixel values keep every polygon's
missing fraction <= 0.1 (asserted at build time), so the waterbodies
NaN branch never fires and both engines stay in exact float territory
(integer sums + one IEEE division).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from . import datagen
from .core import codec, geom

FIXTURE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".bench_data", "mini_drill")
_VERSION = "v10"  # bump to force regeneration

MINI_GRID = datagen.GridSpec(G=2, T=2, w=16, h=16)


def _convex_polys() -> list:
    """Four convex polygons (CCW rings): two overlapping rectangles, a
    hexagon, and a rectangle straddling the tile boundary."""

    def rect(x0, y0, x1, y1):
        return np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]])

    hex_c = (100700.0, 100250.0)
    ang = np.linspace(0.0, 2 * np.pi, 7)[:-1] + 0.3
    hexagon = np.stack([hex_c[0] + 150.0 * np.cos(ang),
                        hex_c[1] + 150.0 * np.sin(ang)], axis=1)
    shapes = [
        ("mini_rect_a", rect(100030.3, 100050.7, 100310.9, 100350.1)),
        ("mini_rect_b", rect(100200.4, 100250.2, 100700.6, 100600.8)),
        ("mini_hex_c", hexagon),
        ("mini_rect_d", rect(100400.15, 100500.45, 100560.85, 100900.35)),
        # overflows the grid extent's south-west corner: with the
        # single-tile drill of mini_drill_flags it fires South+West while
        # mini_rect_b fires North+East — all four direction flags and
        # both corner-overflow cases are exercised
        ("mini_rect_e", rect(99900.6, 99850.3, 100150.2, 100120.9)),
    ]
    polys = []
    for i, (pid, ring) in enumerate(shapes):
        rings = [np.asarray(ring, dtype=np.float64)]
        bx = geom.bbox(rings)
        cx, cy = geom.centroid(rings)
        polys.append({
            "poly_id": pid, "kind": "mini", "ordinal": i, "rings": rings,
            "cx": cx, "cy": cy,
            "xmin": bx[0], "ymin": bx[1], "xmax": bx[2], "ymax": bx[3],
            "area": geom.area(rings),
        })
    return polys


def _half_planes(polys: list) -> pd.DataFrame:
    """(poly_id, ordinal, a, b, c): inside iff a*x + b*y <= c for ALL
    planes of the polygon (CCW ring -> interior left of each edge)."""
    rows = []
    for p in polys:
        ring = p["rings"][0]
        n = len(ring)
        for k in range(n):
            px, py = ring[k]
            qx, qy = ring[(k + 1) % n]
            a, b = qy - py, -(qx - px)
            rows.append((p["poly_id"], p["ordinal"], float(a), float(b),
                         float(a * px + b * py)))
    return pd.DataFrame(rows, columns=["poly_id", "ordinal", "a", "b", "c"])


def _pixel_values(ts_idx: int, gx: int, gy: int) -> np.ndarray:
    """Deterministic uint8 WOfS-style values: 0 dry / 128 wet / 2 invalid
    (wofl=2 -> neither wet nor clear-dry), invalid rate ~2%."""
    rng = np.random.default_rng([777, ts_idx, gx, gy])
    r = rng.random((MINI_GRID.h, MINI_GRID.w))
    arr = np.where(r < 0.40, 128, 0).astype(np.uint8)
    arr[r > 0.98] = 2
    return arr


_WIT_PX_BANDS = ["water", "nbart_blue", "nbart_green", "nbart_red",
                 "nbart_nir", "nbart_swir_1", "nbart_swir_2",
                 "bs", "pv", "npv"]


def _wit_band_values(ts_idx: int, gx: int, gy: int) -> dict:
    """Deterministic WIT multiband planes: WOfS bitfield with sparse mask
    bits (~96% clear so every polygon keeps n_mask > 0), reflectance
    spanning the TCW > -350 threshold, fractional cover 0..120."""
    rng = np.random.default_rng([888, ts_idx, gx, gy])
    h, w = MINI_GRID.h, MINI_GRID.w
    water = np.zeros((h, w), dtype=np.uint8)
    water |= (rng.random((h, w)) < 0.02).astype(np.uint8) << 1  # noncontig
    water |= (rng.random((h, w)) < 0.02).astype(np.uint8) << 6  # cloud
    water |= (rng.random((h, w)) < 0.30).astype(np.uint8) << 7  # open water
    bands = {"water": water}
    for b in ("nbart_blue", "nbart_green", "nbart_red", "nbart_nir"):
        bands[b] = rng.integers(0, 3000, (h, w)).astype(np.int16)
    for b in ("nbart_swir_1", "nbart_swir_2"):
        # SWIR drives TCW negative; keep the -350 threshold in play
        bands[b] = rng.integers(0, 1500, (h, w)).astype(np.int16)
    for b in ("bs", "pv", "npv"):
        bands[b] = rng.integers(0, 121, (h, w)).astype(np.uint8)
    return bands


def build(out_dir: str = FIXTURE_DIR) -> str:
    """Write the fixture (idempotent; keyed by _VERSION marker)."""
    marker = os.path.join(out_dir, f".done_{_VERSION}")
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    g = MINI_GRID
    polys = _convex_polys()
    planes = _half_planes(polys)

    tile_rows, px_rows = [], []
    px_id = 0
    for ts_idx in range(g.T):
        for gy in range(g.G):
            for gx in range(g.G):
                arr = _pixel_values(ts_idx, gx, gy)
                iid = datagen.image_id(ts_idx, gx, gy)
                byts = codec.encode(arr, "raw")
                tile_rows.append({
                    "image_id": iid, "bytes": byts,
                    "w": np.int32(g.w), "h": np.int32(g.h), "fmt": "raw",
                    "caption": f"mini {iid}",
                    "phash": np.int64(codec.phash64(arr)),
                })
                x0, y0 = g.tile_origin(gx, gy)
                xs = x0 + (np.arange(g.w) + 0.5) * g.px_res
                ys = y0 + (np.arange(g.h) + 0.5) * g.px_res
                xx, yy = np.meshgrid(xs, ys)
                n = g.w * g.h
                px_rows.append(pd.DataFrame({
                    "px_id": np.arange(px_id, px_id + n, dtype=np.int64),
                    "ts_idx": np.int32(ts_idx),
                    "x": xx.ravel(), "y": yy.ravel(),
                    "val": arr.ravel().astype(np.int32),
                }))
                px_id += n

    px = pd.concat(px_rows, ignore_index=True)

    # build-time sanity vs the independent half-plane assignment: every
    # (poly, ts) group must stay under the 10% missing gate so the
    # waterbodies NaN branch never fires (exact cross-engine floats)
    owner = np.full(len(px), -1, dtype=np.int64)
    pid_of = {}
    for p in polys:
        pl = planes[planes.poly_id == p["poly_id"]]
        inside = np.ones(len(px), dtype=bool)
        for _, r in pl.iterrows():
            inside &= (r.a * px.x.values + r.b * px.y.values) <= r.c
        owner[inside] = p["ordinal"]  # ascending ordinal overwrite
        pid_of[p["ordinal"]] = p["poly_id"]
    for o in sorted(pid_of):
        for ts in range(g.T):
            m = (owner == o) & (px.ts_idx.values == ts)
            assert m.any(), (pid_of[o], ts)
            wofl = px.val.values[m] & 0b11110011
            miss = (~((wofl == 128) | (wofl == 0))).mean()
            assert miss <= 0.1, (pid_of[o], ts, miss)

    pd.DataFrame(tile_rows).to_parquet(
        os.path.join(out_dir, "mini_tiles.parquet"), index=False)
    px.to_parquet(os.path.join(out_dir, "mini_pixels.parquet"), index=False)
    planes.to_parquet(os.path.join(out_dir, "mini_planes.parquet"),
                      index=False)
    # WIT multiband twin of the fixture: the same pixel grid encoded as
    # multiraw engine tiles AND exploded per band for the SQL oracle
    from .plugins.wit import WIT_BANDS

    wit_tile_rows, wit_px_rows = [], []
    px_id = 0
    for ts_idx in range(g.T):
        for gy in range(g.G):
            for gx in range(g.G):
                bands = _wit_band_values(ts_idx, gx, gy)
                iid = datagen.image_id(ts_idx, gx, gy)
                wit_tile_rows.append({
                    "image_id": iid,
                    "bytes": codec.encode_bands(bands, WIT_BANDS),
                    "w": np.int32(g.w), "h": np.int32(g.h),
                    "fmt": "multiraw", "caption": f"mini wit {iid}",
                    "phash": np.int64(codec.phash64(bands["water"])),
                })
                x0, y0 = g.tile_origin(gx, gy)
                xs = x0 + (np.arange(g.w) + 0.5) * g.px_res
                ys = y0 + (np.arange(g.h) + 0.5) * g.px_res
                xx, yy = np.meshgrid(xs, ys)
                n = g.w * g.h
                row = {
                    "px_id": np.arange(px_id, px_id + n, dtype=np.int64),
                    "ts_idx": np.int32(ts_idx),
                    "x": xx.ravel(), "y": yy.ravel(),
                }
                for b in _WIT_PX_BANDS:
                    row[b] = bands[b].ravel().astype(np.int32)
                wit_px_rows.append(pd.DataFrame(row))
                px_id += n
    pd.DataFrame(wit_tile_rows).to_parquet(
        os.path.join(out_dir, "mini_wit_tiles.parquet"), index=False)
    wit_px = pd.concat(wit_px_rows, ignore_index=True)
    # same pixel order as the WOfS table, so `owner` aligns positionally:
    # assert every (poly, ts) keeps n_mask > 0 (the WIT NaN branch never
    # fires -> both engines stay in exact integer-count + one-division
    # territory, means 4-dp rounded)
    wmask = (wit_px.water.values & 0b01100011) == 0
    for o in sorted(pid_of):
        for ts in range(g.T):
            m = (owner == o) & (wit_px.ts_idx.values == ts)
            assert (wmask & m).sum() > 0, (pid_of[o], ts)
    wit_px.to_parquet(
        os.path.join(out_dir, "mini_wit_pixels.parquet"), index=False)

    # kNN side tables: deterministic query points + the exact polygon
    # centroids the engine's polygon table carries (same float64 values,
    # parquet round-trips them bit-exactly)
    rng = np.random.default_rng(321)
    x0, y0, x1, y1 = g.extent
    nq = 25
    pd.DataFrame({
        "qid": [f"mq{i:03d}" for i in range(nq)],
        "qx": rng.uniform(x0 - 100, x1 + 100, nq),
        "qy": rng.uniform(y0 - 100, y1 + 100, nq),
    }).to_parquet(os.path.join(out_dir, "mini_queries.parquet"),
                  index=False)
    pd.DataFrame({
        "poly_id": [p["poly_id"] for p in polys],
        "cx": [p["cx"] for p in polys],
        "cy": [p["cy"] for p in polys],
    }).to_parquet(os.path.join(out_dir, "mini_centroids.parquet"),
                  index=False)
    # bbox side table for the edge-flag oracle (same float64 values the
    # engine's polygon table carries; parquet round-trips them bit-exact)
    pd.DataFrame({
        "poly_id": [p["poly_id"] for p in polys],
        "xmin": [p["xmin"] for p in polys],
        "ymin": [p["ymin"] for p in polys],
        "xmax": [p["xmax"] for p in polys],
        "ymax": [p["ymax"] for p in polys],
    }).to_parquet(os.path.join(out_dir, "mini_bboxes.parquet"),
                  index=False)
    # image near-dup corpus: every WOfS tile + a one-pixel-perturbed TWIN
    # (near-identical image), as engine tiles AND as a stored
    # perceptual-hash table for the brute-force SQL oracle
    ah_tiles, ah_rows = [], []
    for ts_idx in range(g.T):
        for gy in range(g.G):
            for gx in range(g.G):
                arr = _pixel_values(ts_idx, gx, gy)
                twin = arr.copy()
                twin[0, 0] = 2 if twin[0, 0] != 2 else 0
                for tag, a in (("orig", arr), ("twin", twin)):
                    iid = f"{tag}_{datagen.image_id(ts_idx, gx, gy)}"
                    ah_tiles.append({
                        "image_id": iid, "bytes": codec.encode(a, "raw"),
                        "w": np.int32(g.w), "h": np.int32(g.h),
                        "fmt": "raw", "caption": f"ahash {iid}",
                        "phash": np.int64(codec.phash64(a)),
                    })
                    ah_rows.append((iid, np.int64(codec.ahash64(a))))
    # non-vacuity: every (orig, twin) pair is within hamming 3 and at
    # least one unrelated pair is far outside it
    hm = {i: int(h) for i, h in ah_rows}
    hams = [bin((hm[f"orig_{datagen.image_id(t, y, x)}"]
                 ^ hm[f"twin_{datagen.image_id(t, y, x)}"])
                & ((1 << 64) - 1)).count("1")
            for t in range(g.T) for y in range(g.G) for x in range(g.G)]
    assert max(hams) <= 3, hams
    far = bin((hm["orig_t0000_x000_y000"] ^ hm["orig_t0001_x001_y001"])
              & ((1 << 64) - 1)).count("1")
    assert far > 3, far
    pd.DataFrame(ah_tiles).to_parquet(
        os.path.join(out_dir, "mini_ahash_tiles.parquet"), index=False)
    pd.DataFrame(ah_rows, columns=["image_id", "ahash"]).to_parquet(
        os.path.join(out_dir, "mini_ahashes.parquet"), index=False)
    # rawstack videos: one per grid slot, frames = that slot's per-ts
    # pixel arrays concatenated (deterministic container for the
    # frame-sampling plumbing; pixel values shared with mini_pixels)
    vid_rows = []
    for gy in range(g.G):
        for gx in range(g.G):
            stack = np.stack([_pixel_values(t, gx, gy)
                              for t in range(g.T)])
            vid_rows.append({
                "video_id": f"v_x{gx:03d}_y{gy:03d}",
                "bytes": stack.tobytes(),
                "w": np.int32(g.w), "h": np.int32(g.h),
                "n_frames": np.int32(g.T), "fmt": "rawstack",
            })
    pd.DataFrame(vid_rows).to_parquet(
        os.path.join(out_dir, "mini_videos.parquet"), index=False)
    # rawpcm audio clips: deterministic int16 sine mixes, written once
    # ENCODED (what the engine decodes) and once EXPLODED as a
    # relational sample table (what DuckDB aggregates) — the audio
    # analogue of the tiles/pixels twin pair
    au_rows, samp_frames = [], []
    for k in range(6):
        sr = 8000
        n = 1200 + 160 * k
        t = np.arange(n)
        wave = (3000.0 * (k + 1) * np.sin(2 * np.pi * (55.0 + 13.0 * k)
                                          * t / sr)
                + 700.0 * np.sin(2 * np.pi * 997.0 * t / sr + 0.25 * k))
        s = np.clip(np.round(wave), -32768, 32767).astype(np.int16)
        au_rows.append({
            "audio_id": f"clip{k:02d}", "bytes": s.tobytes(),
            "sr": np.int32(sr), "n_samples": np.int32(n),
            "fmt": "rawpcm",
        })
        samp_frames.append(pd.DataFrame({
            "audio_id": f"clip{k:02d}",
            "idx": t.astype(np.int64),
            "sample": s.astype(np.int32),
        }))
    # clip06: alternating loud/near-silent 100 ms (800-sample) windows,
    # so the audio_chunks silence flag is exercised on BOTH sides of the
    # threshold (the sine clips above are loud throughout)
    sr = 8000
    n = 2000  # 2 full windows + 1 partial
    t = np.arange(n)
    amp = np.where((t // 800) % 2 == 0, 6000.0, 30.0)
    wave = amp * np.sin(2 * np.pi * 220.0 * t / sr)
    s = np.clip(np.round(wave), -32768, 32767).astype(np.int16)
    au_rows.append({
        "audio_id": "clip06", "bytes": s.tobytes(),
        "sr": np.int32(sr), "n_samples": np.int32(n), "fmt": "rawpcm",
    })
    samp_frames.append(pd.DataFrame({
        "audio_id": "clip06",
        "idx": t.astype(np.int64),
        "sample": s.astype(np.int32),
    }))
    pd.DataFrame(au_rows).to_parquet(
        os.path.join(out_dir, "mini_audio.parquet"), index=False)
    pd.concat(samp_frames, ignore_index=True).to_parquet(
        os.path.join(out_dir, "mini_audio_samples.parquet"), index=False)
    # vertex table for the polygon-overlap SAT oracle: convex polygons are
    # disjoint iff some edge half-plane of one has ALL the other's
    # vertices strictly outside (separating axis over edge normals)
    vx_rows = []
    for p in polys:
        for (x, y) in p["rings"][0]:
            vx_rows.append((p["poly_id"], p["ordinal"],
                            float(x), float(y)))
    pd.DataFrame(vx_rows, columns=["poly_id", "ordinal", "vx", "vy"]) \
        .to_parquet(os.path.join(out_dir, "mini_vertices.parquet"),
                    index=False)
    with open(marker, "w") as f:
        f.write(_VERSION)
    return out_dir


def mini_drill(spark, sf_dir: str, mode: str = "joined"):
    """The flagship waterbodies drill over the fixture tiles — compared
    row-for-row against the half-plane SQL oracle by the driver gate.

    ``mode`` selects the physical strategy under the SAME oracle:
    ``"joined"`` (broadcast-candidate), ``"cogrouped"`` (Exchange-free
    huge-layer cogroup), or ``"salted"`` (salted shuffle-hash cover
    join, the no-broadcast cover path) — every execution strategy must
    agree with the second engine, not just with each other."""
    from .operators.drill import drill, drill_cogrouped
    from .plugins import get_plugin

    out = build()
    tiles = spark.read.parquet(os.path.join(out, "mini_tiles.parquet"))
    polygons = spark.createDataFrame(
        datagen.polygons_pdf(_convex_polys()), schema=datagen.POLY_SCHEMA)
    plugin = get_plugin("waterbodies_c3")
    if mode == "cogrouped":
        res = drill_cogrouped(tiles, polygons, plugin, MINI_GRID,
                              partial=False)
    elif mode == "salted":
        res = drill(tiles, polygons, plugin, MINI_GRID, partial=False,
                    broadcast_cover=False)
    else:
        res = drill(tiles, polygons, plugin, MINI_GRID, partial=False)
    return res.select("poly_id", "ts", "px_wet", "pc_wet", "pc_missing")


def mini_wit(spark, sf_dir: str):
    """The WIT 10-band drill (Tasseled Cap Wetness + masking + zonal
    means) over the fixture's multiband tiles — exact-checked against the
    per-band pixel table in SQL.  Means are 4-dp rounded on both sides
    (summation order differs between numpy partials and SQL SUM);
    pc_missing is an exact integer-count division."""
    from pyspark.sql import functions as F

    from .operators.drill import drill
    from .operators.textqa import round4
    from .plugins import get_plugin

    out = build()
    tiles = spark.read.parquet(os.path.join(out, "mini_wit_tiles.parquet"))
    polygons = spark.createDataFrame(
        datagen.polygons_pdf(_convex_polys()), schema=datagen.POLY_SCHEMA)
    res = drill(tiles, polygons, get_plugin("wit_ls9"), MINI_GRID,
                partial=False)
    cols = [round4(F.col(b)).alias(b)
            for b in ("water", "wet", "bs", "pv", "npv")]
    return res.select("poly_id", "ts", *cols, "pc_missing")


def mini_wit_oracle_sql() -> str:
    out = build()
    px = os.path.join(out, "mini_wit_pixels.parquet")
    pl = os.path.join(out, "mini_planes.parquet")
    tcw = ("0.0315 * nbart_blue + 0.2021 * nbart_green + "
           "0.3102 * nbart_red + 0.1594 * nbart_nir "
           "- 0.6806 * nbart_swir_1 - 0.6109 * nbart_swir_2")
    r4 = "floor(({x}) * 10000 + 0.5) / 10000.0"
    n_mask = "SUM(CASE WHEN mask THEN 1 ELSE 0 END)"
    means = ", ".join(
        r4.format(x=f"SUM({v}) / {n_mask}") + f" AS {name}"
        for name, v in [
            ("water", "CASE WHEN mask AND ow THEN 1.0 ELSE 0.0 END"),
            ("wet", "CASE WHEN mask AND NOT ow AND wetb THEN 1.0 "
                    "ELSE 0.0 END"),
            ("bs", "CASE WHEN mask AND NOT ow AND NOT wetb "
                   "THEN bs / 100.0 ELSE 0.0 END"),
            ("pv", "CASE WHEN mask AND NOT ow AND NOT wetb "
                   "THEN pv / 100.0 ELSE 0.0 END"),
            ("npv", "CASE WHEN mask AND NOT ow AND NOT wetb "
                    "THEN npv / 100.0 ELSE 0.0 END"),
        ])
    return f"""
        WITH px AS (SELECT * FROM read_parquet('{px}')),
        pl AS (SELECT * FROM read_parquet('{pl}')),
        inside AS (
          SELECT p.px_id, pl.poly_id, pl.ordinal
          FROM (SELECT px_id, x, y FROM px) p JOIN pl ON TRUE
          GROUP BY p.px_id, p.x, p.y, pl.poly_id, pl.ordinal
          HAVING bool_and(pl.a * p.x + pl.b * p.y <= pl.c)
        ),
        own AS (
          SELECT px_id, arg_max(poly_id, ordinal) AS poly_id
          FROM inside GROUP BY px_id
        ),
        v AS (
          SELECT o.poly_id, p.ts_idx,
                 (p.water & 99) = 0 AS mask,
                 (p.water & 128) > 0 AS ow,
                 ((p.water & 99) = 0 AND ({tcw}) > -350) AS wetb,
                 p.bs, p.pv, p.npv
          FROM own o JOIN px p USING (px_id)
        )
        SELECT poly_id,
               TIMESTAMP '2020-01-01' + INTERVAL (ts_idx) DAY AS ts,
               {means},
               1.0 - CAST({n_mask} AS DOUBLE) / COUNT(*) AS pc_missing
        FROM v GROUP BY 1, 2
    """


def mini_drill_flags(spark, sf_dir: str):
    """The flagship drill in PARTIAL mode over ONE fixture tile: the
    observed extent is then the (0,0) tile bbox, which ``mini_rect_b``
    overflows to the North-East and ``mini_rect_e`` to the South-West
    (both corner cases, all four directions fire) while ``mini_rect_a``
    stays fully inside — so the ``conflux_n/s/e/w`` edge-direction flags
    (reference drill.py:104-220) are exercised non-vacuously and checked
    against an independent SQL implementation of the direction rule
    (half-plane chord tests, see :func:`mini_drill_flags_oracle_sql`)."""
    from pyspark.sql import functions as F

    from .operators.drill import FLAG_COLS, drill
    from .plugins import get_plugin

    out = build()
    tiles = (spark.read.parquet(os.path.join(out, "mini_tiles.parquet"))
             .filter(F.col("image_id").endswith("_x000_y000")))
    polygons = spark.createDataFrame(
        datagen.polygons_pdf(_convex_polys()), schema=datagen.POLY_SCHEMA)
    res = drill(tiles, polygons, get_plugin("waterbodies_c3"), MINI_GRID,
                partial=True)
    return res.select("poly_id", "ts", "px_wet", "pc_wet", "pc_missing",
                      *FLAG_COLS)


def mini_drill_flags_oracle_sql() -> str:
    """SQL second engine for the edge-direction rule, independent of the
    engine's clip-and-classify numpy path (core/geom.edge_directions).

    For a CONVEX polygon the reference's rule — clip to the extent; a
    clip-introduced horizontal boundary segment at the clipped shape's
    max-y means North (min-y South), a vertical one at max-x East (min-x
    West) — reduces to a chord test per extent side: the polygon
    overflows North iff its bbox strictly straddles the extent's top line
    (ymin < ry1 < ymax) AND its chord along ``y = ry1`` clipped to
    ``[rx0, rx1]`` has positive length.  The chord of a convex polygon
    along a line is computed directly from the stored half-planes:
    each plane ``a*x + b*y <= c`` at ``y = Y`` bounds x above (a > 0),
    below (a < 0), or is a feasibility test (a = 0)."""
    out = build()
    px = os.path.join(out, "mini_pixels.parquet")
    pl = os.path.join(out, "mini_planes.parquet")
    bb = os.path.join(out, "mini_bboxes.parquet")
    g = MINI_GRID
    rx0, ry0 = g.x_off, g.y_off
    rx1 = g.x_off + g.tile_span_x  # the (0,0) tile only
    ry1 = g.y_off + g.tile_span_y

    def chord(side, horizontal, fixed, lo, hi):
        # positive-length chord of the convex polygon along the side's
        # line, clipped to the extent's [lo, hi] range of the free axis
        if horizontal:
            bound, sign, feas = f"(c - b*{fixed})/a", "a", f"b*{fixed} <= c"
        else:
            bound, sign, feas = f"(c - a*{fixed})/b", "b", f"a*{fixed} <= c"
        return (
            f"ch_{side} AS (SELECT poly_id, "
            f"LEAST({hi}, COALESCE(MIN(CASE WHEN {sign} > 0 THEN {bound} "
            f"END), {hi})) > "
            f"GREATEST({lo}, COALESCE(MAX(CASE WHEN {sign} < 0 THEN "
            f"{bound} END), {lo})) "
            f"AND BOOL_AND(CASE WHEN {sign} = 0 THEN {feas} ELSE TRUE "
            f"END) AS pos_{side} FROM pl GROUP BY poly_id)")

    return f"""
        WITH px AS (SELECT * FROM read_parquet('{px}')
                    WHERE x < {rx1} AND y < {ry1}),
        pl AS (SELECT * FROM read_parquet('{pl}')),
        bb AS (SELECT * FROM read_parquet('{bb}')),
        {chord('n', True, ry1, rx0, rx1)},
        {chord('s', True, ry0, rx0, rx1)},
        {chord('e', False, rx1, ry0, ry1)},
        {chord('w', False, rx0, ry0, ry1)},
        flags AS (
          SELECT bb.poly_id,
                 bb.ymax > {ry1} AND bb.ymin < {ry1} AND pos_n AS conflux_n,
                 bb.ymin < {ry0} AND bb.ymax > {ry0} AND pos_s AS conflux_s,
                 bb.xmax > {rx1} AND bb.xmin < {rx1} AND pos_e AS conflux_e,
                 bb.xmin < {rx0} AND bb.xmax > {rx0} AND pos_w AS conflux_w
          FROM bb JOIN ch_n USING (poly_id) JOIN ch_s USING (poly_id)
                  JOIN ch_e USING (poly_id) JOIN ch_w USING (poly_id)
        ),
        inside AS (
          SELECT px.px_id, px.ts_idx, px.val, pl.poly_id, pl.ordinal
          FROM px JOIN pl ON TRUE
          GROUP BY px.px_id, px.ts_idx, px.val, pl.poly_id, pl.ordinal
          HAVING bool_and(pl.a * px.x + pl.b * px.y <= pl.c)
        ),
        own AS (
          SELECT px_id, ts_idx, val,
                 arg_max(poly_id, ordinal) AS poly_id
          FROM inside GROUP BY px_id, ts_idx, val
        ),
        agg AS (
          SELECT poly_id,
                 TIMESTAMP '2020-01-01' + INTERVAL (ts_idx) DAY AS ts,
                 COUNT(*) AS n_px,
                 SUM(CASE WHEN (val & 243) NOT IN (0, 128)
                     THEN 1 ELSE 0 END) AS n_missing,
                 SUM(CASE WHEN (val & 243) = 128 THEN 1 ELSE 0 END) AS n_wet
          FROM own GROUP BY 1, 2
        )
        SELECT agg.poly_id, ts,
               CASE WHEN n_missing / n_px <= 0.1
                    THEN CAST(n_wet AS DOUBLE)
                    ELSE CAST('nan' AS DOUBLE) END AS px_wet,
               CASE WHEN n_missing / n_px <= 0.1
                    THEN n_wet / n_px
                    ELSE CAST('nan' AS DOUBLE) END AS pc_wet,
               n_missing / n_px AS pc_missing,
               conflux_n, conflux_s, conflux_e, conflux_w
        FROM agg JOIN flags ON agg.poly_id = flags.poly_id
    """


def mini_image_stats(spark, sf_dir: str):
    """The multimodal ``image_stats`` feature-extraction pass (decode
    inside the Arrow batch -> per-image scalars) over the fixture tiles —
    exact-checked against the relational pixel table.  Mean and wet-bit
    fraction are exact (integer sums + one IEEE division); std is 4-dp
    rounded on both sides (numpy's two-pass vs SQL's moment formula
    differ in the last ulp)."""
    from pyspark.sql import functions as F

    from .operators.multimodal import image_stats
    from .operators.textqa import round4

    out = build()
    tiles = spark.read.parquet(os.path.join(out, "mini_tiles.parquet"))
    res = image_stats(tiles)
    return res.select("image_id", "px_mean", round4(F.col("px_std"))
                      .alias("px_std"), "px_min", "px_max", "wet_frac")


def mini_image_stats_oracle_sql() -> str:
    out = build()
    px = os.path.join(out, "mini_pixels.parquet")
    g = MINI_GRID
    return f"""
        WITH px AS (
          SELECT printf('t%04d_x%03d_y%03d', ts_idx,
                        CAST(floor((x - {g.x_off}) / {g.tile_span_x})
                             AS INT),
                        CAST(floor((y - {g.y_off}) / {g.tile_span_y})
                             AS INT)) AS image_id,
                 val
          FROM read_parquet('{px}')
        )
        SELECT image_id,
               SUM(val) / COUNT(*) AS px_mean,
               floor(sqrt(SUM(CAST(val AS DOUBLE) * val) / COUNT(*)
                          - (SUM(val) / COUNT(*))
                            * (SUM(val) / COUNT(*))) * 10000 + 0.5)
                 / 10000.0 AS px_std,
               CAST(MIN(val) AS INT) AS px_min,
               CAST(MAX(val) AS INT) AS px_max,
               SUM(CASE WHEN (val & 128) > 0 THEN 1.0 ELSE 0.0 END)
                 / COUNT(*) AS wet_frac
        FROM px GROUP BY image_id
    """


def mini_image_histogram(spark, sf_dir: str):
    """The multimodal histogram pass (decode -> per-image bincount of
    value buckets) over the fixture tiles, exact-checked against the
    relational pixel table grouped by (image, val // 16) — integer
    counts, no rounding anywhere."""
    from .operators.multimodal import image_histogram

    out = build()
    tiles = spark.read.parquet(os.path.join(out, "mini_tiles.parquet"))
    return image_histogram(tiles, bin_width=16)


def mini_image_histogram_oracle_sql() -> str:
    out = build()
    px = os.path.join(out, "mini_pixels.parquet")
    g = MINI_GRID
    return f"""
        WITH px AS (
          SELECT printf('t%04d_x%03d_y%03d', ts_idx,
                        CAST(floor((x - {g.x_off}) / {g.tile_span_x})
                             AS INT),
                        CAST(floor((y - {g.y_off}) / {g.tile_span_y})
                             AS INT)) AS image_id,
                 val
          FROM read_parquet('{px}')
        )
        SELECT image_id, CAST(val // 16 AS INT) AS bin,
               COUNT(*) AS n_px
        FROM px GROUP BY image_id, bin
    """


def mini_audio_stats(spark, sf_dir: str):
    """The multimodal audio feature pass (rawpcm decode -> duration /
    RMS / peak / zero crossings) over the fixture clips, exact-checked
    against the relational sample table.  Zero crossings use the
    sign-of-(s>=0) change rule on both sides; RMS is 4-dp rounded
    half-up (int16^2 sums exact in float64)."""
    from .operators.multimodal import audio_stats

    out = build()
    clips = spark.read.parquet(os.path.join(out, "mini_audio.parquet"))
    return audio_stats(clips)


def mini_audio_stats_oracle_sql() -> str:
    out = build()
    samp = os.path.join(out, "mini_audio_samples.parquet")
    return f"""
        WITH s AS (
          SELECT audio_id, idx, sample,
                 CASE WHEN sample >= 0 THEN 1 ELSE 0 END AS nn,
                 LAG(CASE WHEN sample >= 0 THEN 1 ELSE 0 END)
                   OVER (PARTITION BY audio_id ORDER BY idx) AS prev_nn
          FROM read_parquet('{samp}')
        )
        SELECT audio_id,
               COUNT(*) / 8000.0 AS duration_sec,
               floor(sqrt(SUM(CAST(sample AS DOUBLE) * sample)
                          / COUNT(*)) * 10000 + 0.5) / 10000.0 AS rms,
               CAST(MAX(abs(sample)) AS INT) AS peak,
               CAST(SUM(CASE WHEN prev_nn IS NOT NULL
                             AND nn <> prev_nn THEN 1 ELSE 0 END)
                    AS INT) AS zero_crossings
        FROM s GROUP BY audio_id
    """


def mini_audio_chunks(spark, sf_dir: str):
    """The fixed-window audio segmentation pass (100 ms windows, RMS +
    silence flag) over the fixture clips — including clip06's
    alternating loud/near-silent windows, so ``is_silence`` is checked
    on both sides of the threshold — against the relational sample
    table grouped by ``idx // 800``."""
    from .operators.multimodal import audio_chunks

    out = build()
    clips = spark.read.parquet(os.path.join(out, "mini_audio.parquet"))
    return audio_chunks(clips, window_ms=100, silence_rms=500.0)


def mini_audio_chunks_oracle_sql() -> str:
    out = build()
    samp = os.path.join(out, "mini_audio_samples.parquet")
    return f"""
        WITH w AS (
          SELECT audio_id, CAST(idx // 800 AS INT) AS win,
                 CAST(MIN(idx) AS BIGINT) AS start_idx,
                 CAST(COUNT(*) AS INT) AS n_samples,
                 floor(sqrt(SUM(CAST(sample AS DOUBLE) * sample)
                            / COUNT(*)) * 10000 + 0.5) / 10000.0 AS rms
          FROM read_parquet('{samp}')
          GROUP BY audio_id, CAST(idx // 800 AS INT)
        )
        SELECT audio_id, win, start_idx, n_samples, rms,
               rms < 500.0 AS is_silence
        FROM w
    """


def mini_audio_resample_stats(spark, sf_dir: str):
    """The decimation pass driven end-to-end by a second engine:
    rawpcm decode -> keep every 2nd sample at sr/2 -> re-encode ->
    feature pass.  The oracle aggregates the even-index rows of the
    relational sample table at the halved rate, so the resampled BYTES
    (not just the maths) are what is being checked — wrong stride, rate
    or byte order would break duration, RMS and crossings at once."""
    from .operators.multimodal import audio_resample, audio_stats

    out = build()
    clips = spark.read.parquet(os.path.join(out, "mini_audio.parquet"))
    return audio_stats(audio_resample(clips, factor=2))


def mini_audio_resample_stats_oracle_sql() -> str:
    out = build()
    samp = os.path.join(out, "mini_audio_samples.parquet")
    return f"""
        WITH s AS (
          SELECT audio_id, idx, sample,
                 CASE WHEN sample >= 0 THEN 1 ELSE 0 END AS nn,
                 LAG(CASE WHEN sample >= 0 THEN 1 ELSE 0 END)
                   OVER (PARTITION BY audio_id ORDER BY idx) AS prev_nn
          FROM read_parquet('{samp}')
          WHERE idx % 2 = 0
        )
        SELECT audio_id,
               COUNT(*) / 4000.0 AS duration_sec,
               floor(sqrt(SUM(CAST(sample AS DOUBLE) * sample)
                          / COUNT(*)) * 10000 + 0.5) / 10000.0 AS rms,
               CAST(MAX(abs(sample)) AS INT) AS peak,
               CAST(SUM(CASE WHEN prev_nn IS NOT NULL
                             AND nn <> prev_nn THEN 1 ELSE 0 END)
                    AS INT) AS zero_crossings
        FROM s GROUP BY audio_id
    """


def mini_image_resize_stats(spark, sf_dir: str):
    """The multimodal resize pass driven end-to-end by a second engine:
    decode -> nearest-neighbour 16x16 -> 8x8 -> re-encode raw -> decode
    -> per-image stats, compared against the relational pixel table
    restricted to the pixels NN sampling selects (even row/col indices:
    ``arange(8) * 16 // 8``)."""
    from pyspark.sql import functions as F

    from .operators.multimodal import image_stats, resize_images
    from .operators.textqa import round4

    out = build()
    tiles = spark.read.parquet(os.path.join(out, "mini_tiles.parquet"))
    res = image_stats(resize_images(tiles, 8, 8))
    return res.select("image_id", "px_mean", round4(F.col("px_std"))
                      .alias("px_std"), "px_min", "px_max", "wet_frac")


def mini_image_resize_stats_oracle_sql() -> str:
    out = build()
    px = os.path.join(out, "mini_pixels.parquet")
    g = MINI_GRID
    # global pixel index parity == local parity (tile width 16 is even),
    # and NN 16->8 keeps exactly the even local indices
    return f"""
        WITH px AS (
          SELECT printf('t%04d_x%03d_y%03d', ts_idx,
                        CAST(floor((x - {g.x_off}) / {g.tile_span_x})
                             AS INT),
                        CAST(floor((y - {g.y_off}) / {g.tile_span_y})
                             AS INT)) AS image_id,
                 val
          FROM read_parquet('{px}')
          WHERE CAST(floor((x - {g.x_off}) / {g.px_res}) AS INT) % 2 = 0
            AND CAST(floor((y - {g.y_off}) / {g.px_res}) AS INT) % 2 = 0
        )
        SELECT image_id,
               SUM(val) / COUNT(*) AS px_mean,
               floor(sqrt(SUM(CAST(val AS DOUBLE) * val) / COUNT(*)
                          - (SUM(val) / COUNT(*))
                            * (SUM(val) / COUNT(*))) * 10000 + 0.5)
                 / 10000.0 AS px_std,
               CAST(MIN(val) AS INT) AS px_min,
               CAST(MAX(val) AS INT) AS px_max,
               SUM(CASE WHEN (val & 128) > 0 THEN 1.0 ELSE 0.0 END)
                 / COUNT(*) AS wet_frac
        FROM px GROUP BY image_id
    """


def mini_frame_sample_stats(spark, sf_dir: str):
    """The video frame-sampling plumbing driven by a second engine: each
    fixture video (rawstack of the slot's per-timestep pixel arrays)
    explodes into per-frame raw images, whose decoded stats must equal
    the relational pixel table grouped by (slot, timestep)."""
    from pyspark.sql import functions as F

    from .operators.multimodal import frame_sample, image_stats
    from .operators.textqa import round4

    out = build()
    videos = spark.read.parquet(os.path.join(out, "mini_videos.parquet"))
    res = image_stats(frame_sample(videos, every_n=1))
    return res.select("image_id", "px_mean", round4(F.col("px_std"))
                      .alias("px_std"), "px_min", "px_max", "wet_frac")


def mini_frame_sample_stats_oracle_sql() -> str:
    out = build()
    px = os.path.join(out, "mini_pixels.parquet")
    g = MINI_GRID
    return f"""
        WITH px AS (
          SELECT printf('v_x%03d_y%03d#f%05d',
                        CAST(floor((x - {g.x_off}) / {g.tile_span_x})
                             AS INT),
                        CAST(floor((y - {g.y_off}) / {g.tile_span_y})
                             AS INT),
                        ts_idx) AS image_id,
                 val
          FROM read_parquet('{px}')
        )
        SELECT image_id,
               SUM(val) / COUNT(*) AS px_mean,
               floor(sqrt(SUM(CAST(val AS DOUBLE) * val) / COUNT(*)
                          - (SUM(val) / COUNT(*))
                            * (SUM(val) / COUNT(*))) * 10000 + 0.5)
                 / 10000.0 AS px_std,
               CAST(MIN(val) AS INT) AS px_min,
               CAST(MAX(val) AS INT) AS px_max,
               SUM(CASE WHEN (val & 128) > 0 THEN 1.0 ELSE 0.0 END)
                 / COUNT(*) AS wet_frac
        FROM px GROUP BY image_id
    """


def mini_image_neardup(spark, sf_dir: str):
    """Image near-duplicate pairs over the fixture's orig+twin tile
    corpus: decode -> perceptual average-hash (Arrow batch) -> banded
    candidate join -> JVM bit_count verify — exact-checked against a
    brute-force hamming SQL oracle over the stored hash table.  The 16
    planted (orig, twin) pairs are within hamming 3; unrelated tiles sit
    ~25-35 bits apart, so the gate is non-vacuous in both directions."""
    from .operators.multimodal import hash_neardup_pairs, image_ahash

    out = build()
    tiles = spark.read.parquet(
        os.path.join(out, "mini_ahash_tiles.parquet"))
    return hash_neardup_pairs(image_ahash(tiles), max_hamming=3)


def mini_image_neardup_oracle_sql() -> str:
    out = build()
    ah = os.path.join(out, "mini_ahashes.parquet")
    return f"""
        WITH h AS (SELECT * FROM read_parquet('{ah}'))
        SELECT a.image_id AS id1, b.image_id AS id2,
               CAST(bit_count(xor(a.ahash, b.ahash)) AS INT) AS hamming
        FROM h a JOIN h b ON a.image_id < b.image_id
        WHERE bit_count(xor(a.ahash, b.ahash)) <= 3
    """


def mini_knn(spark, sf_dir: str, broadcast_index=True):
    """The cell-ring kNN (nearest polygon centroids, exactness guard +
    brute fallback) over the fixture — exact-checked against a
    brute-force SQL oracle.  ``broadcast_index=False`` exercises the
    shuffle-join scale path (the plan a layer too large to broadcast
    would run) under the SAME oracle."""
    from pyspark.sql import functions as F

    from .operators.knn import knn_nearest
    from .operators.textqa import round4

    out = build()
    queries = spark.read.parquet(os.path.join(out, "mini_queries.parquet"))
    polygons = spark.createDataFrame(
        datagen.polygons_pdf(_convex_polys()), schema=datagen.POLY_SCHEMA)
    res = knn_nearest(queries, polygons, k=2, res=9, ring=1,
                      broadcast_index=broadcast_index)
    # 4-dp rounding on the OUTPUT value only (ranking runs on the raw
    # distance): Spark's pow(x, 2) and SQL's x*x may differ in the last
    # ulp, which the driver's value-hash would flag
    return res.select("qid", "poly_id",
                      round4(F.col("dist")).alias("dist"), "rank")


def mini_knn_oracle_sql() -> str:
    out = build()
    q = os.path.join(out, "mini_queries.parquet")
    c = os.path.join(out, "mini_centroids.parquet")
    return f"""
        WITH q AS (SELECT * FROM read_parquet('{q}')),
        c AS (SELECT * FROM read_parquet('{c}')),
        d AS (SELECT qid, poly_id,
                     sqrt((qx - cx) * (qx - cx) + (qy - cy) * (qy - cy))
                       AS dist
              FROM q CROSS JOIN c),
        r AS (SELECT qid, poly_id, dist,
                     ROW_NUMBER() OVER (PARTITION BY qid
                         ORDER BY dist ASC, poly_id) AS rank
              FROM d)
        SELECT qid, poly_id,
               floor(dist * 10000 + 0.5) / 10000.0 AS dist,
               CAST(rank AS INT) AS rank
        FROM r WHERE rank <= 2
    """


def mini_drill_oracle_sql() -> str:
    out = build()
    px = os.path.join(out, "mini_pixels.parquet")
    pl = os.path.join(out, "mini_planes.parquet")
    return f"""
        WITH px AS (SELECT * FROM read_parquet('{px}')),
        pl AS (SELECT * FROM read_parquet('{pl}')),
        inside AS (
          SELECT px.px_id, px.ts_idx, px.val, pl.poly_id, pl.ordinal
          FROM px JOIN pl ON TRUE
          GROUP BY px.px_id, px.ts_idx, px.val, pl.poly_id, pl.ordinal
          HAVING bool_and(pl.a * px.x + pl.b * px.y <= pl.c)
        ),
        own AS (
          SELECT px_id, ts_idx, val,
                 arg_max(poly_id, ordinal) AS poly_id
          FROM inside GROUP BY px_id, ts_idx, val
        ),
        agg AS (
          SELECT poly_id,
                 TIMESTAMP '2020-01-01' + INTERVAL (ts_idx) DAY AS ts,
                 COUNT(*) AS n_px,
                 SUM(CASE WHEN (val & 243) NOT IN (0, 128)
                     THEN 1 ELSE 0 END) AS n_missing,
                 SUM(CASE WHEN (val & 243) = 128 THEN 1 ELSE 0 END) AS n_wet
          FROM own GROUP BY 1, 2
        )
        SELECT poly_id, ts,
               CASE WHEN n_missing / n_px <= 0.1
                    THEN CAST(n_wet AS DOUBLE)
                    ELSE CAST('nan' AS DOUBLE) END AS px_wet,
               CASE WHEN n_missing / n_px <= 0.1
                    THEN n_wet / n_px
                    ELSE CAST('nan' AS DOUBLE) END AS pc_wet,
               n_missing / n_px AS pc_missing
        FROM agg
    """


def _px_local_cte(px_path: str) -> str:
    """Shared CTE: pixel table with tile id parts + LOCAL pixel indices
    (row 0 = southernmost row, matching the engine's decode layout)."""
    g = MINI_GRID
    return f"""
        px AS (
          SELECT ts_idx,
                 CAST(floor((x - {g.x_off}) / {g.px_res}) AS INT)
                   // {g.w} AS gx,
                 CAST(floor((y - {g.y_off}) / {g.px_res}) AS INT)
                   // {g.h} AS gy,
                 CAST(floor((x - {g.x_off}) / {g.px_res}) AS INT)
                   % {g.w} AS lx,
                 CAST(floor((y - {g.y_off}) / {g.px_res}) AS INT)
                   % {g.h} AS ly,
                 x, y, val
          FROM read_parquet('{px_path}')
        )"""


_STATS_SELECT = """
               SUM(val) / COUNT(*) AS px_mean,
               floor(sqrt(SUM(CAST(val AS DOUBLE) * val) / COUNT(*)
                          - (SUM(val) / COUNT(*))
                            * (SUM(val) / COUNT(*))) * 10000 + 0.5)
                 / 10000.0 AS px_std,
               CAST(MIN(val) AS INT) AS px_min,
               CAST(MAX(val) AS INT) AS px_max,
               SUM(CASE WHEN (val & 128) > 0 THEN 1.0 ELSE 0.0 END)
                 / COUNT(*) AS wet_frac"""


def mini_image_flip(spark, sf_dir: str):
    """The flip augmentation pass driven per-PIXEL by a second engine:
    decode -> 180-degree flip (``hv``) -> re-encode -> explode back to
    relational rows (decode_pixels), compared against the pixel table
    with mirrored local indices.  Every output pixel of the augmented
    image is checked — codec round-trip included — with no rounding
    anywhere (integer values)."""
    from .operators.multimodal import decode_pixels, flip_images

    out = build()
    tiles = spark.read.parquet(os.path.join(out, "mini_tiles.parquet"))
    return decode_pixels(flip_images(tiles, mode="hv"))


def mini_image_flip_oracle_sql() -> str:
    out = build()
    px = os.path.join(out, "mini_pixels.parquet")
    g = MINI_GRID
    return f"""
        WITH {_px_local_cte(px)}
        SELECT printf('t%04d_x%03d_y%03d#fhv', ts_idx, gx, gy)
                 AS image_id,
               {g.h - 1} - ly AS py, {g.w - 1} - lx AS px, val
        FROM px
    """


def mini_image_patches(spark, sf_dir: str):
    """ViT-style patch extraction driven by a second engine: 16x16 tiles
    -> sixteen 4x4 patch images (crop + re-encode) -> decoded stats,
    compared against the pixel table grouped by (tile, ly//4, lx//4).
    Mean/min/max/wet fraction exact; std 4-dp rounded both sides."""
    from pyspark.sql import functions as F

    from .operators.multimodal import image_patches, image_stats
    from .operators.textqa import round4

    out = build()
    tiles = spark.read.parquet(os.path.join(out, "mini_tiles.parquet"))
    res = image_stats(image_patches(tiles, patch=4))
    return res.select("image_id", "px_mean", round4(F.col("px_std"))
                      .alias("px_std"), "px_min", "px_max", "wet_frac")


def mini_image_patches_oracle_sql() -> str:
    out = build()
    px = os.path.join(out, "mini_pixels.parquet")
    return f"""
        WITH {_px_local_cte(px)}
        SELECT printf('t%04d_x%03d_y%03d#p%02d_%02d', ts_idx, gx, gy,
                      ly // 4, lx // 4) AS image_id,
               {_STATS_SELECT}
        FROM px GROUP BY image_id
    """


def mini_chip_stats(spark, sf_dir: str):
    """Polygon-bbox training-chip extraction driven by a second engine:
    broadcast range join (bbox intersects tile extent) -> decode -> crop
    to the pixel-centre window -> re-encode -> decoded stats, compared
    against the pixel table filtered to centres inside each polygon's
    bbox.  Exercises clipping on every side: mini_rect_e overflows the
    grid extent south-west, mini_rect_b spans a tile boundary."""
    from pyspark.sql import functions as F

    from .operators.multimodal import extract_chips, image_stats
    from .operators.textqa import round4

    out = build()
    tiles = spark.read.parquet(os.path.join(out, "mini_tiles.parquet"))
    bboxes = spark.read.parquet(os.path.join(out, "mini_bboxes.parquet"))
    res = image_stats(extract_chips(tiles, bboxes, MINI_GRID))
    return res.select("image_id", "px_mean", round4(F.col("px_std"))
                      .alias("px_std"), "px_min", "px_max", "wet_frac")


def mini_chip_stats_oracle_sql() -> str:
    out = build()
    px = os.path.join(out, "mini_pixels.parquet")
    bb = os.path.join(out, "mini_bboxes.parquet")
    return f"""
        WITH {_px_local_cte(px)},
        bb AS (SELECT * FROM read_parquet('{bb}'))
        SELECT printf('%s@t%04d_x%03d_y%03d', bb.poly_id, ts_idx, gx, gy)
                 AS image_id,
               {_STATS_SELECT}
        FROM px JOIN bb
          ON px.x > bb.xmin AND px.x < bb.xmax
         AND px.y > bb.ymin AND px.y < bb.ymax
        GROUP BY image_id
    """


def mini_poly_overlap(spark, sf_dir: str):
    """The polygon-polygon overlap join (cell-cover candidates + exact
    edge-cross/containment refine, operators/overlap.py) over the convex
    fixture polygons — exact-checked against an independent DuckDB
    separating-axis oracle over the stored half-planes + vertices."""
    from .operators.overlap import polygon_overlap_pairs

    build()
    polygons = spark.createDataFrame(
        datagen.polygons_pdf(_convex_polys()), schema=datagen.POLY_SCHEMA)
    return polygon_overlap_pairs(polygons)


def mini_poly_overlap_oracle_sql() -> str:
    out = build()
    pl = os.path.join(out, "mini_planes.parquet")
    vx = os.path.join(out, "mini_vertices.parquet")
    return f"""
        WITH pl AS (SELECT * FROM read_parquet('{pl}')),
        vx AS (SELECT * FROM read_parquet('{vx}')),
        p AS (SELECT DISTINCT poly_id, ordinal FROM vx),
        sep AS (
          -- a half-plane of polygon P with ALL of Q's vertices strictly
          -- outside separates the (convex) pair -> disjoint
          SELECT pl.poly_id AS p_sep, vx.poly_id AS q_sep
          FROM pl JOIN vx ON vx.poly_id <> pl.poly_id
          GROUP BY pl.poly_id, pl.a, pl.b, pl.c, vx.poly_id
          HAVING bool_and(pl.a * vx.vx + pl.b * vx.vy > pl.c)
        )
        SELECT a.poly_id AS poly_id_a, b.poly_id AS poly_id_b
        FROM p a JOIN p b ON a.ordinal < b.ordinal
        WHERE NOT EXISTS (
          SELECT 1 FROM sep s
          WHERE (s.p_sep = a.poly_id AND s.q_sep = b.poly_id)
             OR (s.p_sep = b.poly_id AND s.q_sep = a.poly_id))
    """


def mini_wofs_summary(spark, sf_dir: str):
    """The per-pixel temporal composite (WOfS-summary product,
    operators/summary.py: partial mapInPandas count planes -> final
    plane sum -> pixel explode) over the fixture tiles — exact-checked
    against the relational pixel table grouped by pixel position.
    Counts are integers; wet_freq is one IEEE division (NULL where a
    pixel was never clear), so both engines are exact."""
    from .operators.summary import wofs_summary_pixels

    out = build()
    g = MINI_GRID
    tiles = spark.read.parquet(os.path.join(out, "mini_tiles.parquet"))
    return wofs_summary_pixels(tiles, g.x_off, g.y_off, g.tile_span_x,
                               g.tile_span_y, g.px_res)


def mini_wofs_summary_oracle_sql() -> str:
    out = build()
    px = os.path.join(out, "mini_pixels.parquet")
    return f"""
        SELECT x, y,
               SUM(CASE WHEN (val & 243) = 128
                   THEN 1 ELSE 0 END) AS n_wet,
               SUM(CASE WHEN (val & 243) IN (0, 128)
                   THEN 1 ELSE 0 END) AS n_clear,
               CAST(SUM(CASE WHEN (val & 243) = 128 THEN 1 ELSE 0 END)
                    AS DOUBLE)
                 / NULLIF(SUM(CASE WHEN (val & 243) IN (0, 128)
                              THEN 1 ELSE 0 END), 0) AS wet_freq
        FROM read_parquet('{px}')
        GROUP BY x, y
    """
