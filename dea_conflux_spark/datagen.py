"""Deterministic synthetic data generator (FIXTURES.md T1/T2, seed=42).

Produces the two engine inputs:

* ``tiles`` — image+caption rows with EXACTLY the BASELINE.json input_hint
  schema ``(image_id string, bytes binary, w int, h int, fmt string,
  caption string, phash long)``.  Placement (grid x/y, timestep) is encoded
  in ``image_id`` = ``t{ts:04d}_x{gx:03d}_y{gy:03d}`` and derived downstream,
  mirroring the reference's scene grid (resolution=(-30,30),
  reference tests/data/sum_wet.conflux.py:5).
* ``polygons`` — waterbody rows ``(poly_id, ordinal, rings, cx, cy, bbox,
  area)`` with geohash-style string ids (reference tests/test_stack.py:26).

Pixel model: uint8 WOfS-style bitfield (bit 7 water, bit 6 cloud, bit 2
sea/low-solar-angle noise, value 1 nodata) matching
reference examples/ga_ls_wo_3_flags.conflux.py:19-28.  Pixels are wet when
inside a waterbody polygon and a seeded per-(tile, timestep) noise draw
passes, so wet fractions are non-trivial and polygon-aligned.

All pixel content is a pure function of ``(seed, ts_idx, gx, gy)`` so tiles
generate independently on any executor — the distributed generator
(`generate_tiles_spark`) and the driver-side one produce identical rows.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd

from .config import EPOCH, PIXEL_RES
from .core import codec, geom


@dataclass(frozen=True)
class GridSpec:
    """Tile-grid geometry: G x G tiles of (w x h) px at ``px_res`` m/px,
    anchored at (x_off, y_off), T timesteps of one day starting at EPOCH."""

    G: int = 8
    T: int = 4
    w: int = 64
    h: int = 64
    px_res: float = PIXEL_RES
    x_off: float = 100_000.0
    y_off: float = 100_000.0
    seed: int = 42

    @property
    def tile_span_x(self) -> float:
        return self.w * self.px_res

    @property
    def tile_span_y(self) -> float:
        return self.h * self.px_res

    def tile_origin(self, gx: int, gy: int) -> tuple:
        return (self.x_off + gx * self.tile_span_x,
                self.y_off + gy * self.tile_span_y)

    @property
    def extent(self) -> tuple:
        return (self.x_off, self.y_off,
                self.x_off + self.G * self.tile_span_x,
                self.y_off + self.G * self.tile_span_y)

    def ts_of(self, ts_idx: int):
        return np.datetime64(EPOCH) + np.timedelta64(ts_idx, "D")


def image_id(ts_idx: int, gx: int, gy: int) -> str:
    return f"t{ts_idx:04d}_x{gx:03d}_y{gy:03d}"


# ---------------------------------------------------------------- polygons

def _blob(rng, cx, cy, r, n_min=6, n_max=24):
    n = int(rng.integers(n_min, n_max + 1))
    ang = np.sort(rng.uniform(0, 2 * np.pi, n))
    rad = r * rng.uniform(0.55, 1.0, n)
    return np.stack([cx + rad * np.cos(ang), cy + rad * np.sin(ang)], axis=1)


def make_polygons(grid: GridSpec, n_small: int = 40, n_medium: int = 5,
                  n_huge: int = 2) -> list:
    """FIXTURES.md T2 population: small lakes, medium, huge skew polygons,
    tile-edge straddlers, overlapping pair, one hole, one fully outside."""
    rng = np.random.default_rng([grid.seed, 7])
    x0, y0, x1, y1 = grid.extent
    span = min(x1 - x0, y1 - y0)
    polys = []
    seen_ids = set()

    def add(rings, kind):
        cx, cy = geom.centroid(rings)
        # geohash-style id: map world coords into a +/-80deg pseudo frame
        la = (cy / 4_194_304.0) * 160.0 - 80.0
        lo = (cx / 4_194_304.0) * 320.0 - 160.0
        pid = geom.geohash_encode(la, lo, 9)
        while pid in seen_ids:
            pid = pid + "x"
        seen_ids.add(pid)
        bx = geom.bbox(rings)
        polys.append({
            "poly_id": pid, "kind": kind,
            "rings": [np.asarray(r, dtype=np.float64) for r in rings],
            "cx": cx, "cy": cy,
            "xmin": bx[0], "ymin": bx[1], "xmax": bx[2], "ymax": bx[3],
            "area": geom.area(rings),
        })

    for _ in range(n_small):  # 3-30 px across at 30 m/px -> r 45..450 m
        r = rng.uniform(45, 450)
        cx = rng.uniform(x0 + r, x1 - r)
        cy = rng.uniform(y0 + r, y1 - r)
        add([_blob(rng, cx, cy, r)], "small")
    for _ in range(n_medium):
        r = rng.uniform(800, 1500)
        add([_blob(rng, rng.uniform(x0 + r, x1 - r),
                   rng.uniform(y0 + r, y1 - r), r)], "medium")
    for _ in range(n_huge):  # skew-inducing: spans many tiles
        r = min(span * 0.28, rng.uniform(0.18, 0.30) * span)
        add([_blob(rng, rng.uniform(x0 + r, x1 - r),
                   rng.uniform(y0 + r, y1 - r), r, 16, 24)], "huge")
    # straddlers centred on internal tile boundaries
    for i in range(3):
        bx = x0 + ((i % grid.G) or 1) * grid.tile_span_x
        by = rng.uniform(y0 + 500, y1 - 500)
        add([_blob(rng, bx, by, rng.uniform(200, 500))], "straddle")
    # extent-overflow polygons centred on the outer boundary — these must
    # yield TRUE conflux_n/s/e/w flags (reference drill.py:104-220)
    for dx, dy, kind in ((0, 1, "overflow_n"), (0, -1, "overflow_s"),
                         (1, 0, "overflow_e"), (-1, 0, "overflow_w")):
        r = rng.uniform(300, 600)
        cx = (x1 if dx > 0 else x0) if dx != 0 else rng.uniform(
            x0 + 0.3 * (x1 - x0), x0 + 0.7 * (x1 - x0))
        cy = (y1 if dy > 0 else y0) if dy != 0 else rng.uniform(
            y0 + 0.3 * (y1 - y0), y0 + 0.7 * (y1 - y0))
        add([_blob(rng, cx, cy, r)], kind)
    # overlapping pair (tests rasterise last-wins tie-break)
    cx = rng.uniform(x0 + 1000, x1 - 1000)
    cy = rng.uniform(y0 + 1000, y1 - 1000)
    add([_blob(rng, cx, cy, 420)], "overlap_a")
    add([_blob(rng, cx + 150, cy + 100, 420)], "overlap_b")
    # polygon with a hole
    cx = rng.uniform(x0 + 1500, x1 - 1500)
    cy = rng.uniform(y0 + 1500, y1 - 1500)
    outer = _blob(rng, cx, cy, 700, 12, 16)
    hole = _blob(rng, cx, cy, 200, 6, 8)[::-1]
    add([outer, hole], "holed")
    # fully outside every tile
    add([_blob(rng, x1 + 5 * grid.tile_span_x, y1 + 5 * grid.tile_span_y, 300)],
        "outside")
    for i, p in enumerate(polys):
        p["ordinal"] = i
    return polys


def polygons_pdf(polys: list) -> pd.DataFrame:
    """Polygon table as pandas (rings nested lists -> Spark
    array<array<array<double>>>)."""
    return pd.DataFrame({
        "poly_id": [p["poly_id"] for p in polys],
        "ordinal": np.array([p["ordinal"] for p in polys], dtype=np.int32),
        "rings": [[[list(map(float, v)) for v in r] for r in p["rings"]]
                  for p in polys],
        "cx": [p["cx"] for p in polys],
        "cy": [p["cy"] for p in polys],
        "xmin": [p["xmin"] for p in polys],
        "ymin": [p["ymin"] for p in polys],
        "xmax": [p["xmax"] for p in polys],
        "ymax": [p["ymax"] for p in polys],
        "area": [p["area"] for p in polys],
    })


# ------------------------------------------------------------------- tiles

def tile_pixels(grid: GridSpec, ts_idx: int, gx: int, gy: int,
                preps: list) -> np.ndarray:
    """Deterministic uint8 WOfS bitfield for one tile.

    ``preps`` is the list of (ordinal, Prepared, phase) for all polygons
    (pre-prepared once per process).  arr[i, j] maps to the pixel whose
    centre is (x0 + (j+.5)*res, y0 + (i+.5)*res) — row 0 is the southern row.
    """
    rng = np.random.default_rng([grid.seed, ts_idx, gx, gy])
    w, h = grid.w, grid.h
    x0, y0 = grid.tile_origin(gx, gy)
    xs = x0 + (np.arange(w) + 0.5) * grid.px_res
    ys = y0 + (np.arange(h) + 0.5) * grid.px_res
    arr = np.zeros((h, w), dtype=np.uint8)
    tx1, ty1 = x0 + grid.tile_span_x, y0 + grid.tile_span_y

    inside_any = np.zeros((h, w), dtype=bool)
    for ordinal, prep, phase in preps:
        bx0, by0, bx1, by1 = prep.bbox
        if bx1 <= x0 or bx0 >= tx1 or by1 <= y0 or by0 >= ty1:
            continue
        inside_any |= geom.contains_grid(prep, xs, ys)
    # seasonal wetness: fraction of in-lake pixels that are wet this timestep
    p_wet = 0.55 + 0.4 * np.sin(2 * np.pi * ts_idx / max(grid.T, 1) + 0.7)
    wet = inside_any & (rng.uniform(size=(h, w)) < p_wet)
    arr[wet] |= 128
    # sparse false-positive wet speckle outside lakes
    speck = (~inside_any) & (rng.uniform(size=(h, w)) < 0.002)
    arr[speck] |= 128
    # sea / low-solar-angle bits (masked off by the c3 plugin -> dry)
    sea = rng.uniform(size=(h, w)) < 0.01
    arr[sea] |= 4
    # cloud patches (bit 6) -> invalid
    for _ in range(int(rng.integers(0, 3))):
        cw = int(rng.integers(4, max(5, w // 3)))
        ch = int(rng.integers(4, max(5, h // 3)))
        cj = int(rng.integers(0, w - cw))
        ci = int(rng.integers(0, h - ch))
        arr[ci:ci + ch, cj:cj + cw] |= 64
    # nodata stripe (value 1) occasionally
    if rng.uniform() < 0.15:
        j = int(rng.integers(0, w - 4))
        arr[:, j:j + 4] = 1
    return arr


def tile_row(grid: GridSpec, ts_idx: int, gx: int, gy: int, preps: list,
             fmt: str = "raw") -> dict:
    arr = tile_pixels(grid, ts_idx, gx, gy, preps)
    iid = image_id(ts_idx, gx, gy)
    frac = float((arr & 128 > 0).mean())
    data = codec.encode(arr, fmt)
    dec = codec.decode(data, grid.h, grid.w, fmt)
    return {
        "image_id": iid,
        "bytes": data,
        "w": np.int32(grid.w),
        "h": np.int32(grid.h),
        "fmt": fmt,
        "caption": f"scene {iid} wet_frac={frac:.3f}",
        "phash": np.int64(codec.phash64(dec)),
    }


def prepare_polys(polys: list) -> list:
    return [(p["ordinal"], geom.prepare(p["rings"]), i * 0.37)
            for i, p in enumerate(polys)]


def make_tiles_pdf(grid: GridSpec, polys: list) -> pd.DataFrame:
    """Driver-side tile generation (test scale)."""
    preps = prepare_polys(polys)
    rows = [tile_row(grid, t, gx, gy, preps)
            for t in range(grid.T) for gx in range(grid.G)
            for gy in range(grid.G)]
    pdf = pd.DataFrame(rows)
    pdf["w"] = pdf["w"].astype("int32")
    pdf["h"] = pdf["h"].astype("int32")
    pdf["phash"] = pdf["phash"].astype("int64")
    return pdf


def wit_tile_bands(grid: GridSpec, ts_idx: int, gx: int, gy: int,
                   preps: list) -> dict:
    """Deterministic multiband WIT tile: WOfS-style water bitfield +
    six int16 reflectance planes (tuned so Tasseled Cap Wetness straddles
    the -350 threshold, wetter inside lakes) + three uint8 fractional-cover
    planes (0..120 to exercise the >100 normalisation case)."""
    rng = np.random.default_rng([grid.seed, 91, ts_idx, gx, gy])
    w, h = grid.w, grid.h
    x0, y0 = grid.tile_origin(gx, gy)
    xs = x0 + (np.arange(w) + 0.5) * grid.px_res
    ys = y0 + (np.arange(h) + 0.5) * grid.px_res
    water = tile_pixels(grid, ts_idx, gx, gy, preps)

    inside_any = np.zeros((h, w), dtype=bool)
    tx1, ty1 = x0 + grid.tile_span_x, y0 + grid.tile_span_y
    for ordinal, prep, phase in preps:
        bx0, by0, bx1, by1 = prep.bbox
        if bx1 <= x0 or bx0 >= tx1 or by1 <= y0 or by0 >= ty1:
            continue
        inside_any |= geom.contains_grid(prep, xs, ys)

    bands = {"water": water}
    for name in ("nbart_blue", "nbart_green", "nbart_red", "nbart_nir",
                 "nbart_swir_1", "nbart_swir_2"):
        v = rng.normal(600.0, 350.0, size=(h, w))
        if name.startswith("nbart_swir") :
            v = v - 400.0 * inside_any  # lakes: lower SWIR -> higher TCW
        bands[name] = np.clip(v, -999, 10000).astype(np.int16)
    for name in ("bs", "pv", "npv"):
        bands[name] = rng.integers(0, 121, size=(h, w), dtype=np.uint8)
    return bands


def wit_tile_row(grid: GridSpec, t: int, gx: int, gy: int,
                 preps: list) -> dict:
    from .plugins.wit import WIT_BANDS

    bands = wit_tile_bands(grid, t, gx, gy, preps)
    data = codec.encode_bands(bands, WIT_BANDS)
    iid = image_id(t, gx, gy)
    frac = float((bands["water"] & 128 > 0).mean())
    return {
        "image_id": iid, "bytes": data,
        "w": np.int32(grid.w), "h": np.int32(grid.h),
        "fmt": "multiraw",
        "caption": f"scene {iid} wet_frac={frac:.3f}",
        "phash": np.int64(codec.phash64(bands["water"])),
    }


def make_wit_tiles_pdf(grid: GridSpec, polys: list) -> pd.DataFrame:
    """WIT multiband tile table (fmt='multiraw', same input_hint schema)."""
    preps = prepare_polys(polys)
    return pd.DataFrame([wit_tile_row(grid, t, gx, gy, preps)
                         for t in range(grid.T)
                         for gx in range(grid.G)
                         for gy in range(grid.G)])


def generate_wit_tiles_spark(spark, grid: GridSpec, polys: list,
                             out_path: str) -> None:
    """Distributed WIT multiband generation (``make_wit_tiles_pdf``
    parallelised over the (ts, gx, gy) index space — same pattern as
    :func:`generate_tiles_spark`)."""
    from pyspark.sql import functions as F

    idx = (
        spark.range(grid.T * grid.G * grid.G)
        .select(
            (F.col("id") % grid.T).cast("int").alias("ts_idx"),
            ((F.col("id") / grid.T).cast("long") % grid.G).cast("int")
            .alias("gx"),
            (F.col("id") / (grid.T * grid.G)).cast("int").alias("gy"),
        )
        .repartition(max(32, spark.sparkContext.defaultParallelism * 2))
    )
    grid_b = spark.sparkContext.broadcast(grid)
    polys_b = spark.sparkContext.broadcast(
        [(p["ordinal"], [np.asarray(r) for r in p["rings"]]) for p in polys])

    def gen(batches):
        g = grid_b.value
        preps = [(o, geom.prepare(rings), i * 0.37)
                 for i, (o, rings) in enumerate(polys_b.value)]
        for pdf in batches:
            yield pd.DataFrame(
                [wit_tile_row(g, int(r.ts_idx), int(r.gx), int(r.gy), preps)
                 for r in pdf.itertuples()])

    (idx.mapInPandas(gen, schema=TILE_SCHEMA)
     .write.mode("overwrite").parquet(out_path))


def photo_pixels(grid: GridSpec, ts_idx: int, gx: int, gy: int) -> np.ndarray:
    """Deterministic smooth 'photographic' tile (sinusoid field + mild
    noise) — the lossy-codec test payload (bitfields are not meaningfully
    DCT-compressible; real imagery is)."""
    rng = np.random.default_rng([grid.seed, 55, ts_idx, gx, gy])
    y, x = np.mgrid[0:grid.h, 0:grid.w]
    fx, fy = rng.uniform(5, 20, 2)
    phase = rng.uniform(0, 6.28, 2)
    img = (128 + 60 * np.sin(x / fx + phase[0]) * np.cos(y / fy + phase[1])
           + 20 * np.sin((x + y) / 31.0) + rng.normal(0, 3, (grid.h, grid.w)))
    return np.clip(img, 0, 255).astype(np.uint8)


def make_photo_tiles_pdf(grid: GridSpec, fmt: str = "dct") -> pd.DataFrame:
    """Lossy-path tile table (input_hint per-row invariant: decoded pixels
    PSNR >= 40 dB vs the pre-encode image + caption equality; the caption
    embeds the ORIGINAL image's mean brightness)."""
    rows = []
    for t in range(grid.T):
        for gx in range(grid.G):
            for gy in range(grid.G):
                arr = photo_pixels(grid, t, gx, gy)
                iid = image_id(t, gx, gy)
                data = codec.encode(arr, fmt)
                dec = codec.decode(data, grid.h, grid.w, fmt)
                rows.append({
                    "image_id": iid, "bytes": data,
                    "w": np.int32(grid.w), "h": np.int32(grid.h),
                    "fmt": fmt,
                    "caption": f"photo {iid} mean={arr.mean():.2f}",
                    "phash": np.int64(codec.phash64(dec)),
                })
    return pd.DataFrame(rows)


TILE_SCHEMA = ("image_id string, bytes binary, w int, h int, fmt string, "
               "caption string, phash long")

POLY_SCHEMA = ("poly_id string, ordinal int, rings array<array<array<double>>>, "
               "cx double, cy double, xmin double, ymin double, "
               "xmax double, ymax double, area double")


def tiles_df(spark, grid: GridSpec, polys: list):
    return spark.createDataFrame(make_tiles_pdf(grid, polys), schema=TILE_SCHEMA)


def polygons_df(spark, polys: list):
    return spark.createDataFrame(polygons_pdf(polys), schema=POLY_SCHEMA)


def generate_tiles_spark(spark, grid: GridSpec, polys: list, out_path: str,
                         fmt: str = "raw") -> None:
    """Distributed tile generation for bench scales: parallelises over the
    (ts, gx, gy) index space with mapInPandas; each task generates its tiles
    locally (pixel content is a pure function of the index + seed), so the
    generator itself scales like the engine."""
    from pyspark.sql import functions as F

    idx = (
        spark.range(grid.T * grid.G * grid.G)
        .select(
            (F.col("id") % grid.T).cast("int").alias("ts_idx"),
            ((F.col("id") / grid.T).cast("long") % grid.G).cast("int").alias("gx"),
            (F.col("id") / (grid.T * grid.G)).cast("int").alias("gy"),
        )
        .repartition(max(32, spark.sparkContext.defaultParallelism * 2))
    )
    grid_b = spark.sparkContext.broadcast(grid)
    polys_b = spark.sparkContext.broadcast(
        [(p["ordinal"], [np.asarray(r) for r in p["rings"]]) for p in polys])

    def gen(batches):
        g = grid_b.value
        preps = [(o, geom.prepare(rings), i * 0.37)
                 for i, (o, rings) in enumerate(polys_b.value)]
        for pdf in batches:
            rows = [tile_row(g, int(r.ts_idx), int(r.gx), int(r.gy), preps, fmt)
                    for r in pdf.itertuples()]
            yield pd.DataFrame(rows)

    idx.mapInPandas(gen, schema=TILE_SCHEMA).write.mode("overwrite").parquet(out_path)
