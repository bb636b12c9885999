"""Multimodal column plumbing: images/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

The Spark-side machinery (schemas, batch shapes, partitioning, UDF
signatures) is real and tested; only *external* codecs (jpeg/png/mp3/mp4)
are stubbed behind ``NotImplementedError`` because no image/audio libraries
exist in this environment.  The engine's own deterministic formats
(``raw``/``dct``, core.codec) decode for real.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..core import codec

_EXTERNAL_FMTS = {"jpeg", "jpg", "png", "webp", "mp3", "wav", "mp4"}


def _decode_any(data: bytes, h: int, w: int, fmt: str) -> np.ndarray:
    if fmt in _EXTERNAL_FMTS:
        raise NotImplementedError(
            f"external codec '{fmt}' unavailable in this environment — "
            "plug a real decoder here (PIL/ffmpeg); the Spark plumbing "
            "around this call is format-agnostic")
    return codec.decode(data, h, w, fmt)


def image_stats(tiles: DataFrame) -> DataFrame:
    """Per-image decoded-pixel statistics (mean/std/min/max + wet-bit
    fraction) — a feature-extraction pass: decode once per row inside the
    Arrow batch, emit scalars, never materialise pixels in the plan."""

    def run(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                a = _decode_any(r.bytes, int(r.h), int(r.w), r.fmt)
                rows.append((r.image_id, float(a.mean()), float(a.std()),
                             int(a.min()), int(a.max()),
                             float((a & 128 > 0).mean())))
            yield pd.DataFrame(rows, columns=[
                "image_id", "px_mean", "px_std", "px_min", "px_max",
                "wet_frac"])

    return tiles.mapInPandas(
        run, schema=("image_id string, px_mean double, px_std double, "
                     "px_min int, px_max int, wet_frac double"))


def resize_images(tiles: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbour resize: decode -> index-sample -> re-encode raw.
    Output keeps the input_hint schema (bytes/w/h/fmt/phash refreshed)."""

    def run(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                a = _decode_any(r.bytes, int(r.h), int(r.w), r.fmt)
                yi = (np.arange(out_h) * a.shape[0] // out_h)
                xi = (np.arange(out_w) * a.shape[1] // out_w)
                b = a[yi][:, xi]
                rows.append((r.image_id, codec.encode(b, "raw"),
                             np.int32(out_w), np.int32(out_h), "raw",
                             r.caption, np.int64(codec.phash64(b))))
            yield pd.DataFrame(rows, columns=[
                "image_id", "bytes", "w", "h", "fmt", "caption", "phash"])

    from ..datagen import TILE_SCHEMA
    return tiles.mapInPandas(run, schema=TILE_SCHEMA)


def frame_sample(videos: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: one input row (video binary) -> many
    output rows (frame binaries).  The container parser is stubbed; the
    deterministic 'rawstack' fmt (concatenated raw frames, frame count in
    ``w``x``h``x``n_frames`` metadata) samples for real."""

    def run(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                if r.fmt != "rawstack":
                    raise NotImplementedError(
                        f"video container '{r.fmt}' needs ffmpeg — absent")
                n = int(r.n_frames)
                h, w = int(r.h), int(r.w)
                stack = np.frombuffer(r.bytes, dtype=np.uint8).reshape(n, h, w)
                for i in range(0, n, every_n):
                    rows.append((f"{r.video_id}#f{i:05d}",
                                 stack[i].tobytes(), np.int32(w), np.int32(h),
                                 "raw", f"frame {i} of {r.video_id}",
                                 np.int64(codec.phash64(stack[i]))))
            yield pd.DataFrame(rows, columns=[
                "image_id", "bytes", "w", "h", "fmt", "caption", "phash"])

    from ..datagen import TILE_SCHEMA
    return videos.mapInPandas(run, schema=TILE_SCHEMA)


def image_histogram(tiles: DataFrame, bin_width: int = 16) -> DataFrame:
    """Per-image pixel-value histogram: (image_id, bin, n_px) for every
    NON-EMPTY bin of width ``bin_width`` over the uint8 range — the
    luminance-distribution feature a vision training pipeline extracts
    for exposure/contrast filtering.

    Decode + ``np.bincount`` run inside the Arrow batch; each image
    emits at most ``256 // bin_width`` narrow rows, so the output is a
    tiny fraction of the pixel volume and downstream aggregation (e.g.
    corpus-wide exposure stats) shuffles bin counts, never pixels."""
    n_bins = 256 // bin_width

    def run(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                a = _decode_any(r.bytes, int(r.h), int(r.w), r.fmt)
                counts = np.bincount(a.ravel() // bin_width,
                                     minlength=n_bins)
                rows.extend((r.image_id, int(b), int(c))
                            for b, c in enumerate(counts) if c)
            yield pd.DataFrame(rows,
                               columns=["image_id", "bin", "n_px"])

    return tiles.mapInPandas(
        run, schema="image_id string, bin int, n_px long")


def audio_stats(clips: DataFrame) -> DataFrame:
    """Per-clip audio features from an opaque binary waveform column:
    duration, RMS level, peak amplitude, zero-crossing count — the
    loudness/voicedness screen an audio training pipeline runs before
    transcription.

    ``fmt='rawpcm'`` (little-endian int16 mono, rate in ``sr``) decodes
    for real inside the Arrow batch; compressed containers (mp3/wav)
    raise the documented external-codec stub like the image side.  One
    row in, one scalar row out — pixels/samples never enter the plan.
    RMS is 4-dp rounded half-up (int16^2 sums are exact in float64, so
    the SQL oracle matches bit-for-bit after the shared rounding)."""

    def run(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                if r.fmt != "rawpcm":
                    raise NotImplementedError(
                        f"audio codec '{r.fmt}' unavailable in this "
                        "environment — plug a real decoder here "
                        "(ffmpeg/soundfile); the plumbing is "
                        "format-agnostic")
                s = np.frombuffer(r.bytes, dtype="<i2")
                sq = s.astype(np.float64) ** 2
                rms = float(np.sqrt(sq.sum() / len(s)))
                nz = (s >= 0)
                rows.append((
                    r.audio_id, len(s) / float(r.sr),
                    float(np.floor(rms * 10000 + 0.5) / 10000.0),
                    int(np.abs(s.astype(np.int32)).max()),
                    int(np.count_nonzero(nz[1:] != nz[:-1]))))
            yield pd.DataFrame(rows, columns=[
                "audio_id", "duration_sec", "rms", "peak",
                "zero_crossings"])

    return clips.mapInPandas(
        run, schema=("audio_id string, duration_sec double, rms double, "
                     "peak int, zero_crossings int"))


def audio_chunks(clips: DataFrame, window_ms: int = 100,
                 silence_rms: float = 500.0) -> DataFrame:
    """Fixed-duration audio windowing: one input clip -> one row per
    ``window_ms`` window with per-window RMS and a silence flag — the
    segmentation + voice-activity screen an audio pipeline runs to trim
    silence and slice clips into training chunks (the audio analogue of
    ``frame_sample``).

    The last window may be partial (``n_samples`` carries its true
    length).  RMS uses the shared 4-dp half-up rounding so the
    relational sample-table oracle matches bit-for-bit; the silence
    flag compares the ROUNDED value, keeping both engines on the same
    side of the threshold.  Windows are emitted as scalar rows —
    samples never enter the plan, so downstream silence-ratio
    aggregation shuffles window stats, not waveforms."""

    def run(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                if r.fmt != "rawpcm":
                    raise NotImplementedError(
                        f"audio codec '{r.fmt}' unavailable in this "
                        "environment — plug a real decoder here "
                        "(ffmpeg/soundfile); the plumbing is "
                        "format-agnostic")
                s = np.frombuffer(r.bytes, dtype="<i2")
                win = int(r.sr) * window_ms // 1000
                for wi in range(0, len(s), win):
                    seg = s[wi:wi + win].astype(np.float64)
                    rms = float(np.sqrt((seg * seg).sum() / len(seg)))
                    rms4 = float(np.floor(rms * 10000 + 0.5) / 10000.0)
                    rows.append((r.audio_id, wi // win, wi, len(seg),
                                 rms4, bool(rms4 < silence_rms)))
            yield pd.DataFrame(rows, columns=[
                "audio_id", "win", "start_idx", "n_samples", "rms",
                "is_silence"])

    return clips.mapInPandas(
        run, schema=("audio_id string, win int, start_idx long, "
                     "n_samples int, rms double, is_silence boolean"))


def audio_resample(clips: DataFrame, factor: int = 2) -> DataFrame:
    """Integer-factor decimation: keep every ``factor``-th sample and
    divide the rate — the cheap sample-rate normalisation pass before a
    uniform-rate training corpus (the audio analogue of the
    nearest-neighbour image resize: deterministic index selection, no
    interpolation; a band-limiting pre-filter would need scipy, which
    this environment lacks — plug one in where noted).

    Output keeps the clip schema (bytes/sr/n_samples refreshed), so the
    pass composes with ``audio_stats`` / ``audio_chunks`` downstream.
    """
    if factor < 1:
        raise ValueError(f"factor must be >= 1, got {factor}")

    def run(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                if r.fmt != "rawpcm":
                    raise NotImplementedError(
                        f"audio codec '{r.fmt}' unavailable in this "
                        "environment — plug a real decoder here "
                        "(ffmpeg/soundfile); the plumbing is "
                        "format-agnostic")
                s = np.frombuffer(r.bytes, dtype="<i2")
                # anti-alias filter would go here (scipy.signal.decimate)
                d = s[::factor]
                rows.append((r.audio_id, d.tobytes(),
                             np.int32(int(r.sr) // factor),
                             np.int32(len(d)), "rawpcm"))
            yield pd.DataFrame(rows, columns=[
                "audio_id", "bytes", "sr", "n_samples", "fmt"])

    return clips.mapInPandas(
        run, schema=("audio_id string, bytes binary, sr int, "
                     "n_samples int, fmt string"))


def image_ahash(tiles: DataFrame, out_col: str = "ahash") -> DataFrame:
    """(image_id, <out_col>): perceptual average-hash per image, decoded
    and hashed inside the Arrow batch (core.codec.ahash64) — the
    multimodal analogue of a document fingerprint pass."""

    def run(batches):
        for pdf in batches:
            rows = [(r.image_id,
                     np.int64(codec.ahash64(
                         _decode_any(r.bytes, int(r.h), int(r.w), r.fmt))))
                    for r in pdf.itertuples()]
            yield pd.DataFrame(rows, columns=["image_id", out_col])

    return tiles.mapInPandas(run,
                             schema=f"image_id string, {out_col} long")


def hash_neardup_pairs(hashes: DataFrame, max_hamming: int = 3,
                       n_bands: int = 4, id_col: str = "image_id",
                       hash_col: str = "ahash") -> DataFrame:
    """(id1, id2, hamming): pairs of images whose 64-bit perceptual
    hashes differ in at most ``max_hamming`` bits — image near-duplicate
    detection without an all-pairs join.

    SimHash-style banding (reference parity: the same pigeonhole idea as
    the document SimHash blocks, operators/dedup.py): the 64-bit hash
    splits into ``n_bands`` equal bands; two hashes within
    ``n_bands - 1`` bits of each other MUST agree on at least one whole
    band, so the band-key equi-join is recall-COMPLETE for
    ``max_hamming <= n_bands - 1`` (asserted).  Candidates are verified
    with a JVM-side ``bit_count(xor)`` — no Python in the pair path, and
    the shuffle is keyed by (band, 16-bit key), never by the raw hash
    alone."""
    if max_hamming > n_bands - 1:
        raise ValueError(
            f"banding with {n_bands} bands is only recall-complete for "
            f"max_hamming <= {n_bands - 1}, got {max_hamming}")
    width = 64 // n_bands
    mask = (1 << width) - 1
    bands = F.explode(F.array(*[
        F.struct(F.lit(i).alias("band"),
                 F.shiftright(F.col(hash_col), i * width)
                 .bitwiseAND(F.lit(mask)).alias("key"))
        for i in range(n_bands)])).alias("bk")
    b = (hashes.select(F.col(id_col).alias("id"),
                       F.col(hash_col).alias("h"), bands)
         .select("id", "h", "bk.band", "bk.key"))
    left = b.alias("a")
    right = b.alias("c")
    cand = (left.join(right, ["band", "key"])
            .filter(F.col("a.id") < F.col("c.id"))
            .select(F.col("a.id").alias("id1"),
                    F.col("c.id").alias("id2"),
                    F.col("a.h").alias("h1"), F.col("c.h").alias("h2"))
            .distinct())
    ham = F.bit_count(F.col("h1").bitwiseXOR(F.col("h2")))
    return (cand.select("id1", "id2", ham.cast("int").alias("hamming"))
            .filter(F.col("hamming") <= max_hamming))


def decode_pixels(tiles: DataFrame) -> DataFrame:
    """(image_id, py, px, val): explode opaque image bytes into relational
    pixel rows — the bridge from the binary column world to the SQL world
    (the inverse of core.codec.encode).  Fan-out is h*w rows per image,
    so this is a narrow map with large output: keep it behind a filter or
    a small fixture, never over a full tile corpus.  Decode runs once per
    image inside the Arrow batch; the coordinate grids come from one
    cached meshgrid per (h, w) shape."""

    def run(batches):
        grids = {}
        for pdf in batches:
            for r in pdf.itertuples():
                h, w = int(r.h), int(r.w)
                if (h, w) not in grids:
                    yy, xx = np.meshgrid(np.arange(h, dtype=np.int32),
                                         np.arange(w, dtype=np.int32),
                                         indexing="ij")
                    grids[(h, w)] = (yy.ravel(), xx.ravel())
                yy, xx = grids[(h, w)]
                a = _decode_any(r.bytes, h, w, r.fmt)
                yield pd.DataFrame({
                    "image_id": r.image_id, "py": yy, "px": xx,
                    "val": a.ravel().astype(np.int32)})

    return tiles.mapInPandas(
        run, schema="image_id string, py int, px int, val int")


_FLIP_MODES = {"h", "v", "hv"}


def flip_images(tiles: DataFrame, mode: str = "h") -> DataFrame:
    """Deterministic flip augmentation: ``h`` mirrors columns, ``v``
    mirrors rows, ``hv`` both (a 180-degree rotation).  Emits the same
    tile schema with re-encoded bytes, ``#f<mode>``-suffixed ids and a
    recomputed perceptual hash — a training-augmentation pass that stays
    a narrow map (no shuffle; new ids keep augmented rows distinct from
    originals when unioned)."""
    if mode not in _FLIP_MODES:
        raise ValueError(f"mode must be one of {sorted(_FLIP_MODES)}")

    def run(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                a = _decode_any(r.bytes, int(r.h), int(r.w), r.fmt)
                if "v" in mode:
                    a = a[::-1, :]
                if "h" in mode:
                    a = a[:, ::-1]
                a = np.ascontiguousarray(a)
                rows.append((f"{r.image_id}#f{mode}",
                             codec.encode(a, "raw"), int(r.w), int(r.h),
                             "raw", r.caption,
                             np.int64(codec.phash64(a))))
            yield pd.DataFrame(rows, columns=[
                "image_id", "bytes", "w", "h", "fmt", "caption", "phash"])

    return tiles.mapInPandas(
        run, schema=("image_id string, bytes binary, w int, h int, "
                     "fmt string, caption string, phash long"))


def image_patches(tiles: DataFrame, patch: int = 4) -> DataFrame:
    """ViT-style non-overlapping patch extraction: each (h x w) image
    explodes into (h//patch) * (w//patch) patch images of shape
    (patch x patch), ids suffixed ``#p<row>_<col>``.  Images whose sides
    are not multiples of ``patch`` keep only full patches (standard ViT
    cropping).  A narrow map — patch tensors are re-encoded raw bytes in
    the same tile schema, ready for the same downstream passes
    (image_stats, ahash, packing)."""
    if patch < 1:
        raise ValueError("patch must be >= 1")

    def run(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                a = _decode_any(r.bytes, int(r.h), int(r.w), r.fmt)
                for py in range(int(r.h) // patch):
                    for px in range(int(r.w) // patch):
                        b = np.ascontiguousarray(
                            a[py * patch:(py + 1) * patch,
                              px * patch:(px + 1) * patch])
                        rows.append((f"{r.image_id}#p{py:02d}_{px:02d}",
                                     codec.encode(b, "raw"),
                                     patch, patch, "raw", r.caption,
                                     np.int64(codec.phash64(b))))
            yield pd.DataFrame(rows, columns=[
                "image_id", "bytes", "w", "h", "fmt", "caption", "phash"])

    return tiles.mapInPandas(
        run, schema=("image_id string, bytes binary, w int, h int, "
                     "fmt string, caption string, phash long"))


def extract_chips(tiles: DataFrame, bboxes: DataFrame, grid,
                  fmt: str = "raw") -> DataFrame:
    """Training-chip extraction: crop every tile to each overlapping
    polygon bounding box (reference parity: the polygon rasterise window
    of dea_conflux/drill.py — here the crop itself is the product, the
    standard way ML training chips are cut from a tiled raster store).

    ``bboxes`` is a small dimension ``(poly_id, xmin, ymin, xmax, ymax)``
    in world coordinates; ``grid`` a datagen.GridSpec giving the tile
    georeference.  The tile-x-bbox pairing is a broadcast nested-loop
    range join on bbox-intersects-tile-extent (the dim is polygon-count
    sized — broadcastable by construction; for huge polygon sets use the
    drill's cell-cover join instead), so tile BYTES never shuffle: decode
    + crop run in the same Arrow batch that scanned the tile.

    A pixel belongs to a chip iff its CENTRE lies inside the bbox
    (half-open handling never ambiguous while bbox edges avoid the
    centre lattice).  Rows: ``(image_id, poly_id, lx0, ly0, bytes, w, h,
    fmt, caption, phash)`` with ``image_id = '<poly_id>@<tile_id>'`` and
    (lx0, ly0) the crop's pixel offset inside the source tile."""
    from .tilecells import tile_meta

    res = float(grid.px_res)
    meta = tile_meta(tiles, grid).select("image_id", "x0", "y0")
    src = tiles.select("image_id", "bytes", "w", "h", "fmt").join(
        meta, "image_id")
    b = F.broadcast(bboxes.select("poly_id", "xmin", "ymin",
                                  "xmax", "ymax"))
    cand = src.join(
        b, (F.col("xmin") < F.col("x0") + F.col("w") * F.lit(res))
           & (F.col("xmax") > F.col("x0"))
           & (F.col("ymin") < F.col("y0") + F.col("h") * F.lit(res))
           & (F.col("ymax") > F.col("y0")))

    def run(batches):
        import math
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                h, w = int(r.h), int(r.w)
                lx0 = max(0, math.ceil((r.xmin - r.x0) / res - 0.5))
                lx1 = min(w - 1, math.floor((r.xmax - r.x0) / res - 0.5))
                ly0 = max(0, math.ceil((r.ymin - r.y0) / res - 0.5))
                ly1 = min(h - 1, math.floor((r.ymax - r.y0) / res - 0.5))
                if lx1 < lx0 or ly1 < ly0:
                    continue
                a = _decode_any(r.bytes, h, w, r.fmt)
                chip = np.ascontiguousarray(a[ly0:ly1 + 1, lx0:lx1 + 1])
                rows.append((f"{r.poly_id}@{r.image_id}", r.poly_id,
                             int(lx0), int(ly0), codec.encode(chip, fmt),
                             chip.shape[1], chip.shape[0], fmt,
                             f"chip {r.poly_id}",
                             np.int64(codec.phash64(chip))))
            yield pd.DataFrame(rows, columns=[
                "image_id", "poly_id", "lx0", "ly0", "bytes", "w", "h",
                "fmt", "caption", "phash"])

    return cand.mapInPandas(
        run, schema=("image_id string, poly_id string, lx0 int, ly0 int, "
                     "bytes binary, w int, h int, fmt string, "
                     "caption string, phash long"))
