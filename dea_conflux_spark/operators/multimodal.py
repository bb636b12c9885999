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
