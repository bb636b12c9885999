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
