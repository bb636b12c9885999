"""Affine grid resampling (pure numpy) for the decode UDF.

The reference delegates per-band resampling to GDAL via ``dc.load``
(nearest/bilinear chosen per band, reference drill.py:622-624,
examples/wit_ls9.conflux.py:6-13).  Here decode-time resampling is a numpy
index/interp step inside the Arrow batch — bands declare ``nearest``
(categorical/bitfield) or ``bilinear`` (continuous)."""

from __future__ import annotations

import numpy as np


def resample(arr: np.ndarray, out_h: int, out_w: int,
             method: str = "nearest") -> np.ndarray:
    """Resample a (h, w) array to (out_h, out_w) over the same extent."""
    h, w = arr.shape
    if (h, w) == (out_h, out_w):
        return arr
    # output pixel centres in input pixel coordinates
    ys = (np.arange(out_h) + 0.5) * h / out_h - 0.5
    xs = (np.arange(out_w) + 0.5) * w / out_w - 0.5
    if method == "nearest":
        yi = np.clip(np.rint(ys).astype(int), 0, h - 1)
        xi = np.clip(np.rint(xs).astype(int), 0, w - 1)
        return arr[yi][:, xi]
    if method == "bilinear":
        y0 = np.clip(np.floor(ys).astype(int), 0, h - 1)
        x0 = np.clip(np.floor(xs).astype(int), 0, w - 1)
        y1 = np.clip(y0 + 1, 0, h - 1)
        x1 = np.clip(x0 + 1, 0, w - 1)
        fy = np.clip(ys - y0, 0.0, 1.0)[:, None]
        fx = np.clip(xs - x0, 0.0, 1.0)[None, :]
        a = arr.astype(np.float64)
        top = a[y0][:, x0] * (1 - fx) + a[y0][:, x1] * fx
        bot = a[y1][:, x0] * (1 - fx) + a[y1][:, x1] * fx
        out = top * (1 - fy[:, ...]) + bot * fy
        return out
    raise ValueError(f"unknown resampling: {method}")


def resample_bands(bands: dict, out_h: int, out_w: int,
                   methods: dict | None = None,
                   default: str = "nearest") -> dict:
    """Per-band resampling with a ``{'band': method, '*': default}`` spec —
    the reference plugin's resampling dict shape."""
    methods = methods or {}
    out = {}
    for name, arr in bands.items():
        m = methods.get(name, methods.get("*", default))
        out[name] = resample(arr, out_h, out_w, m)
    return out
