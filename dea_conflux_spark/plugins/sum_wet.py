"""Minimal test drill: count wet pixels per polygon.

Matches reference tests/data/sum_wet.conflux.py: transform = (water == 128),
summarise = sum -> output column ``water``.
"""

from __future__ import annotations

import numpy as np

from . import base
from .base import DrillSpec


class SumWet(DrillSpec):
    name = "sum_wet"
    version = "0.0.1"

    partial_fields = [("wet_sum", "long")]
    output_fields = [("water", "double")]

    def transform(self, raw: np.ndarray) -> dict:
        return {"water": (raw == 128).astype(np.float32)}

    def partials(self, bands: dict, mask: np.ndarray) -> tuple:
        return (int(bands["water"][mask].sum()),)

    def partials_grouped(self, bands: dict, owner: np.ndarray,
                         ordinals: list, scratch: dict | None = None) -> dict:
        oi = base.owner_index(owner, scratch)
        if not oi:
            return {}
        sel, idx, lo, nb, _n_px, nz = oi
        wet = bands["water"].ravel()[sel] == 1.0
        n_wet = np.bincount(idx[wet], minlength=nb)
        return {o + lo: (int(n_wet[o]),) for o in nz}

    def partials_grouped_raw(self, raw, owner: np.ndarray,
                             ordinals: list,
                             scratch: dict | None = None) -> dict:
        # bit-identical to transform()+partials_grouped(): wet iff the
        # raw byte equals 128 — owner-sorted gather + slice counts, no
        # float band and no per-element bincount (see base.owner_segments)
        oi = base.owner_index(owner, scratch)
        if not oi:
            return {}
        lo = oi[2]
        gix, segs = base.owner_segments(oi, scratch)
        cnz = np.count_nonzero
        full = base.full_tile_segment(owner.size, segs)
        if full is not None:
            o, _n = full
            return {o + lo: (int(cnz(raw.ravel() == 128)),)}
        wet = raw.ravel()[gix] == 128
        return {o + lo: (int(cnz(wet[a:b])),) for o, a, b in segs}

    def final_aggs(self):
        from pyspark.sql import functions as F

        return [F.sum("wet_sum").cast("double").alias("water")]

    def summarise_numpy(self, bands_flat: dict) -> dict:
        return {"water": float(np.nansum(bands_flat["water"]))}
