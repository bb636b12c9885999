"""Per-flag bit counts drill.

Matches reference examples/ga_ls_wo_3_flags.conflux.py: transform is the
identity; summarise counts NaN pixels plus, for each WOfS flag bit,
``((water & (1 << bit)) > 0).sum()``.
"""

from __future__ import annotations

import numpy as np

from . import base
from .base import DrillSpec

FLAGS = {
    "nodata": 0,
    "noncontiguous": 1,
    "low_solar_angle": 2,
    "terrain_shadow": 3,
    "high_slope": 4,
    "cloud_shadow": 5,
    "cloud": 6,
    "water_observed": 7,
}


class WoFlags(DrillSpec):
    name = "ga_ls_wo_3_flags"
    version = "0.0.1"
    FLAGS = FLAGS  # per-product flag-name wiring; variants override

    def __init_subclass__(cls, **kw):
        # rebuild the schema-bearing fields from the subclass's FLAGS
        super().__init_subclass__(**kw)
        cls.partial_fields = [("nan_sum", "long")] + [
            (f"{f}_sum", "long") for f in cls.FLAGS]
        cls.output_fields = [("nan", "double")] + [
            (f, "double") for f in cls.FLAGS]

    partial_fields = [("nan_sum", "long")] + [
        (f"{f}_sum", "long") for f in FLAGS
    ]
    output_fields = [("nan", "double")] + [(f, "double") for f in FLAGS]

    def transform(self, raw: np.ndarray) -> dict:
        return {"water": raw.astype(np.float64)}

    def partials(self, bands: dict, mask: np.ndarray) -> tuple:
        v = bands["water"][mask]
        nan_sum = int(np.isnan(v).sum())
        iv = v[~np.isnan(v)].astype(np.int64)
        return (nan_sum, *[int(((iv & (1 << bit)) > 0).sum())
                           for bit in self.FLAGS.values()])

    def partials_grouped_raw(self, raw, owner: np.ndarray,
                             ordinals: list,
                             scratch: dict | None = None) -> dict:
        # bit-identical to transform()+partials_grouped(): the float band
        # is the uint8 payload upcast (never NaN -> nan_sum is always 0),
        # so each flag count is a boolean pass over the owner-sorted
        # gathered bytes + slice-local counts — replaces the generic
        # per-ordinal O(cands x pixels) mask loop
        oi = base.owner_index(owner, scratch)
        if not oi:
            return {}
        lo = oi[2]
        gix, segs = base.owner_segments(oi, scratch)
        cnz = np.count_nonzero
        full = base.full_tile_segment(owner.size, segs)
        if full is not None:
            o, _n = full
            flat = raw.ravel()
            return {o + lo: (0, *[int(cnz(flat & (1 << bit)))
                                  for bit in self.FLAGS.values()])}
        vv = raw.ravel()[gix]
        flags = [(vv & (1 << bit)) > 0 for bit in self.FLAGS.values()]
        return {o + lo: (0, *[int(cnz(fl[a:b])) for fl in flags])
                for o, a, b in segs}

    def final_aggs(self):
        from pyspark.sql import functions as F

        return [F.sum("nan_sum").cast("double").alias("nan")] + [
            F.sum(f"{f}_sum").cast("double").alias(f) for f in self.FLAGS
        ]

    def summarise_numpy(self, bands_flat: dict) -> dict:
        v = bands_flat["water"]
        out = {"nan": float(np.isnan(v).sum())}
        iv = v[~np.isnan(v)].astype(np.int64)
        for f, bit in self.FLAGS.items():
            out[f] = float(((iv & (1 << bit)) > 0).sum())
        return out
