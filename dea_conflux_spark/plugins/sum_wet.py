"""Minimal test drill: count wet pixels per polygon.

Matches reference tests/data/sum_wet.conflux.py: transform = (water == 128),
summarise = sum -> output column ``water``.
"""

from __future__ import annotations

import numpy as np

from .base import DrillSpec


class SumWet(DrillSpec):
    name = "sum_wet"
    version = "0.0.1"

    partial_fields = [("wet_sum", "long")]
    output_fields = [("water", "double")]

    def transform(self, raw: np.ndarray) -> dict:
        return {"water": (raw == 128).astype(np.float64)}

    def partials(self, bands: dict, mask: np.ndarray) -> tuple:
        return (int(bands["water"][mask].sum()),)

    def final_aggs(self):
        from pyspark.sql import functions as F

        return [F.sum("wet_sum").cast("double").alias("water")]

    def summarise_numpy(self, bands_flat: dict) -> dict:
        return {"water": float(np.nansum(bands_flat["water"]))}
