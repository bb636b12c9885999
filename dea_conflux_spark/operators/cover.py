"""Polygon cell-cover computation as a distributed operator.

``polygon_cover_df`` maps the polygon table through the pure-numpy quadtree
cover (core.cells.polygon_cover) with mapInPandas — at waterbody scale
(~300k polygons) this is a narrow, embarrassingly parallel pass; the result
``poly_cells(poly_id, ordinal, cell, full)`` is the small join side that the
drill broadcasts (or shuffles on ``cell`` when it outgrows the broadcast
threshold — SURVEY.md §4 O5).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..config import BASE_RES
from ..core import cells

COVER_SCHEMA = "poly_id string, ordinal int, cell long, full boolean"


def polygon_cover_df(polygons: DataFrame, base_res: int = BASE_RES,
                     max_cells: int = 4096) -> DataFrame:
    def cover(batches):
        for pdf in batches:
            out_pid, out_ord, out_cell, out_full = [], [], [], []
            for row in pdf.itertuples():
                cov, full = cells.polygon_cover(
                    row.rings, base_res=base_res, max_cells=max_cells)
                out_pid.extend([row.poly_id] * len(cov))
                out_ord.extend([row.ordinal] * len(cov))
                out_cell.extend(cov.tolist())
                out_full.extend(full.tolist())
            yield pd.DataFrame({
                "poly_id": out_pid,
                "ordinal": np.asarray(out_ord, dtype=np.int32),
                "cell": np.asarray(out_cell, dtype=np.int64),
                "full": np.asarray(out_full, dtype=bool),
            })

    n = polygons.sparkSession.sparkContext.defaultParallelism
    return (polygons.select("poly_id", "ordinal", "rings")
            .repartition(n)
            .mapInPandas(cover, schema=COVER_SCHEMA))
