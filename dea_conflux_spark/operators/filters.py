"""Polygon/scene screening filters (SURVEY.md §2.B).

All four reference filters become relational predicates / joins — Catalyst
orders and pushes them down; no spatial library involved.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..datagen import GridSpec
from .drill import candidate_pairs
from .tilecells import tile_meta


def quick_filter(polygons: DataFrame, ex0: float, ey0: float, ex1: float,
                 ey1: float, buffer_x: float = 0.0,
                 buffer_y: float = 0.0) -> DataFrame:
    """B1 (reference drill.py:302-340): polygons whose *centroid* lies in
    the extent buffered by one scene width/height — a pure range predicate
    on the centroid columns."""
    return polygons.filter(
        (F.col("cx") >= ex0 - buffer_x) & (F.col("cx") <= ex1 + buffer_x)
        & (F.col("cy") >= ey0 - buffer_y) & (F.col("cy") <= ey1 + buffer_y))


def bbox_intersects_filter(polygons: DataFrame, ex0: float, ey0: float,
                           ex1: float, ey1: float) -> DataFrame:
    """B2 analogue (reference drill.py:282-299): polygons whose bbox
    intersects the extent (exactness is provided downstream by the PIP
    refinement, so bbox-level screening suffices here)."""
    return polygons.filter(
        (F.col("xmax") > ex0) & (F.col("xmin") < ex1)
        & (F.col("ymax") > ey0) & (F.col("ymin") < ey1))


def overedge_interior_filter(polygons: DataFrame, ex0: float, ey0: float,
                             ex1: float, ey1: float) -> DataFrame:
    """B3 (reference drill.py:343-375): drop polygons touching the boundary
    of the 3x-expanded extent box — keep only those fully coverable by the
    scene plus its neighbours."""
    w, h = ex1 - ex0, ey1 - ey0
    bx0, by0, bx1, by1 = ex0 - w, ey0 - h, ex1 + w, ey1 + h
    return polygons.filter(
        (F.col("xmin") > bx0) & (F.col("xmax") < bx1)
        & (F.col("ymin") > by0) & (F.col("ymax") < by1))


def screen_tiles(tiles: DataFrame, poly_cells: DataFrame,
                 grid: GridSpec) -> DataFrame:
    """B4/B5 (reference drill.py:378-418): keep tiles that overlap at least
    one polygon — a left-semi join through the cell cover (the reference's
    multiprocessing pool becomes ordinary Spark parallelism)."""
    cand = candidate_pairs(tiles, poly_cells, grid)
    return tiles.join(cand.select("image_id").distinct(), "image_id",
                      "left_semi")


def screened_ids(tiles: DataFrame, poly_cells: DataFrame,
                 grid: GridSpec) -> DataFrame:
    """get-ids analogue (reference __main__.py:1022-1095): the id list of
    tiles that pass the polygon screen."""
    return screen_tiles(tiles, poly_cells, grid).select("image_id")
