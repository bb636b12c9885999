"""Polygon-polygon overlap join via shared cell covers.

Finds every pair of polygons whose interiors/boundaries intersect — the
spatial self-join used to detect overlapping or double-digitised waterbody
polygons before a drill run (the reference assumes a clean, rasterise-
last-wins layer, reference drill.py:85-90; this operator is how an engine
checks that assumption at scale).

Candidate generation must respect the ADAPTIVE cover (core.cells
.polygon_cover): a big polygon carries coarse ``full`` cells while its
small neighbour carries base-res cells, so plain cell equality would miss
ancestor/descendant containment.  Each side's cells are therefore
expanded to *ancestor-or-self* sets and candidates are the UNION of the
two one-sided equi-joins (A.cell = B.up and A.up = B.cell) — this catches
exactly the cell-containment relations without the false blow-up of
joining both expanded sides (which would pair every polygon sharing a
coarsest-res ancestor).

Scale design:

* Both joins are plain equi-joins on int64 cell ids — shuffle-hash /
  broadcast by Catalyst+AQE choice; cover rows are ~10-4000 per polygon.
* ``full``-cell fast accept: if A's cell is fully interior to A and B's
  (descendant-or-equal) cell is fully interior to B, the descendant cell
  is inside both — the pair overlaps with NO exact test.  Only the
  residue goes through the exact geometry refine.
* The exact refine is an Arrow-batched pass (``mapInPandas``) over
  candidate pairs joined to their rings: bbox reject, then any-edge-pair
  proper intersection (vectorised orientation tests), then mutual
  vertex-in-polygon (ray cast, core.geom) for the containment-only cases.
  No all-pairs path exists: every tested pair shares a cover cell.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..config import BASE_RES
from ..core import cells, geom
from .cover import polygon_cover_df

PAIR_SCHEMA = "ordinal_a int, ordinal_b int, overlaps boolean"


def _edges(rings: list) -> np.ndarray:
    """(n, 4) array of segments (x1, y1, x2, y2) over all rings
    (``geom._as_rings`` normalises Arrow's object-array delivery)."""
    segs = []
    for r in geom._as_rings(rings):
        q = np.roll(r, -1, axis=0)
        segs.append(np.concatenate([r, q], axis=1))
    return np.concatenate(segs, axis=0)


def _any_edge_cross(sa: np.ndarray, sb: np.ndarray) -> bool:
    """True iff any segment of ``sa`` properly crosses any of ``sb``."""
    ax1, ay1, ax2, ay2 = (sa[:, None, k] for k in range(4))
    bx1, by1, bx2, by2 = (sb[None, :, k] for k in range(4))
    d1 = (bx2 - bx1) * (ay1 - by1) - (by2 - by1) * (ax1 - bx1)
    d2 = (bx2 - bx1) * (ay2 - by1) - (by2 - by1) * (ax2 - bx1)
    d3 = (ax2 - ax1) * (by1 - ay1) - (ay2 - ay1) * (bx1 - ax1)
    d4 = (ax2 - ax1) * (by2 - ay1) - (ay2 - ay1) * (bx2 - ax1)
    return bool(np.any((d1 * d2 < 0) & (d3 * d4 < 0)))


def pair_overlaps(rings_a: list, rings_b: list) -> bool:
    """Exact overlap test: bbox reject -> edge crossing -> containment."""
    return _pair_overlaps_prepped((geom.prepare(rings_a), _edges(rings_a)),
                                  (geom.prepare(rings_b), _edges(rings_b)))


def _pair_overlaps_prepped(ea, eb) -> bool:
    """:func:`pair_overlaps` over pre-built (Prepared, segments) entries —
    the refine pass memoizes these per ordinal so a hub polygon (a huge
    waterbody paired with hundreds of neighbours) prepares once per task
    instead of once per pair."""
    pa, sa = ea
    pb, sb = eb
    if (pa.bbox[2] < pb.bbox[0] or pb.bbox[2] < pa.bbox[0]
            or pa.bbox[3] < pb.bbox[1] or pb.bbox[3] < pa.bbox[1]):
        return False
    if _any_edge_cross(sa, sb):
        return True
    # No boundary crossing: overlap iff one contains the other.
    ax, ay = float(sa[0, 0]), float(sa[0, 1])
    bx, by = float(sb[0, 0]), float(sb[0, 1])
    return bool(geom.contains(pb, np.array([ax]), np.array([ay]))[0]
                or geom.contains(pa, np.array([bx]), np.array([by]))[0])


def _expand_up(cover: DataFrame, coarsest_res: int = 4) -> DataFrame:
    """Explode each cover cell into its ancestor-or-self cells
    (descendant containment key for the candidate join)."""

    def up(batches):
        for pdf in batches:
            out_ord, out_cell, out_full = [], [], []
            for row in pdf.itertuples():
                anc = [int(row.cell)] + cells.ancestors(
                    np.int64(row.cell), down_to=coarsest_res)
                out_ord.extend([row.ordinal] * len(anc))
                out_cell.extend(anc)
                out_full.extend([row.full] * len(anc))
            yield pd.DataFrame({
                "ordinal": np.asarray(out_ord, dtype=np.int32),
                "up": np.asarray(out_cell, dtype=np.int64),
                "full": np.asarray(out_full, dtype=bool),
            })

    return cover.mapInPandas(up, schema="ordinal int, up long, full boolean")


def polygon_overlap_pairs(polygons: DataFrame, base_res: int = BASE_RES,
                          max_cells: int = 4096) -> DataFrame:
    """All pairs (poly_id_a, poly_id_b), ordinal_a < ordinal_b, whose
    geometries intersect.  See module docstring for the plan shape."""
    cover = polygon_cover_df(polygons, base_res=base_res,
                             max_cells=max_cells)
    cover = cover.localCheckpoint(eager=False)  # computed once, two joins
    up = _expand_up(cover)

    flat = cover.select("ordinal", F.col("cell").alias("up"), "full")
    half = []
    for a, b in ((flat, up), (up, flat)):
        half.append(
            a.alias("a").join(b.alias("b"), on="up")
            .where(F.col("a.ordinal") < F.col("b.ordinal"))
            .select(F.col("a.ordinal").alias("ordinal_a"),
                    F.col("b.ordinal").alias("ordinal_b"),
                    (F.col("a.full") & F.col("b.full")).alias("sure")))
    cand = (half[0].unionByName(half[1])
            .groupBy("ordinal_a", "ordinal_b")
            .agg(F.max("sure").alias("sure"))
            # materialised once: both the sure fast-accept branch and the
            # refine branch consume it (without this the two cover joins
            # + pair aggregate run twice)
            .localCheckpoint(eager=False))

    dim = polygons.select("ordinal", "poly_id", "rings")
    sure = cand.where("sure")
    todo = (cand.where(~F.col("sure"))
            .join(dim.select(F.col("ordinal").alias("ordinal_a"),
                             F.col("rings").alias("rings_a")), "ordinal_a")
            .join(dim.select(F.col("ordinal").alias("ordinal_b"),
                             F.col("rings").alias("rings_b")), "ordinal_b"))

    def refine(batches):
        prep: dict = {}

        def get(o, rings):
            e = prep.get(o)
            if e is None:
                if len(prep) >= 8192:
                    prep.clear()
                e = (geom.prepare(rings), _edges(rings))
                prep[o] = e
            return e

        for pdf in batches:
            ok = [_pair_overlaps_prepped(get(int(oa), ra), get(int(ob), rb))
                  for oa, ob, ra, rb in zip(pdf.ordinal_a, pdf.ordinal_b,
                                            pdf.rings_a, pdf.rings_b)]
            yield pd.DataFrame({
                "ordinal_a": pdf.ordinal_a.astype(np.int32),
                "ordinal_b": pdf.ordinal_b.astype(np.int32),
                "overlaps": np.asarray(ok, dtype=bool),
            })

    refined = (todo.mapInPandas(refine, schema=PAIR_SCHEMA)
               .where("overlaps").drop("overlaps"))
    hits = sure.drop("sure").unionByName(refined)
    names = polygons.select("ordinal", "poly_id")
    return (hits
            .join(names.select(F.col("ordinal").alias("ordinal_a"),
                               F.col("poly_id").alias("poly_id_a")),
                  "ordinal_a")
            .join(names.select(F.col("ordinal").alias("ordinal_b"),
                               F.col("poly_id").alias("poly_id_b")),
                  "ordinal_b")
            .select("poly_id_a", "poly_id_b"))
