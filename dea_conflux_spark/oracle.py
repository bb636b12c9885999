"""Single-process numpy oracle for the drill (test-scale golden values).

Plays the role of the reference's golden-value notebook
(reference notebooks/MakeTestValues.ipynb, cells 8-15): stitch all tiles of
one timestep into a global raster, rasterise every polygon by pixel-center
containment with ascending-ordinal overwrite (last wins, matching rasterio
semantics in reference drill.py:85-90), then apply the plugin's
reference-faithful ``summarise_numpy`` to each polygon's full pixel bag.

Deliberately different code paths from the engine: the oracle uses the
broadcast ray-cast (`geom.contains`) over one global meshgrid and a single
whole-grid summarise, whereas the engine uses the per-tile scanline
rasteriser plus distributed partial/final aggregation — so a bug in either
decomposition cannot cancel out.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .config import EPOCH
from .core import geom
from .datagen import GridSpec, image_id
from .plugins.base import DrillSpec


def oracle_drill(grid: GridSpec, polys: list, tiles_pdf: pd.DataFrame,
                 plugin: DrillSpec, partial: bool = True) -> pd.DataFrame:
    """Expected drill output over the full tile grid.

    ``tiles_pdf`` is the tiles table as pandas (image_id, bytes, w, h, fmt).
    Returns rows (poly_id, ts, <metrics>[, conflux_n/s/e/w]) sorted by
    (poly_id, ts).
    """
    W, H = grid.G * grid.w, grid.G * grid.h
    xs = grid.x_off + (np.arange(W) + 0.5) * grid.px_res
    ys = grid.y_off + (np.arange(H) + 0.5) * grid.px_res
    byid = {r.image_id: r for r in tiles_pdf.itertuples()}
    ex0, ey0, ex1, ey1 = grid.extent

    # Rasterise once (placement is time-invariant): owner[i, j] = ordinal of
    # the last polygon whose interior contains the pixel centre.
    owner = np.full((H, W), -1, dtype=np.int32)
    preps = {}
    for p in sorted(polys, key=lambda q: q["ordinal"]):
        prep = geom.prepare(p["rings"])
        preps[p["poly_id"]] = prep
        bx0, by0, bx1, by1 = prep.bbox
        j0, j1 = np.searchsorted(xs, [bx0, bx1])
        i0, i1 = np.searchsorted(ys, [by0, by1])
        if j0 >= j1 or i0 >= i1:
            continue
        gx, gy = np.meshgrid(xs[j0:j1], ys[i0:i1], indexing="xy")
        inside = geom.contains(prep, gx.ravel(), gy.ravel()).reshape(gx.shape)
        view = owner[i0:i1, j0:j1]
        view[inside] = p["ordinal"]

    rows = []
    for t in range(grid.T):
        raw = None
        for gx in range(grid.G):
            for gy in range(grid.G):
                r = byid[image_id(t, gx, gy)]
                arr = plugin.decode(r.bytes, int(r.h), int(r.w), r.fmt)
                sl = (slice(gy * grid.h, (gy + 1) * grid.h),
                      slice(gx * grid.w, (gx + 1) * grid.w))
                if isinstance(arr, dict):
                    if raw is None:
                        raw = {k: np.zeros((H, W), dtype=v.dtype)
                               for k, v in arr.items()}
                    for k, v in arr.items():
                        raw[k][sl] = v
                else:
                    if raw is None:
                        raw = np.zeros((H, W), dtype=arr.dtype)
                    raw[sl] = arr
        bands = plugin.transform(raw)
        ts = pd.Timestamp(EPOCH) + pd.Timedelta(days=t)
        for p in polys:
            mask = owner == p["ordinal"]
            if not mask.any():
                continue
            flat = {k: v[mask] for k, v in bands.items()}
            met = plugin.summarise_numpy(flat)
            row = {"poly_id": p["poly_id"], "ts": ts, **met}
            if partial:
                d = geom.edge_directions(p["rings"], ex0, ey0, ex1, ey1)
                row.update(conflux_n=d["North"], conflux_s=d["South"],
                           conflux_e=d["East"], conflux_w=d["West"])
            rows.append(row)
    out = pd.DataFrame(rows).sort_values(["poly_id", "ts"]).reset_index(drop=True)
    return out


def oracle_assignments(grid: GridSpec, polys: list) -> pd.DataFrame:
    """Per-tile pixel->polygon assignment counts: (image_id-free)
    (poly_id, gx, gy, n_px).  Used to check the engine's tile->polygon
    assignment (join) rows exactly."""
    W, H = grid.G * grid.w, grid.G * grid.h
    xs = grid.x_off + (np.arange(W) + 0.5) * grid.px_res
    ys = grid.y_off + (np.arange(H) + 0.5) * grid.px_res
    owner = np.full((H, W), -1, dtype=np.int32)
    by_ord = {}
    for p in sorted(polys, key=lambda q: q["ordinal"]):
        prep = geom.prepare(p["rings"])
        by_ord[p["ordinal"]] = p["poly_id"]
        bx0, by0, bx1, by1 = prep.bbox
        j0, j1 = np.searchsorted(xs, [bx0, bx1])
        i0, i1 = np.searchsorted(ys, [by0, by1])
        if j0 >= j1 or i0 >= i1:
            continue
        gx, gy = np.meshgrid(xs[j0:j1], ys[i0:i1], indexing="xy")
        inside = geom.contains(prep, gx.ravel(), gy.ravel()).reshape(gx.shape)
        view = owner[i0:i1, j0:j1]
        view[inside] = p["ordinal"]
    rows = []
    for gx in range(grid.G):
        for gy in range(grid.G):
            sub = owner[gy * grid.h:(gy + 1) * grid.h,
                        gx * grid.w:(gx + 1) * grid.w]
            vals, cnts = np.unique(sub[sub >= 0], return_counts=True)
            for v, c in zip(vals, cnts):
                rows.append({"poly_id": by_ord[int(v)], "gx": gx, "gy": gy,
                             "n_px": int(c)})
    return pd.DataFrame(rows).sort_values(
        ["poly_id", "gx", "gy"]).reset_index(drop=True)
