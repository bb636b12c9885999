"""Per-pixel temporal composite (WOfS summary) + polygon-overlap join."""

import numpy as np
import pandas as pd
import pytest

from dea_conflux_spark import datagen, minidrill
from dea_conflux_spark.operators.overlap import (pair_overlaps,
                                                 polygon_overlap_pairs)
from dea_conflux_spark.operators.summary import (WET, WOFL_MASK,
                                                 wofs_summary_pixels,
                                                 wofs_summary_rasters)


def _mini_tiles(spark):
    import os

    out = minidrill.build()
    return spark.read.parquet(os.path.join(out, "mini_tiles.parquet"))


def _expected_planes():
    """Per-position numpy oracle over the fixture's pixel values."""
    g = minidrill.MINI_GRID
    exp = {}
    for gy in range(g.G):
        for gx in range(g.G):
            wet = np.zeros((g.h, g.w), np.int64)
            clear = np.zeros((g.h, g.w), np.int64)
            for t in range(g.T):
                wofl = minidrill._pixel_values(t, gx, gy) & WOFL_MASK
                wet += wofl == WET
                clear += (wofl == WET) | (wofl == 0)
            exp[(gx, gy)] = (wet, clear)
    return exp


@pytest.mark.parametrize("flush", [256, 1])
def test_wofs_summary_rasters_golden(spark, flush):
    g = minidrill.MINI_GRID
    got = wofs_summary_rasters(_mini_tiles(spark),
                               flush_positions=flush).collect()
    exp = _expected_planes()
    assert len(got) == g.G * g.G
    for row in got:
        wet = np.frombuffer(row.wet, dtype="<i4").reshape(row.h, row.w)
        clear = np.frombuffer(row.clear, dtype="<i4").reshape(row.h, row.w)
        ew, ec = exp[(row.gx, row.gy)]
        assert row.n_t == g.T
        np.testing.assert_array_equal(wet, ew)
        np.testing.assert_array_equal(clear, ec)


def test_wofs_summary_pixels_match_and_null(spark):
    g = minidrill.MINI_GRID
    pdf = wofs_summary_pixels(
        _mini_tiles(spark), g.x_off, g.y_off, g.tile_span_x,
        g.tile_span_y, g.px_res).toPandas()
    assert len(pdf) == g.G * g.G * g.h * g.w
    exp = _expected_planes()
    for (gx, gy), (ew, ec) in exp.items():
        x0, y0 = g.tile_origin(gx, gy)
        sel = pdf[(pdf.x >= x0) & (pdf.x < x0 + g.tile_span_x)
                  & (pdf.y >= y0) & (pdf.y < y0 + g.tile_span_y)]
        m = sel.sort_values(["y", "x"])
        np.testing.assert_array_equal(
            m.n_wet.values.reshape(g.h, g.w), ew)
        np.testing.assert_array_equal(
            m.n_clear.values.reshape(g.h, g.w), ec)
    # wet_freq: exact division where clear > 0, SQL NULL (not NaN) where
    # a pixel was never clear
    has_clear = pdf.n_clear > 0
    np.testing.assert_allclose(
        pdf.wet_freq[has_clear],
        pdf.n_wet[has_clear] / pdf.n_clear[has_clear], rtol=0, atol=0)
    assert pdf.wet_freq[~has_clear].isna().all()


def _sat_overlap(ra, rb):
    """Separating-axis oracle for convex rings (numpy, local)."""
    def planes(r):
        r = np.asarray(r, float)
        q = np.roll(r, -1, axis=0)
        a, b = q[:, 1] - r[:, 1], -(q[:, 0] - r[:, 0])
        return a, b, a * r[:, 0] + b * r[:, 1]

    for p, q in ((ra, rb), (rb, ra)):
        a, b, c = planes(p)
        v = np.asarray(q, float)
        if np.any(np.all(a[:, None] * v[None, :, 0]
                         + b[:, None] * v[None, :, 1] > c[:, None], axis=1)):
            return False
    return True


def test_polygon_overlap_pairs_matches_sat(spark):
    polys = minidrill._convex_polys()
    pdf = datagen.polygons_pdf(polys)
    polygons = spark.createDataFrame(pdf, schema=datagen.POLY_SCHEMA)
    got = {tuple(r) for r in polygon_overlap_pairs(polygons)
           .select("poly_id_a", "poly_id_b").collect()}
    exp = set()
    for i, a in enumerate(polys):
        for b in polys[i + 1:]:
            if _sat_overlap(a["rings"][0], b["rings"][0]):
                exp.add((a["poly_id"], b["poly_id"]))
    assert got == exp
    assert ("mini_rect_a", "mini_rect_b") in exp  # non-vacuous
    assert len(exp) < len(polys) * (len(polys) - 1) // 2  # some disjoint


def test_polygon_overlap_containment_and_scale_mix(spark):
    """A polygon fully inside another (no edge crossing) must pair; a
    coarse-cover huge polygon must pair with a fine-cover tiny one
    (ancestor/descendant candidate join); far-apart polygons must not."""
    def rect(pid, ordn, x0, y0, x1, y1):
        ring = [[x0, y0], [x1, y0], [x1, y1], [x0, y1]]
        return {"poly_id": pid, "kind": "t", "ordinal": ordn,
                "rings": [np.asarray(ring, float)],
                "cx": (x0 + x1) / 2, "cy": (y0 + y1) / 2,
                "xmin": x0, "ymin": y0, "xmax": x1, "ymax": y1,
                "area": (x1 - x0) * (y1 - y0)}

    polys = [
        rect("huge", 0, 100000.3, 100000.7, 140000.1, 140000.9),
        rect("inner", 1, 110000.2, 110000.4, 110400.6, 110400.8),
        rect("far", 2, 190000.1, 190000.3, 190300.7, 190300.9),
    ]
    pdf = datagen.polygons_pdf(polys)
    polygons = spark.createDataFrame(pdf, schema=datagen.POLY_SCHEMA)
    got = {tuple(r) for r in polygon_overlap_pairs(polygons)
           .select("poly_id_a", "poly_id_b").collect()}
    assert got == {("huge", "inner")}
    # unit-level: containment without edge crossing, both directions
    assert pair_overlaps(polys[0]["rings"], polys[1]["rings"])
    assert pair_overlaps(polys[1]["rings"], polys[0]["rings"])
    assert not pair_overlaps(polys[0]["rings"], polys[2]["rings"])
