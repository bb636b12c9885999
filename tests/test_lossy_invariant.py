"""The BASELINE input_hint per-row invariant, end-to-end through Spark:
for every lossy (dct) tile row, decoded pixels reach PSNR >= 40 dB vs the
pre-encode image, the phash matches the decoded pixels, and the caption
round-trips exactly."""

import numpy as np
import pandas as pd
import pytest

from dea_conflux_spark import datagen
from dea_conflux_spark.core import codec


@pytest.fixture(scope="module")
def photo_grid():
    return datagen.GridSpec(G=3, T=2, w=64, h=64)


@pytest.fixture(scope="module")
def photo_tiles_pdf(photo_grid):
    return datagen.make_photo_tiles_pdf(photo_grid, fmt="dct")


def test_lossy_rows_psnr_and_caption(spark, photo_grid, photo_tiles_pdf):
    tiles = spark.createDataFrame(photo_tiles_pdf,
                                  schema=datagen.TILE_SCHEMA)

    def check(batches):
        import re
        for pdf in batches:
            out = []
            for r in pdf.itertuples():
                m = re.match(r"^t(\d+)_x(\d+)_y(\d+)$", r.image_id)
                orig = datagen.photo_pixels(
                    photo_grid, int(m.group(1)), int(m.group(2)),
                    int(m.group(3)))
                dec = codec.decode(r.bytes, int(r.h), int(r.w), r.fmt)
                psnr = codec.psnr(orig, dec)
                cap_ok = (r.caption ==
                          f"photo {r.image_id} mean={orig.mean():.2f}")
                ph_ok = codec.phash64(dec) == int(r.phash)
                out.append((r.image_id, float(psnr), bool(cap_ok),
                            bool(ph_ok)))
            yield pd.DataFrame(out, columns=["image_id", "psnr", "cap_ok",
                                             "ph_ok"])

    res = tiles.mapInPandas(
        check, "image_id string, psnr double, cap_ok boolean, "
               "ph_ok boolean").toPandas()
    assert len(res) == photo_grid.G ** 2 * photo_grid.T
    assert (res["psnr"] >= 40.0).all(), res["psnr"].min()
    assert res["cap_ok"].all()
    assert res["ph_ok"].all()


def test_lossless_rows_exact(tiles_pdf):
    """raw rows decode bit-exactly (the allclose degenerate case) and the
    stored phash matches the decoded pixels for every row."""
    for r in tiles_pdf.head(32).itertuples():
        arr = codec.decode(r.bytes, int(r.h), int(r.w), r.fmt)
        assert codec.phash64(arr) == int(r.phash)
        assert (codec.decode(codec.encode(arr, "raw"), arr.shape[0],
                             arr.shape[1], "raw") == arr).all()
