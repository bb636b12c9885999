"""kNN nearest-polygon assignment vs brute-force numpy oracle."""

import numpy as np
import pandas as pd
import pytest

from dea_conflux_spark.operators import knn


@pytest.mark.parametrize("broadcast_index", [True, False],
                         ids=["broadcast", "shuffle"])
def test_knn_matches_bruteforce(spark, polygons, polys, grid,
                                broadcast_index):
    rng = np.random.default_rng(7)
    x0, y0, x1, y1 = grid.extent
    # queries both inside and well outside the polygon field
    qx = rng.uniform(x0 - 20000, x1 + 20000, 60)
    qy = rng.uniform(y0 - 20000, y1 + 20000, 60)
    qpdf = pd.DataFrame({"qid": [f"q{i}" for i in range(60)],
                         "qx": qx, "qy": qy})
    queries = spark.createDataFrame(qpdf, "qid string, qx double, qy double")

    got = knn.knn_nearest(queries, polygons, k=3, res=9, ring=1,
                          broadcast_index=broadcast_index).toPandas()
    got = got.sort_values(["qid", "rank"]).reset_index(drop=True)

    # brute force oracle
    cx = np.array([p["cx"] for p in polys])
    cy = np.array([p["cy"] for p in polys])
    pids = [p["poly_id"] for p in polys]
    rows = []
    for i in range(60):
        d = np.hypot(qx[i] - cx, qy[i] - cy)
        order = np.lexsort((pids, d))[:3]
        for r, j in enumerate(order, 1):
            rows.append({"qid": f"q{i}", "poly_id": pids[j],
                         "dist": d[j], "rank": r})
    exp = pd.DataFrame(rows).sort_values(["qid", "rank"]).reset_index(drop=True)

    assert len(got) == len(exp)
    assert list(got["poly_id"]) == list(exp["poly_id"])
    np.testing.assert_allclose(got["dist"], exp["dist"], rtol=1e-9)


def test_knn_k1_every_query_answered(spark, polygons):
    qpdf = pd.DataFrame({"qid": ["a", "b"],
                         "qx": [0.0, 4_000_000.0],
                         "qy": [0.0, 4_000_000.0]})
    queries = spark.createDataFrame(qpdf, "qid string, qx double, qy double")
    got = knn.knn_nearest(queries, polygons, k=1).toPandas()
    assert set(got["qid"]) == {"a", "b"}
    assert (got["rank"] == 1).all()
