"""Round-6 focused unit tests for the vectorised hot-path kernels.

The optimization round replaced per-row/per-element computations with
batched numpy/Arrow kernels whose contract is BIT-IDENTITY with the
per-row formulations; these tests exercise that contract directly
(random inputs, edge configurations), independent of the end-to-end
golden/oracle tests that also cover them.
"""

import numpy as np
import pytest

from dea_conflux_spark.plugins import get_plugin


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(7)


def _random_owner(rng, h, w, n_cands, lo=0):
    """Owner rasters covering the interesting configurations: sparse,
    dense multi-owner, and single-owner-full-tile."""
    owner = rng.integers(-1, n_cands, size=(h, w)).astype(np.int32)
    owner[owner >= 0] += lo
    return owner


class TestWaterbodiesBatchKernel:
    """partials_grouped_raw_batch(T-stack) must equal
    partials_grouped_raw applied per row, count for count."""

    def _check(self, raws2d, owner, h, w):
        plugin = get_plugin("waterbodies_c3")
        ords = sorted({int(o) for o in np.unique(owner) if o >= 0})
        res = plugin.partials_grouped_raw_batch(raws2d, owner, scratch={})
        assert res is not None
        ords_out = res[0]
        per_row = [plugin.partials_grouped_raw(
            raws2d[t].reshape(h, w), owner, ords, scratch={})
            for t in range(raws2d.shape[0])]
        if not ords_out:
            assert all(not g for g in per_row)
            return
        n_px, n_missing, n_wet = res[1], res[2], res[3]
        for t, grouped in enumerate(per_row):
            assert sorted(grouped) == sorted(ords_out)
            for k, o in enumerate(ords_out):
                assert grouped[o] == (int(n_px[t][k]),
                                      int(n_missing[t][k]),
                                      int(n_wet[t][k])), (t, o)

    def test_multi_owner_stack(self, rng):
        h = w = 32
        owner = _random_owner(rng, h, w, n_cands=5, lo=3)
        raws = rng.integers(0, 256, size=(7, h * w)).astype(np.uint8)
        # plant exact wet (128) and clear-dry (0) runs so both counters
        # are non-trivial
        raws[:, : h * w // 3] = 128
        raws[:, h * w // 3: h * w // 2] = 0
        self._check(raws, owner, h, w)

    def test_single_owner_full_tile_fast_path(self, rng):
        h = w = 16
        owner = np.full((h, w), 2, dtype=np.int32)
        raws = rng.integers(0, 256, size=(4, h * w)).astype(np.uint8)
        self._check(raws, owner, h, w)

    def test_no_assigned_pixels(self, rng):
        h = w = 8
        owner = np.full((h, w), -1, dtype=np.int32)
        raws = rng.integers(0, 256, size=(3, h * w)).astype(np.uint8)
        plugin = get_plugin("waterbodies_c3")
        res = plugin.partials_grouped_raw_batch(raws, owner, scratch={})
        assert res == ([],)

    def test_single_row_stack(self, rng):
        h = w = 16
        owner = _random_owner(rng, h, w, n_cands=3)
        raws = rng.integers(0, 256, size=(1, h * w)).astype(np.uint8)
        self._check(raws, owner, h, w)


class TestAssignNearestBitExact:
    """The Arrow nearest-centroid assignment must reproduce the
    higher-order-function expressions' sequential IEEE fold bit for bit
    (same dot/distance doubles, same argmin/argmax tie-break)."""

    def _hof_reference(self, X, cents, metric):
        """Pure-python sequential fold — the exact op order of
        aggregate(zip_with(...)) in the round-5 expressions."""
        out_cid, out_score = [], []
        order = sorted(cents)
        for x in X:
            best = None
            for cid, cv in order:
                acc = 0.0
                if metric == "cosine":
                    nv = 0.0
                    nc = 0.0
                    for a, b in zip(x, cv):
                        acc = acc + a * b
                    for a in x:
                        nv = nv + a * a
                    for b in cv:
                        nc = nc + b * b
                    score = acc / ((nv ** 0.5) * (nc ** 0.5))
                    key = (-score, cid)
                else:
                    for a, b in zip(x, cv):
                        acc = acc + (a - b) * (a - b)
                    score = acc
                    key = (score, cid)
                if best is None or key < best[0]:
                    best = (key, cid, score)
            out_cid.append(best[1])
            out_score.append(best[2])
        return out_cid, out_score

    @pytest.mark.parametrize("metric", ["cosine", "sqeuclidean"])
    def test_bit_exact_vs_sequential_fold(self, spark, rng, metric):
        from dea_conflux_spark.operators.similarity import _assign_nearest

        n, dim, k = 64, 16, 5
        X = rng.normal(size=(n, dim))
        cents = [(int(i * 3 + 1), list(rng.normal(size=dim)))
                 for i in range(k)]
        pdf = [(int(i), [float(v) for v in X[i]]) for i in range(n)]
        e = spark.createDataFrame(pdf, "vec_id long, v array<double>")
        got = _assign_nearest(e, cents, metric=metric,
                              with_dist=(metric == "sqeuclidean"))
        rows = {r["vec_id"]: r for r in got.collect()}
        exp_cid, exp_score = self._hof_reference(X, cents, metric)
        for i in range(n):
            assert rows[i]["cid"] == exp_cid[i], i
            if metric == "sqeuclidean":
                # bit-exact: the double must be IDENTICAL, not close
                assert rows[i]["dist"] == exp_score[i], i
