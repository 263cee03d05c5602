"""AsLS baseline parity: batched pentadiagonal LDL^T vs scipy sparse oracle."""

import numpy as np
import pytest
from scipy import sparse
from scipy.sparse.linalg import spsolve

import xmris_tpu as xmt
from xmris_tpu import ATTRS, DIMS, XmrArray
from xmris_tpu.ops.baseline import als_baseline_batched


def als_oracle(y, lam, p, n_iter):
    """Reference AsLS: sparse second-difference penalty + spsolve."""
    L = len(y)
    D = sparse.diags([1, -2, 1], [0, 1, 2], shape=(L - 2, L), dtype=float)
    DTD = (lam * D.T @ D).tocsc()
    w = np.ones(L)
    z = np.zeros(L)
    for _ in range(n_iter):
        W = sparse.diags(w, 0, format="csc", dtype=float)
        z = spsolve(W + DTD, w * y)
        w = p * (y > z) + (1 - p) * (y < z)
    return z


def make_spectrum(n=512, seed=0):
    rng = np.random.default_rng(seed)
    x = np.linspace(-1, 1, n)
    baseline = 2.0 + 1.5 * x + 0.8 * x**2
    peaks = 5.0 * np.exp(-((x - 0.2) ** 2) / 2e-4) + 3.0 * np.exp(
        -((x + 0.4) ** 2) / 5e-4
    )
    return baseline + peaks + rng.normal(0, 0.02, n)


class TestAsLSParity:
    @pytest.mark.parametrize("lam,p", [(1e5, 0.001), (1e4, 0.01), (1e6, 0.05)])
    def test_matches_spsolve_oracle(self, lam, p):
        y = make_spectrum()
        ours = np.asarray(
            als_baseline_batched(y[None, :].astype(np.float64), lam, p, 10)
        )[0]
        oracle = als_oracle(y, lam, p, 10)
        scale = np.max(np.abs(oracle))
        assert np.max(np.abs(ours - oracle)) / scale < 1e-8

    def test_batched_consistency(self):
        ys = np.stack([make_spectrum(seed=s) for s in range(6)])
        batch = np.asarray(als_baseline_batched(ys.astype(np.float64), 1e5, 0.001, 10))
        for i in range(6):
            single = np.asarray(
                als_baseline_batched(ys[i : i + 1].astype(np.float64), 1e5, 0.001, 10)
            )[0]
            np.testing.assert_allclose(batch[i], single, rtol=1e-12)


class TestBaselineLabeled:
    def test_removes_smooth_baseline(self):
        y = make_spectrum()
        da = XmrArray(
            y, dims=(DIMS.frequency,),
            coords={DIMS.frequency: np.arange(len(y), dtype=float)},
            attrs={"scan": 1},
        )
        out = da.xmr.baseline_als(lam=1e5, p=0.001)
        # off-peak residual at this stiffness matches the scipy oracle
        # (~0.125); the uncorrected baseline is ~1.3 there.
        off = np.abs(out.values[:100])
        assert off.mean() < 0.2
        assert off.mean() < 0.2 * np.abs(y[:100]).mean()
        assert out.attrs[ATTRS.baseline_method] == "als"
        assert out.attrs[ATTRS.baseline_lam] == 1e5
        assert out.attrs["scan"] == 1

    def test_complex_input_uses_real_part(self):
        y = make_spectrum()
        da = XmrArray(
            y + 1j * 99.0, dims=(DIMS.frequency,),
            coords={DIMS.frequency: np.arange(len(y), dtype=float)},
        )
        out = da.xmr.baseline_als()
        assert not np.iscomplexobj(out.values)

    def test_nd_vectorization(self):
        ys = np.stack([make_spectrum(seed=s) for s in range(4)]).reshape(2, 2, -1)
        da = XmrArray(
            ys, dims=(DIMS.x, DIMS.y, DIMS.frequency),
            coords={DIMS.frequency: np.arange(ys.shape[-1], dtype=float)},
        )
        out = da.xmr.baseline_als()
        assert out.dims == (DIMS.x, DIMS.y, DIMS.frequency)
        flat = da.isel({DIMS.x: 0, DIMS.y: 1}).xmr.baseline_als()
        np.testing.assert_allclose(
            out.values[0, 1], flat.values, rtol=1e-10
        )
