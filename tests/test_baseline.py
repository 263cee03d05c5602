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


class TestCyclicReduction:
    """Block-cyclic-reduction solver vs the scan LDL^T and the scipy oracle.

    The CR path is the TPU formulation (the sequential scan measured
    503 ms at 16384x2048/n_iter=10 on the v5e — results/tpu_r19.jsonl);
    exactness in f64 and refined f32 accuracy are pinned here.
    """

    @pytest.mark.parametrize("n", [256, 300, 511, 512])
    def test_direct_solve_exact_f64(self, n):
        import jax.numpy as jnp

        from xmris_tpu.ops.baseline import (
            _dtd_bands,
            _penta_ldlt_solve,
            _penta_matvec,
            penta_solve_cr,
        )

        rng = np.random.default_rng(n)
        lam = 1e5
        w = rng.uniform(0.001, 1.0, (4, n))
        m0, m1, m2 = (np.asarray(x) for x in _dtd_bands(n, jnp.float64))
        a0 = w + lam * m0
        b = rng.normal(size=(4, n))
        a1b = jnp.broadcast_to(jnp.asarray(lam * m1), (4, n - 1))
        a2b = jnp.broadcast_to(jnp.asarray(lam * m2), (4, n - 2))
        x_cr = np.asarray(
            penta_solve_cr(jnp.asarray(a0), a1b, a2b, jnp.asarray(b))
        )
        x_scan = np.stack(
            [
                np.asarray(
                    _penta_ldlt_solve(
                        jnp.asarray(a0[i]), jnp.asarray(lam * m1),
                        jnp.asarray(lam * m2), jnp.asarray(b[i]),
                    )
                )
                for i in range(4)
            ]
        )
        scale = np.max(np.abs(x_scan))
        assert np.max(np.abs(x_cr - x_scan)) / scale < 1e-9
        # and the solution actually satisfies the system
        r = np.asarray(
            _penta_matvec(jnp.asarray(a0), a1b, a2b, jnp.asarray(x_cr))
        )
        assert np.max(np.abs(r - b)) / np.max(np.abs(b)) < 1e-8

    def test_asls_cr_matches_scan_f64(self):
        ys = np.stack([make_spectrum(seed=s) for s in range(4)])
        z_scan = np.asarray(
            als_baseline_batched(ys.astype(np.float64), 1e5, 0.001, 10,
                                 solver="scan")
        )
        z_cr = np.asarray(
            als_baseline_batched(ys.astype(np.float64), 1e5, 0.001, 10,
                                 solver="cr")
        )
        scale = np.max(np.abs(z_scan))
        assert np.max(np.abs(z_cr - z_scan)) / scale < 1e-7

    def test_asls_cr_f32_input_upcasts_to_f64_accuracy(self):
        """The cr solver computes internally in f64 regardless of input
        dtype: the system's conditioning (~lam*16/w_min ~ 1e9) exceeds
        1/eps_f32, and EVERY f32 formulation tried is numerically
        unusable on TPU arithmetic (the f32 scan measured NaN outputs on
        realistic spectra; safeguarded f32 CR measured 40-85 %
        self-inconsistency — results/tpu_r19.jsonl).  An f32 input must
        therefore come back agreeing with the f64 answer to input-dtype
        resolution, limited only by weight decisions near exact y == z
        ties."""
        lam, p = 1e5, 0.001
        ys = np.stack([make_spectrum(seed=s) for s in range(4)])
        z64 = np.asarray(
            als_baseline_batched(ys.astype(np.float64), lam, p, 10,
                                 solver="scan")
        )
        z32 = np.asarray(
            als_baseline_batched(ys.astype(np.float32), lam, p, 10,
                                 solver="cr")
        ).astype(np.float64)
        assert z32.dtype == np.float64 and not np.isnan(z32).any()
        scale = np.max(np.abs(z64))
        # f32 INPUT rounding perturbs y by ~1e-7 relative, which can flip
        # razor-edge weight decisions; the solve itself is f64-exact.
        assert np.max(np.abs(z32 - z64)) / scale < 1e-4

    def test_asls_cr_chunked_matches_unchunked(self):
        """>2048-voxel batches run as 2048-voxel chunks (remote-compile
        size limit); chunking must be invisible in the results."""
        rng = np.random.default_rng(5)
        ys = np.stack(
            [make_spectrum(seed=s) for s in rng.integers(0, 50, 6)]
        ).astype(np.float64)
        big = np.tile(ys, (400, 1))[:2050]  # crosses the 2048 boundary
        z_big = np.asarray(
            als_baseline_batched(big, 1e5, 0.001, 3, solver="cr")
        )
        z_small = np.asarray(
            als_baseline_batched(big[2048:], 1e5, 0.001, 3, solver="cr")
        )
        # tail chunks are edge-padded to the 2048 executable shape; the
        # differing batch vectorization moves f64 rounding by ~1e-10
        np.testing.assert_allclose(z_big[2048:], z_small, rtol=1e-8)

    def test_bad_solver_raises(self):
        ys = make_spectrum()[None].astype(np.float64)
        with pytest.raises(ValueError, match="solver"):
            als_baseline_batched(ys, 1e5, 0.001, 2, solver="qr")


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
