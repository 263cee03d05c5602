"""Seeded fuzz sweeps for the round-5 numerics: ACME kernel gradient and
the cyclic-reduction pentadiagonal solver.

Deterministic trials (seeded by parametrized index — exact reproduction on
failure) over random shapes, scales, and degeneracies:

* the closed-form ACME value/gradient vs ``jax.vmap(jax.grad(...))`` of
  the reference objective at random spectra, pivots, and phase points,
  including fully-negative (inf-scored) voxels and p0-only mode;
* the block-cyclic-reduction solve vs the banded-LDL^T scan at random
  sizes (odd, non-power-of-two), weights, and lambda scales, plus the
  structured matvec as an independent system check.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from xmris_tpu.ops.baseline import (
    _dtd_bands,
    _penta_ldlt_solve,
    _penta_matvec,
    penta_solve_cr,
)
from xmris_tpu.ops.kernels.acme_pallas import _acme_value_grad
from xmris_tpu.ops.phasing import _phased_real_planar, acme_score_raw


def _rng(trial, salt=0):
    return np.random.default_rng(70_000 + 211 * trial + salt)


class TestFuzzAcmeGradient:
    @pytest.mark.parametrize("trial", range(8))
    def test_value_grad_matches_autodiff(self, trial):
        rng = _rng(trial)
        vt = int(rng.integers(2, 10))
        nf = int(rng.choice([96, 192, 257, 384, 513]))
        f = np.linspace(-3000.0, 3000.0, nf) * rng.uniform(0.3, 1.5)
        xr = float(f[-1] - f[0])
        scale = 10.0 ** rng.uniform(-1, 2)
        re = rng.normal(0, 1, (vt, nf)) * scale
        im = rng.normal(0, 1, (vt, nf)) * scale
        # a few structured voxels (peaks) + possibly one degenerate
        for v in range(vt // 2):
            c = rng.uniform(f[0], f[-1])
            re[v] += 8 * scale * np.exp(-(((f - c) / (0.02 * xr)) ** 2))
        if trial % 3 == 0:
            re[-1] = -np.abs(re[-1]) - scale
            im[-1] = 0.0
        piv = rng.uniform(f[0], f[-1], (vt,))
        p = np.stack(
            [rng.uniform(-180, 180, vt), rng.uniform(-3500, 3500, vt)],
            axis=1,
        )
        p0_only = bool(trial % 2)
        if p0_only:
            p[:, 1] = 0.0

        def obj_one(pv, rr, ri, pivot):
            p1v = 0.0 if p0_only else pv[1]
            d = _phased_real_planar(
                rr, ri, jnp.asarray(f), pv[0], p1v, pivot, xr
            )
            return acme_score_raw(d)

        ref_v = jax.vmap(obj_one)(
            jnp.asarray(p), jnp.asarray(re), jnp.asarray(im), jnp.asarray(piv)
        )
        ref_g = jax.vmap(jax.grad(obj_one))(
            jnp.asarray(p), jnp.asarray(re), jnp.asarray(im), jnp.asarray(piv)
        )
        u = (jnp.asarray(f)[None, :] - jnp.asarray(piv)[:, None]) / xr
        v, g = _acme_value_grad(
            jnp.asarray(re), jnp.asarray(im), u, jnp.asarray(p),
            p0_only=p0_only, want_grad=True, mosaic=False,
        )
        v = np.asarray(v[:, 0])
        finite = np.isfinite(np.asarray(ref_v))
        np.testing.assert_allclose(
            v[finite], np.asarray(ref_v)[finite], rtol=1e-7
        )
        assert np.all(np.isinf(v[~finite]))
        gr = np.asarray(ref_g)
        if p0_only:
            gr = np.concatenate([gr[:, :1], np.zeros_like(gr[:, :1])], 1)
        np.testing.assert_allclose(
            np.asarray(g), gr, rtol=2e-5,
            atol=1e-7 * max(1.0, float(np.max(np.abs(gr)))),
        )


class TestFuzzCyclicReduction:
    @pytest.mark.parametrize("trial", range(8))
    def test_cr_matches_scan_and_system(self, trial):
        rng = _rng(trial, salt=1)
        n = int(rng.choice([64, 129, 250, 384, 511, 1024]))
        b = int(rng.integers(1, 5))
        lam = 10.0 ** rng.uniform(2, 6)
        w = rng.uniform(1e-3, 1.0, (b, n))
        m0, m1, m2 = (np.asarray(x) for x in _dtd_bands(n, jnp.float64))
        a0 = w + lam * m0
        rhs = rng.normal(size=(b, n)) * 10.0 ** rng.uniform(-1, 2)
        a1b = jnp.broadcast_to(jnp.asarray(lam * m1), (b, n - 1))
        a2b = jnp.broadcast_to(jnp.asarray(lam * m2), (b, n - 2))
        x_cr = np.asarray(
            penta_solve_cr(jnp.asarray(a0), a1b, a2b, jnp.asarray(rhs))
        )
        x_scan = np.stack(
            [
                np.asarray(
                    _penta_ldlt_solve(
                        jnp.asarray(a0[i]), jnp.asarray(lam * m1),
                        jnp.asarray(lam * m2), jnp.asarray(rhs[i]),
                    )
                )
                for i in range(b)
            ]
        )
        scale = max(np.max(np.abs(x_scan)), 1e-30)
        assert np.max(np.abs(x_cr - x_scan)) / scale < 1e-8, (n, b, lam)
        resid = np.asarray(
            _penta_matvec(jnp.asarray(a0), a1b, a2b, jnp.asarray(x_cr))
        ) - rhs
        assert np.max(np.abs(resid)) / max(np.max(np.abs(rhs)), 1e-30) < 1e-7
