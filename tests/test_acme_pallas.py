"""Fused ACME polish kernel: analytic gradient + whole-loop parity.

The kernel (``ops/kernels/acme_pallas.py``) replicates the XLA gd polish of
``_grid_phase_search`` with the spectrum rows VMEM-resident across the
whole loop.  Pinned here (interpret mode on the CPU suite):

1. the closed-form ACME gradient matches ``jax.grad`` of the reference
   objective (including the zero-bin entropy guard, penalty branch, and
   degenerate all-negative spectra);
2. the full polish achieves gd-level scores voxel-for-voxel through
   ``autophase(mode="all", optimizer="grid", polish_optimizer="fused")``.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import xmris_tpu as xmt
from xmris_tpu import DIMS, XmrArray
from xmris_tpu.ops.kernels.acme_pallas import _acme_value_grad, acme_polish_pallas
from xmris_tpu.ops.phasing import _phased_real_planar, acme_score_raw


def _random_batch(rng, vt=8, nf=256, degenerate=0):
    f = np.linspace(-2500.0, 2500.0, nf)
    re = rng.normal(0, 1, (vt, nf)) + 5 * np.exp(-(((f[None, :] - 300) / 50) ** 2))
    im = rng.normal(0, 1, (vt, nf))
    for v in range(degenerate):
        # fully-negative phased spectrum -> score +inf, zero gradient
        re[v] = -np.abs(re[v]) - 1.0
        im[v] = 0.0
    piv = rng.uniform(-1000, 1000, (vt,))
    p = np.stack(
        [rng.uniform(-150, 150, vt), rng.uniform(-3000, 3000, vt)], axis=1
    )
    return f, re, im, piv, p


class TestAnalyticGradient:
    @pytest.mark.parametrize("trial", range(4))
    def test_matches_autodiff(self, trial):
        rng = np.random.default_rng(100 + trial)
        f, re, im, piv, p = _random_batch(rng, degenerate=trial % 2)
        xr = float(f[-1] - f[0])

        def obj_one(pv, rr, ri, pivot):
            d = _phased_real_planar(
                rr, ri, jnp.asarray(f), pv[0], pv[1], pivot, xr
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
            p0_only=False, want_grad=True, mosaic=False,
        )
        v = np.asarray(v[:, 0])
        finite = np.isfinite(np.asarray(ref_v))
        np.testing.assert_allclose(v[finite], np.asarray(ref_v)[finite],
                                   rtol=1e-8)
        assert np.all(np.isinf(v[~finite]))
        # degenerate voxels: autodiff of the inf branch gives 0 gradient
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(ref_g), rtol=1e-5,
            atol=1e-7 * float(np.max(np.abs(ref_g))),
        )

    def test_p0_only_grad(self):
        rng = np.random.default_rng(7)
        f, re, im, piv, p = _random_batch(rng)
        xr = float(f[-1] - f[0])
        p[:, 1] = 0.0

        def obj_one(p0, rr, ri, pivot):
            d = _phased_real_planar(
                rr, ri, jnp.asarray(f), p0, 0.0, pivot, xr
            )
            return acme_score_raw(d)

        ref_g = jax.vmap(jax.grad(obj_one))(
            jnp.asarray(p[:, 0]), jnp.asarray(re), jnp.asarray(im),
            jnp.asarray(piv),
        )
        u = (jnp.asarray(f)[None, :] - jnp.asarray(piv)[:, None]) / xr
        _, g = _acme_value_grad(
            jnp.asarray(re), jnp.asarray(im), u, jnp.asarray(p),
            p0_only=True, want_grad=True, mosaic=False,
        )
        np.testing.assert_allclose(np.asarray(g[:, 0]), np.asarray(ref_g),
                                   rtol=1e-5)
        assert np.all(np.asarray(g[:, 1]) == 0.0)


class TestFusedPolish:
    def _phantom(self, n_voxels=12, nf=512, seed=3):
        rng = np.random.default_rng(seed)
        f = np.linspace(-2500.0, 2500.0, nf)
        re = np.zeros((n_voxels, nf))
        for _ in range(2):
            center = rng.uniform(-2000, 2000, (n_voxels, 1))
            lw = rng.uniform(30, 80, (n_voxels, 1))
            amp = rng.uniform(5, 25, (n_voxels, 1))
            re += amp / (1.0 + ((f[None, :] - center) / lw) ** 2)
        p0 = rng.uniform(-120, 120, (n_voxels, 1))
        p1 = rng.uniform(-500, 500, (n_voxels, 1))
        u = (f[None, :] - f[0]) / (f[-1] - f[0])
        phi = np.deg2rad(p0 + p1 * u)
        rr = re * np.cos(phi) + rng.normal(0, 0.1, (n_voxels, nf))
        ri = -re * np.sin(phi) + rng.normal(0, 0.1, (n_voxels, nf))
        return f, rr, ri

    def _scores(self, f, rr, ri, p):
        xr = float(f[-1] - f[0])

        def one(pv, row_re, row_im):
            d = _phased_real_planar(
                row_re, row_im, jnp.asarray(f), pv[0], pv[1],
                jnp.asarray(f)[jnp.argmax(row_re**2 + row_im**2)], xr,
            )
            return acme_score_raw(d)

        return np.asarray(
            jax.vmap(one)(jnp.asarray(p), jnp.asarray(rr), jnp.asarray(ri))
        )

    @pytest.mark.parametrize("p0_only", [False, True])
    def test_fused_matches_gd_through_autophase(self, p0_only):
        """Public chain: autophase(mode='all', optimizer='grid',
        polish_optimizer='fused') achieves gd-level ACME scores."""
        f, rr, ri = self._phantom()
        spec = XmrArray(
            (rr + 1j * ri).astype(np.complex128),
            dims=("voxel", DIMS.frequency),
            coords={DIMS.frequency: (DIMS.frequency, f)},
        )
        outs = {}
        for polish in ("gd", "fused"):
            ph = spec.xmr.autophase(
                mode="all", optimizer="grid", p0_only=p0_only,
                polish_optimizer=polish,
            )
            outs[polish] = np.asarray(ph.values)
        # Same seeds + same step rule: achieved objective must match at
        # gd level.  Compare achieved ACME scores of the corrected
        # spectra (phases themselves may differ between equal-score
        # optima).
        s_gd = self._scores(
            f, outs["gd"].real, outs["gd"].imag,
            np.zeros((rr.shape[0], 2)),
        )
        s_fused = self._scores(
            f, outs["fused"].real, outs["fused"].imag,
            np.zeros((rr.shape[0], 2)),
        )
        assert np.all(s_fused <= s_gd * 1.02 + 1e-9), (
            s_fused - s_gd
        )

    def test_nondivisible_batch_padding(self):
        f, rr, ri = self._phantom(n_voxels=11, nf=256)
        piv = f[np.argmax(rr**2 + ri**2, axis=1)]
        p0 = np.zeros((11, 2))
        p, s = acme_polish_pallas(
            jnp.asarray(rr), jnp.asarray(ri), jnp.asarray(f),
            jnp.asarray(piv), jnp.asarray(p0), float(f[-1] - f[0]),
            n_iter=10, interpret=True,
        )
        assert p.shape == (11, 2) and s.shape == (11,)
        assert np.all(np.isfinite(np.asarray(s)))
