"""Randomized finite-difference oracles for the fit engine's derivatives.

The LM engine and the CRLBs both stand on the analytic Eq.6 Jacobian
(``fitting/lm.py::eq6_jacobian_planar``); the suite pins them via fit
*outcomes* (cost parity with scipy, ground-truth recovery, tie scaling).
This module checks the derivatives themselves: central finite differences
of the planar Eq.6 model at random parameter draws vs the analytic planes,
and an independently-built FD Fisher matrix vs ``crlb_batched_planar`` —
at random free/fixed/tied parameter maps.

All in float64 (the test conftest enables x64), so FD truncation error is
the only tolerance driver.
"""

import numpy as np
import pytest

from xmris_tpu.fitting.lm import (
    ParamMap,
    crlb_batched_planar,
    eq6_basis_planar,
    eq6_jacobian_planar,
    hashable_pmap,
)

import jax.numpy as jnp

N_T = 128
SW = 4000.0
MHZ = 120.0


def _rng(trial, salt=0):
    return np.random.default_rng(70_000 + 149 * trial + salt)


def _random_grid(rng, k):
    """(K, 5) physical parameters: amp, cs[ppm], lw[Hz], phase[deg], g."""
    base = rng.uniform(-10.0, -4.0)
    cs = base + np.arange(k) * rng.uniform(2.0, 4.0)
    return np.column_stack(
        [
            rng.uniform(0.5, 20.0, k),
            cs,
            rng.uniform(8.0, 30.0, k),
            rng.uniform(-120.0, 120.0, k),
            rng.uniform(0.0, 1.0, k),
        ]
    )


def _model(t, grid):
    m_re, m_im, _, _ = eq6_basis_planar(jnp.asarray(t), jnp.asarray(grid), MHZ)
    return np.asarray(m_re), np.asarray(m_im)


class TestAnalyticJacobianFuzz:
    @pytest.mark.parametrize("trial", range(6))
    def test_matches_central_differences(self, trial):
        rng = _rng(trial)
        k = int(rng.integers(1, 5))
        t = np.arange(N_T) / SW
        grid = _random_grid(rng, k)

        _, _, b_re, b_im = eq6_basis_planar(
            jnp.asarray(t), jnp.asarray(grid), MHZ
        )
        j_re, j_im = eq6_jacobian_planar(
            jnp.asarray(t), jnp.asarray(grid), b_re, b_im, MHZ
        )
        j_re, j_im = np.asarray(j_re), np.asarray(j_im)

        for ki in range(k):
            for p in range(5):
                h = max(1e-6 * abs(grid[ki, p]), 1e-7)
                gp, gm = grid.copy(), grid.copy()
                gp[ki, p] += h
                gm[ki, p] -= h
                rp, ip = _model(t, gp)
                rm, im_ = _model(t, gm)
                fd_re = (rp - rm) / (2 * h)
                fd_im = (ip - im_) / (2 * h)
                # Per-(peak, param)-column tolerance: chemical-shift columns
                # are ~2 orders larger than amplitude/g columns, so one
                # global scale would loosen the small columns to ~1e-3
                # relative and mask subtle per-column derivative errors.
                np.testing.assert_allclose(
                    j_re[:, ki, p], fd_re,
                    atol=5e-6 * max(1.0, float(np.max(np.abs(fd_re)))),
                    err_msg=f"d(re)/d(param {p}) of peak {ki}",
                )
                np.testing.assert_allclose(
                    j_im[:, ki, p], fd_im,
                    atol=5e-6 * max(1.0, float(np.max(np.abs(fd_im)))),
                    err_msg=f"d(im)/d(param {p}) of peak {ki}",
                )


def _random_pmap(rng, grid):
    """Random free/fixed/tied map consistent with ``grid`` as the truth.

    Every peak's cs/lw/phase/g are independently free or fixed; amplitudes
    are free, except that with >=2 peaks one random non-first amplitude may
    be tied to peak 0's slot with a random positive factor (in which case
    the grid is adjusted so the tie holds exactly).
    """
    k = grid.shape[0]
    idx, scale, offset, x_free = [], [], [], []
    slot_of = {}  # (peak, param) -> free slot

    tie_child = None
    factor = 1.0
    if k >= 2 and rng.integers(0, 2):
        tie_child = int(rng.integers(1, k))
        factor = float(np.round(rng.uniform(0.3, 0.9), 3))
        grid[tie_child, 0] = factor * grid[0, 0]

    for ki in range(k):
        for p in range(5):
            if ki == tie_child and p == 0:
                idx.append(slot_of[(0, 0)])
                scale.append(factor)
                offset.append(0.0)
            elif p == 0 or rng.integers(0, 4):  # amplitudes always free
                slot = len(x_free)
                slot_of[(ki, p)] = slot
                idx.append(slot)
                scale.append(1.0)
                offset.append(0.0)
                x_free.append(grid[ki, p])
            else:
                idx.append(-1)
                scale.append(0.0)
                offset.append(grid[ki, p])
    pmap = ParamMap(
        idx=np.asarray(idx, np.int32),
        scale=np.asarray(scale, float),
        offset=np.asarray(offset, float),
        n_peaks=k,
    )
    return hashable_pmap(pmap), np.asarray(x_free, float)


class TestCRLBOracleFuzz:
    @pytest.mark.parametrize("trial", range(5))
    def test_matches_fd_fisher(self, trial):
        rng = _rng(trial, salt=1)
        k = int(rng.integers(1, 4))
        t = np.arange(N_T) / SW
        grid = _random_grid(rng, k)
        pmap_static, x_free = _random_pmap(rng, grid)
        n_free = x_free.size

        idx = np.asarray(pmap_static[0])
        sc = np.asarray(pmap_static[1])
        off = np.asarray(pmap_static[2])

        def model_stacked(x):
            full = off + np.where(idx >= 0, sc * x[np.maximum(idx, 0)], 0.0)
            m_re, m_im = _model(t, full.reshape(k, 5))
            return np.concatenate([m_re, m_im])

        m0 = model_stacked(x_free)
        noise = 0.01 * rng.standard_normal(m0.size)
        y = m0 + noise
        y_re, y_im = y[:N_T], y[N_T:]

        # --- FD Fisher oracle ---
        j_fd = np.zeros((m0.size, n_free))
        for f in range(n_free):
            h = max(1e-6 * abs(x_free[f]), 1e-7)
            xp, xm = x_free.copy(), x_free.copy()
            xp[f] += h
            xm[f] -= h
            j_fd[:, f] = (model_stacked(xp) - model_stacked(xm)) / (2 * h)
        r = y - m0
        sigma2 = float(r @ r) / max(2.0 * N_T - n_free, 1.0)
        fisher = j_fd.T @ j_fd
        cov = sigma2 * np.linalg.inv(fisher + 1e-12 * np.eye(n_free))
        sd_oracle = np.sqrt(np.maximum(np.diag(cov), 0.0))

        sds, s2 = crlb_batched_planar(
            jnp.asarray(y_re)[None], jnp.asarray(y_im)[None],
            jnp.asarray(t), jnp.asarray(x_free)[None], pmap_static, MHZ,
        )
        np.testing.assert_allclose(float(s2[0]), sigma2, rtol=1e-9)
        np.testing.assert_allclose(
            np.asarray(sds)[0], sd_oracle, rtol=1e-4
        )
