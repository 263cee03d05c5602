"""Unrolled tiny-SPD solver tests (ops/kernels/spd.py)."""

import numpy as np
import pytest

from xmris_tpu.ops.kernels.spd import spd_inverse_diag, spd_solve_small


def make_spd(b=6, f=10, seed=0):
    rng = np.random.default_rng(seed)
    a = rng.normal(size=(b, f, f))
    h = a @ np.transpose(a, (0, 2, 1)) + f * np.eye(f)
    g = rng.normal(size=(b, f))
    return h, g


class TestSolve:
    @pytest.mark.parametrize("f", [3, 10, 20])
    def test_matches_numpy_solve(self, f):
        h, g = make_spd(f=f, seed=f)
        x = np.asarray(spd_solve_small(h, g))
        expected = np.stack([np.linalg.solve(h[i], g[i]) for i in range(len(h))])
        np.testing.assert_allclose(x, expected, rtol=1e-8)

    def test_non_spd_produces_nan(self):
        # Contract: non-SPD input -> NaN (the LM driver rejects non-finite
        # steps); a finite-but-wrong answer would be silently accepted.
        h = np.array([[[1.0, 2.0], [2.0, 1.0]]])  # indefinite
        g = np.array([[1.0, 1.0]])
        x = np.asarray(spd_solve_small(h, g))
        assert np.isnan(x).any()

    def test_spd_batch_with_one_bad_matrix(self):
        h, g = make_spd(b=3, f=4, seed=1)
        h[1] = [[1, 2, 0, 0], [2, 1, 0, 0], [0, 0, 1, 0], [0, 0, 0, 1]]
        x = np.asarray(spd_solve_small(h, g))
        # good rows stay exact, the indefinite row goes NaN
        for i in (0, 2):
            np.testing.assert_allclose(
                x[i], np.linalg.solve(h[i], g[i]), rtol=1e-8
            )
        assert np.isnan(x[1]).any()


class TestInverseDiag:
    @pytest.mark.parametrize("f", [4, 12])
    def test_matches_numpy_inverse(self, f):
        h, _ = make_spd(f=f, seed=2 * f)
        d = np.asarray(spd_inverse_diag(h))
        expected = np.stack(
            [np.diagonal(np.linalg.inv(h[i])) for i in range(len(h))]
        )
        np.testing.assert_allclose(d, expected, rtol=1e-7)

    def test_non_spd_produces_nan(self):
        h = np.array([[[0.0, 1.0], [1.0, 0.0]]])
        d = np.asarray(spd_inverse_diag(h))
        assert np.isnan(d).any()
