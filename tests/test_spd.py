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


class TestSolvePallas:
    """VMEM-resident Pallas variant (interpret mode on CPU)."""

    @pytest.mark.parametrize("f", [3, 10, 20])
    def test_matches_xla_form_with_damping(self, f):
        import jax.numpy as jnp

        from xmris_tpu.ops.kernels.spd import spd_solve_damped_pallas

        h, g = make_spd(b=13, f=f, seed=f)
        lam = np.random.default_rng(f).uniform(1e-5, 1e-2, size=13)
        h32 = h.astype(np.float32)
        eye = np.eye(f, dtype=np.float32)[None]
        diag = np.einsum("bii->bi", h32)
        damped = (
            h32
            + lam[:, None, None].astype(np.float32)
            * np.maximum(diag, 1e-12)[:, None, :] * eye
            + 1e-12 * eye
        )
        ref = np.asarray(spd_solve_small(jnp.asarray(damped), g.astype(np.float32)))
        got = np.asarray(
            spd_solve_damped_pallas(
                jnp.asarray(h32), jnp.asarray(g.astype(np.float32)),
                jnp.asarray(lam.astype(np.float32)), v_tile=8, interpret=True,
            )
        )
        np.testing.assert_allclose(got, ref, rtol=2e-6, atol=1e-7)

    def test_batch_padding_and_nan_rows(self):
        # b=5 with v_tile=8 exercises the pad tail; one indefinite system
        # must go NaN without contaminating its lane neighbours.
        import jax.numpy as jnp

        from xmris_tpu.ops.kernels.spd import spd_solve_damped_pallas

        h, g = make_spd(b=5, f=4, seed=3)
        h[2] = [[1, 2, 0, 0], [2, 1, 0, 0], [0, 0, 1, 0], [0, 0, 0, 1]]
        lam = np.zeros(5)
        x = np.asarray(
            spd_solve_damped_pallas(
                jnp.asarray(h.astype(np.float32)),
                jnp.asarray(g.astype(np.float32)),
                jnp.asarray(lam.astype(np.float32)), v_tile=8, interpret=True,
            )
        )
        assert x.shape == (5, 4)
        assert np.isnan(x[2]).any()
        for i in (0, 1, 3, 4):
            np.testing.assert_allclose(
                x[i], np.linalg.solve(h[i], g[i]), rtol=2e-4
            )

    def test_inverse_diag_pallas_matches(self):
        import jax.numpy as jnp

        from xmris_tpu.ops.kernels.spd import spd_inverse_diag_pallas

        h, _ = make_spd(b=9, f=12, seed=7)
        ref = np.stack([np.diagonal(np.linalg.inv(h[i])) for i in range(9)])
        got = np.asarray(
            spd_inverse_diag_pallas(
                jnp.asarray(h.astype(np.float32)), v_tile=8, interpret=True
            )
        )
        np.testing.assert_allclose(got, ref, rtol=2e-4)


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
