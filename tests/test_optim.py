"""Differential evolution optimizer tests (standard functions, determinism)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xmris_tpu.ops.optim import differential_evolution


def sphere(x):
    return jnp.sum((x - 0.3) ** 2)


def rosenbrock(x):
    return jnp.sum(100.0 * (x[1:] - x[:-1] ** 2) ** 2 + (1 - x[:-1]) ** 2)


class TestDE:
    def test_sphere_2d(self):
        res = differential_evolution(
            sphere, jnp.asarray([(-2.0, 2.0), (-2.0, 2.0)]), seed=0
        )
        np.testing.assert_allclose(np.asarray(res.x), 0.3, atol=1e-3)
        assert bool(res.converged)

    def test_rosenbrock_with_polish(self):
        res = differential_evolution(
            rosenbrock,
            jnp.asarray([(-2.0, 2.0)] * 2),
            seed=1,
            maxiter=400,
            tol=1e-8,
            polish_iters=100,
        )
        assert float(res.fun) < 1e-3

    def test_bounds_respected(self):
        res = differential_evolution(
            lambda x: -jnp.sum(x),  # pushes to the upper bound
            jnp.asarray([(0.0, 1.0), (2.0, 5.0)]),
            seed=2,
        )
        x = np.asarray(res.x)
        assert x[0] <= 1.0 + 1e-6 and x[1] <= 5.0 + 1e-6
        np.testing.assert_allclose(x, [1.0, 5.0], atol=1e-2)

    def test_seed_determinism(self):
        bounds = jnp.asarray([(-1.0, 1.0)])
        r1 = differential_evolution(sphere, bounds, seed=7)
        r2 = differential_evolution(sphere, bounds, seed=7)
        assert float(r1.fun) == float(r2.fun)
        np.testing.assert_array_equal(np.asarray(r1.x), np.asarray(r2.x))

    def test_prng_key_seed(self):
        bounds = jnp.asarray([(-1.0, 1.0)])
        res = differential_evolution(sphere, bounds, seed=jax.random.PRNGKey(3))
        assert abs(float(res.x[0]) - 0.3) < 1e-2

    def test_vmappable(self):
        """The whole search vmaps (the mode='all' autophase pattern)."""
        bounds = jnp.asarray([(-2.0, 2.0)])
        targets = jnp.asarray([0.1, -0.5, 1.2])
        keys = jax.random.split(jax.random.PRNGKey(0), 3)

        def solve_one(target, key):
            return differential_evolution(
                lambda x: jnp.sum((x - target) ** 2), bounds, seed=key
            ).x

        xs = jax.vmap(solve_one)(targets, keys)
        np.testing.assert_allclose(np.asarray(xs)[:, 0], np.asarray(targets), atol=5e-3)

    def test_inf_candidates_are_rejected(self):
        """+inf regions (the guarded ACME branch) never win selection."""

        def guarded(x):
            val = jnp.sum(x**2)
            return jnp.where(x[0] < -0.5, jnp.inf, val)

        res = differential_evolution(
            guarded, jnp.asarray([(-2.0, 2.0)]), seed=4, polish_iters=0
        )
        assert np.isfinite(float(res.fun))
        assert float(res.x[0]) >= -0.5
