"""Randomized sweeps over the MINPACK bound transforms.

The LM engine iterates in unbounded internal coordinates and maps through
``internal_to_external_jax`` every evaluation (``fitting/lm.py:56-127``);
the transform's exactness and its diagonal Jacobian are therefore load-
bearing for every fit.  Random draws over all four bound kinds assert:

* host and traced ``external_to_internal`` agree;
* the round trip external -> internal -> external is the identity for
  strictly-interior points;
* arbitrary internal points always map INSIDE the bounds;
* the returned dx/du matches a central finite difference.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from xmris_tpu.fitting.lm import (
    classify_bounds,
    external_to_internal,
    external_to_internal_jax,
    internal_to_external_jax,
)


def _rng(trial, salt=0):
    return np.random.default_rng(30_000 + 163 * trial + salt)


def _random_bounds(rng, n):
    """Random mix of free / lower-only / upper-only / two-sided bounds plus
    strictly-interior external points."""
    lower = np.full(n, -np.inf)
    upper = np.full(n, np.inf)
    x = np.empty(n)
    for i in range(n):
        kind = rng.integers(0, 4)
        if kind == 0:  # free
            x[i] = rng.uniform(-100.0, 100.0)
        elif kind == 1:  # lower only
            lower[i] = rng.uniform(-50.0, 50.0)
            x[i] = lower[i] + rng.uniform(0.01, 80.0)
        elif kind == 2:  # upper only
            upper[i] = rng.uniform(-50.0, 50.0)
            x[i] = upper[i] - rng.uniform(0.01, 80.0)
        else:  # two-sided
            lo = rng.uniform(-50.0, 50.0)
            span = rng.uniform(0.1, 60.0)
            lower[i], upper[i] = lo, lo + span
            x[i] = lo + span * rng.uniform(0.01, 0.99)
    return lower, upper, x


class TestBoundTransformFuzz:
    @pytest.mark.parametrize("trial", range(10))
    def test_roundtrip_identity_interior(self, trial):
        rng = _rng(trial)
        lower, upper, x = _random_bounds(rng, 24)
        kind = classify_bounds(lower, upper)

        u_np = external_to_internal(x, lower, upper, kind)
        u_jax = np.asarray(
            external_to_internal_jax(
                jnp.asarray(x), jnp.asarray(lower), jnp.asarray(upper),
                jnp.asarray(kind),
            )
        )
        np.testing.assert_allclose(u_jax, u_np, rtol=1e-12, atol=1e-12)

        back, _ = internal_to_external_jax(
            jnp.asarray(u_np), jnp.asarray(lower), jnp.asarray(upper),
            jnp.asarray(kind),
        )
        span = np.where(
            np.isfinite(upper - lower), upper - lower, np.maximum(1.0, np.abs(x))
        )
        np.testing.assert_allclose(
            np.asarray(back), x, atol=1e-7 * np.max(span) + 1e-9
        )

    @pytest.mark.parametrize("trial", range(10))
    def test_arbitrary_internal_stays_in_bounds(self, trial):
        rng = _rng(trial, salt=1)
        lower, upper, _ = _random_bounds(rng, 24)
        kind = classify_bounds(lower, upper)
        u = rng.uniform(-50.0, 50.0, size=24)
        x, _ = internal_to_external_jax(
            jnp.asarray(u), jnp.asarray(lower), jnp.asarray(upper),
            jnp.asarray(kind),
        )
        x = np.asarray(x)
        eps = 1e-9
        assert np.all(x >= np.where(np.isfinite(lower), lower - eps, -np.inf))
        assert np.all(x <= np.where(np.isfinite(upper), upper + eps, np.inf))

    @pytest.mark.parametrize("trial", range(6))
    def test_dxdu_matches_finite_difference(self, trial):
        rng = _rng(trial, salt=2)
        lower, upper, _ = _random_bounds(rng, 16)
        kind = classify_bounds(lower, upper)
        u = rng.uniform(-5.0, 5.0, size=16)
        h = 1e-6

        def ext(uu):
            x, _ = internal_to_external_jax(
                jnp.asarray(uu), jnp.asarray(lower), jnp.asarray(upper),
                jnp.asarray(kind),
            )
            return np.asarray(x)

        _, dxdu = internal_to_external_jax(
            jnp.asarray(u), jnp.asarray(lower), jnp.asarray(upper),
            jnp.asarray(kind),
        )
        fd = (ext(u + h) - ext(u - h)) / (2 * h)
        scale = np.maximum(1.0, np.abs(fd))
        np.testing.assert_allclose(np.asarray(dxdu), fd, atol=1e-6 * scale.max())
