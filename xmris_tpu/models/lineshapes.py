"""AMARES Eq.6 time-domain forward model (the framework's model family).

The model (Vanhamme et al., J Magn Reson 1997, 129(1):35-43, Eq. 6) covers the
Lorentzian (g=0), Gaussian (g=1), and Voigt-like (0<g<1) lineshape families:

    y(t) = sum_k  a_k * exp(j*phi_k) * exp(-d_k * (1 - g_k + g_k*t) * t)
                * exp(j*2*pi*f_k*t)

This is the single source of truth used by the simulator
(:mod:`xmris_tpu.fitting.simulation`) and the batched Levenberg-Marquardt
fitter (:mod:`xmris_tpu.fitting.amares`) — pure, jittable, and
differentiable, so the fitter's Jacobians come from autodiff of exactly the
model being simulated.  (Reference equivalent: ``fitting/simulation.py:91-96``
and the pyAMARES ``multieq6`` kernel it round-trips through.)
"""

from __future__ import annotations

import jax.numpy as jnp


def eq6_fid(t, amplitudes, frequencies, dampings, phases, lineshape_g):
    """Complex FID for one voxel.

    Parameters
    ----------
    t : (n_time,) array
        Time axis in seconds (including any dead-time offset).
    amplitudes, frequencies, dampings, phases, lineshape_g : (n_peaks,) arrays
        Per-peak a_k, f_k [Hz], d_k [1/s], phi_k [rad], g_k in [0, 1].

    Returns
    -------
    (n_time,) complex array.
    """
    t_col = t[:, None]
    decay = jnp.exp(-dampings * (1.0 - lineshape_g + lineshape_g * t_col) * t_col)
    angle = 2.0 * jnp.pi * frequencies * t_col + phases
    osc = jnp.cos(angle) + 1j * jnp.sin(angle)
    return jnp.sum(amplitudes * decay * osc, axis=1)


def eq6_fid_multi(t, amplitudes, frequencies, dampings, phases, lineshape_g):
    """Batched Eq.6: every per-peak argument has shape (batch, n_peaks)."""
    t_col = t[None, :, None]  # (1, n_time, 1)
    a = amplitudes[:, None, :]
    f = frequencies[:, None, :]
    d = dampings[:, None, :]
    p = phases[:, None, :]
    g = lineshape_g[:, None, :]
    decay = jnp.exp(-d * (1.0 - g + g * t_col) * t_col)
    angle = 2.0 * jnp.pi * f * t_col + p
    osc = jnp.cos(angle) + 1j * jnp.sin(angle)
    return jnp.sum(a * decay * osc, axis=2)  # (batch, n_time)
