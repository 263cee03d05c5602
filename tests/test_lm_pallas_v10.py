"""v10 whole-loop Pallas LM kernel tests — subprocess-isolated.

These tests trace the ENTIRE 25-iteration LM loop into one (interpreted)
pallas_call, which produces by far the largest XLA:CPU program in the
suite.  On a 1-CPU host that compile deterministically SIGSEGVs the
XLA:CPU compiler when it happens late in a long in-process compile
history (observed in three modes: persistent-cache read, cache write,
and `backend_compile_and_load` itself with the cache disabled; the same
program compiles fine in a fresh process).  See
``docs/xla_cpu_segfault.md`` for the minimal repro and the full history.

So: this module is gated behind ``XMT_V10_ISOLATED=1`` and is executed
via ``tests/test_v10_isolated.py``, which launches it in a fresh python
subprocess (fresh compile history, compile cache off).  To iterate on it
directly::

    XMT_V10_ISOLATED=1 python -m pytest tests/test_lm_pallas_v10.py -q
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from xmris_tpu.fitting.lm import (
    external_to_internal,
    hashable_pmap,
    lm_fit_batched_pallas,
)
from xmris_tpu.fitting.prior import load_prior_knowledge

pytestmark = pytest.mark.skipif(
    not os.environ.get("XMT_V10_ISOLATED"),
    reason="runs in a fresh subprocess via tests/test_v10_isolated.py "
    "(XLA:CPU compiler segfault after long compile histories on 1-CPU "
    "hosts; set XMT_V10_ISOLATED=1 to run in-process)",
)


class TestWholeLoopKernel:
    """v10: the entire LM loop (transform, eval, damped solve,
    accept/reject) fused into ONE pallas launch — must replicate the
    per-iteration v9 driver's results state-for-state."""

    LORENTZ_CSV = (
        "Index,PCr,ATP\n"
        "Initial Values,,\n"
        "amplitude,10.0,5.0\n"
        "chemicalshift,0.0,-7.5\n"
        "linewidth,15.0,20.0\n"
        "phase,0,0\n"
        "g,0,0\n"
        "Bounds,,\n"
        'amplitude,"(0, ","(0, "\n'
        'chemicalshift,"(-0.5, 0.5)","(-8.0, -7.0)"\n'
        'linewidth,"(5.0, 30.0)","(10.0, 40.0)"\n'
        'phase,"(-180, 180)","(-180, 180)"\n'
        "g,fixed,fixed\n"
    )

    def _run_pair(self, csv, tmp_path, n_points=512, u0_shift=0.0, **kw):
        from tests.test_fitting import make_phantom

        p = tmp_path / "pk.csv"
        p.write_text(csv)
        pk = load_prior_knowledge(p)
        da = make_phantom(n_voxels=3, n_points=n_points)
        fids = np.asarray(
            da.transpose("voxel", "time").values
        ).astype(np.complex64)
        t = jnp.asarray((np.arange(n_points) / 10000.0).astype(np.float32))
        u0 = jnp.asarray(
            external_to_internal(pk.init_free, pk.lower, pk.upper, pk.kind)
        ) + u0_shift
        args = (
            t, u0,
            jnp.asarray(pk.lower), jnp.asarray(pk.upper), jnp.asarray(pk.kind),
            hashable_pmap(pk.pmap), 120.0,
        )
        re = jnp.asarray(fids.real)
        im = jnp.asarray(fids.imag)
        r9, h9 = lm_fit_batched_pallas(
            re, im, *args, max_iter=25, v_tile=2, interpret=True,
            kernel_version=9, return_hessian=True, **kw,
        )
        r10, h10 = lm_fit_batched_pallas(
            re, im, *args, max_iter=25, v_tile=2, interpret=True,
            kernel_version=10, return_hessian=True, **kw,
        )
        return r9, h9, r10, h10

    def test_matches_v9_on_lorentzian_prior(self, tmp_path):
        """Identical accept/reject cascade: same costs, same iteration
        counts, same carried Hessian (the CRLB input), all converged.
        The 3-voxel batch at v_tile=2 also exercises the padding lane
        (done0 mask) of the whole-loop kernel."""
        r9, h9, r10, h10 = self._run_pair(self.LORENTZ_CSV, tmp_path)
        np.testing.assert_allclose(
            np.asarray(r10.x_free), np.asarray(r9.x_free),
            rtol=1e-4, atol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(r10.cost), np.asarray(r9.cost), rtol=1e-5
        )
        np.testing.assert_array_equal(
            np.asarray(r10.n_iter), np.asarray(r9.n_iter)
        )
        np.testing.assert_allclose(
            np.asarray(h10), np.asarray(h9), rtol=1e-3,
            atol=1e-4 * float(np.abs(np.asarray(h9)).max()),
        )
        assert np.asarray(r10.converged).all()
        assert np.asarray(r10.done).all()

    def test_matches_v9_on_voigt_fixed_g(self, tmp_path):
        """Fixed g = 0.3: the degree-2 linewidth coefficient rows flow
        through the in-kernel loop identically."""
        csv = self.LORENTZ_CSV.replace("g,0,0", "g,0.3,0.3")
        r9, _, r10, _ = self._run_pair(csv, tmp_path)
        np.testing.assert_allclose(
            np.asarray(r10.x_free), np.asarray(r9.x_free),
            rtol=1e-4, atol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(r10.cost), np.asarray(r9.cost), rtol=1e-5
        )
        assert np.asarray(r10.converged).all()

    def test_matches_v9_with_tied_amplitude(self, tmp_path):
        """Tied amplitude (0.5*PCr): the in-kernel free-space fold merges
        the tied rows exactly as the per-launch kernel does."""
        csv = self.LORENTZ_CSV.replace(
            "amplitude,10.0,5.0", "amplitude,10.0,0.5*PCr"
        )
        r9, h9, r10, h10 = self._run_pair(csv, tmp_path, n_points=256)
        np.testing.assert_allclose(
            np.asarray(r10.x_free), np.asarray(r9.x_free),
            rtol=1e-4, atol=1e-4,
        )
        np.testing.assert_array_equal(
            np.asarray(r10.n_iter), np.asarray(r9.n_iter)
        )
        assert np.asarray(r10.converged).all()

    def test_factored_basis_matches_direct(self, tmp_path):
        """The v10 kernel's block-factored basis (uniform t, n_t % 128
        == 0) matches its direct basis on identical inputs.  The driver
        auto-selects factored whenever t is concretely uniform, so the
        direct route is forced by calling the kernel wrapper directly."""
        from xmris_tpu.fitting.lm import (
            active_param_rows,
            lorentzian_env_flags,
        )
        from xmris_tpu.ops.kernels.lm_pallas import lm_loop_pallas_v10
        from tests.test_fitting import make_phantom

        p = tmp_path / "pk.csv"
        p.write_text(self.LORENTZ_CSV)
        pk = load_prior_knowledge(p)
        pmap_static = hashable_pmap(pk.pmap)
        n_points = 512
        da = make_phantom(n_voxels=3, n_points=n_points)
        fids = np.asarray(
            da.transpose("voxel", "time").values
        ).astype(np.complex64)
        t = jnp.asarray((np.arange(n_points) / 10000.0).astype(np.float32))
        u0 = jnp.asarray(
            external_to_internal(pk.init_free, pk.lower, pk.upper, pk.kind)
        ).astype(np.float32)
        u0 = jnp.broadcast_to(u0[None, :], (3, u0.shape[0]))
        active = active_param_rows(pmap_static)
        n_free = int(pk.lower.shape[0])
        kw = dict(
            n_peaks=pmap_static[3],
            mhz=120.0,
            active=active,
            g_zero=lorentzian_env_flags(pmap_static),
            n_free=n_free,
            fold_slots=tuple(int(pmap_static[0][j]) for j in active),
            fold_scales=tuple(float(pmap_static[1][j]) for j in active),
            pmap_idx=tuple(int(v) for v in pmap_static[0]),
            pmap_scale=tuple(float(v) for v in pmap_static[1]),
            pmap_offset=tuple(float(v) for v in pmap_static[2]),
            max_iter=25,
            v_tile=2,
            interpret=True,
        )
        args = (
            u0, jnp.asarray(fids.real), jnp.asarray(fids.imag), t,
            jnp.asarray(pk.lower), jnp.asarray(pk.upper),
            jnp.asarray(pk.kind),
        )
        u_f, cost_f, n_f, done_f, h_f = lm_loop_pallas_v10(
            *args, factored_t=True, **kw
        )
        u_d, cost_d, n_d, done_d, h_d = lm_loop_pallas_v10(
            *args, factored_t=False, **kw
        )
        np.testing.assert_allclose(
            np.asarray(u_f), np.asarray(u_d), rtol=1e-4, atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(cost_f), np.asarray(cost_d), rtol=1e-5
        )
        np.testing.assert_array_equal(np.asarray(n_f), np.asarray(n_d))
        assert np.asarray(done_f).all() and np.asarray(done_d).all()

    def test_nonfactored_length_matches_v9(self, tmp_path):
        """n_t not divisible by 128 forces the direct-basis route in both
        kernels through the public driver."""
        r9, _, r10, _ = self._run_pair(
            self.LORENTZ_CSV, tmp_path, n_points=320
        )
        np.testing.assert_allclose(
            np.asarray(r10.x_free), np.asarray(r9.x_free),
            rtol=1e-4, atol=1e-4,
        )
        np.testing.assert_array_equal(
            np.asarray(r10.n_iter), np.asarray(r9.n_iter)
        )
        assert np.asarray(r10.converged).all()

    def test_loose_ftol_exit_matches_v9(self, tmp_path):
        """Regression: the ftol accept-exit must test the POST-update lam
        exactly like the per-iteration drivers.  At ftol=0.5 a voxel's
        first accepted step can satisfy rel_drop < ftol while the
        pre-update lam still equals lam0 — the buggy pre-update check kept
        iterating (different n_iter and cost than v9).  The seed is
        perturbed off the optimum so the first accepted step's
        improvement is large enough to satisfy the loose ftol."""
        r9, _, r10, _ = self._run_pair(
            self.LORENTZ_CSV, tmp_path, ftol=0.5, u0_shift=0.5
        )
        np.testing.assert_array_equal(
            np.asarray(r10.n_iter), np.asarray(r9.n_iter)
        )
        np.testing.assert_allclose(
            np.asarray(r10.cost), np.asarray(r9.cost), rtol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(r10.x_free), np.asarray(r9.x_free),
            rtol=1e-4, atol=1e-4,
        )

    def test_free_g_falls_back_to_launch_loop(self, tmp_path):
        """A free-g prior auto-enables the VARPRO override, which is a
        launch-loop concept: kernel_version=10 must transparently produce
        the v9 path's exact result."""
        from tests.test_fitting import PK_CSV

        r9, _, r10, _ = self._run_pair(PK_CSV, tmp_path, n_points=256)
        np.testing.assert_array_equal(
            np.asarray(r10.x_free), np.asarray(r9.x_free)
        )
        np.testing.assert_array_equal(
            np.asarray(r10.cost), np.asarray(r9.cost)
        )
