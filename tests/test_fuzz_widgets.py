"""Randomized sweeps through the widget JS engines vs the Python ops.

``test_widget_js.py`` pins the browser-side numeric engines (executed via
the ``tests/_jsmini.py`` JS-subset interpreter) at fixed vectors; this
module drives the same engines at randomized sizes, signals, windows, and
phase parameters, asserting the in-browser preview math stays bit-faithful
to :mod:`xmris_tpu.ops` everywhere — not just at the pinned points.

The reference widgets' previews are the user's only visual feedback while
tuning ``lb``/``gb``/``p0``/``p1`` interactively
(``/root/reference/src/xmris/visualization/widget/apodizer/apodizer.js``,
``phase/phase.js``); divergence between JS preview and Python result is the
class of bug this sweep exists to catch.
"""

import pathlib

import numpy as np
import pytest

from tests._jsmini import load_widget_module
from xmris_tpu import XmrArray

WIDGET_DIR = pathlib.Path(__file__).resolve().parent.parent / (
    "xmris_tpu/visualization/widget"
)


@pytest.fixture(scope="module")
def dsp():
    interp, env = load_widget_module(WIDGET_DIR / "apodizer" / "apodizer.js")
    return interp, env.get("DSP")


@pytest.fixture(scope="module")
def phasemath():
    interp, env = load_widget_module(WIDGET_DIR / "phase" / "phase.js")
    return interp, env.get("PHASEMATH")


def _call(interp_obj, name, *args):
    interp, obj = interp_obj
    fn = obj[name].bind(obj)
    return interp.call(fn, list(args))


def _rng(trial, salt=0):
    return np.random.default_rng(80_000 + 211 * trial + salt)


class TestDSPFuzz:
    @pytest.mark.parametrize("trial", range(6))
    def test_fft_random_signals_and_sizes(self, dsp, trial):
        rng = _rng(trial)
        n = int(2 ** rng.integers(3, 10))  # 8..512, pow-2 (radix-2 engine)
        re = rng.normal(size=n) * float(rng.uniform(0.1, 100.0))
        im = rng.normal(size=n) * float(rng.uniform(0.1, 100.0))
        jre, jim = list(map(float, re)), list(map(float, im))
        _call(dsp, "fftOrtho", jre, jim)  # in-place
        expected = np.fft.fft(re + 1j * im, norm="ortho")
        scale = max(1.0, float(np.max(np.abs(expected))))
        np.testing.assert_allclose(jre, expected.real, atol=1e-11 * scale)
        np.testing.assert_allclose(jim, expected.imag, atol=1e-11 * scale)

    @pytest.mark.parametrize("trial", range(6))
    def test_to_spectrum_chain_random_params(self, dsp, trial):
        """Full preview chain (window -> ortho FFT -> shift) == ops chain at
        random sw/lb/gb/window and multi-peak signals."""
        rng = _rng(trial, salt=1)
        n = int(2 ** rng.integers(6, 9))  # 64..256
        sw = float(rng.uniform(1000.0, 16000.0))
        t = np.arange(n) / sw
        sig = np.zeros(n, dtype=np.complex128)
        for _ in range(int(rng.integers(1, 4))):
            f0 = rng.uniform(-sw / 2 * 0.8, sw / 2 * 0.8)
            sig += rng.uniform(0.5, 10.0) * np.exp(
                (1j * 2 * np.pi * f0 - rng.uniform(5.0, 50.0)) * t
            )
        sig += 0.01 * (rng.normal(size=n) + 1j * rng.normal(size=n))

        window = str(rng.choice(["exp", "lg"]))
        lb = float(rng.uniform(0.0, 25.0))
        gb = float(rng.uniform(0.5, 20.0)) if window == "lg" else 0.0

        out = _call(
            dsp, "toSpectrum",
            list(map(float, sig.real)), list(map(float, sig.imag)),
            list(map(float, t)), window, lb, gb,
        )
        js_spec = np.asarray(out["re"]) + 1j * np.asarray(out["im"])

        fid = XmrArray(sig, dims=("time",), coords={"time": t})
        apod = (
            fid.xmr.apodize_exp(lb=lb)
            if window == "exp"
            else fid.xmr.apodize_lg(lb=lb, gb=gb)
        )
        py_spec = apod.xmr.to_spectrum().values
        scale = float(np.max(np.abs(py_spec)))
        np.testing.assert_allclose(js_spec, py_spec, atol=1e-9 * scale)


class TestPhaseMathFuzz:
    @pytest.mark.parametrize("trial", range(8))
    def test_phased_random_grids_and_params(self, phasemath, trial):
        """JS rotation == ops.phase at random (possibly non-uniform-origin)
        frequency grids, pivots inside and outside the axis range."""
        rng = _rng(trial, salt=2)
        n = int(rng.integers(16, 300))
        x0 = float(rng.uniform(-2000.0, 0.0))
        x1 = x0 + float(rng.uniform(100.0, 4000.0))
        x = np.linspace(x0, x1, n)
        spec = rng.normal(size=n) + 1j * rng.normal(size=n)
        p0 = float(rng.uniform(-360.0, 360.0))
        p1 = float(rng.uniform(-4000.0, 4000.0))
        pivot = float(rng.uniform(x0 - 500.0, x1 + 500.0))

        out = _call(
            phasemath, "phased",
            list(map(float, x)),
            list(map(float, spec.real)), list(map(float, spec.imag)),
            p0, p1, pivot, float(x.min()), float(x.max()),
        )
        js = np.asarray(out["re"]) + 1j * np.asarray(out["im"])

        da = XmrArray(spec, dims=("frequency",), coords={"frequency": x})
        py = da.xmr.phase(p0=p0, p1=p1, pivot=pivot).values
        np.testing.assert_allclose(js, py, atol=1e-11)
