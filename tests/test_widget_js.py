"""Numeric JS<->Python parity for the browser engines.

No JS runtime exists in this image (no node/quickjs/dukpy), so the widget
math executes through the JS-subset interpreter in ``tests/_jsmini.py``:
the ``DSP`` object of ``apodizer.js`` (radix-2 ortho FFT, fftshift,
apodization windows) and the ``PHASEMATH`` object of ``phase.js`` run on
fixed vectors and compare numerically against :mod:`xmris_tpu.ops` — a
transposed sign in the JS would now fail the suite, unlike the round-1
string greps.  Structural checks (balanced brackets, export contract)
remain for the DOM-bound remainder.
"""

import pathlib

import numpy as np
import pytest

from tests._jsmini import Interpreter, load_widget_module

WIDGET_DIR = pathlib.Path(__file__).resolve().parent.parent / (
    "xmris_tpu/visualization/widget"
)
JS_FILES = sorted(WIDGET_DIR.glob("*/*.js"))


def scan_js(src: str):
    """Tokenize just enough JS to track bracket nesting outside strings,
    comments, template literals, and regex-free code."""
    stack = []
    pairs = {")": "(", "]": "[", "}": "{"}
    i, n = 0, len(src)
    mode = None  # None | "'" | '"' | '`' | '//' | '/*'
    while i < n:
        c = src[i]
        nxt = src[i + 1] if i + 1 < n else ""
        if mode is None:
            if c in "'\"`":
                mode = c
            elif c == "/" and nxt == "/":
                mode = "//"
                i += 1
            elif c == "/" and nxt == "*":
                mode = "/*"
                i += 1
            elif c in "([{":
                stack.append((c, i))
            elif c in ")]}":
                if not stack or stack[-1][0] != pairs[c]:
                    return f"unbalanced {c!r} at offset {i}"
                stack.pop()
        elif mode in ("'", '"', "`"):
            if c == "\\":
                i += 1
            elif c == mode:
                mode = None
            elif c == "\n" and mode in ("'", '"'):
                return f"unterminated string at offset {i}"
            elif mode == "`" and c == "$" and nxt == "{":
                depth = 1
                i += 2
                while i < n and depth:
                    if src[i] == "{":
                        depth += 1
                    elif src[i] == "}":
                        depth -= 1
                    i += 1
                i -= 1
        elif mode == "//":
            if c == "\n":
                mode = None
        elif mode == "/*":
            if c == "*" and nxt == "/":
                mode = None
                i += 1
        i += 1
    if stack:
        return f"unclosed {stack[-1][0]!r} opened at offset {stack[-1][1]}"
    if mode not in (None, "//"):
        return f"unterminated {mode!r}"
    return None


class TestJSStructure:
    def test_engines_present(self):
        names = {p.name for p in JS_FILES}
        assert {"phase.js", "scroller.js", "apodizer.js"} <= names

    @pytest.mark.parametrize("path", JS_FILES, ids=[p.name for p in JS_FILES])
    def test_balanced_and_terminated(self, path):
        problem = scan_js(path.read_text())
        assert problem is None, f"{path.name}: {problem}"

    @pytest.mark.parametrize("path", JS_FILES, ids=[p.name for p in JS_FILES])
    def test_exports_render(self, path):
        src = path.read_text()
        assert "export function render" in src

    @pytest.mark.parametrize("path", JS_FILES, ids=[p.name for p in JS_FILES])
    def test_close_button_convention(self, path):
        # the static exporter hides elements with this class
        assert "remove-me-close-btn" in path.read_text()


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


class TestApodizerDSPNumeric:
    """Execute the JS DSP engine and compare against numpy / ops.fid."""

    @pytest.mark.parametrize("n", [8, 64, 256])
    def test_fft_ortho_matches_numpy(self, dsp, n):
        rng = np.random.default_rng(n)
        re = rng.normal(size=n)
        im = rng.normal(size=n)
        jre, jim = list(map(float, re)), list(map(float, im))
        _call(dsp, "fftOrtho", jre, jim)  # in-place
        expected = np.fft.fft(re + 1j * im, norm="ortho")
        np.testing.assert_allclose(jre, expected.real, atol=1e-12)
        np.testing.assert_allclose(jim, expected.imag, atol=1e-12)

    def test_fft_rejects_non_pow2(self, dsp):
        from tests._jsmini import JSError

        with pytest.raises(JSError):
            _call(dsp, "fftOrtho", [0.0] * 12, [0.0] * 12)

    @pytest.mark.parametrize("n", [8, 63])
    def test_fftshift_matches_numpy(self, dsp, n):
        arr = list(map(float, range(n)))
        out = _call(dsp, "fftshift", arr)
        np.testing.assert_array_equal(out, np.roll(np.arange(n), n // 2))

    def test_exp_window_matches_ops(self, dsp):
        from xmris_tpu import XmrArray

        t = np.arange(128) / 4000.0
        w_js = _call(dsp, "weight", list(map(float, t)), "exp", 7.5, 0.0)
        fid = XmrArray(np.ones(128, complex), dims=("time",),
                       coords={"time": t})
        w_py = fid.xmr.apodize_exp(lb=7.5).values.real
        np.testing.assert_allclose(w_js, w_py, atol=1e-12)

    def test_lg_window_matches_ops(self, dsp):
        from xmris_tpu import XmrArray

        t = np.arange(128) / 4000.0
        w_js = _call(dsp, "weight", list(map(float, t)), "lg", 6.0, 9.0)
        fid = XmrArray(np.ones(128, complex), dims=("time",),
                       coords={"time": t})
        w_py = fid.xmr.apodize_lg(lb=6.0, gb=9.0).values.real
        np.testing.assert_allclose(w_js, w_py, atol=1e-12)

    def test_to_spectrum_matches_pipeline(self, dsp):
        """The full browser preview chain == the Python processing chain."""
        from xmris_tpu import XmrArray

        n, sw, lb = 256, 4000.0, 5.0
        t = np.arange(n) / sw
        sig = np.exp((1j * 2 * np.pi * 300.0 - 30.0) * t)

        out = _call(
            dsp, "toSpectrum",
            list(map(float, sig.real)), list(map(float, sig.imag)),
            list(map(float, t)), "exp", lb, 0.0,
        )
        js_spec = np.asarray(out["re"]) + 1j * np.asarray(out["im"])

        fid = XmrArray(sig, dims=("time",), coords={"time": t})
        py_spec = fid.xmr.apodize_exp(lb=lb).xmr.to_spectrum().values
        np.testing.assert_allclose(js_spec, py_spec, atol=1e-9)


class TestPhaseMathNumeric:
    """Execute the JS phase engine and compare against ops.phasing.phase."""

    def test_phased_matches_ops(self, phasemath):
        from xmris_tpu import XmrArray

        n = 128
        x = np.linspace(-500.0, 500.0, n)
        rng = np.random.default_rng(0)
        spec = rng.normal(size=n) + 1j * rng.normal(size=n)
        p0, p1, pivot = 37.0, -210.0, 120.0

        out = _call(
            phasemath, "phased",
            list(map(float, x)),
            list(map(float, spec.real)), list(map(float, spec.imag)),
            p0, p1, pivot, float(x.min()), float(x.max()),
        )
        js = np.asarray(out["re"]) + 1j * np.asarray(out["im"])

        da = XmrArray(spec, dims=("frequency",), coords={"frequency": x})
        py = da.xmr.phase(p0=p0, p1=p1, pivot=pivot).values
        np.testing.assert_allclose(js, py, atol=1e-12)

    def test_phi_formula(self, phasemath):
        # phi(x) = deg2rad(p0) + deg2rad(p1) * (x - pivot) / range
        phi = _call(phasemath, "phiAt", 10.0, 90.0, 180.0, -20.0, 100.0)
        expected = np.deg2rad(90.0) + np.deg2rad(180.0) * (10.0 + 20.0) / 100.0
        assert phi == pytest.approx(expected, abs=1e-15)


class TestInterpreterSelfChecks:
    """Spot-checks of the JS-subset semantics the engines rely on."""

    def test_destructuring_swap(self):
        interp = Interpreter()
        env = interp.run(
            "const a = [1, 2, 3];\n"
            "[a[0], a[2]] = [a[2], a[0]];\n"
        )
        assert env.get("a") == [3.0, 2.0, 1.0]

    def test_bit_ops_int32(self):
        interp = Interpreter()
        env = interp.run(
            "let j = 0; let bit = 8;\n"
            "for (; j & bit; bit >>= 1) j ^= bit;\n"
            "j ^= bit;\n"
            "const npow = (12 & (12 - 1)) !== 0;\n"
        )
        assert env.get("j") == 8.0
        assert env.get("npow") is True

    def test_map_with_index_and_this(self):
        interp = Interpreter()
        env = interp.run(
            "const obj = {\n"
            "  scale(v) { return v * 2; },\n"
            "  run(xs) { return xs.map((v, i) => this.scale(v) + i); },\n"
            "};\n"
            "const out = obj.run([1, 2, 3]);\n"
        )
        assert env.get("out") == [2.0, 5.0, 8.0]

    def test_spread_minmax(self):
        interp = Interpreter()
        env = interp.run("const m = Math.max(...[3, 9, 4].map(Math.abs));")
        assert env.get("m") == 9.0
