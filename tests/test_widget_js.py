"""Static sanity checks for the browser JS engines.

There is no JS runtime in this image, so full behavior is untestable here —
but gross syntax breakage (unbalanced brackets, unterminated strings or
template literals, missing export) is catchable with a small tokenizer, and
the widget/exporter contracts (render signature, close-button convention)
are plain-text assertions.
"""

import pathlib

import pytest

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
                # template interpolation: scan nested expression
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


class TestJSEngines:
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

    def test_apodizer_dsp_formulas(self):
        src = (WIDGET_DIR / "apodizer" / "apodizer.js").read_text()
        # ortho normalization and both window formulas present
        assert "1 / Math.sqrt(n)" in src
        assert "Math.exp(-Math.PI * lb * v)" in src
        assert "Math.sqrt(Math.LN2)" in src

    def test_phase_math_matches_python(self):
        src = (WIDGET_DIR / "phase" / "phase.js").read_text()
        assert "p0r + p1r * ((X[i] - pivot) / xRange)" in src
