"""Runtime layer tests: profiling, logging, dtype config, scripts."""

import logging

import jax.numpy as jnp
import numpy as np
import pytest

from xmris_tpu.runtime import Timings, stage_timer
from xmris_tpu.runtime.config import matching_dtypes
from xmris_tpu.runtime.logging import get_logger, set_log_level


class TestTimings:
    def test_stage_timer_records(self):
        t = Timings()
        with stage_timer(t, "fft"):
            _ = jnp.fft.fft(jnp.ones(128, jnp.complex128))
        with stage_timer(t, "fft"):
            pass
        assert t.stages["fft"] > 0
        assert "fft" in t.report()
        assert "TOTAL" in t.report()

    def test_stage_timer_syncs_device_arrays(self):
        t = Timings()
        x = jnp.ones(64)
        with stage_timer(t, "mul", x * 2):
            y = x * 2
        assert t.total() >= t.stages["mul"] > 0
        del y


class TestDtypeConfig:
    @pytest.mark.parametrize(
        "dtype,expected",
        [
            (np.complex64, (np.float32, np.complex64)),
            (np.complex128, (np.float64, np.complex128)),
            (np.float32, (np.float32, np.complex64)),
            (np.float64, (np.float64, np.complex128)),
        ],
    )
    def test_matching_dtypes(self, dtype, expected):
        real, cplx = matching_dtypes(dtype)
        assert real == np.dtype(expected[0])
        assert cplx == np.dtype(expected[1])


class TestLogging:
    def test_namespace_logger(self):
        log = get_logger("xmris_tpu.test")
        assert log.name == "xmris_tpu.test"

    def test_set_log_level(self, caplog):
        set_log_level("info", verbose=False)
        assert get_logger().level == logging.INFO
        set_log_level("error", verbose=False)
        assert get_logger().level == logging.ERROR


class TestScripts:
    def test_api_docs_generation(self, tmp_path):
        from xmris_tpu._scripts import build_api_docs

        out = build_api_docs(tmp_path / "api")
        index = (out / "index.md").read_text()
        assert "xmris_tpu.ops.fourier" in index
        fourier = (out / "xmris_tpu_ops_fourier.md").read_text()
        assert "fftshift" in fourier
        assert "Reference parity" in fourier

    def test_notebook_generation(self, tmp_path):
        """Docs -> .ipynb conversion with no external tooling; the
        generated notebooks are valid nbformat-4 JSON whose code cells
        reproduce the executable blocks of the source pages."""
        import json

        from xmris_tpu._scripts import generate_test_notebooks

        out = generate_test_notebooks(tmp_path / "nb")
        notebooks = sorted(out.glob("**/*.ipynb"))
        assert len(notebooks) > 25  # full docs catalog converted

        qs = next(p for p in notebooks if p.name == "quickstart.ipynb")
        nb = json.loads(qs.read_text())
        assert nb["nbformat"] == 4
        code_cells = [c for c in nb["cells"] if c["cell_type"] == "code"]
        assert code_cells
        src = "".join("".join(c["source"]) for c in code_cells)
        assert "import xmris_tpu" in src

        # a code cell from a notebooks/ page executes standalone
        pm = next(p for p in notebooks if p.name == "phase.ipynb")
        nb = json.loads(pm.read_text())
        first = "".join(
            next(c for c in nb["cells"] if c["cell_type"] == "code")["source"]
        )
        ns: dict = {}
        exec(compile(first, "phase.ipynb", "exec"), ns)  # noqa: S102
