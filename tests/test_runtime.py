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

    def test_notebook_generation_gated(self, capsys):
        from xmris_tpu._scripts import generate_test_notebooks

        generate_test_notebooks()  # jupytext absent: prints a notice, no crash
        out = capsys.readouterr().out
        assert "jupytext" in out or "notebooks written" in out
