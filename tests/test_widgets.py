"""Widget layer tests: factories, trait payloads, static exporter."""

import numpy as np
import pytest

from xmris_tpu import DIMS, XmrArray
from xmris_tpu.visualization.widget import (
    apodize_interactive,
    export_widget_static,
    phase_spectrum,
    scroll_spectra,
    widget_to_iframe_html,
)


@pytest.fixture
def spectrum_1d():
    n = 128
    ppm = np.linspace(10, -10, n)
    data = np.exp(-((ppm - 2.0) ** 2)) + 1j * np.exp(-((ppm - 2.0) ** 2)) * 0.1
    return XmrArray(
        data,
        dims=(DIMS.chemical_shift,),
        coords={DIMS.chemical_shift: ppm},
    )


@pytest.fixture
def fid_1d():
    n = 100  # deliberately not a power of two
    t = np.arange(n) / 4000.0
    data = np.exp((1j * 2 * np.pi * 300.0 - 30.0) * t)
    return XmrArray(
        data,
        dims=(DIMS.time,),
        coords={DIMS.time: t},
        attrs={"reference_frequency": 100.0, "carrier_ppm": 4.7},
    )


class TestPhaseWidget:
    def test_factory_traits(self, spectrum_1d):
        w = phase_spectrum(spectrum_1d)
        assert len(w.reals) == 128
        assert len(w.imags) == 128
        assert w.x_label == "Chemical Shift [ppm]"
        # pivot at max-magnitude coordinate
        mags = np.abs(spectrum_1d.values)
        expected = spectrum_1d.coords[DIMS.chemical_shift].values[np.argmax(mags)]
        assert w.pivot_val == pytest.approx(expected)

    def test_requires_1d(self, spectrum_1d):
        da2 = XmrArray(np.zeros((2, 4), complex), dims=("a", "b"))
        with pytest.raises(ValueError, match="1-D"):
            phase_spectrum(da2)

    def test_requires_complex(self):
        da = XmrArray(np.ones(8), dims=(DIMS.frequency,), coords={DIMS.frequency: np.arange(8.0)})
        with pytest.raises(ValueError, match="complex"):
            phase_spectrum(da)

    def test_accessor_route(self, spectrum_1d):
        w = spectrum_1d.xmr.widget.phase_spectrum(width=500)
        assert w.width == 500


class TestScrollWidget:
    def test_factory(self):
        data = np.random.default_rng(0).normal(size=(6, 64)) + 0j
        da = XmrArray(
            data,
            dims=("repetitions", DIMS.frequency),
            coords={DIMS.frequency: np.linspace(-100, 100, 64)},
        )
        w = scroll_spectra(da)
        assert w.scroll_dim == "repetitions"
        assert len(w.spectra) == 6
        assert len(w.spectra[0]) == 64

    def test_part_selection(self):
        data = (1.0 + 2.0j) * np.ones((2, 8))
        da = XmrArray(data, dims=("repetitions", DIMS.frequency),
                      coords={DIMS.frequency: np.arange(8.0)})
        assert scroll_spectra(da, part="imag").spectra[0][0] == 2.0
        assert scroll_spectra(da, part="abs").spectra[0][0] == pytest.approx(np.sqrt(5))
        with pytest.raises(ValueError, match="part"):
            scroll_spectra(da, part="bogus")

    def test_requires_2d(self, spectrum_1d):
        with pytest.raises(ValueError, match="2-D"):
            scroll_spectra(spectrum_1d)

    def test_transposed_layout(self):
        # spectral dim first: factory must transpose to (scroll, spectral)
        data = np.arange(24.0).reshape(8, 3) + 0j
        da = XmrArray(data, dims=(DIMS.frequency, "repetitions"),
                      coords={DIMS.frequency: np.arange(8.0)})
        w = scroll_spectra(da)
        assert len(w.spectra) == 3
        assert len(w.spectra[0]) == 8

    def test_rejects_spectral_scroll_axis(self):
        """scroll_axis naming the spectral dim would render a silently
        transposed widget (frames labeled with spectral coords) — raise."""
        data = np.zeros((2, 8)) + 0j
        da = XmrArray(data, dims=("repetitions", DIMS.frequency),
                      coords={DIMS.frequency: np.arange(8.0)})
        with pytest.raises(ValueError, match="spectral dimension"):
            scroll_spectra(da, scroll_axis=DIMS.frequency)


class TestApodizerWidget:
    def test_factory_pads_to_pow2(self, fid_1d):
        w = apodize_interactive(fid_1d)
        assert len(w.reals_t) == 128  # 100 -> next pow2
        assert len(w.x_coords) == 128
        assert w.x_label == "Chemical Shift [ppm]"

    def test_hz_axis(self, fid_1d):
        w = apodize_interactive(fid_1d, unit="hz")
        assert w.x_label == "Frequency [Hz]"
        assert max(w.x_coords) <= 2000.0

    def test_requires_1d(self):
        with pytest.raises(ValueError, match="1-D"):
            apodize_interactive(XmrArray(np.zeros((2, 4), complex), dims=("a", "b")))


class TestStaticExporter:
    def test_iframe_html(self, spectrum_1d):
        w = phase_spectrum(spectrum_1d)
        html = widget_to_iframe_html(w)
        assert html.startswith("<iframe")
        assert "data:text/html;base64," in html

    def test_export_widget_static(self, spectrum_1d):
        out = export_widget_static(phase_spectrum, spectrum_1d, width=400)
        assert "<iframe" in out.data

    def test_payload_contains_js_engine(self, spectrum_1d):
        import base64
        import re

        w = phase_spectrum(spectrum_1d)
        html = widget_to_iframe_html(w)
        uri = re.search(r'src="data:text/html;base64,([^"]+)"', html).group(1)
        doc = base64.b64decode(uri).decode()
        assert "StandaloneModel" in doc
        assert "function render" in doc
        assert "remove-me-close-btn { display: none" in doc

    def test_max_points_cap(self):
        big = XmrArray(
            np.ones(200_001, complex),
            dims=(DIMS.frequency,),
            coords={DIMS.frequency: np.arange(200_001.0)},
        )
        w = phase_spectrum(big)
        with pytest.raises(ValueError, match="static limit"):
            widget_to_iframe_html(w)

    def test_float_rounding(self, spectrum_1d):
        from xmris_tpu.visualization.widget._static_exporter import (
            extract_synced_traits,
        )

        w = phase_spectrum(spectrum_1d)
        payload = extract_synced_traits(w)
        # floats rounded to 4 decimals
        assert all(round(v, 4) == v for v in payload["reals"][:10])
        assert payload["width"] == 740

    def test_kernel_less_repr(self, spectrum_1d):
        # Without anywidget the widget still renders itself as an iframe
        w = phase_spectrum(spectrum_1d)
        if hasattr(w, "_repr_html_"):
            assert "<iframe" in w._repr_html_()
