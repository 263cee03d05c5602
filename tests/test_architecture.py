"""Architecture tests: the vocabulary/validation/accessor contracts.

Mirrors the reference's architecture suite (``tests/test_core.py`` sections:
config singletons, naming conventions, metadata completeness, requires_attrs
runtime + docstring injection, check_dims, accessor wiring + sub-accessor
caching, signature defaults pinned to config constants, attrs preservation
through every op and a multi-step chain, to_ppm end-to-end incl. N-D).
Deliberately no numeric-math assertions here — those live in the parity
suites.
"""

import inspect

import numpy as np
import pytest

import xmris_tpu as xmt
from xmris_tpu import ATTRS, COORDS, DIMS, VARS, XmrArray
from xmris_tpu.core.accessor import (
    XmrisAccessor,
    XmrisPlotAccessor,
    XmrisWidgetAccessor,
)
from xmris_tpu.core.config import BaseVocabulary, XmrTerm
from xmris_tpu.core.validation import requires_attrs

ALL_VOCABS = {"ATTRS": ATTRS, "DIMS": DIMS, "COORDS": COORDS, "VARS": VARS}


def _all_terms():
    for vocab_name, vocab in ALL_VOCABS.items():
        for prop, term in vocab._get_terms().items():
            yield pytest.param(vocab_name, prop, term, id=f"{vocab_name}.{prop}")


class TestConfigSingletons:
    def test_singletons_exist(self):
        assert isinstance(ATTRS, BaseVocabulary)
        assert isinstance(DIMS, BaseVocabulary)
        assert isinstance(COORDS, BaseVocabulary)
        assert isinstance(VARS, BaseVocabulary)

    def test_terms_are_strings(self):
        assert DIMS.time == "time"
        assert isinstance(DIMS.time, str)
        assert isinstance(DIMS.time, XmrTerm)

    def test_key_reference_parity(self):
        """The exact string keys reference data relies on."""
        assert ATTRS.reference_frequency == "reference_frequency"
        assert ATTRS.carrier_ppm == "carrier_ppm"
        assert ATTRS.phase_p0 == "phase_p0"
        assert DIMS.chemical_shift == "chemical_shift"
        assert DIMS.component == "component"
        assert VARS.original_data == "data"
        assert VARS.crlb == "crlb"

    @pytest.mark.parametrize("vocab_name,prop,term", list(_all_terms()))
    def test_lowercase_naming_convention(self, vocab_name, prop, term):
        assert str(term) == str(term).lower(), f"{vocab_name}.{prop} not lowercase"
        assert " " not in str(term)

    @pytest.mark.parametrize("vocab_name,prop,term", list(_all_terms()))
    def test_descriptions_present(self, vocab_name, prop, term):
        assert term.description, f"{vocab_name}.{prop} missing description"

    def test_long_name(self):
        assert DIMS.chemical_shift.long_name == "Chemical Shift"

    def test_get_description_lookup(self):
        assert "Larmor" in ATTRS.get_description("reference_frequency")
        assert ATTRS.get_description("nope") == "Unknown metadata key."

    @pytest.mark.parametrize("vocab", list(ALL_VOCABS.values()), ids=list(ALL_VOCABS))
    def test_html_repr(self, vocab):
        html = vocab._repr_html_()
        assert "<table" in html
        for term in vocab._get_terms().values():
            assert str(term) in html


class TestRequiresAttrs:
    class MockAccessor:
        def __init__(self, obj):
            self._obj = obj

        @requires_attrs(ATTRS.b0_field)
        def needs_b0(self):
            return "ok"

        @requires_attrs(ATTRS.reference_frequency, ATTRS.carrier_ppm)
        def needs_two(self):
            """Existing docstring."""
            return "ok"

    def test_passes_when_present(self):
        da = XmrArray(np.zeros(4), dims=("t",), attrs={ATTRS.b0_field: 3.0})
        assert self.MockAccessor(da).needs_b0() == "ok"

    def test_raises_with_fix_instructions(self):
        da = XmrArray(np.zeros(4), dims=("t",))
        with pytest.raises(ValueError) as e:
            self.MockAccessor(da).needs_b0()
        msg = str(e.value)
        assert "b0_field" in msg
        assert "assign_attrs" in msg

    def test_lists_all_missing(self):
        da = XmrArray(np.zeros(4), dims=("t",))
        with pytest.raises(ValueError, match="reference_frequency.*carrier_ppm"):
            self.MockAccessor(da).needs_two()

    def test_docstring_injection(self):
        doc = self.MockAccessor.needs_two.__doc__
        assert "Existing docstring." in doc
        assert "Required Attributes" in doc
        assert "reference_frequency" in doc
        assert "carrier_ppm" in doc

    def test_docstring_injection_no_existing_doc(self):
        doc = self.MockAccessor.needs_b0.__doc__
        assert "Required Attributes" in doc


class TestCheckDims:
    def test_error_lists_available_and_fix(self, empty_da):
        from xmris_tpu.core.utils import check_dims

        with pytest.raises(ValueError) as e:
            check_dims(empty_da, "time", "myop")
        msg = str(e.value)
        assert "myop" in msg
        assert "dim_0" in msg
        assert "rename" in msg

    def test_accepts_list(self, multi_dim_da):
        from xmris_tpu.core.utils import check_dims

        check_dims(multi_dim_da, [DIMS.x, DIMS.time], "ok")  # no raise


class TestAccessorWiring:
    def test_xmr_namespace_available(self, valid_fid_da):
        assert isinstance(valid_fid_da.xmr, XmrisAccessor)

    def test_sub_accessors_lazy_and_cached(self, valid_fid_da):
        acc = valid_fid_da.xmr
        assert acc._plot is None and acc._widget is None
        p = acc.plot
        assert isinstance(p, XmrisPlotAccessor)
        assert acc.plot is p  # cached
        w = acc.widget
        assert isinstance(w, XmrisWidgetAccessor)
        assert acc.widget is w

    def test_dataset_accessor(self):
        from xmris_tpu import XmrDataset
        from xmris_tpu.core.accessor import XmrisDatasetAccessor

        ds = XmrDataset()
        assert isinstance(ds.xmr, XmrisDatasetAccessor)
        assert ds.xmr.plot is not None

    def test_public_api_surface(self):
        """Every name the reference exports must exist here."""
        for name in (
            "ATTRS", "COORDS", "DIMS", "VARS", "DEFAULTS",
            "XmrisAccessor", "XmrisDatasetAccessor",
            "to_complex", "to_real_imag", "apodize_exp", "apodize_lg",
            "to_fid", "to_spectrum", "zero_fill",
            "fft", "fftc", "fftshift", "ifft", "ifftc", "ifftshift",
            "autophase", "phase", "baseline_als",
            "fit_amares", "simulate_fid", "remove_digital_filter",
            "WaterfallConfig", "CarpetConfig", "PlotTrajectoryConfig",
            "PlotQCGridConfig",
        ):
            assert hasattr(xmt, name), f"missing public symbol {name}"

    def test_deprecated_defaults_warns(self):
        import warnings

        with warnings.catch_warnings(record=True) as rec:
            warnings.simplefilter("always")
            _ = xmt.DEFAULTS
        assert any(issubclass(w.category, DeprecationWarning) for w in rec)


class TestSignatureDefaults:
    """Accessor methods must default their `dim` to the config constants."""

    @pytest.mark.parametrize(
        "method,expected",
        [
            ("to_spectrum", DIMS.time),
            ("to_fid", DIMS.frequency),
            ("apodize_exp", DIMS.time),
            ("apodize_lg", DIMS.time),
            ("zero_fill", DIMS.time),
            ("fft", DIMS.time),
            ("ifft", DIMS.frequency),
            ("fftc", DIMS.time),
            ("ifftc", DIMS.frequency),
            ("phase", DIMS.frequency),
            ("autophase", DIMS.frequency),
            ("baseline_als", DIMS.frequency),
            ("to_ppm", DIMS.frequency),
            ("to_hz", DIMS.chemical_shift),
        ],
    )
    def test_dim_default(self, method, expected):
        sig = inspect.signature(getattr(XmrisAccessor, method))
        assert sig.parameters["dim"].default == expected

    def test_component_defaults(self):
        sig = inspect.signature(XmrisAccessor.to_real_imag)
        assert sig.parameters["dim"].default == DIMS.component
        assert sig.parameters["coords"].default == ("real", "imag")


class TestAttrsPreservation:
    """Every op must carry attrs through (the lineage contract)."""

    OPS = [
        ("to_spectrum", {}),
        ("apodize_exp", {"lb": 2.0}),
        ("apodize_lg", {"lb": 1.0, "gb": 2.0}),
        ("zero_fill", {"target_points": 4096}),
        ("fft", {}),
        ("fftshift", {"dim": "time"}),
        ("ifftshift", {"dim": "time"}),
        ("fftc", {}),
        ("to_real_imag", {}),
    ]

    @pytest.mark.parametrize("method,kwargs", OPS, ids=[o[0] for o in OPS])
    def test_op_preserves_attrs(self, valid_fid_da, method, kwargs):
        out = getattr(valid_fid_da.xmr, method)(**kwargs)
        for k, v in valid_fid_da.attrs.items():
            assert out.attrs[k] == v, f"{method} dropped attr {k}"

    def test_five_step_chain(self, valid_fid_da):
        out = (
            valid_fid_da.xmr.zero_fill(target_points=4096)
            .xmr.apodize_exp(lb=3.0)
            .xmr.to_spectrum()
            .xmr.phase(p0=10.0)
            .xmr.to_ppm()
        )
        assert out.attrs[ATTRS.reference_frequency] == pytest.approx(127.6261421)
        assert out.attrs[ATTRS.zero_fill_target] == 4096
        assert out.attrs[ATTRS.apodization_lb] == 3.0
        assert out.attrs[ATTRS.phase_p0] == 10.0
        assert out.dims == (DIMS.chemical_shift,)


class TestToPpmEndToEnd:
    def test_1d(self, valid_spectrum_da):
        out = valid_spectrum_da.xmr.to_ppm()
        ppm = out.coords[DIMS.chemical_shift].values
        hz = valid_spectrum_da.coords[DIMS.frequency].values
        np.testing.assert_allclose(ppm, 4.7 + hz / 127.6261421)
        assert out.coords[DIMS.chemical_shift].attrs["units"] == "ppm"

    def test_nd(self, multi_dim_da):
        out = multi_dim_da.xmr.to_spectrum().xmr.to_ppm()
        assert out.dims == (DIMS.x, DIMS.y, DIMS.chemical_shift)
        assert out.sizes[DIMS.chemical_shift] == 256


class TestProcessingNamespaceAlias:
    """Imports that translate 1:1 from the reference's module layout."""

    def test_module_aliases(self):
        from xmris_tpu.processing import fid, fourier, phasing, utils

        assert fid.to_spectrum is xmt.to_spectrum
        assert fourier.fftc is xmt.fftc
        assert phasing.autophase is xmt.autophase
        assert utils.to_complex is xmt.to_complex

    def test_function_reexports(self):
        from xmris_tpu.processing import baseline_als, to_spectrum, zero_fill

        assert to_spectrum is xmt.to_spectrum
        assert zero_fill is xmt.zero_fill
        assert baseline_als is xmt.baseline_als
