"""Automated API-surface parity audit against the mounted reference.

AST-parses the reference sources (never imports them — the reference needs
real xarray/pyAMARES, unavailable offline) and asserts, durably, what the
round-16 manual audit established:

1. every name in the reference's public ``__all__``
   (``src/xmris/__init__.py:55-99``) exists at our top level;
2. every public reference *function* re-exported there keeps all of its
   parameter names in our signature (we may add TPU-specific extras);
3. every public accessor method (``src/xmris/core/accessor.py``) exists on
   the same-named accessor/mixin class here, with all reference parameter
   names intact;
4. every accessor/mixin class name itself is preserved.

Skips gracefully when the reference checkout isn't mounted (same convention
as ``test_vendor.py``: override with ``XMRIS_TPU_REFSRC``).
"""

import ast
import inspect
import os
import pathlib

import pytest

import xmris_tpu as xmt
from xmris_tpu.core import accessor as our_accessor_mod

_REFSRC = pathlib.Path(
    os.environ.get("XMRIS_TPU_REFSRC", "/root/reference/src/xmris")
)

pytestmark = pytest.mark.skipif(
    not (_REFSRC / "__init__.py").exists(), reason="reference sources not mounted"
)

# Intentional divergences, each with the rationale the audit trail records.
# (No entries today: the surface is covered 1:1.  Add name -> reason here if
# a future reference release ships something deliberately renamed.)
NAME_EXCEPTIONS: dict[str, str] = {}
PARAM_EXCEPTIONS: dict[str, set[str]] = {
    # reference fit_amares exposes joblib pool sizing; the batched TPU engine
    # keeps the parameter for compatibility, so nothing is excepted.
}


def _ref_function_index():
    """name -> (relpath, [param names]) for all public top-level functions."""
    index = {}
    for path in sorted(_REFSRC.rglob("*.py")):
        tree = ast.parse(path.read_text())
        for node in tree.body:
            if isinstance(node, ast.FunctionDef) and not node.name.startswith("_"):
                a = node.args
                params = [
                    arg.arg
                    for arg in a.posonlyargs + a.args + a.kwonlyargs
                    if arg.arg != "self"
                ]
                index.setdefault(
                    node.name, (str(path.relative_to(_REFSRC)), params)
                )
    return index


def _ref_public_all():
    tree = ast.parse((_REFSRC / "__init__.py").read_text())
    for node in ast.walk(tree):
        if isinstance(node, ast.Assign):
            for target in node.targets:
                if getattr(target, "id", None) == "__all__":
                    return [ast.literal_eval(el) for el in node.value.elts]
    raise AssertionError("reference __init__.py has no literal __all__")


def _ref_accessor_classes():
    """class name -> {method name: [param names]} for public methods."""
    tree = ast.parse((_REFSRC / "core" / "accessor.py").read_text())
    classes = {}
    for node in tree.body:
        if isinstance(node, ast.ClassDef):
            methods = {}
            for item in node.body:
                if isinstance(item, ast.FunctionDef) and not item.name.startswith("_"):
                    a = item.args
                    methods[item.name] = [
                        arg.arg
                        for arg in a.posonlyargs + a.args + a.kwonlyargs
                        if arg.arg != "self"
                    ]
            classes[node.name] = methods
    return classes


class TestTopLevelSurface:
    def test_every_public_name_exists(self):
        missing = [
            name
            for name in _ref_public_all()
            if not hasattr(xmt, name) and name not in NAME_EXCEPTIONS
        ]
        assert missing == [], f"reference __all__ names absent here: {missing}"

    def test_public_function_params_covered(self):
        fn_index = _ref_function_index()
        problems = []
        for name in _ref_public_all():
            ours = getattr(xmt, name, None)
            if (
                ours is None
                or name not in fn_index
                or not callable(ours)
                or isinstance(ours, type)
            ):
                continue
            ref_file, ref_params = fn_index[name]
            try:
                our_params = set(inspect.signature(ours).parameters)
            except (TypeError, ValueError):
                continue
            allowed = PARAM_EXCEPTIONS.get(name, set())
            lost = [
                p for p in ref_params if p not in our_params and p not in allowed
            ]
            if lost:
                problems.append(f"{name} ({ref_file}): missing params {lost}")
        assert problems == [], "\n".join(problems)


class TestAccessorSurface:
    def test_accessor_classes_and_methods_covered(self):
        ref_classes = _ref_accessor_classes()
        problems = []
        for cls_name, methods in ref_classes.items():
            ours_cls = getattr(our_accessor_mod, cls_name, None)
            if ours_cls is None:
                problems.append(f"accessor class {cls_name} absent")
                continue
            for m_name, ref_params in methods.items():
                ours = getattr(ours_cls, m_name, None)
                if ours is None:
                    problems.append(f"{cls_name}.{m_name} absent")
                    continue
                if not callable(ours):
                    continue  # property-style members: existence is the contract
                try:
                    our_params = set(inspect.signature(ours).parameters)
                except (TypeError, ValueError):
                    continue
                allowed = PARAM_EXCEPTIONS.get(f"{cls_name}.{m_name}", set())
                lost = [
                    p
                    for p in ref_params
                    if p not in our_params and p not in allowed
                ]
                if lost:
                    problems.append(f"{cls_name}.{m_name}: missing params {lost}")
        assert problems == [], "\n".join(problems)

    def test_dataarray_accessor_methods_reachable_from_instance(self):
        """The flattened method set of the reference's DataArray accessor is
        reachable on an actual XmrArray.xmr instance (mixin wiring intact)."""
        import numpy as np

        from xmris_tpu import DIMS, XmrArray

        da = XmrArray(
            np.ones(8, complex),
            dims=(DIMS.time,),
            coords={DIMS.time: np.arange(8.0)},
        )
        ref_classes = _ref_accessor_classes()
        # classes composing the reference DataArray accessor (mixins + itself)
        composing = (
            "XmrisSpectrumCoordsMixin",
            "XmrisFourierMixin",
            "XmrisProcessingMixin",
            "XmrisPhasingMixin",
            "XmrisAccessor",
        )
        wanted = sorted(
            m for cls in composing for m in ref_classes.get(cls, {})
        )
        missing = [m for m in wanted if not hasattr(da.xmr, m)]
        assert missing == [], f"da.xmr lacks reference methods: {missing}"
