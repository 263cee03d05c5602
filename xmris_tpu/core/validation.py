"""Validation decorators: runtime attr checks + import-time docstring injection.

Reference parity: ``src/xmris/core/validation.py:10-60``.  The "bouncer"
pattern: methods that need physical metadata (e.g. ``reference_frequency`` for
ppm conversion) declare it declaratively; missing attrs raise an actionable
``ValueError`` containing a copy-pasteable fix, and the requirement list is
appended to the method docstring at import time.
"""

from __future__ import annotations

import functools
from collections.abc import Callable
from typing import Any

from xmris_tpu.core.config import ATTRS


def _append_to_docstring(
    doc: str | None, title: str, keys: tuple[str, ...], vocab: Any
) -> str:
    """Append a NumPy-style section listing required keys to a docstring."""
    base_doc = doc or ""
    if base_doc and not base_doc.endswith("\n\n"):
        base_doc += "\n\n" if base_doc.endswith("\n") else "\n\n"

    lines = [f"    {title}", f"    {'-' * len(title)}"]
    for k in keys:
        lines.append(f"    * ``{k}``: {vocab.get_description(k)}")
    return base_doc + "\n".join(lines) + "\n"


def requires_attrs(*keys: str) -> Callable:
    """Enforce that specific keys exist in ``self._obj.attrs`` at call time.

    Raises a ``ValueError`` with explicit fix instructions when attributes are
    missing, and injects a "Required Attributes" docstring section at import
    time so documentation stays in sync with runtime behavior.
    """

    def decorator(func: Callable) -> Callable:
        func.__doc__ = _append_to_docstring(
            doc=func.__doc__, title="Required Attributes", keys=keys, vocab=ATTRS
        )

        @functools.wraps(func)
        def wrapper(self, *args, **kwargs):
            missing = [k for k in keys if k not in self._obj.attrs]
            if missing:
                raise ValueError(
                    f"Method '{func.__name__}' requires the following missing attributes "
                    f"in `obj.attrs`: {missing}.\n\n"
                    f"To fix this, assign them using standard methods:\n"
                    f"    >>> obj = obj.assign_attrs({{{missing[0]!r}: value}})"
                )
            return func(self, *args, **kwargs)

        return wrapper

    return decorator
