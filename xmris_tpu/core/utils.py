"""Small core helpers: dimension bouncer and metadata-rich coordinate builder.

Reference parity: ``src/xmris/core/utils.py:8-33``.
"""

from __future__ import annotations

import numpy as np

from xmris_tpu.core.array import Coord, XmrArray
from xmris_tpu.core.config import XmrTerm


def _check_dims(da: XmrArray, dims: str | list[str], method_name: str) -> None:
    """Validate that required dimensions exist, with an actionable error."""
    dims_to_check = [dims] if isinstance(dims, str) else list(dims)
    missing = [d for d in dims_to_check if d not in da.dims]

    if missing:
        raise ValueError(
            f"Method '{method_name}' attempted to operate on missing "
            f"dimension(s): {missing}.\n"
            f"Available dimensions are: {list(da.dims)}.\n\n"
            f"To fix this, either pass the correct `dim` string argument to the "
            f"function, or rename your data's axes:\n"
            f"    >>> obj = obj.rename({{{missing[0]!r}: 'correct_name'}})"
        )


# Public alias used by accessors and user code.
check_dims = _check_dims


def as_coord(term: XmrTerm, dim: str, data: np.ndarray) -> Coord:
    """Build a :class:`Coord` carrying unit/long_name metadata from a term.

    Equivalent of the reference's ``as_variable`` (``core/utils.py:24-33``)
    for the native carrier.
    """
    attrs = {"long_name": term.long_name}
    if term.unit:
        attrs["units"] = term.unit
    return Coord(dim, np.asarray(data), attrs)
