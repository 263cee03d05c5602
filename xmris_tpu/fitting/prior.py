"""AMARES prior-knowledge file parsing (pyAMARES CSV/XLSX layout).

Parses the table layout the reference ecosystem uses (see
``docs/notebooks/fitting/pyamares.md`` in the reference repo): a first
``Index`` column holding section markers and parameter names, one column per
metabolite:

    Index,PCr,ATP
    Initial Values,,
    amplitude,10.0,5.0
    chemicalshift,0.0,-7.5
    linewidth,15.0,20.0
    phase,0,0
    g,0,0
    Bounds,,
    amplitude,"(0, ","(0, "
    chemicalshift,"(-0.5, 0.5)","(-8.0, -7.0)"
    ...

Supported semantics:
* ``Initial Values`` numbers seed the fit.
* ``Bounds`` cells: ``(lo, hi)``; open-ended ``(lo,`` / ``(, hi)``; empty =
  unbounded; ``fixed`` (or lo == hi) pins the parameter.
* Parameter tying: an Initial Values cell of the form ``<factor>*<Metab>``
  (e.g. ``0.5*PCr``) ties this parameter to the named metabolite's same
  parameter with a linear factor (shared free variable).

The output is a :class:`PriorKnowledge` bundle: free-parameter vector with
bounds plus the affine :class:`~xmris_tpu.fitting.lm.ParamMap` expanding it to
the (n_peaks, 5) physical grid [amplitude, chemicalshift(ppm),
linewidth(Hz), phase(deg), g].
"""

from __future__ import annotations

import csv
import re
from dataclasses import dataclass, field
from pathlib import Path

import numpy as np

from xmris_tpu.fitting.lm import ParamMap, classify_bounds

PARAM_NAMES = ("amplitude", "chemicalshift", "linewidth", "phase", "g")

_DEFAULT_INIT = {"amplitude": 1.0, "chemicalshift": 0.0, "linewidth": 10.0, "phase": 0.0, "g": 0.0}

_TIE_RE = re.compile(r"^\s*([-+]?[0-9.eE]+)\s*\*\s*([A-Za-z_][\w]*)\s*$")


@dataclass
class PriorKnowledge:
    metabolites: list[str]
    init_free: np.ndarray  # (F,) external initial values
    lower: np.ndarray  # (F,)
    upper: np.ndarray  # (F,)
    kind: np.ndarray  # (F,) bound classification
    pmap: ParamMap
    source: str = ""
    free_labels: list[str] = field(default_factory=list)

    @property
    def n_peaks(self) -> int:
        return len(self.metabolites)

    @property
    def n_free(self) -> int:
        return len(self.init_free)


def _read_table(path: str | Path) -> list[list[str]]:
    path = Path(path)
    if path.suffix.lower() in (".xlsx", ".xls"):
        try:
            import pandas as pd

            df = pd.read_excel(path, header=None, dtype=str)
            return df.fillna("").values.tolist()
        except ImportError as e:  # pragma: no cover
            raise ImportError(
                "Reading XLSX prior-knowledge files requires pandas+openpyxl; "
                "convert the file to CSV instead."
            ) from e
    with open(path, newline="") as f:
        return [row for row in csv.reader(f)]


def _parse_bound_cell(cell: str) -> tuple[float, float] | str | None:
    cell = cell.strip()
    if not cell:
        return None
    if cell.lower() == "fixed":
        return "fixed"
    inner = cell.strip("()").strip()
    parts = [p.strip() for p in inner.split(",")]
    lo = float(parts[0]) if parts and parts[0] not in ("", "-inf") else -np.inf
    hi = (
        float(parts[1])
        if len(parts) > 1 and parts[1] not in ("", "inf")
        else np.inf
    )
    return (lo, hi)


def load_prior_knowledge(path: str | Path) -> PriorKnowledge:
    """Parse a prior-knowledge CSV/XLSX into a fit-ready bundle."""
    rows = _read_table(path)
    if not rows:
        raise ValueError(f"Prior knowledge file {path} is empty.")

    header = [str(c).strip() for c in rows[0]]
    metabolites = [m for m in header[1:] if m]
    n_peaks = len(metabolites)
    if n_peaks == 0:
        raise ValueError(
            f"Prior knowledge file {path} defines no metabolite columns "
            f"(header: {header})."
        )

    inits: dict[tuple[str, str], object] = {}
    bounds: dict[tuple[str, str], object] = {}
    # Rows before any explicit marker default to the Initial Values section.
    section = "initialvalues"
    for row in rows[1:]:
        if not row or not str(row[0]).strip():
            continue
        norm = str(row[0]).strip().lower().replace(" ", "")
        if norm in ("initialvalues", "bounds", "expressions", "lessconstraints"):
            section = norm
            continue
        if norm not in PARAM_NAMES:
            continue  # unknown parameter rows are ignored gracefully
        pname = norm
        for mi, metab in enumerate(metabolites):
            cell = str(row[1 + mi]).strip() if len(row) > 1 + mi else ""
            if section == "initialvalues":
                if cell:
                    inits[(metab, pname)] = cell
            elif section == "bounds":
                parsed = _parse_bound_cell(cell)
                if parsed is not None:
                    bounds[(metab, pname)] = parsed

    # ---- Build the free-parameter structure -------------------------------
    idx = np.full(n_peaks * 5, -1, dtype=np.int32)
    scale = np.zeros(n_peaks * 5, dtype=np.float64)
    offset = np.zeros(n_peaks * 5, dtype=np.float64)

    init_free: list[float] = []
    lo_free: list[float] = []
    hi_free: list[float] = []
    labels: list[str] = []
    slot_of: dict[tuple[str, str], int] = {}
    ties: list[tuple[int, float, str, str]] = []  # (flat_j, factor, metab, pname)

    def flat_index(mi: int, pname: str) -> int:
        return mi * 5 + PARAM_NAMES.index(pname)

    for mi, metab in enumerate(metabolites):
        for pname in PARAM_NAMES:
            j = flat_index(mi, pname)
            raw_init = inits.get((metab, pname), None)
            b = bounds.get((metab, pname), None)

            # Tied parameter?
            if isinstance(raw_init, str):
                m = _TIE_RE.match(raw_init)
                if m:
                    ties.append((j, float(m.group(1)), m.group(2), pname))
                    continue
                try:
                    init_val = float(raw_init)
                except ValueError:
                    raise ValueError(
                        f"Cannot parse initial value {raw_init!r} for "
                        f"{metab}.{pname} in {path}."
                    )
            elif raw_init is None:
                init_val = _DEFAULT_INIT[pname]
            else:
                init_val = float(raw_init)

            if b == "fixed" or (isinstance(b, tuple) and b[0] == b[1]):
                fixed_val = b[0] if isinstance(b, tuple) else init_val
                offset[j] = fixed_val
                continue

            lo, hi = b if isinstance(b, tuple) else (-np.inf, np.inf)
            init_val = float(np.clip(init_val, lo, hi))
            # Nudge initial values off exact bounds: the MINPACK bound
            # transform has zero slope at the edge, which freezes the
            # parameter and ill-conditions the first LM steps (lmfit has the
            # same pathology).
            if np.isfinite(lo) and np.isfinite(hi) and hi > lo:
                margin = 1e-3 * (hi - lo)
                init_val = float(np.clip(init_val, lo + margin, hi - margin))
            elif np.isfinite(lo) and init_val <= lo:
                init_val = lo + max(1e-3, abs(lo) * 1e-3)
            elif np.isfinite(hi) and init_val >= hi:
                init_val = hi - max(1e-3, abs(hi) * 1e-3)
            slot = len(init_free)
            slot_of[(metab, pname)] = slot
            idx[j] = slot
            scale[j] = 1.0
            init_free.append(init_val)
            lo_free.append(lo)
            hi_free.append(hi)
            labels.append(f"{metab}.{pname}")

    for j, factor, target_metab, pname in ties:
        key = (target_metab, pname)
        if key not in slot_of:
            raise ValueError(
                f"Tie target {target_metab}.{pname} is not a free parameter "
                f"(referenced from flat slot {j} in {path})."
            )
        idx[j] = slot_of[key]
        scale[j] = factor

    lower = np.asarray(lo_free, dtype=np.float64)
    upper = np.asarray(hi_free, dtype=np.float64)
    return PriorKnowledge(
        metabolites=metabolites,
        init_free=np.asarray(init_free, dtype=np.float64),
        lower=lower,
        upper=upper,
        kind=classify_bounds(lower, upper),
        pmap=ParamMap(idx=idx, scale=scale, offset=offset, n_peaks=n_peaks),
        source=str(path),
        free_labels=labels,
    )
