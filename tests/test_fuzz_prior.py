"""Randomized prior-knowledge parsing sweeps.

``test_fitting.py`` pins `load_prior_knowledge` on the benchmark 31P tables;
this module generates random prior tables — random metabolite sets, sparse
initial values, every documented bound form (closed, half-open, empty,
``fixed``, degenerate lo==hi), amplitude/linewidth ties — and asserts:

1. **Metamorphic robustness**: a "messified" but semantically identical
   table (cell whitespace, unknown parameter rows, blank lines, interleaved
   re-declared sections) parses to the exact same ``PriorKnowledge``.
2. **Behavioral semantics** via ``expand_params``: fixed cells pin exactly,
   ties scale the parent slot exactly, free parameters start strictly
   inside finite bounds and within the documented nudge margin of the
   requested value.

Layout contract: the pyAMARES CSV table (reference
``docs/notebooks/fitting/pyamares.md``; parser ``fitting/prior.py``).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from xmris_tpu.fitting.lm import expand_params
from xmris_tpu.fitting.prior import PARAM_NAMES, load_prior_knowledge

_DEFAULT_INIT = {
    "amplitude": 1.0,
    "chemicalshift": 0.0,
    "linewidth": 10.0,
    "phase": 0.0,
    "g": 0.0,
}


def _rng(trial, salt=0):
    return np.random.default_rng(50_000 + 181 * trial + salt)


def _random_spec(rng):
    """Random semantic prior spec: per (metab, pname) an init (or None, or a
    tie) and a bound (tuple / 'fixed' / None)."""
    k = int(rng.integers(1, 5))
    names = [f"Met{chr(65 + i)}" for i in range(k)]
    spec = {}
    for mi, m in enumerate(names):
        for p in PARAM_NAMES:
            init = None
            if rng.integers(0, 3):  # 2/3 of cells carry an explicit init
                lo_typ, hi_typ = {
                    "amplitude": (0.5, 30.0),
                    "chemicalshift": (-16.0, 8.0),
                    "linewidth": (5.0, 40.0),
                    "phase": (-90.0, 90.0),
                    "g": (0.0, 1.0),
                }[p]
                init = float(np.round(rng.uniform(lo_typ, hi_typ), 4))
            kind = rng.choice(["closed", "open_lo", "open_hi", "none", "fixed"])
            if kind == "closed":
                center = init if init is not None else _DEFAULT_INIT[p]
                w = float(np.round(rng.uniform(0.5, 5.0), 3))
                bound = (np.round(center - w, 4), np.round(center + w, 4))
            elif kind == "open_lo":
                bound = ("open_lo", float(np.round((init or 0.0) + rng.uniform(0.5, 3.0), 4)))
            elif kind == "open_hi":
                bound = ("open_hi", float(np.round((init or 0.0) - rng.uniform(0.5, 3.0), 4)))
            elif kind == "fixed":
                bound = "fixed"
            else:
                bound = None
            spec[(m, p)] = {"init": init, "bound": bound, "tie": None}
    # one random amplitude tie to the first metabolite (never self)
    if k >= 2 and rng.integers(0, 2):
        child = names[int(rng.integers(1, k))]
        factor = float(np.round(rng.uniform(0.25, 0.9), 3))
        # the parent amplitude must stay free
        spec[(names[0], "amplitude")]["bound"] = None
        spec[(child, "amplitude")] = {
            "init": None,
            "bound": None,
            "tie": (factor, names[0]),
        }
    return names, spec


def _bound_cell(bound):
    if bound is None:
        return ""
    if bound == "fixed":
        return "fixed"
    if bound[0] == "open_lo":
        return f"(, {bound[1]})"
    if bound[0] == "open_hi":
        return f"({bound[1]}, "
    return f"({bound[0]}, {bound[1]})"


def _write_csv(path, names, spec, messy=False, rng=None):
    def cell(txt):
        if not messy or rng is None or not txt:
            return txt
        return " " * int(rng.integers(0, 3)) + txt + " " * int(rng.integers(0, 3))

    lines = ["Index," + ",".join(names)]
    if messy:
        lines.append(",".join([""] * (len(names) + 1)))  # blank row
        lines.append("frequency," + ",".join(["42"] * len(names)))  # unknown row
    lines.append("Initial Values," + "," * (len(names) - 1))
    for p in PARAM_NAMES:
        cells = []
        for m in names:
            s = spec[(m, p)]
            if s["tie"] is not None:
                cells.append(cell(f"{s['tie'][0]}*{s['tie'][1]}"))
            elif s["init"] is not None:
                cells.append(cell(str(s["init"])))
            else:
                cells.append("")
        lines.append(p + "," + ",".join(cells))
    if messy:
        lines.append("Initial Values," + "," * (len(names) - 1))  # re-declared
    lines.append("Bounds," + "," * (len(names) - 1))
    for p in PARAM_NAMES:
        cells = [cell(_bound_cell(spec[(m, p)]["bound"])) for m in names]
        lines.append(p + "," + ",".join(f'"{c}"' for c in cells))
    if messy:
        lines.append("notes,unused,comment" + "," * max(0, len(names) - 2))
    path.write_text("\n".join(lines) + "\n")


class TestPriorParsingFuzz:
    @pytest.mark.parametrize("trial", range(10))
    def test_messy_table_parses_identically(self, tmp_path, trial):
        rng = _rng(trial)
        names, spec = _random_spec(rng)
        clean, messy = tmp_path / "clean.csv", tmp_path / "messy.csv"
        _write_csv(clean, names, spec)
        _write_csv(messy, names, spec, messy=True, rng=_rng(trial, salt=1))
        a = load_prior_knowledge(clean)
        b = load_prior_knowledge(messy)
        assert a.metabolites == b.metabolites
        np.testing.assert_array_equal(a.init_free, b.init_free)
        np.testing.assert_array_equal(a.lower, b.lower)
        np.testing.assert_array_equal(a.upper, b.upper)
        np.testing.assert_array_equal(a.kind, b.kind)
        np.testing.assert_array_equal(a.pmap.idx, b.pmap.idx)
        np.testing.assert_array_equal(a.pmap.scale, b.pmap.scale)
        np.testing.assert_array_equal(a.pmap.offset, b.pmap.offset)
        assert a.free_labels == b.free_labels

    @pytest.mark.parametrize("trial", range(10))
    def test_expand_semantics(self, tmp_path, trial):
        rng = _rng(trial, salt=2)
        names, spec = _random_spec(rng)
        path = tmp_path / "pk.csv"
        _write_csv(path, names, spec)
        pk = load_prior_knowledge(path)
        grid = np.asarray(expand_params(jnp.asarray(pk.init_free), pk.pmap))
        assert grid.shape == (len(names), 5)

        slot_values = {}
        for mi, m in enumerate(names):
            for pi, p in enumerate(PARAM_NAMES):
                s = spec[(m, p)]
                got = grid[mi, pi]
                if s["tie"] is not None:
                    continue  # checked after free slots recorded
                bound = s["bound"]
                req = s["init"] if s["init"] is not None else _DEFAULT_INIT[p]
                if bound == "fixed":
                    # 'fixed' with no tuple pins at the requested init
                    assert got == pytest.approx(req, abs=0), (m, p)
                elif isinstance(bound, tuple) and bound[0] not in (
                    "open_lo",
                    "open_hi",
                ):
                    lo, hi = float(bound[0]), float(bound[1])
                    margin = 1e-3 * (hi - lo)
                    assert lo + margin / 2 < got < hi - margin / 2, (m, p)
                    # within the nudge margin of the (clipped) request
                    assert abs(got - np.clip(req, lo, hi)) <= margin + 1e-12
                    slot_values[(m, p)] = got
                else:
                    # half-open / unbounded: the request is clipped to the
                    # open side first, then (at most) nudged off the edge
                    req_eff = req
                    if isinstance(bound, tuple) and bound[0] == "open_lo":
                        req_eff = min(req, bound[1])
                        assert got <= bound[1]
                    if isinstance(bound, tuple) and bound[0] == "open_hi":
                        req_eff = max(req, bound[1])
                        assert got >= bound[1]
                    assert abs(got - req_eff) <= max(
                        1e-3, abs(req_eff) * 1e-3
                    ) + 1e-12
                    slot_values[(m, p)] = got

        for mi, m in enumerate(names):
            for pi, p in enumerate(PARAM_NAMES):
                s = spec[(m, p)]
                if s["tie"] is None:
                    continue
                factor, parent = s["tie"]
                assert grid[mi, pi] == pytest.approx(
                    factor * slot_values[(parent, p)], rel=1e-12
                ), (m, p)

    def test_tie_to_fixed_target_raises(self, tmp_path):
        # Draw until the spec actually has >= 2 metabolites: a hand-picked
        # fallback seed could silently drift to k=1 (spec would then lack
        # MetB keys and _write_csv would KeyError).
        for salt in range(100):
            names, spec = _random_spec(_rng(999, salt=salt))
            if len(names) >= 2:
                break
        assert len(names) >= 2
        # force: child ties to a FIXED parent -> documented error
        spec[(names[0], "amplitude")] = {
            "init": 5.0,
            "bound": "fixed",
            "tie": None,
        }
        spec[(names[1], "amplitude")] = {
            "init": None,
            "bound": None,
            "tie": (0.5, names[0]),
        }
        path = tmp_path / "pk.csv"
        _write_csv(path, names, spec)
        with pytest.raises(ValueError, match="not a free parameter"):
            load_prior_knowledge(path)
