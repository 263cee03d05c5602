"""Randomized op-chain sweeps over the XmrArray carrier vs a numpy shadow.

``test_array.py`` pins each method at hand-picked cases; this module runs
random *sequences* of indexing / transposition / rolling / reduction ops,
maintaining an independent numpy "shadow" (values + dims + per-dim coords)
under xarray semantics — integer ``isel`` drops the dim and its coord,
list/slice keep them, ``roll`` moves coords with the data, reductions drop
the reduced dim — and asserts the carrier agrees after every step.
Sequences are seeded per trial: deterministic, reproducible on failure.
"""

import numpy as np
import pytest

from xmris_tpu import XmrArray

DIM_POOL = ("aa", "bb", "cc", "dd")


def _rng(trial):
    return np.random.default_rng(95_000 + 199 * trial)


def _fresh(rng):
    ndim = int(rng.integers(2, 4))
    dims = DIM_POOL[:ndim]
    shape = tuple(int(rng.integers(2, 6)) for _ in dims)
    vals = rng.normal(size=shape) + 1j * rng.normal(size=shape)
    coords = {d: rng.normal(size=n) for d, n in zip(dims, shape)}
    da = XmrArray(
        vals.copy(),
        dims=dims,
        coords={d: (d, c.copy()) for d, c in coords.items()},
        attrs={"k": 1},
    )
    return da, {"vals": vals, "dims": list(dims), "coords": dict(coords)}


def _check(da, shadow):
    assert tuple(da.dims) == tuple(shadow["dims"])
    np.testing.assert_allclose(np.asarray(da.values), shadow["vals"], atol=1e-12)
    for d in shadow["dims"]:
        if d in shadow["coords"]:
            np.testing.assert_allclose(
                da.coords[d].values, shadow["coords"][d], atol=1e-12
            )


def _step(rng, da, shadow):
    ops = ["isel_int", "isel_slice", "isel_list", "transpose", "roll",
           "reduce", "conj"]
    op = str(rng.choice(ops))
    dims = shadow["dims"]
    if op == "isel_int" and len(dims) > 1:
        d = str(rng.choice(dims))
        ax = dims.index(d)
        i = int(rng.integers(0, shadow["vals"].shape[ax]))
        da = da.isel({d: i})
        shadow["vals"] = np.take(shadow["vals"], i, axis=ax)
        shadow["dims"] = [x for x in dims if x != d]
        shadow["coords"].pop(d, None)
    elif op == "isel_slice":
        d = str(rng.choice(dims))
        ax = dims.index(d)
        n = shadow["vals"].shape[ax]
        lo = int(rng.integers(0, n))
        hi = int(rng.integers(lo + 1, n + 1))
        da = da.isel({d: slice(lo, hi)})
        sl = [slice(None)] * len(dims)
        sl[ax] = slice(lo, hi)
        shadow["vals"] = shadow["vals"][tuple(sl)]
        shadow["coords"][d] = shadow["coords"][d][lo:hi]
    elif op == "isel_list":
        d = str(rng.choice(dims))
        ax = dims.index(d)
        n = shadow["vals"].shape[ax]
        sel = list(rng.integers(0, n, size=int(rng.integers(1, n + 1))))
        da = da.isel({d: sel})
        shadow["vals"] = np.take(shadow["vals"], sel, axis=ax)
        shadow["coords"][d] = shadow["coords"][d][sel]
    elif op == "transpose" and len(dims) > 1:
        perm = list(rng.permutation(len(dims)))
        new_dims = [dims[i] for i in perm]
        da = da.transpose(*new_dims)
        shadow["vals"] = np.transpose(shadow["vals"], perm)
        shadow["dims"] = new_dims
    elif op == "roll":
        d = str(rng.choice(dims))
        ax = dims.index(d)
        k = int(rng.integers(-4, 5))
        da = da.roll({d: k})
        shadow["vals"] = np.roll(shadow["vals"], k, axis=ax)
        shadow["coords"][d] = np.roll(shadow["coords"][d], k)
    elif op == "reduce" and len(dims) > 1:
        d = str(rng.choice(dims))
        ax = dims.index(d)
        red = str(rng.choice(["mean", "sum"]))
        da = getattr(da, red)(dim=d)
        shadow["vals"] = getattr(np, red)(shadow["vals"], axis=ax)
        shadow["dims"] = [x for x in dims if x != d]
        shadow["coords"].pop(d, None)
    elif op == "conj":
        da = da.conj()
        shadow["vals"] = np.conj(shadow["vals"])
    return da, shadow


class TestArrayOpChainFuzz:
    @pytest.mark.parametrize("trial", range(12))
    def test_random_chain_matches_numpy_shadow(self, trial):
        rng = _rng(trial)
        da, shadow = _fresh(rng)
        _check(da, shadow)
        for _ in range(int(rng.integers(3, 9))):
            da, shadow = _step(rng, da, shadow)
            _check(da, shadow)
