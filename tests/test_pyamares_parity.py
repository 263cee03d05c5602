"""Cross-engine parity: our batched LM fit vs the real pyAMARES.

The reference's fit engine IS pyAMARES (+ lmfit, ``amares.py:74-81``);
this suite fits the seeded 5-voxel 31P phantom from
``docs/notebooks/fitting/pyamares.md`` with BOTH engines and asserts the
quantified amplitudes agree.  pyAMARES is not installable in the
offline dev environment, so everything here ``importorskip``s — the CI
``pyamares-parity`` job (``.github/workflows/ci-fast.yml``) installs it
and runs this file for real.  This closes SURVEY §7 step 5's parity
claim.
"""

from copy import deepcopy

import numpy as np
import pytest

pyAMARES = pytest.importorskip("pyAMARES")

import xmris_tpu as xmt  # noqa: E402
from xmris_tpu.core.array import Coord  # noqa: E402

from tests._phantom31p import (  # noqa: E402
    MHZ, N, PRIOR, SW, TRUE_ATP, TRUE_PCR, make_phantom,
)


def fit_with_pyamares(fids, pk_path):
    """Per-voxel pyAMARES fits, exactly the reference's call pattern
    (``/root/reference/src/xmris/fitting/amares.py:74-81, 314-324``)."""
    from pyAMARES import initialize_FID
    from pyAMARES.kernel.lmfit import fitAMARES

    shared = initialize_FID(
        fid=fids[-1],  # highest-SNR voxel, like the reference's auto-select
        priorknowledgefile=str(pk_path),
        MHz=MHZ,
        sw=SW,
        deadtime=0.0,
        normalize_fid=False,
        preview=False,
    )
    rows = []
    for v in range(fids.shape[0]):
        obj = deepcopy(shared)
        obj.fid = fids[v]
        fitAMARES(
            fid_parameters=obj,
            fitting_parameters=obj.initialParams,
            method="least_squares",
            initialize_with_lm=True,
            ifplot=False,
            inplace=True,
        )
        rows.append(obj.result_multiplets)
    return rows


@pytest.fixture(scope="module")
def both_fits(tmp_path_factory):
    pk_path = tmp_path_factory.mktemp("pk") / "prior_31p.csv"
    pk_path.write_text(PRIOR)
    fids, t = make_phantom()

    da = xmt.XmrArray(
        fids,
        dims=("voxel", "time"),
        coords={"time": Coord("time", t)},
        attrs={"MHz": MHZ},
    )
    ours = da.xmr.fit_amares(pk_path)
    theirs = fit_with_pyamares(fids, pk_path)
    return ours, theirs


def test_amplitudes_match_pyamares(both_fits):
    ours, theirs = both_fits
    metabs = list(np.asarray(ours["amplitude"].coords["Metabolite"].values))
    our_amps = np.asarray(ours["amplitude"].values)  # (voxel, Metabolite)
    their_amps = np.stack(
        [[float(df.loc[m, "amplitude"]) for m in metabs] for df in theirs]
    )
    np.testing.assert_allclose(our_amps, their_amps, rtol=0.02, atol=0.05)


def test_both_engines_recover_ground_truth(both_fits):
    ours, theirs = both_fits
    metabs = list(np.asarray(ours["amplitude"].coords["Metabolite"].values))
    pcr_col = metabs.index("PCr")
    our_pcr = np.asarray(ours["amplitude"].values)[:, pcr_col]
    their_pcr = np.array([float(df.loc["PCr", "amplitude"]) for df in theirs])
    np.testing.assert_allclose(our_pcr, TRUE_PCR, rtol=0.02)
    np.testing.assert_allclose(their_pcr, TRUE_PCR, rtol=0.02)


def test_chem_shifts_match_pyamares(both_fits):
    ours, theirs = both_fits
    metabs = list(np.asarray(ours["amplitude"].coords["Metabolite"].values))
    our_cs = np.asarray(ours["chem_shift"].values)
    their_cs = np.stack(
        [[float(df.loc[m, "chem shift(ppm)"]) for m in metabs] for df in theirs]
    )
    np.testing.assert_allclose(our_cs, their_cs, atol=0.02)
