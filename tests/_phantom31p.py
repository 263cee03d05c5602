"""Shared seeded 5-voxel 31P parity phantom + prior.

Single source for the cross-engine parity suites: the real-pyAMARES arm
(``test_pyamares_parity.py``, CI-only) and the committed independent-scipy
oracle arm (``test_oracle_parity.py`` + ``data/generate_scipy_oracle.py``,
every checkout) must fit literally the same data with the same prior.
Pure numpy — no xmris_tpu or jax imports.
"""

import numpy as np

PRIOR = """Index,PCr,ATP
Initial Values,,
amplitude,20.0,5.0
chemicalshift,0.0,-7.5
linewidth,10.0,15.0
phase,0,0
g,0,0
Bounds,,
amplitude,"(0, ","(0, "
chemicalshift,"(-0.5, 0.5)","(-8.0, -7.0)"
linewidth,"(2, 40)","(5, 40)"
phase,"(-180, 180)","(-180, 180)"
g,fixed,fixed
"""

MHZ, SW, N = 51.7, 5000.0, 1024
TRUE_PCR = np.array([10.0, 20.0, 30.0, 40.0, 50.0])
TRUE_ATP = 5.0


def make_phantom():
    """Two-Lorentzian FIDs at seed 42: PCr amplitudes 10..50, ATP 5.0."""
    t = np.arange(N) / SW
    rng = np.random.default_rng(42)
    fids = np.stack(
        [
            a * np.exp((-np.pi * 9.0 + 1j * 2 * np.pi * (0.0 * MHZ)) * t)
            + TRUE_ATP
            * np.exp((-np.pi * 14.0 + 1j * 2 * np.pi * (-7.5 * MHZ)) * t)
            + rng.normal(0, 0.05, N)
            + 1j * rng.normal(0, 0.05, N)
            for a in TRUE_PCR
        ]
    )
    return fids, t
