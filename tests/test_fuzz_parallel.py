"""Randomized sharding-parity sweeps over the fused pipeline.

``test_parallel.py`` pins sharded == single-device at one friendly geometry
(16 voxels over 8 devices); this module draws *awkward* voxel counts —
prime, smaller than the device count, off-multiple — plus random autophase
modes and apodization, asserting the mesh path (including its pad-to-device-
multiple logic, ``parallel/pipeline.py:321``) stays bit-faithful to the
single-device program.  Seeded per trial: deterministic shapes, warm
persistent compile cache.
"""

import numpy as np
import pytest

from xmris_tpu import ATTRS, COORDS, DIMS, XmrArray
from xmris_tpu.parallel import PipelineConfig, make_mesh, mrsi_pipeline

N_TIME = 128
SW = 4000.0


def _rng(trial):
    return np.random.default_rng(90_000 + 257 * trial)


def _grid(rng, nx, ny):
    t = np.arange(N_TIME) / SW
    freqs = rng.uniform(-1000, 1000, size=(nx, ny))
    amps = rng.uniform(1.0, 5.0, size=(nx, ny))
    data = amps[..., None] * np.exp(
        (1j * 2 * np.pi * freqs[..., None] - 30.0) * t[None, None, :]
    )
    data += rng.normal(0, 1e-3, data.shape) + 1j * rng.normal(
        0, 1e-3, data.shape
    )
    return XmrArray(
        data,
        dims=(DIMS.x, DIMS.y, DIMS.time),
        coords={COORDS.time: (DIMS.time, t)},
        attrs={ATTRS.reference_frequency: 100.0, ATTRS.carrier_ppm: 0.0},
    )


class TestShardedPipelineFuzz:
    # geometries chosen to stress the pad logic: 3 voxels (< 8 devices),
    # 7 and 13 (prime, off-multiple), 18 (over-multiple, remainder 2)
    @pytest.mark.bigcompile
    @pytest.mark.parametrize(
        "trial,nx,ny", [(0, 3, 1), (1, 7, 1), (2, 13, 1), (3, 6, 3)]
    )
    def test_awkward_voxel_counts_match_single_device(self, trial, nx, ny):
        rng = _rng(trial)
        da = _grid(rng, nx, ny)
        autophase = ("none", "single")[trial % 2]
        cfg = PipelineConfig(
            zero_fill_to=256,
            lb=float(rng.uniform(0.0, 10.0)),
            autophase=autophase,
        )
        sharded = mrsi_pipeline(da, cfg=cfg, mesh=make_mesh(8))
        single = mrsi_pipeline(da, cfg=cfg, mesh=make_mesh(1))
        np.testing.assert_allclose(
            np.asarray(sharded.values),
            np.asarray(single.values),
            rtol=1e-8,
            atol=1e-10,
        )
        assert sharded.dims == single.dims
        assert sharded.sizes[DIMS.x] == nx and sharded.sizes[DIMS.y] == ny
