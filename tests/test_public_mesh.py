"""Multi-device fitting through the PUBLIC API (``fit_amares(mesh=...)``).

The reference exposes parallelism as ``fit_amares(..., num_workers=)`` — a
loky process pool over voxel chunks (reference ``fitting/amares.py:118-204``).
The TPU-native analog is SPMD over a ``jax.sharding.Mesh`` voxel axis; these
tests pin that the *labeled public entry point* reaches it (VERDICT r4
item 2) with per-voxel solutions identical to the single-device launch,
including non-divisible voxel counts (edge-padded, trimmed).

Runs on the 8-virtual-CPU-device mesh the conftest configures.
"""

import numpy as np
import pytest

import xmris_tpu as xmt
from xmris_tpu import DIMS, XmrArray
from xmris_tpu.fitting.amares import fit_amares

# Fixed-g (Lorentzian) prior: the pallas engine's v9 kernel path.
PK_CSV = """Index,PCr,ATP
Initial Values,,
amplitude,10.0,5.0
chemicalshift,0.0,-7.5
linewidth,15.0,20.0
phase,0,0
g,0,0
Bounds,,
amplitude,"(0, ","(0, "
chemicalshift,"(-0.5, 0.5)","(-8.0, -7.0)"
linewidth,"(5.0, 30.0)","(10.0, 40.0)"
phase,"(-180, 180)","(-180, 180)"
g,fixed,fixed
"""


@pytest.fixture(scope="module")
def pk_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("mesh_pk") / "pk.csv"
    p.write_text(PK_CSV)
    return p


def make_phantom(n_voxels, n_points=256, sw=10000.0, mhz=120.0):
    dt = 1.0 / sw
    t = np.arange(n_points) * dt
    rng = np.random.default_rng(7)
    data = np.zeros((n_voxels, n_points), dtype=complex)
    for v in range(n_voxels):
        amp = 8.0 + 4.0 * v
        data[v] = amp * np.exp(-15.0 * np.pi * t) + 5.0 * np.exp(
            (-20.0 * np.pi + 1j * 2 * np.pi * (-7.5 * mhz)) * t
        )
    data += rng.normal(0, 0.3, data.shape) + 1j * rng.normal(0, 0.3, data.shape)
    return XmrArray(
        data,
        dims=("voxel", DIMS.time),
        coords={"voxel": np.arange(n_voxels), DIMS.time: (DIMS.time, t)},
        attrs={"MHz": mhz, "sw": sw},
    )


def _maps(ds):
    return {
        name: np.asarray(ds[name].values)
        for name in ("amplitude", "chem_shift", "crlb", "fit_converged")
    }


class TestFitAmaresMesh:
    def test_xla_engine_sharded_parity_nondivisible(self, pk_file):
        """11 voxels over 8 devices (pad 11->16) == single device, exactly
        the per-voxel solutions (voxel independence: sharding cannot change
        any voxel's arithmetic)."""
        import jax

        assert len(jax.devices()) >= 8, "conftest must provide 8 devices"
        da = make_phantom(11)
        ref = fit_amares(da, pk_file, engine="xla", return_curves=False)
        shr = fit_amares(
            da, pk_file, engine="xla", return_curves=False, mesh=8
        )
        for name, want in _maps(ref).items():
            got = _maps(shr)[name]
            np.testing.assert_allclose(
                got.astype(np.float64), want.astype(np.float64),
                rtol=2e-6, atol=1e-8, err_msg=name,
            )

    def test_mesh_object_and_auto(self, pk_file):
        """mesh accepts a prebuilt Mesh and the 'auto' string."""
        from xmris_tpu.parallel.mesh import make_mesh

        da = make_phantom(8)
        ref = fit_amares(da, pk_file, engine="xla", return_curves=False)
        via_mesh = fit_amares(
            da, pk_file, engine="xla", return_curves=False, mesh=make_mesh(4)
        )
        via_auto = fit_amares(
            da, pk_file, engine="xla", return_curves=False, mesh="auto"
        )
        for other in (via_mesh, via_auto):
            np.testing.assert_allclose(
                np.asarray(other["amplitude"].values),
                np.asarray(ref["amplitude"].values),
                rtol=2e-6,
            )

    def test_mesh_bad_string_raises(self, pk_file):
        da = make_phantom(4)
        with pytest.raises(ValueError, match="mesh"):
            fit_amares(da, pk_file, engine="xla", mesh="everything")

    def test_mesh_bad_object_raises_descriptively(self, pk_file):
        """A non-Mesh object must fail fast with the documented error, not
        an AttributeError deep in the fit."""
        da = make_phantom(4)
        with pytest.raises(ValueError, match="jax.sharding.Mesh"):
            fit_amares(da, pk_file, engine="xla", mesh=2.0)

    def test_multi_axis_mesh_rejected(self, pk_file):
        import jax
        import numpy as np_
        from jax.sharding import Mesh

        devs = np_.array(jax.devices()[:4]).reshape(2, 2)
        da = make_phantom(4)
        with pytest.raises(ValueError, match="1-D mesh"):
            fit_amares(
                da, pk_file, engine="xla", mesh=Mesh(devs, ("a", "b"))
            )

    def test_cli_mesh_bad_value_is_usage_error(self, tmp_path, capsys):
        """--mesh garbage must be an argparse usage error (exit 2), not a
        raw ValueError traceback."""
        from xmris_tpu.runtime.cli import fit_main

        with pytest.raises(SystemExit) as exc:
            fit_main(["in.npz", "pk.csv", "-o", "out.npz", "--mesh", "all"])
        assert exc.value.code == 2
        assert "device count or 'auto'" in capsys.readouterr().err

    @pytest.mark.bigcompile
    def test_pallas_engine_sharded_parity(self, pk_file):
        """The fused-kernel engine routes through shard_map
        (lm_fit_batched_pallas_sharded) from the public API; interpret-mode
        Pallas on the CPU mesh, small shapes."""
        da = make_phantom(11, n_points=128)
        ref = fit_amares(
            da, pk_file, engine="pallas", return_curves=False, max_iter=8,
            initialize_with_lm=False,
        )
        shr = fit_amares(
            da, pk_file, engine="pallas", return_curves=False, max_iter=8,
            initialize_with_lm=False, mesh=8,
        )
        for name, want in _maps(ref).items():
            got = _maps(shr)[name]
            np.testing.assert_allclose(
                got.astype(np.float64), want.astype(np.float64),
                rtol=2e-6, atol=1e-8, err_msg=name,
            )
