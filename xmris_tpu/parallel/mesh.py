"""Device mesh & sharding helpers: the framework's scale-out substrate.

The reference's only parallel backend is a single-node joblib/loky process
pool that pickles one voxel per task (``src/xmris/fitting/amares.py:118-204``).
The TPU-native equivalent is SPMD: the voxel-batch axis is embarrassingly
parallel, so MRSI grids shard over a 1-D ``grid`` mesh axis with
``NamedSharding`` and XLA inserts the only collectives the math needs (the
global argmax for single-mode autophase, and result gathers).  Within a slice
the collectives ride ICI; across slices DCN — no pickling, no process pool.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

GRID_AXIS = "grid"


def make_mesh(n_devices: int | None = None, axis_name: str = GRID_AXIS) -> Mesh:
    """A 1-D mesh over (the first ``n_devices``) available devices.

    The voxel-batch dimension of every batched engine shards over this axis.
    """
    devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"Requested {n_devices} devices but only {len(devices)} available."
            )
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def voxel_sharding(mesh: Mesh, ndim: int, axis_name: str = GRID_AXIS) -> NamedSharding:
    """Sharding that splits the leading (voxel) axis, replicating the rest."""
    spec = P(axis_name, *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_voxels(array, mesh: Mesh, axis_name: str = GRID_AXIS):
    """Place a (batch, ...) array with the batch axis split over the mesh."""
    return jax.device_put(array, voxel_sharding(mesh, np.ndim(array), axis_name))


def pad_to_multiple(n: int, m: int) -> int:
    """Smallest multiple of ``m`` that is >= ``n``."""
    return ((n + m - 1) // m) * m


def edge_pad_rows(array, n_rows: int):
    """Edge-repeat a (B, ...) array's leading axis up to ``n_rows``.

    The shared shard/tile divisibility padding: pad voxels are copies of
    the last row, so downstream per-voxel computation on them is valid
    (their results are trimmed by the caller).  No-op when already sized.
    """
    import jax.numpy as jnp

    short = n_rows - array.shape[0]
    if short <= 0:
        return array
    return jnp.concatenate(
        [array, jnp.repeat(array[-1:], short, axis=0)], axis=0
    )
