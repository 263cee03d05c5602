"""Scale-out layer: device meshes, sharded batched pipelines."""

from xmris_tpu.parallel.fit import lm_fit_batched_pallas_sharded
from xmris_tpu.parallel.mesh import (
    GRID_AXIS,
    make_mesh,
    replicated,
    shard_voxels,
    voxel_sharding,
)
from xmris_tpu.parallel.pipeline import (
    PipelineConfig,
    mrsi_pipeline,
    spectral_pipeline_raw,
)
from xmris_tpu.parallel.process import (
    pinned_grid_program,
    process_grid_planar_raw,
)

__all__ = [
    "GRID_AXIS",
    "PipelineConfig",
    "lm_fit_batched_pallas_sharded",
    "make_mesh",
    "mrsi_pipeline",
    "pinned_grid_program",
    "process_grid_planar_raw",
    "replicated",
    "shard_voxels",
    "spectral_pipeline_raw",
    "voxel_sharding",
]
