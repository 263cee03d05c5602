"""Multi-chip batched fitting: the fused-kernel LM under ``shard_map``.

The XLA planar LM (:func:`~xmris_tpu.fitting.lm.lm_fit_batched_planar`)
auto-shards under GSPMD — hand it voxel-sharded inputs and XLA partitions
the vmapped program.  The Pallas path does not partition automatically;
here the fused normal-equations solver runs under ``shard_map`` over the
1-D voxel mesh instead:

* every device executes the whole LM ``while_loop`` on ITS voxel shard
  only — zero collectives (the problem is embarrassingly parallel, exactly
  the reference's process-pool structure, ``amares.py:118-204``);
* each device's loop exits as soon as *its* voxels converge, so a shard of
  easy voxels stops early instead of idling behind the global batch — a
  straggler property the single-launch formulation cannot have.

Results are bit-identical to the single-device launch: converged voxels
stop updating (``ok & ~done`` masking), so loop-length differences between
shards cannot change any voxel's solution.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from xmris_tpu.fitting.lm import LMResult, lm_fit_batched_pallas
from xmris_tpu.parallel.mesh import GRID_AXIS


def lm_fit_batched_pallas_sharded(
    fids_re,
    fids_im,
    t,
    u0,
    lower,
    upper,
    kind,
    pmap_static,
    mhz: float,
    mesh: Mesh,
    axis_name: str = GRID_AXIS,
    max_iter: int = 50,
    lam0: float = 1e-3,
    ftol: float = 1e-10,
    v_tile: int | None = None,
    interpret: bool = False,
    kernel_version: int = 9,
    return_hessian: bool = False,
) -> "LMResult | tuple[LMResult, jax.Array]":
    """Fused-kernel bounded LM sharded over the mesh's voxel axis.

    ``fids_re``/``fids_im``/``u0`` shard on their leading (voxel) axis,
    which must divide by the mesh size; ``t``/``lower``/``upper``/``kind``
    replicate.  ``u0`` must already be per-voxel ``(B, F)`` (broadcast a
    shared seed before calling).  Semantics match
    :func:`~xmris_tpu.fitting.lm.lm_fit_batched_pallas` exactly, including
    ``return_hessian=True`` -> ``(LMResult, h_ext)`` with the per-voxel
    Gauss-Newton Hessian sharded like the batch (zero-cost CRLBs via
    :func:`~xmris_tpu.fitting.lm.crlb_from_hessian`).
    """
    if not isinstance(return_hessian, bool):
        # "slab" would shard-concatenate (n_tiles, f_pad^2, v_tile) slabs
        # whose per-shard lane padding lands mid-batch: slab_to_bff /
        # crlb_from_hessian_slab would then attribute shard-0 pad lanes to
        # real voxels and drop the final shard's tail — silently wrong.
        raise ValueError(
            "lm_fit_batched_pallas_sharded supports return_hessian="
            "True/False only (the slab layout does not concatenate "
            "across shards); use crlb_from_hessian on the (B, F, F) "
            "Hessian instead"
        )
    n_dev = mesh.shape[axis_name]
    b = fids_re.shape[0]
    if b % n_dev:
        raise ValueError(
            f"Voxel batch ({b}) must divide by the mesh axis ({n_dev}); "
            "pad with pad_to_multiple first."
        )
    if u0.ndim == 1:
        u0 = jnp.broadcast_to(u0[None, :], (b, u0.shape[0]))

    if kernel_version == 7 and fids_re.shape[-1] % 128 == 0:
        # Validate v7's uniform-t precondition here, where t is still
        # concrete — inside shard_map it is traced and unverifiable.
        # (On n_t % 128 != 0 the selector falls back to v6: no precondition.)
        from xmris_tpu.fitting.lm import _check_uniform_t_v7

        _check_uniform_t_v7(t, require_uniform_t=False)

    # Inside shard_map t is traced, so uniformity must be established here:
    # v9 enables its block-factored basis only when this concrete check
    # passes (it falls back to the direct basis otherwise).
    from xmris_tpu.fitting.lm import _t_is_uniform

    t_uniform = not isinstance(t, jax.core.Tracer) and _t_is_uniform(t)

    solver = functools.partial(
        lm_fit_batched_pallas,
        require_uniform_t=t_uniform,
        pmap_static=pmap_static,
        mhz=mhz,
        max_iter=max_iter,
        lam0=lam0,
        ftol=ftol,
        v_tile=v_tile,
        interpret=interpret,
        kernel_version=kernel_version,
        return_hessian=return_hessian,
    )

    def per_shard(re, im, t, u0, lower, upper, kind):
        return solver(re, im, t, u0, lower, upper, kind)

    sharded = P(axis_name)
    replicated = P()
    result_spec = LMResult(
        x_free=sharded, cost=sharded, n_iter=sharded,
        converged=sharded, done=sharded,
    )
    fn = jax.shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(
            sharded, sharded, replicated, sharded,
            replicated, replicated, replicated,
        ),
        out_specs=(result_spec, sharded) if return_hessian else result_spec,
        check_vma=False,
    )
    return fn(fids_re, fids_im, t, u0, lower, upper, kind)
