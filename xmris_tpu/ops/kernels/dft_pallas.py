"""Pallas TPU kernel: fused zero-fill + windowed ortho DFT + fftshift.

TPU-native replacement for the spectral hot path that the reference runs
through ``np.fft.fftn`` + ``roll`` (``/root/reference/src/xmris/processing/
fourier.py:117-173`` and ``fid.py:9-42``).  The XLA matmul formulations in
:mod:`xmris_tpu.ops.kernels.dft` leave ~5x on the table because every
Cooley-Tukey stage round-trips intermediates (and their layout transposes)
through HBM; this kernel keeps a voxel tile's whole transform resident in
VMEM.

Factorization (n = n1 * n2, decimation x[j1*n2 + j2], output k = k1 + n1*k2):

    Y[k1, j2]  = sum_{j1} x[j1*n2 + j2] W_{n1}^{j1 k1}        stage-1 matmul
    Y'[k1, j2] = Y * W_n^{j2 k1}                              twiddle
    X[k1+n1*k2] = sum_{j2} Y'[k1, j2] W_{n2}^{j2 k2}          stage-2 matmul

Hardware-fit choices:

* **Zero-fill is free.**  With n_in = n/2 and n2 | n_in, only rows
  j1 < n_in/n2 of the stage-1 DFT matrix survive — the factor matrix is
  rectangular and the padding is never materialized.
* **fftshift is free.**  A half-spectrum roll maps k2 -> (k2 + n2/2) mod n2
  with k1 untouched (n/2 = n1 * n2/2), so the shift is a static column
  permutation of the stage-2 factor matrix.
* **No XLA layout passes.**  The input arrives in its natural (v, j1, j2)
  block layout straight from HBM; the window multiply and the relayout to
  the (j1, (v, j2)) stage-1 panel run inside the kernel as static slice
  copies (Mosaic can neither split nor merge a vector's lane dimension,
  so the relayout is copies, not a reshape).  Stage 1 is then a plain
  matmul, the twiddle is a host-tiled elementwise factor, and stage 2
  contracts the lane dim against the factor's transpose (the lane-lane
  ``dot_general`` pattern the LM kernels already use).  The single
  irreducible output digit-reversal (k1, k2) -> flat k is a FREE reshape
  on the default per-voxel-transposed ("loop") output layout.

Everything is planar float32 (no complex dtype on device).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_n2(n_in: int, n_out: int) -> int:
    """Auto-pick the Cooley-Tukey split: total MACs = n_out*(n_in/n2 + n2)
    per voxel, minimized near n2 = sqrt(n_in); halve until it divides."""
    n2 = 32
    while n2 > 8 and (n_in % n2 or n_out % n2):
        n2 //= 2
    return n2


def pallas_split_ok(n_in: int, n_out: int) -> bool:
    """True when the auto-picked Cooley-Tukey split handles (n_in, n_out):
    an even n2 >= 8 dividing both, with n_out >= n_in (zero-fill only)."""
    if n_out < n_in:
        return False
    n2 = _pick_n2(n_in, n_out)
    return n_in % n2 == 0 and n_out % n2 == 0


@functools.lru_cache(maxsize=16)
def _spectrum_factors(
    n_in: int, n_out: int, n2: int, shifted: bool, ortho: bool
):
    """Host-precomputed planar factor matrices for the fused transform.

    Returns (f1_re, f1_im) of shape (n1, n1_in) [k1 rows, j1 cols],
    (tw_re, tw_im) of shape (n1, n2) [k1 rows, j2 cols], and
    (f2t_re, f2t_im) of shape (n2, n2) [k2 rows, j2 cols] with the
    fftshift column permutation folded in when ``shifted``.
    """
    if n_out % n2:
        raise ValueError(f"n2={n2} must divide n_out={n_out}")
    n1 = n_out // n2
    if n_in % n2:
        raise ValueError(f"n2={n2} must divide n_in={n_in}")
    if n_in > n_out:
        raise ValueError(
            f"n_in={n_in} > n_out={n_out}: this kernel zero-fills, it does "
            "not truncate (stage 1 would alias the folded sequence)"
        )
    n1_in = n_in // n2
    if shifted and n2 % 2:
        # The roll by n_out/2 = n1*(n2/2) is a pure k2-digit permutation
        # only when n2 is even; odd n2 would touch the k1 digit too.
        raise ValueError(f"fftshift folding needs an even n2, got {n2}")

    k1 = np.arange(n1)[:, None]
    j1 = np.arange(n1_in)[None, :]
    ang1 = -2.0 * np.pi * k1 * j1 / n1
    scale = (1.0 / math.sqrt(n_out)) if ortho else 1.0
    f1_re = np.cos(ang1) * scale
    f1_im = np.sin(ang1) * scale

    j2 = np.arange(n2)[None, :]
    ang_t = -2.0 * np.pi * k1 * j2 / n_out
    tw_re = np.cos(ang_t)
    tw_im = np.sin(ang_t)

    k2 = np.arange(n2)[:, None]
    if shifted:
        # X_shift[k1 + n1*k2'] = X[k1 + n1*((k2' + n2/2) % n2)]: the roll by
        # n_out/2 = n1*(n2/2) only touches the k2 digit.
        k2 = (k2 + n2 // 2) % n2
    ang2 = -2.0 * np.pi * k2 * np.arange(n2)[None, :] / n2  # (k2, j2)
    f2t_re = np.cos(ang2)
    f2t_im = np.sin(ang2)
    return (
        f1_re.astype(np.float32),
        f1_im.astype(np.float32),
        tw_re.astype(np.float32),
        tw_im.astype(np.float32),
        f2t_re.astype(np.float32),
        f2t_im.astype(np.float32),
    )


def _spectrum_kernel(
    xre_ref,  # (Vt, n1_in, n2) VMEM — natural-layout input block
    xim_ref,
    wre_ref,  # (n1_in, n2) VMEM — window reshaped to the decimation grid
    f1re_ref,  # (n1, n1_in) VMEM
    f1im_ref,
    twre_ref,  # (n1, n2) VMEM — per-voxel twiddle pattern (applied in the
    twim_ref,  # per-voxel stage-2 loops, so it is never tiled across lanes)
    f2tre_ref,  # (n2, n2) VMEM — [k2, j2]
    f2tim_ref,
    ore_ref,  # stacked: (n2, Vt*n1); loop/stacked2: (Vt*n2, n1)
    oim_ref,
    *scratch,  # [mv_ref, mi_ref if with_maxmag] + [pre_ref, pim_ref unless
    #            pre_panel] + stacked scratch
    n1: int,
    n2: int,
    v_tile: int,
    s2: str,
    pre_panel: bool = False,
    with_maxmag: bool = False,
    precision: str = "highest",
):
    """All values stay 2D after the input relayout (Mosaic can neither
    split nor merge a vector's lane dimension).  The input arrives in its
    natural (v, j1, j2) layout and is windowed + relayouted to the
    (j1, (v, j2)) stage-1 panel with static slice copies — no XLA
    pre-transpose pass over HBM.  Two stage-2 strategies, selected
    statically:

    * ``"stacked"`` — relayout via static slice copies into a scratch,
      then ONE long Gram contraction producing (k2, (v, k1)); the output
      digit reversal happens in XLA (a transpose pass over HBM).
    * ``"stacked2"`` — same ONE long Gram contraction, but the digit
      reversal is a third in-kernel slice-copy loop ((n2, n1) blocks per
      voxel), producing the loop path's ((v, k2), k1) layout so no XLA
      post-pass exists.  Trades 64 fill/drain-bound tiny MXU dots for 64
      VPU block copies.
    * ``"loop"`` — per-voxel (n2, n2) x (n1, n2) Gram dots straight off
      the twiddled stage-1 slices, producing ((v, k2), k1) so the output
      digit reversal is a free reshape.

    With ``pre_panel`` the (j1, (v, j2)) stage-1 panel arrives pre-built
    (window + relayout done by ONE fused XLA transpose pass over HBM);
    the in-kernel copy loop disappears.
    """
    f32 = jnp.float32
    # "highest" (6 bf16 passes, ~1e-7) is the production setting; the
    # lower tiers exist for the roofline precision ablation ONLY (one
    # pass ~1.3e-3 relative error — never ship it).
    prec = {
        "highest": jax.lax.Precision.HIGHEST,
        "high": jax.lax.Precision.HIGH,
        "default": jax.lax.Precision.DEFAULT,
    }[precision]

    mm = functools.partial(
        jnp.matmul, preferred_element_type=f32, precision=prec
    )
    f1r = f1re_ref[:, :]
    f1i = f1im_ref[:, :]

    if with_maxmag:
        # Extra OUTPUT refs (pallas passes outputs before scratch)
        extra_outs = (scratch[0], scratch[1])
        scratch = scratch[2:]
    if pre_panel:
        # Panel arrives ready: (j1, (v, j2)) with the window already folded
        xr = xre_ref[:, :]
        xi = xim_ref[:, :]
        s_scratch = scratch
    else:
        # Window + relayout (v, j1, j2) -> (j1, (v, j2)) via static copies
        pre_ref, pim_ref = scratch[0], scratch[1]
        s_scratch = scratch[2:]
        w2 = wre_ref[:, :]
        for v in range(v_tile):
            pre_ref[:, v * n2 : (v + 1) * n2] = xre_ref[v, :, :] * w2
            pim_ref[:, v * n2 : (v + 1) * n2] = xim_ref[v, :, :] * w2
        xr = pre_ref[:, :]
        xi = pim_ref[:, :]

    # Stage 1: (n1, n1_in) @ (n1_in, Vt*n2) — contraction over j1
    yr = mm(f1r, xr) - mm(f1i, xi)
    yi = mm(f1r, xi) + mm(f1i, xr)

    # Twiddle: the factor repeats its (n1, n2) pattern per voxel, so it is
    # applied on each voxel's (n1, n2) slice inside the stage-2 loops
    # below instead of materializing a lane-tiled (n1, Vt*n2) copy — that
    # tiled factor plus the twiddled intermediate cost ~3 MB of VMEM at
    # v_tile=64 and blew the 16 MB scoped budget (measured OOM).
    twr = twre_ref[:, :]
    twi = twim_ref[:, :]

    f2r = f2tre_ref[:, :]
    f2i = f2tim_ref[:, :]
    contract = (((1,), (1,)), ((), ()))
    dg = functools.partial(
        jax.lax.dot_general, preferred_element_type=f32, precision=prec
    )

    if s2 in ("stacked", "stacked2"):
        # Twiddle + relayout (k1, (v, j2)) -> ((v, k1), j2) via static
        # slice copies, then Z^T[k2, (v, k1)] = sum_j2 F2s[j2, k2]
        # Y'[(v, k1), j2] as one long lane-lane contraction.
        sre_ref, sim_ref = s_scratch[0], s_scratch[1]
        for v in range(v_tile):
            sl = slice(v * n2, (v + 1) * n2)
            yv_re = yr[:, sl]
            yv_im = yi[:, sl]
            sre_ref[v * n1 : (v + 1) * n1, :] = yv_re * twr - yv_im * twi
            sim_ref[v * n1 : (v + 1) * n1, :] = yv_re * twi + yv_im * twr
        a_re = sre_ref[:, :]
        a_im = sim_ref[:, :]
        zr = dg(f2r, a_re, contract) - dg(f2i, a_im, contract)
        zi = dg(f2r, a_im, contract) + dg(f2i, a_re, contract)
        if s2 == "stacked":
            ore_ref[:, :] = zr
            oim_ref[:, :] = zi
        else:
            # In-kernel digit reversal: (k2, (v, k1)) -> ((v, k2), k1) via
            # per-voxel (n2, n1) block copies — no XLA transpose pass.
            for v in range(v_tile):
                ore_ref[v * n2 : (v + 1) * n2, :] = zr[
                    :, v * n1 : (v + 1) * n1
                ]
                oim_ref[v * n2 : (v + 1) * n2, :] = zi[
                    :, v * n1 : (v + 1) * n1
                ]
    else:
        # Per-voxel: twiddle the slice, then Gram dots (k2, j2) x (k1, j2)
        for v in range(v_tile):
            sl = slice(v * n2, (v + 1) * n2)
            yv_re = yr[:, sl] * twr - yi[:, sl] * twi  # (n1, n2)
            yv_im = yr[:, sl] * twi + yi[:, sl] * twr
            zr = dg(f2r, yv_re, contract) - dg(f2i, yv_im, contract)
            zi = dg(f2r, yv_im, contract) + dg(f2i, yv_re, contract)
            ore_ref[v * n2 : (v + 1) * n2, :] = zr
            oim_ref[v * n2 : (v + 1) * n2, :] = zi

        if with_maxmag:
            # Per-voxel peak |spectrum|^2 and its frequency index, computed
            # while the block is VMEM-resident — replaces a full-grid XLA
            # magnitude+argmax pass over HBM in the autophase pipeline.
            mv_ref, mi_ref = extra_outs
            zr_all = ore_ref[:, :]  # ((v, k2), k1)
            zi_all = oim_ref[:, :]
            m2 = (zr_all * zr_all + zi_all * zi_all).reshape(
                v_tile, n2, n1
            )  # leading-dim split only (lanes untouched)
            # Two-stage argmax: over k1 (lanes), then over k2 (sublanes).
            # The index path stays int32 end-to-end — Mosaic on this
            # toolchain cannot legalize vector `arith.sitofp`, so no
            # int->float conversion may appear here.
            rmax = jnp.max(m2, axis=2)  # (V, n2)
            rarg = jnp.argmax(m2, axis=2)  # (V, n2) int32
            k2_best = jnp.argmax(rmax, axis=1)  # (V,) int32
            vmax = jnp.max(rmax, axis=1)  # (V,)
            # gather rarg[v, k2_best[v]] without dynamic indexing
            k2_iota = jax.lax.broadcasted_iota(
                jnp.int32, (v_tile, n2), 1
            )
            sel = k2_iota == k2_best[:, None]
            k1_best = jnp.sum(jnp.where(sel, rarg, 0), axis=1)  # (V,) int32
            # flat frequency index k = k1 + n1 * k2.  The (8, Vt) block is
            # written whole (sublane-broadcast): Mosaic requires the block's
            # second-to-last dim to be 8-divisible and rejects sub-block
            # row stores here; the caller reads row 0.
            ki = k1_best + jnp.int32(n1) * k2_best
            mv_ref[:, :, :] = jnp.broadcast_to(
                vmax[None, None, :], (1, 8, v_tile)
            )
            mi_ref[:, :, :] = jnp.broadcast_to(
                ki[None, None, :], (1, 8, v_tile)
            )


def stacked_spec_shape(n_in: int, n_out: int, n2: int | None = None):
    """The (n2, n1) per-voxel block shape of the ``stacked_out`` layout.

    ``spectrum_pallas(..., stacked_out=True)`` returns spectra shaped
    ``batch + (n2, n1)`` where the flat frequency index is
    ``k = k1 + n1 * k2`` — i.e. a C-order reshape of the last two dims
    recovers the flat spectrum exactly (the layouts are linear-memory
    identical; only the on-device tiling differs).
    """
    if n2 is None:
        n2 = _pick_n2(n_in, n_out)
    return n2, n_out // n2


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_out", "n2", "shifted", "ortho", "v_tile", "interpret", "s2",
        "pre_relayout", "vmem_limit_mb", "with_maxmag", "precision",
        "stacked_out",
    ),
)
def spectrum_pallas(
    xr: jax.Array,  # (..., n_in) real plane
    xi: jax.Array,
    n_out: int,
    window: jax.Array | None = None,  # (n_in,) real apodization weights
    n2: int | None = None,
    shifted: bool = True,
    ortho: bool = True,
    v_tile: int = 64,
    interpret: bool = False,
    s2: str = "loop",
    pre_relayout: bool = False,
    vmem_limit_mb: int | None = None,
    with_maxmag: bool = False,
    precision: str = "highest",
    stacked_out: bool = False,
):
    """Fused window -> zero-fill -> ortho DFT -> fftshift of a planar batch.

    Matches ``fftshift(fft(pad(x * window), n_out, norm="ortho"))`` to f32
    accuracy (~1e-7 relative).  ``n_in`` and ``n_out`` must be multiples of
    ``n2`` with ``n_out >= n_in``; the batch is padded to ``v_tile``
    internally.  ``n2=None`` picks the split so the output lane count
    ``n1 = n_out/n2`` lands at the 128-lane vreg width.

    ``s2`` selects the stage-2 strategy (``"loop"`` / ``"stacked"`` /
    ``"stacked2"``, see :func:`_spectrum_kernel`); ``pre_relayout=True``
    builds the (j1, (v, j2)) stage-1 panel with one fused XLA
    window+transpose pass over HBM instead of in-kernel slice copies.

    ``with_maxmag=True`` (loop path only) additionally returns
    ``(max_mag2, max_idx)`` — each voxel's peak squared magnitude and its
    frequency index — computed while the spectrum block is VMEM-resident,
    so the autophase pipeline's full-grid magnitude+argmax pass over HBM
    disappears.  Return becomes ``(out_re, out_im, max_mag2, max_idx)``
    with the extras shaped like the batch.

    ``stacked_out=True`` (loop path only) skips the final XLA lane-merge
    relayout and returns the spectra in the kernel's native stacked layout,
    shaped ``batch + (n2, n1)`` with flat frequency ``k = k1 + n1*k2`` (see
    :func:`stacked_spec_shape`).  The stacked block is linear-memory
    identical to the flat spectrum, so a host-side C-order reshape — or a
    leading-dim-preserving consumer on device — recovers it for free; the
    relayout the flat return pays (~0.6 ms/plane at bench scale, r7 trace)
    never runs.
    """
    if with_maxmag and s2 != "loop":
        raise ValueError("with_maxmag requires the default s2='loop' path")
    if stacked_out and s2 != "loop":
        raise ValueError("stacked_out requires the default s2='loop' path")
    batch_shape = xr.shape[:-1]
    n_in = xr.shape[-1]
    if n2 is None:
        n2 = _pick_n2(n_in, n_out)
    xr = xr.reshape(-1, n_in).astype(jnp.float32)
    xi = xi.reshape(-1, n_in).astype(jnp.float32)
    b = xr.shape[0]

    n1 = n_out // n2
    n1_in = n_in // n2
    f1_re, f1_im, tw_re, tw_im, f2t_re, f2t_im = _spectrum_factors(
        n_in, n_out, n2, shifted, ortho
    )

    pad_b = (-b) % v_tile
    if pad_b:
        xr = jnp.pad(xr, ((0, pad_b), (0, 0)))
        xi = jnp.pad(xi, ((0, pad_b), (0, 0)))
    b_pad = b + pad_b
    grid = (b_pad // v_tile,)

    if window is not None:
        w2 = window.reshape(n1_in, n2).astype(jnp.float32)
    else:
        w2 = jnp.ones((n1_in, n2), jnp.float32)

    if pre_relayout:
        # One fused XLA pass: window multiply + (v, j1, j2) -> (j1, (v, j2))
        # transpose over HBM; the kernel reads the panel directly.
        xr_p = (
            (xr.reshape(b_pad, n1_in, n2) * w2[None])
            .transpose(1, 0, 2)
            .reshape(n1_in, b_pad * n2)
        )
        xi_p = (
            (xi.reshape(b_pad, n1_in, n2) * w2[None])
            .transpose(1, 0, 2)
            .reshape(n1_in, b_pad * n2)
        )
    else:
        # Natural layout in, FREE reshape only — the (v, j1, j2) -> (j1,
        # (v, j2)) relayout happens inside the kernel with slice copies,
        # saving a full XLA transpose pass over HBM (and the window
        # multiply rides it).
        xr_p = xr.reshape(b_pad, n1_in, n2)
        xi_p = xi.reshape(b_pad, n1_in, n2)

    kernel = functools.partial(
        _spectrum_kernel, n1=n1, n2=n2, v_tile=v_tile, s2=s2,
        pre_panel=pre_relayout, with_maxmag=with_maxmag,
        precision=precision,
    )

    lanes = v_tile * n2

    if s2 == "stacked":
        out_spec = pl.BlockSpec(
            (n2, v_tile * n1), lambda i: (0, i), memory_space=pltpu.VMEM
        )
        out_shape = jax.ShapeDtypeStruct((n2, b_pad * n1), jnp.float32)
    else:
        out_spec = pl.BlockSpec(
            (v_tile * n2, n1), lambda i: (i, 0), memory_space=pltpu.VMEM
        )
        out_shape = jax.ShapeDtypeStruct((b_pad * n2, n1), jnp.float32)

    if pre_relayout:
        x_specs = [
            pl.BlockSpec(
                (n1_in, lanes), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (n1_in, lanes), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
        ]
        input_scratch = []
    else:
        x_specs = [
            pl.BlockSpec(
                (v_tile, n1_in, n2), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (v_tile, n1_in, n2), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ]
        input_scratch = [
            pltpu.VMEM((n1_in, lanes), jnp.float32),
            pltpu.VMEM((n1_in, lanes), jnp.float32),
        ]
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=x_specs
        + [
            pl.BlockSpec((n1_in, n2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n1, n1_in), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n1, n1_in), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n1, n2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n1, n2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n2, n2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n2, n2), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[out_spec, out_spec]
        + (
            [
                # (1, 8, Vt) blocks: the trailing two dims satisfy Mosaic's
                # (8-divisible, 128-divisible-or-equal) rule; the 8 sublane
                # rows all carry the same value and row 0 is consumed.
                pl.BlockSpec(
                    (1, 8, v_tile), lambda i: (i, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 8, v_tile), lambda i: (i, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ]
            if with_maxmag
            else []
        ),
        out_shape=[out_shape, out_shape]
        + (
            [
                jax.ShapeDtypeStruct((grid[0], 8, v_tile), jnp.float32),
                jax.ShapeDtypeStruct((grid[0], 8, v_tile), jnp.int32),
            ]
            if with_maxmag
            else []
        ),
        # The stage-2 relayout scratch only exists on the stacked paths —
        # the loop path would waste 2 * Vt*n1*n2 floats of VMEM otherwise.
        scratch_shapes=input_scratch
        + (
            [
                pltpu.VMEM((v_tile * n1, n2), jnp.float32),
                pltpu.VMEM((v_tile * n1, n2), jnp.float32),
            ]
            if s2 in ("stacked", "stacked2")
            else []
        ),
        # Mosaic's default scoped-VMEM budget is 16 MB; the stacked paths'
        # unrolled relayout loops account above it at large tiles even
        # though the declared buffers are far smaller.
        compiler_params=(
            pltpu.CompilerParams(
                vmem_limit_bytes=vmem_limit_mb * 1024 * 1024
            )
            if vmem_limit_mb
            else None
        ),
        interpret=interpret,
    )(
        xr_p,
        xi_p,
        w2,
        jnp.asarray(f1_re),
        jnp.asarray(f1_im),
        jnp.asarray(tw_re),
        jnp.asarray(tw_im),
        jnp.asarray(f2t_re),
        jnp.asarray(f2t_im),
    )
    ore, oim = outs[0], outs[1]

    if s2 == "stacked":
        # Output digit reversal in XLA: (k2, (v, k1)) -> (v, k2*n1 + k1)
        out_re = (
            ore.reshape(n2, b_pad, n1)
            .transpose(1, 0, 2)
            .reshape(b_pad, n_out)[:b]
        )
        out_im = (
            oim.reshape(n2, b_pad, n1)
            .transpose(1, 0, 2)
            .reshape(b_pad, n_out)[:b]
        )
    elif stacked_out:
        # Keep the kernel's native ((v, k2), k1) layout: the leading-dim
        # split below is tiling-preserving (32 sublane rows = 4 whole
        # (8, 128) tiles per voxel either way), so no relayout pass runs.
        out_re = ore.reshape(b_pad, n2, n1)[:b]
        out_im = oim.reshape(b_pad, n2, n1)[:b]
    else:
        # Rows are (v, k2) with k1 on the lanes: k = k1 + n1*k2 preserves
        # the linear element order (no transpose), but the TILED layouts
        # differ (n1-lane rows vs dense n_out-lane rows) so XLA still pays
        # a relayout pass here; stacked_out=True is the way to skip it.
        out_re = ore.reshape(b_pad, n_out)[:b]
        out_im = oim.reshape(b_pad, n_out)[:b]
    tail = (n2, n1) if stacked_out else (n_out,)
    out_re = out_re.reshape(batch_shape + tail)
    out_im = out_im.reshape(batch_shape + tail)
    if with_maxmag:
        mv = outs[2][:, 0, :].reshape(b_pad)[:b].reshape(batch_shape)
        mi = outs[3][:, 0, :].reshape(b_pad)[:b].reshape(batch_shape)
        return out_re, out_im, mv, mi
    return out_re, out_im
