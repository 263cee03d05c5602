"""Cartesian k-space reconstruction: centered iFFT + RSS coil combine.

BASELINE config 3: 8-coil 256x256 centered inverse FFT with
root-sum-of-squares coil combination.  Built from the same centered-transform
machinery as the spectral path (``ops.fourier.ifftc``) plus a coil reduction;
the raw core compiles to a single XLA program and shards over the coil or
phase-encode axis on a mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from xmris_tpu.core.array import XmrArray, get_namespace
from xmris_tpu.core.config import DIMS
from xmris_tpu.core.utils import _check_dims
from xmris_tpu.ops.fourier import ifftc


@functools.partial(jax.jit, static_argnames=("axes", "coil_axis"))
def rss_reconstruct_raw(kspace, axes: tuple[int, ...], coil_axis: int):
    """Centered N-D iFFT over ``axes`` + RSS magnitude combine over
    ``coil_axis``, as one fused program."""
    shifted = jnp.fft.ifftshift(kspace, axes=axes)
    img = jnp.fft.ifftn(shifted, axes=axes, norm="ortho")
    img = jnp.fft.fftshift(img, axes=axes)
    return jnp.sqrt(jnp.sum(jnp.real(img * jnp.conj(img)), axis=coil_axis))


@functools.partial(jax.jit, static_argnames=("axes", "coil_axis"))
def rss_reconstruct_planar_raw(k_re, k_im, axes: tuple[int, ...], coil_axis: int):
    """Planar (split real/imag) Cartesian recon: the TPU execution path.

    Applies the centered inverse DFT axis by axis as MXU matmuls
    (:func:`xmris_tpu.ops.kernels.dft.dft_planar`) — no complex dtype on
    device — then combines coils by root-sum-of-squares.
    """
    from xmris_tpu.ops.kernels.dft import dft_planar

    ndim = k_re.ndim
    axes = tuple(a % ndim for a in axes)
    re = jnp.fft.ifftshift(k_re, axes=axes)
    im = jnp.fft.ifftshift(k_im, axes=axes)
    for ax in axes:
        re = jnp.moveaxis(re, ax, -1)
        im = jnp.moveaxis(im, ax, -1)
        re, im = dft_planar(re, im, re.shape[-1], inverse=True, ortho=True)
        re = jnp.moveaxis(re, -1, ax)
        im = jnp.moveaxis(im, -1, ax)
    re = jnp.fft.fftshift(re, axes=axes)
    im = jnp.fft.fftshift(im, axes=axes)
    return jnp.sqrt(jnp.sum(re * re + im * im, axis=coil_axis))


def kspace_to_image(
    da: XmrArray,
    dims: list[str] | None = None,
    out_dims: list[str] | None = None,
) -> XmrArray:
    """Centered inverse FFT of Cartesian k-space dims (default kx/ky/kz
    present in the array), renaming to image-space dims (x/y/z)."""
    if dims is None:
        dims = [d for d in (DIMS.kx, DIMS.ky, DIMS.kz) if d in da.dims]
        if not dims:
            raise ValueError(
                "No k-space dimensions (kx/ky/kz) found; pass `dims` explicitly."
            )
    if out_dims is None:
        k2im = {DIMS.kx: DIMS.x, DIMS.ky: DIMS.y, DIMS.kz: DIMS.z}
        out_dims = [k2im.get(d, d) for d in dims]
    _check_dims(da, dims, "kspace_to_image")
    return ifftc(da, dim=dims, out_dim=out_dims)


def rss_combine(da: XmrArray, dim: str = DIMS.coil) -> XmrArray:
    """Root-sum-of-squares magnitude combination over the coil dimension."""
    _check_dims(da, dim, "rss_combine")
    xp = get_namespace(da.data)
    ax = da.get_axis_num(dim)
    mag2 = xp.real(da.data * xp.conj(da.data))
    out_data = xp.sqrt(xp.sum(mag2, axis=ax))
    new_dims = tuple(d for d in da.dims if d != dim)
    out = XmrArray(out_data, dims=new_dims, attrs=da.attrs, name=da.name)
    out.coords = {k: c.copy() for k, c in da.coords.items() if c.dim != dim}
    out.attrs["coil_combine"] = "rss"
    return out


def rss_reconstruct(
    da: XmrArray,
    dims: list[str] | None = None,
    coil_dim: str = DIMS.coil,
) -> XmrArray:
    """Full Cartesian recon: centered iFFT + RSS coil combine (labeled)."""
    img = kspace_to_image(da, dims=dims)
    return rss_combine(img, dim=coil_dim)
