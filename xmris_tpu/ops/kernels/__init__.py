"""TPU kernel layer: planar-complex math and MXU matmul-DFT engines."""

from xmris_tpu.ops.kernels.dft import (
    dft_planar,
    fft_ortho_planar,
    ifft_ortho_planar,
    plan_dft,
)

__all__ = ["dft_planar", "fft_ortho_planar", "ifft_ortho_planar", "plan_dft"]
