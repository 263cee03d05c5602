"""Benchmark: full MRSI spectral pipeline on the BASELINE.json headline config.

Config 2 of BASELINE.md: 32x32x16 voxels, 2048-pt pipeline
(zero_fill -> apodize_exp -> ortho FFT -> fftshift -> ACME autophase), i.e.
the reference chain ``da.xmr.zero_fill(...).xmr.apodize_exp(5).xmr.to_spectrum()
.xmr.autophase()`` compiled as one fused XLA program on device.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is measured voxels/sec divided by the BASELINE target rate
(16384 voxels in < 1 s on one v5e chip => 16384 vox/s), so > 1.0 beats the
target.  Runs on whatever jax's default backend is (the real TPU chip under
the driver; CPU locally with JAX_PLATFORMS=cpu).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from xmris_tpu.parallel.pipeline import PipelineConfig, spectral_pipeline_raw

GRID = (32, 32, 16)
N_TIME = 1024
ZERO_FILL = 2048
SW = 5000.0
TARGET_VOXELS_PER_S = 16384.0  # BASELINE: full grid in < 1 s


def make_inputs(dtype=jnp.complex64):
    n_voxels = int(np.prod(GRID))
    rng = np.random.default_rng(0)
    t = np.arange(N_TIME) / SW
    freqs_hz = rng.uniform(-2000, 2000, size=n_voxels)
    amps = rng.uniform(1.0, 10.0, size=n_voxels)
    fids = amps[:, None] * np.exp(
        (1j * 2 * np.pi * freqs_hz[:, None] - 30.0) * t[None, :]
    )
    fids += rng.normal(0, 1e-3, fids.shape) + 1j * rng.normal(0, 1e-3, fids.shape)

    t_full = np.arange(ZERO_FILL) / SW
    weight = np.exp(-np.pi * 5.0 * t_full)
    freqs = np.fft.fftshift(np.fft.fftfreq(ZERO_FILL, d=1.0 / SW))

    real = jnp.float32 if dtype == jnp.complex64 else jnp.float64
    return (
        jnp.asarray(fids, dtype=dtype),
        jnp.asarray(weight, dtype=real),
        jnp.asarray(freqs, dtype=real),
    )


def main() -> None:
    fids, weight, freqs = make_inputs()
    cfg = PipelineConfig(zero_fill_to=ZERO_FILL, lb=5.0, autophase="single")

    # Execution witness: a scalar float readback forces the full computation
    # to finish (block_until_ready alone is not a reliable fence through the
    # remote-TPU relay, and complex host readback is unsupported there).
    @jax.jit
    def checksum(a):
        return jnp.sum(jnp.real(a)) + jnp.sum(jnp.imag(a))

    # Warmup / compile
    spec, _ = spectral_pipeline_raw(fids, weight, freqs, cfg)
    float(checksum(spec))

    times = []
    for _ in range(5):
        start = time.perf_counter()
        spec, _ = spectral_pipeline_raw(fids, weight, freqs, cfg)
        float(checksum(spec))
        times.append(time.perf_counter() - start)

    elapsed = float(np.median(times))
    n_voxels = int(np.prod(GRID))
    vox_per_s = n_voxels / elapsed

    print(
        json.dumps(
            {
                "metric": "MRSI voxels/sec (32x32x16, 2048-pt zero_fill+apodize+FFT+autophase)",
                "value": round(vox_per_s, 1),
                "unit": "voxels/s",
                "vs_baseline": round(vox_per_s / TARGET_VOXELS_PER_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
