"""Benchmark: full MRSI spectral pipeline on the BASELINE.json headline config.

Config 2 of BASELINE.md: 32x32x16 voxels, 2048-pt pipeline
(zero_fill -> apodize_exp -> ortho FFT -> fftshift -> ACME autophase) — the
reference chain ``da.xmr.zero_fill(...).xmr.apodize_exp(5).xmr.to_spectrum()
.xmr.autophase()`` compiled as ONE fused XLA program.

On accelerators the pipeline runs the **planar** engine: split real/imag
float32 planes with the FFT as MXU matmuls (no complex dtype on device —
fastest batched path and robust to backends with partial complex lowering).
On CPU it runs the complex engine.  Execution is witnessed by a scalar float
readback every iteration (async dispatch means block_until_ready alone is not
a reliable fence through remote-TPU relays).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
``vs_baseline`` = measured voxels/sec over the BASELINE target rate (16384
voxels in < 1 s on one v5e chip); > 1.0 beats the target.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from xmris_tpu.parallel.pipeline import PipelineConfig, spectral_pipeline_raw
from xmris_tpu.parallel.planar_pipeline import spectral_pipeline_planar_raw

GRID = (32, 32, 16)
N_TIME = 1024
ZERO_FILL = 2048
SW = 5000.0
TARGET_VOXELS_PER_S = 16384.0  # BASELINE: full grid in < 1 s


def make_inputs():
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
    weight = np.exp(-np.pi * 5.0 * t_full).astype(np.float32)
    freqs = np.fft.fftshift(np.fft.fftfreq(ZERO_FILL, d=1.0 / SW)).astype(np.float32)
    return fids.astype(np.complex64), weight, freqs


def run_planar(fids, weight, freqs, cfg, iters=5):
    re = jnp.asarray(np.ascontiguousarray(fids.real))
    im = jnp.asarray(np.ascontiguousarray(fids.imag))
    w = jnp.asarray(weight)
    f = jnp.asarray(freqs)

    @jax.jit
    def checksum(a, b):
        return jnp.sum(a) + jnp.sum(b)

    sr, si, _ = spectral_pipeline_planar_raw(re, im, w, f, cfg)
    float(checksum(sr, si))  # compile + execution witness

    times = []
    for _ in range(iters):
        start = time.perf_counter()
        sr, si, _ = spectral_pipeline_planar_raw(re, im, w, f, cfg)
        float(checksum(sr, si))
        times.append(time.perf_counter() - start)
    return float(np.median(times))


def run_complex(fids, weight, freqs, cfg, iters=5):
    fj = jnp.asarray(fids)
    w = jnp.asarray(weight)
    f = jnp.asarray(freqs)

    @jax.jit
    def checksum(a):
        return jnp.sum(jnp.real(a)) + jnp.sum(jnp.imag(a))

    spec, _ = spectral_pipeline_raw(fj, w, f, cfg)
    float(checksum(spec))

    times = []
    for _ in range(iters):
        start = time.perf_counter()
        spec, _ = spectral_pipeline_raw(fj, w, f, cfg)
        float(checksum(spec))
        times.append(time.perf_counter() - start)
    return float(np.median(times))


def main() -> None:
    fids, weight, freqs = make_inputs()
    cfg = PipelineConfig(zero_fill_to=ZERO_FILL, lb=5.0, autophase="single")

    backend = jax.default_backend()
    if backend == "cpu":
        elapsed = run_complex(fids, weight, freqs, cfg)
        engine = "complex"
    else:
        try:
            elapsed = run_planar(fids, weight, freqs, cfg)
            engine = "planar-mxu"
        except Exception:
            elapsed = run_complex(fids, weight, freqs, cfg)
            engine = "complex"

    n_voxels = int(np.prod(GRID))
    vox_per_s = n_voxels / elapsed

    print(
        json.dumps(
            {
                "metric": (
                    "MRSI voxels/sec (32x32x16, 2048-pt zero_fill+apodize+FFT+"
                    f"autophase; {engine} engine on {backend})"
                ),
                "value": round(vox_per_s, 1),
                "unit": "voxels/s",
                "vs_baseline": round(vox_per_s / TARGET_VOXELS_PER_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
