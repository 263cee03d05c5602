"""Fitting & simulation layer: Eq.6 simulator + batched AMARES LM fitter."""

from xmris_tpu.fitting.simulation import simulate_fid, simulate_fid_raw


def __getattr__(name):
    # Lazy import: the fitter pulls in the LM engine; keep base import light.
    if name in ("fit_amares", "stage_device_fids", "StagedFids"):
        from xmris_tpu.fitting import amares

        return getattr(amares, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


__all__ = [
    "StagedFids",
    "fit_amares",
    "simulate_fid",
    "simulate_fid_raw",
    "stage_device_fids",
]
