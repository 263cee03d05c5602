"""Spectral lineshape model families (Lorentzian / Gaussian / Voigt, AMARES Eq.6)."""

from xmris_tpu.models.lineshapes import eq6_fid, eq6_fid_multi

__all__ = ["eq6_fid", "eq6_fid_multi"]
