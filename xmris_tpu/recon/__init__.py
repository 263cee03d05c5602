"""Image reconstruction: Cartesian k-space -> image space."""

from xmris_tpu.recon.kspace import kspace_to_image, rss_combine, rss_reconstruct
from xmris_tpu.recon.sense import (
    estimate_sensitivities,
    sense_combine,
    sense_reconstruct,
)

__all__ = [
    "kspace_to_image",
    "rss_combine",
    "rss_reconstruct",
    "estimate_sensitivities",
    "sense_combine",
    "sense_reconstruct",
]
