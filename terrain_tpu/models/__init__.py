"""Model factories (the reference's architectures/ package, rebuilt NHWC).

Architectures are injected into the trainer as factory functions + kwargs
dicts, preserving the reference idiom (pix2pix.py:25-28, 73-77).
"""

from terrain_tpu.models import dcgan, unet
from terrain_tpu.models.core import Network, describe, param_count

# p2p alias keeps the reference module naming (`from architectures import p2p`)
p2p = unet

__all__ = ["dcgan", "unet", "p2p", "Network", "param_count", "describe"]
