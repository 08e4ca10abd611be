"""Model zoo (flax.linen, NHWC, bf16-capable).

Capability parity with reference ``opencood/models``: heterogeneous
encoders, BEV backbones, fusion modules, detection heads, and the HEAL
pyramid models — re-designed as pure-functional modules over parameter
pytrees (stage freezing = optax masking, checkpoint merge = pytree union).
"""
from . import registry
from .registry import build_model, register_model

__all__ = ["build_model", "register_model", "registry"]
