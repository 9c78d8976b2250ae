"""Framework integrations — drop-in hooks for existing JAX model codebases.

Role parity: the reference's headline use is *minimal integration* into
existing model code (ComfyUI / sd-webui attention layers, reference
README.md:6-15, 31-37). The JAX-ecosystem equivalent of "patch the SDPA
call" is flax.linen's ``attention_fn`` hook, provided here.
"""

from flashattn_tpu.integrations.flax_linen import (
    FlashMultiHeadDotProductAttention,
    flash_attention_fn,
    make_flash_attention_fn,
)

__all__ = [
    "FlashMultiHeadDotProductAttention",
    "flash_attention_fn",
    "make_flash_attention_fn",
]
