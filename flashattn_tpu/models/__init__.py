"""Model families served by the attention engine.

The reference is consumed by Stable Diffusion U-Nets (ComfyUI/sd-webui,
README.md:31-37) and benchmarked at SD1.5/SDXL shapes; its north star adds an
LLM path. This package provides both: an SD-style latent U-Net
(models/unet.py, models/diffusion.py) and a GQA transformer LM
(models/transformer.py) with sharded training and KV-cache decode.
"""

from flashattn_tpu.models.transformer import (
    TransformerConfig,
    init_transformer,
    transformer_forward,
)
from flashattn_tpu.models.unet import UNetConfig, init_unet, unet_forward

__all__ = [
    "TransformerConfig",
    "init_transformer",
    "transformer_forward",
    "UNetConfig",
    "init_unet",
    "unet_forward",
]
