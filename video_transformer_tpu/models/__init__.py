"""JAX/Flax model stack: video ViT encoder + decoder-only LM = VideoLM."""

from .config import DecoderConfig, EncoderConfig, VLMConfig, get_preset
from .tokenizer import ByteTokenizer

__all__ = [
    "VLMConfig",
    "EncoderConfig",
    "DecoderConfig",
    "get_preset",
    "ByteTokenizer",
]
