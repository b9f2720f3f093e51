"""JAX/Flax model stack: video ViT encoder + decoder-only LM = VideoLM."""

from .bpe import BpeTokenizer, train_bpe
from .config import DecoderConfig, EncoderConfig, VLMConfig, get_preset
from .tokenizer import ByteTokenizer

__all__ = [
    "VLMConfig",
    "EncoderConfig",
    "DecoderConfig",
    "get_preset",
    "ByteTokenizer",
    "BpeTokenizer",
    "train_bpe",
]
