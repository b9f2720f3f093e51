"""TPU ops: Pallas kernels and fused compute primitives."""

from .attention import flash_attention, mha_reference
from .norms import rms_norm
from .rotary import apply_rope, rope_angles

__all__ = [
    "flash_attention",
    "mha_reference",
    "rms_norm",
    "apply_rope",
    "rope_angles",
]
