"""Synthesize a Qwen2-scale byte-level-BPE ``tokenizer.json`` (zero egress).

The real deployment path loads an HF tokenizer.json next to the checkpoint
(models/hf_tokenizer.py, models/port.py) — but this image cannot download
one. The 152k-vocab serving chain (TokenGrammar bitset precompute at
S x 152,064, model-axis bitset sharding, constrained decode over the full
vocab, parallel/engine.py:_table_for) must still be exercised end-to-end at
REAL geometry, so this module writes a structurally valid stand-in with the
same scale and byte-length distribution as Qwen2's vocabulary:

- the 256 GPT-2 byte-alphabet tokens,
- ASCII subwords (letter-chain merges, JSON structural fragments),
- the full CJK range U+4E00..U+9FFF (two merges per character — prefix
  pair, then full 3-byte character), matching how CJK text actually
  tokenizes,
- CJK character bigrams (6-byte tokens) filling the remaining budget,
- ``<|endoftext|>`` / ``<|video_pad|>`` added specials.

Every merge references existing tokens and produces its concatenation, so
HfTokenizer's rank tables, byte walks, and greedy ``encode_bytes`` behave
exactly as with a trained file. Only the MAPPING is synthetic — which is
irrelevant to the grammar/engine machinery under test (the bitset cost and
decode behavior depend on vocab scale and token byte contents, not on
which corpus ranked the merges). Swap in the real tokenizer.json on a
deployment host with no code changes.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

__all__ = ["write_synth_qwen_vocab"]


def write_synth_qwen_vocab(
    path: str | Path,
    vocab_size: int = 152064,
    seed: int = 0,
) -> Path:
    """Write a synthetic byte-level-BPE tokenizer.json with ``vocab_size``
    total ids (regular vocab + specials). Returns ``path``.

    ``vocab_size`` must be a multiple of 128 (engine requirement) and at
    least ~22k so the full CJK single-character range fits.
    """
    from .hf_tokenizer import _bytes_to_unicode

    if vocab_size % 128:
        raise ValueError("vocab_size must be a multiple of 128")
    byte_char = _bytes_to_unicode()

    def chars(data: bytes) -> str:
        return "".join(byte_char[b] for b in data)

    vocab: dict[str, int] = {}
    merges: list[str] = []

    def add(token: str) -> None:
        if token not in vocab:
            vocab[token] = len(vocab)

    def merge(a: str, b: str) -> str:
        """Record merge a+b (both must exist) and add the merged token."""
        merged = a + b
        if merged not in vocab:
            merges.append(f"{a} {b}")
            add(merged)
        return merged

    # 1. Byte alphabet.
    for b in range(256):
        add(byte_char[b])

    specials = ["<|endoftext|>", "<|video_pad|>", "<|vision_start|>",
                "<|vision_end|>"]
    budget = vocab_size - len(specials)

    # 2. ASCII subwords: JSON structural fragments + letter chains.
    for frag in ('{"', '":', '",', '"}', '["', '"]', '...', '->',
                 ': "', ', "'):
        data = frag.encode()
        acc = chars(data[:1])
        for byte in data[1:]:
            acc = merge(acc, byte_char[byte])
    letters = "etaoinsrhldcumfpgwybvkxjqz"
    rng = np.random.default_rng(seed)
    ascii_budget = 2000
    made = 0
    stems = [chars(c.encode()) for c in letters]
    while made < ascii_budget and len(vocab) < budget:
        stem = stems[int(rng.integers(len(stems)))]
        nxt = letters[int(rng.integers(len(letters)))]
        merged = merge(stem, chars(nxt.encode()))
        if len(merged) <= 8:
            stems.append(merged)
        made += 1

    # 3. Full CJK single characters (U+4E00..U+9FFF): prefix-pair merge,
    #    then full character. ~21k chars, ~384 shared 2-byte prefixes.
    cjk_chars: list[str] = []
    for cp in range(0x4E00, 0xA000):
        if len(vocab) >= budget:
            break
        data = chr(cp).encode("utf-8")  # 3 bytes
        prefix = merge(chars(data[:1]), chars(data[1:2]))
        full = merge(prefix, chars(data[2:3]))
        cjk_chars.append(full)

    # 4. CJK bigrams fill the remaining budget (the bulk, as in real
    #    CJK-heavy vocabularies).
    n_chars = len(cjk_chars)
    while len(vocab) < budget:
        a = cjk_chars[int(rng.integers(n_chars))]
        b = cjk_chars[int(rng.integers(n_chars))]
        merge(a, b)

    added = [
        {"content": tok, "id": len(vocab) + i, "special": True}
        for i, tok in enumerate(specials)
    ]
    payload = {
        "version": "1.0",
        "model": {"type": "BPE", "vocab": vocab, "merges": merges},
        "added_tokens": added,
    }
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(json.dumps(payload, ensure_ascii=False), encoding="utf-8")
    return path
