"""Token-level grammar: a byte-schema DFA projected onto a BPE vocabulary.

The byte DFA (ops/constrained.py) makes malformed JSON unreachable one byte
at a time; with a subword tokenizer each decode step emits a whole token, so
the grammar must answer, per state, "which TOKENS keep the automaton alive?"
A dense next_state[S, V] is infeasible at real vocab sizes (6k states x 152k
tokens x 4 B ≈ 3.6 GB), but the problem factors (design sketch carried in
ROADMAP.md from round 1):

  (a) MASK — a bitset ``allowed_bits[S, ceil(V/32)]`` (uint32) answers
      membership in one gather + bit test; ~6 MB at S≈6k, V≈8k and ~250 MB
      even at V≈152k. Precomputed on host by walking every token's bytes
      through the byte table, vectorized over (state, token) chunks.
  (b) ADVANCE — the decode loop only needs the successor of the ONE sampled
      token per row: walk its <= max_token_bytes byte columns through the
      byte table inside the loop (a handful of gathers, no table at all).
  (c) FAST-FORWARD — byte-level forced literal runs (the JSON skeleton)
      re-tokenize by greedy longest-match into token-level forced runs, so
      the engine's deterministic-speculation path works unchanged.

Training alignment: ``encode_aligned`` tokenizes text with merge-unit breaks
at every forced/free DFA boundary — the exact segmentation the decode loop
forces — so teacher-forced training never sees token boundaries the
constrained sampler cannot produce.

Replaces the reference's repair-after-the-fact JSON handling
(content_analyzer.py:1607-1996) for subword models, as the byte DFA does for
byte models.
"""

from __future__ import annotations

import hashlib
import os
from pathlib import Path

import jax.numpy as jnp
import numpy as np
from jax import lax

from ..models.bpe import BpeTokenizer
from .constrained import JsonDfa

__all__ = ["TokenGrammar"]

_NEG_INF = -1e30


class TokenGrammar:
    """Engine-facing grammar over a BPE vocab (same surface as JsonDfa)."""

    def __init__(
        self,
        dfa: JsonDfa,
        tokenizer: "BpeTokenizer | object",
        max_token_bytes: int = 16,
        cache_dir: str | Path | None = "./data/cache/grammar",
    ):
        # ``tokenizer`` may be any subword codec exposing the grammar
        # primitives: token_table / token_bytes / encode_bytes / EOS
        # (models/bpe.py self-trained, models/hf_tokenizer.py real vocabs).
        if tokenizer.vocab_size % 128:
            raise ValueError("BPE vocab must be a multiple of 128")
        self.dfa = dfa
        self.tokenizer = tokenizer
        self.start = dfa.start
        self.accept = dfa.accept
        self.max_token_bytes = max_token_bytes
        self.vocab_size = tokenizer.vocab_size

        self.token_cols, self.token_len = tokenizer.token_table(max_token_bytes)
        self.allowed_bits = self._compute_allowed_bits(cache_dir)

    # -- host precompute -------------------------------------------------------

    def _cache_key(self) -> str:
        h = hashlib.sha256()
        h.update(self.dfa.next_state.tobytes())
        h.update(self.token_cols.tobytes())
        return h.hexdigest()[:24]

    def _compute_allowed_bits(self, cache_dir) -> np.ndarray:
        if cache_dir is not None:
            cache_dir = Path(cache_dir)
            if not cache_dir.is_absolute():
                # Anchor at the repo root, not the cwd: tools run from
                # scratch dirs would otherwise re-pay the ~20 s (152k-vocab)
                # bitset precompute into a throwaway location.
                cache_dir = Path(__file__).resolve().parents[2] / cache_dir
            cache_path = cache_dir / f"bits_{self._cache_key()}.npz"
            if cache_path.exists():
                try:
                    return np.load(cache_path)["bits"]
                except Exception:
                    pass

        table = self.dfa.next_state  # [S, byte_vocab]
        num_states = table.shape[0]
        vocab = self.vocab_size
        words = (vocab + 31) // 32
        bits = np.zeros((num_states, words), np.uint32)
        states = np.arange(num_states, dtype=np.int32)

        chunk = 2048
        for v0 in range(0, vocab, chunk):
            cols = self.token_cols[v0 : v0 + chunk]  # [C, L]
            lens = self.token_len[v0 : v0 + chunk]  # [C]
            cur = np.repeat(states[:, None], cols.shape[0], axis=1)  # [S, C]
            for pos in range(self.max_token_bytes):
                active = (pos < lens)[None, :] & (cur >= 0)
                if not active.any():
                    break
                col = np.maximum(cols[:, pos], 0)[None, :]
                nxt = table[
                    np.maximum(cur, 0), np.broadcast_to(col, cur.shape)
                ]
                cur = np.where(active, nxt, cur)
            ok = (cur >= 0) & (lens > 0)[None, :]  # [S, C]
            token_ids = np.arange(v0, v0 + cols.shape[0])
            word_idx = token_ids // 32
            bit_val = (np.uint32(1) << (token_ids % 32).astype(np.uint32))
            for w in np.unique(word_idx):
                sel = word_idx == w
                bits[:, w] |= (ok[:, sel] * bit_val[sel][None, :]).astype(
                    np.uint32
                ).sum(axis=1, dtype=np.uint32)

        if cache_dir is not None:
            try:
                cache_path.parent.mkdir(parents=True, exist_ok=True)
                # Atomic publish: concurrent processes (e.g. pytest-xdist
                # workers) may compute the same key; writing in place could
                # leave a permanently torn file that every later load
                # rejects. Write to a per-process tmp name, then rename.
                tmp_path = cache_path.with_suffix(f".{os.getpid()}.tmp")
                with open(tmp_path, "wb") as fh:  # handle: np.savez would
                    np.savez_compressed(fh, bits=bits)  # append ".npz"
                os.replace(tmp_path, cache_path)
            except OSError:
                pass
        return bits

    # -- engine surface (mirrors JsonDfa) ---------------------------------------

    @property
    def num_states(self) -> int:
        return self.dfa.num_states

    def device_table(self) -> dict:
        return {
            "bits": jnp.asarray(self.allowed_bits),
            "byte_table": jnp.asarray(self.dfa.next_state),
            "token_cols": jnp.asarray(self.token_cols),
            "token_len": jnp.asarray(self.token_len),
        }

    @staticmethod
    def constrain(logits, state, tables):
        """Mask logits [B, V] via the bitset: one row gather + bit test."""
        vocab = logits.shape[-1]
        bits = tables["bits"][state]  # [B, W]
        token_ids = jnp.arange(vocab)
        sel = jnp.take(bits, token_ids // 32, axis=1)  # [B, V]
        allowed = (sel >> (token_ids % 32).astype(jnp.uint32)) & jnp.uint32(1)
        return jnp.where(allowed.astype(bool), logits, _NEG_INF)

    @staticmethod
    def advance(state, token, tables):
        """Successor state after emitting ``token``: walk its byte columns."""
        cols = tables["token_cols"][token]  # [B, L]
        lens = tables["token_len"][token]  # [B]
        byte_table = tables["byte_table"]
        max_bytes = cols.shape[1]

        def step(i, s):
            col = cols[:, i]
            nxt = byte_table[jnp.maximum(s, 0), jnp.maximum(col, 0)]
            take = (i < lens) & (s >= 0) & (col >= 0)
            return jnp.where(take, nxt, s)

        return lax.fori_loop(0, max_bytes, step, state)

    def forced_tables(
        self, max_run: int = 24
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Token-level forced runs: greedy re-tokenization of the byte runs.

        From any inter-token state, the byte DFA's forced literal run (JSON
        skeleton) is deterministic; emitting its longest-match BPE
        segmentation is one valid token path, so the engine appends it in a
        single decoder call exactly as with the byte grammar.
        """
        byte_len, byte_tok, _ = self.dfa.forced_tables(
            max_run=max_run * self.max_token_bytes
        )
        num_states = self.dfa.num_states
        forced_len = np.zeros((num_states,), np.int32)
        forced_tokens = np.zeros((num_states, max_run), np.int32)
        forced_end = np.arange(num_states, dtype=np.int32)

        table = self.dfa.next_state
        for s in range(num_states):
            n = int(byte_len[s])
            if n == 0:
                continue
            run = bytes(int(b) for b in byte_tok[s, :n])
            tokens = self.tokenizer.encode_bytes(run)[:max_run]
            # End state = walk the bytes actually covered by kept tokens.
            cur = s
            count = 0
            for tok in tokens:
                for byte in self.tokenizer.token_bytes(tok):
                    cur = int(table[cur, byte])
                count += 1
            forced_len[s] = count
            forced_tokens[s, :count] = tokens
            forced_end[s] = cur
        return forced_len, forced_tokens, forced_end

    # -- training alignment ------------------------------------------------------

    def encode_aligned(self, text: str) -> list[int]:
        """Tokenize ``text`` with merge breaks at forced/free DFA boundaries.

        Walks the byte DFA over the text, splitting the byte stream wherever
        the automaton's "forcedness" (exactly one allowed byte) flips, then
        BPE-encodes each span as its own merge unit. This reproduces the
        segmentation the constrained decode loop enforces, keeping training
        and serving tokenizations identical. Raises ValueError if the text
        does not parse under the grammar.
        """
        table = self.dfa.next_state
        forced = (table >= 0).sum(axis=1) == 1
        data = text.encode("utf-8")
        ids: list[int] = []
        span: list[int] = []
        state = self.dfa.start
        span_forced = bool(forced[state])
        for byte in data:
            now_forced = bool(forced[state])
            if now_forced != span_forced and span:
                ids.extend(self.tokenizer.encode_bytes(bytes(span)))
                span = []
            span_forced = now_forced
            nxt = int(table[state, byte])
            if nxt < 0:
                raise ValueError(
                    f"text leaves the grammar at byte offset {len(ids)}"
                )
            span.append(byte)
            state = nxt
        if span:
            ids.extend(self.tokenizer.encode_bytes(bytes(span)))
        return ids
