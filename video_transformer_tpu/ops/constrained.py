"""Constrained JSON decoding: schema -> byte-level DFA -> logit masks.

The reference spends ~400 lines repairing malformed cloud-LLM JSON
(content_analyzer.py:1607-1996: escape fixes, truncation closing, LLM repair
passes). The TPU-native design makes malformed JSON impossible instead: the
output schema is compiled into a deterministic finite automaton over the byte
vocabulary, and each decode step masks logits to the DFA's allowed
transitions. The DFA is one dense device array — ``next_state[S, V]`` — so
enforcement inside the jitted decode loop is a single gather per step:
grammar-as-arrays, no host round-trips, no dynamic control flow.

States are cheap: literal runs contribute one state per byte, free-text
fields one state per length position (enforcing min/max lengths exactly).
Lists and dicts loop: the state after ", " aliases the first item's entry
row, so item count is model-chosen while structure stays valid.

Free text is restricted to printable ASCII minus '"' and '\\' (JSON-safe
with no escape handling). A UTF-8 continuation-state extension can widen
this to full Unicode for trained multilingual models.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..models.tokenizer import ByteTokenizer

__all__ = ["JsonDfa", "DfaBuilder", "constrain_logits", "advance_state"]

_FREE_BYTES = tuple(b for b in range(0x20, 0x7F) if b not in (0x22, 0x5C))
_DIGIT_BYTES = tuple(range(0x30, 0x3A))
# UTF-8 extension for free text: 2-byte leads (Latin/Greek/Cyrillic) and the
# 3-byte leads covering the CJK Unified Ideographs plane (0xE4-0xE9 -> all
# continuations land in U+4000-U+9FFF; always valid scalar values).
_LEAD2_BYTES = tuple(range(0xC2, 0xE0))
_LEAD3_BYTES = tuple(range(0xE4, 0xEA))
_CONT_BYTES = tuple(range(0x80, 0xC0))


@dataclass(frozen=True)
class JsonDfa:
    """Compiled schema automaton.

    ``next_state[s, v]`` is the successor of state s on token v, or -1 when v
    is not allowed. ``accept`` permits only EOS (self-loop), so
    ``state == accept`` doubles as the done flag in the decode loop.
    """

    next_state: np.ndarray  # int32 [num_states, vocab]
    start: int
    accept: int

    @property
    def num_states(self) -> int:
        return self.next_state.shape[0]

    def device_table(self) -> jax.Array:
        return jnp.asarray(self.next_state)

    # Uniform grammar surface shared with ops.token_grammar.TokenGrammar so
    # the engine is agnostic to byte-level vs token-level enforcement.
    @staticmethod
    def constrain(logits: jax.Array, state: jax.Array, table) -> jax.Array:
        return constrain_logits(logits, state, table)

    @staticmethod
    def advance(state: jax.Array, token: jax.Array, table) -> jax.Array:
        return advance_state(state, token, table)

    def forced_tables(
        self, max_run: int = 24
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Grammar fast-forward tables: per-state forced literal runs.

        A state with exactly one allowed token "forces" that token; chains of
        forced states are the JSON skeleton's literals (keys, punctuation).
        Returns (forced_len [S], forced_tokens [S, max_run], forced_end [S]):
        starting at s, the next forced_len[s] tokens are forced_tokens[s, :],
        after which the automaton sits at forced_end[s]. The decode loop can
        therefore append an entire literal run in ONE decoder call — the
        model never needs to be consulted for tokens it cannot influence
        (deterministic speculation, zero misprediction).

        EOS is never included in a run (the loop handles termination).
        """
        num_states, _ = self.next_state.shape
        allowed_counts = (self.next_state >= 0).sum(axis=1)
        single = allowed_counts == 1
        # The single allowed token per forcing state (0 where not forcing).
        single_token = np.where(single, np.argmax(self.next_state >= 0, axis=1), 0)

        forced_len = np.zeros((num_states,), np.int32)
        forced_tokens = np.zeros((num_states, max_run), np.int32)
        forced_end = np.arange(num_states, dtype=np.int32)

        for s in range(num_states):
            cur = s
            run: list[int] = []
            while (
                len(run) < max_run
                and single[cur]
                and cur != self.accept
            ):
                token = int(single_token[cur])
                if token >= 256:  # specials (EOS) end the run
                    break
                run.append(token)
                cur = int(self.next_state[cur, token])
            forced_len[s] = len(run)
            forced_tokens[s, : len(run)] = run
            forced_end[s] = cur
        return forced_len, forced_tokens, forced_end


class DfaBuilder:
    """Imperative left-to-right DFA builder.

    Every method extends the automaton from the current frontier state and
    returns self for chaining.
    """

    def __init__(
        self,
        tokenizer: ByteTokenizer | None = None,
        unicode_text: bool = False,
    ):
        self.tokenizer = tokenizer or ByteTokenizer()
        self.vocab = self.tokenizer.vocab_size
        self.unicode_text = unicode_text
        self._rows: list[np.ndarray] = []
        self.state = self._new_state()

    # -- low-level -----------------------------------------------------------

    def _new_state(self) -> int:
        self._rows.append(np.full((self.vocab,), -1, dtype=np.int32))
        return len(self._rows) - 1

    def _link(self, src: int, token: int, dst: int) -> None:
        self._rows[src][token] = dst

    # -- primitives ----------------------------------------------------------

    def literal(self, text: str) -> "DfaBuilder":
        """Forced byte-exact literal run."""
        for byte in text.encode("utf-8"):
            nxt = self._new_state()
            self._link(self.state, byte, nxt)
            self.state = nxt
        return self

    def free_string(
        self, min_len: int = 1, max_len: int = 64, unicode: bool | None = None
    ) -> "DfaBuilder":
        """Quoted free-text field '"..."' with content length in [min, max].

        Lengths are in BYTES. With ``unicode=True`` the field also admits
        well-formed 2-byte UTF-8 and 3-byte CJK sequences (lead bytes only
        where the full sequence fits the remaining budget), so trained
        models can emit Chinese while malformed byte sequences stay
        impossible.
        """
        if unicode is None:
            unicode = self.unicode_text
        self.literal('"')
        exit_state = self._new_state()
        positions = [self.state] + [self._new_state() for _ in range(max_len)]
        for i in range(max_len):
            for byte in _FREE_BYTES:
                self._link(positions[i], byte, positions[i + 1])
        if unicode:
            for i in range(max_len):
                if i + 2 <= max_len:
                    cont = self._new_state()
                    for byte in _LEAD2_BYTES:
                        self._link(positions[i], byte, cont)
                    for byte in _CONT_BYTES:
                        self._link(cont, byte, positions[i + 2])
                if i + 3 <= max_len:
                    cont_a = self._new_state()
                    cont_b = self._new_state()
                    for byte in _LEAD3_BYTES:
                        self._link(positions[i], byte, cont_a)
                    for byte in _CONT_BYTES:
                        self._link(cont_a, byte, cont_b)
                        self._link(cont_b, byte, positions[i + 3])
        for i in range(min_len, max_len + 1):
            self._link(positions[i], 0x22, exit_state)
        self.state = exit_state
        return self

    def quoted_pattern(self, alphabets: list[tuple[int, ...]]) -> "DfaBuilder":
        """Quoted fixed-length field; position i draws from alphabets[i]."""
        self.literal('"')
        for alphabet in alphabets:
            nxt = self._new_state()
            for byte in alphabet:
                self._link(self.state, byte, nxt)
            self.state = nxt
        return self.literal('"')

    def timecode(self) -> "DfaBuilder":
        """Quoted "MM:SS" clock value (parsed by contracts.timefmt)."""
        d = _DIGIT_BYTES
        colon = (0x3A,)
        return self.quoted_pattern([d, d, colon, d, d])

    def choice(self, options: list[str]) -> "DfaBuilder":
        """One of several literal alternatives (e.g. true / false).

        Options must not be prefixes of each other and must differ in their
        first byte (sufficient for JSON keyword sets).
        """
        firsts = [o.encode("utf-8")[0] for o in options]
        if len(set(firsts)) != len(firsts):
            raise ValueError("choice options must differ in first byte")
        entry = self.state
        exit_state = self._new_state()
        for option in options:
            data = option.encode("utf-8")
            self.state = entry
            for byte in data[:-1]:
                nxt = self._new_state()
                self._link(self.state, byte, nxt)
                self.state = nxt
            self._link(self.state, data[-1], exit_state)
        self.state = exit_state
        return self

    # -- composites ----------------------------------------------------------

    def loop_list(
        self,
        build_item: Callable[["DfaBuilder"], None],
        opener: str = "[",
        closer: str = "]",
    ) -> "DfaBuilder":
        """``opener item (', ' item)* closer`` with >= 1 items.

        The state after ", " aliases the first item's entry row, forming the
        loop without duplicating item states.
        """
        self.literal(opener)
        entry = self.state
        build_item(self)
        after = self.state

        exit_state = self._new_state()
        comma = self._new_state()
        space = self._new_state()
        self._link(after, ord(closer), exit_state)
        self._link(after, ord(","), comma)
        self._link(comma, ord(" "), space)
        # Alias: continuing after ", " behaves exactly like the first entry.
        self._rows[space][:] = self._rows[entry]
        self.state = exit_state
        return self

    def string_list(self, item_min: int = 1, item_max: int = 64) -> "DfaBuilder":
        return self.loop_list(
            lambda b: b.free_string(item_min, item_max)
        )

    def string_dict(
        self,
        key_min: int = 1,
        key_max: int = 32,
        val_min: int = 1,
        val_max: int = 96,
    ) -> "DfaBuilder":
        """'{"key": "value", ...}' with >= 1 entries."""
        return self.loop_list(
            lambda b: b.free_string(key_min, key_max)
            .literal(": ")
            .free_string(val_min, val_max),
            opener="{",
            closer="}",
        )

    def finish(self) -> JsonDfa:
        """Terminate: frontier allows only EOS; accept self-loops on EOS."""
        accept = self._new_state()
        self._link(self.state, self.tokenizer.EOS, accept)
        self._link(accept, self.tokenizer.EOS, accept)
        return JsonDfa(
            next_state=np.stack(self._rows, axis=0), start=0, accept=accept
        )


def constrain_logits(
    logits: jax.Array, state: jax.Array, table: jax.Array
) -> jax.Array:
    """Mask logits [B, V] to DFA-allowed tokens for states [B]."""
    rows = table[state]
    return jnp.where(rows >= 0, logits, -1e30)


def advance_state(state: jax.Array, token: jax.Array, table: jax.Array) -> jax.Array:
    """DFA step after sampling: state' = next_state[state, token]."""
    return table[state, token]
