"""Continuous batching: requests join and leave the decode loop mid-flight.

The batch-mode engine (parallel/engine.py) runs one compiled while_loop
until EVERY row finishes — fine for segment batches of one video, wasteful
for a serving runtime where requests arrive continuously and finish at
different lengths. This scheduler keeps a fixed pool of SLOTS resident on
device (KV cache, grammar state, output buffer) and interleaves two
compiled programs:

  prefill_slot(request) -> writes one request's video+prompt KV into its
                           slot rows (dynamic batch-index update)
  decode_chunk(carry)   -> K grammar-constrained decode iterations over ALL
                           slots at once (done slots frozen per row)

Between chunks the host harvests finished slots, emits their notes, and
refills them with queued requests — arrival-to-first-token latency is
bounded by one chunk, and the decode matmuls always run at full pool width
regardless of individual request lengths. Device buffers are donated across
calls, so the pool never copies.

This is the TPU analog of vLLM-style continuous batching with the grammar
as the stopping criterion; all shapes are static (slot count, cache bucket,
prompt bucket) so everything compiles once.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..models.lm import init_kv_cache
from ..models.vlm import VideoLM
from .mesh import DATA_AXIS, MODEL_AXIS

__all__ = ["ContinuousBatcher", "Request", "Completion"]


def _round_up(x: int, multiple: int) -> int:
    return ((x + multiple - 1) // multiple) * multiple


@dataclass
class Request:
    request_id: int
    frames: np.ndarray  # uint8 [T, H, W, 3]
    prompt: str
    priority: int = 0  # higher drains first; FIFO within a priority level


@dataclass
class Completion:
    request_id: int
    text: str
    tokens: int
    complete: bool  # grammar accepted (False = token budget exhausted)
    first_token_s: float = 0.0  # submit -> first decode chunk containing it
    token_ids: list[int] = field(default_factory=list)
    """Raw generated ids — the exact-continuation input for incomplete
    rows (re-encoding text can shift BPE boundaries; engine.generate
    accepts these as prefixes)."""


@dataclass
class _Slot:
    request_id: int | None = None
    started: float = 0.0
    first_token_at: float = 0.0  # 0 until the slot's first decode chunk


@dataclass
class ContinuousBatcher:
    """Fixed-slot continuous scheduler over an InferenceEngine's model.

    Scheduling refinements over the plain fixed-chunk loop:

    - **Priority queue**: requests drain highest ``Request.priority`` first
      (FIFO within a level) — latency-sensitive traffic overtakes batch
      backfill at the next refill boundary.
    - **Adaptive chunk sizing**: the decode program takes its step count as
      a TRACED argument (one compile covers every size). While requests
      wait in the queue the scheduler runs short chunks (``latency_steps``)
      so finished slots are harvested and refilled quickly; with no queue
      it runs full ``chunk_steps`` chunks to amortize host round-trips.
    - **Early exit**: the on-device loop stops as soon as every slot is
      done, so a chunk never burns iterations decoding frozen rows.
    """

    engine: Any  # InferenceEngine (params, model, tokenizer, dfa, mesh)
    slots: int = 4
    prompt_len: int = 256
    chunk_steps: int = 64
    latency_steps: int = 8
    max_new_tokens: int | None = None

    _slots: list[_Slot] = field(default_factory=list)
    _queue: list[tuple[int, int, Request]] = field(default_factory=list)
    _submit_seq: int = 0
    _submit_time: dict[int, float] = field(default_factory=dict)

    def __post_init__(self):
        engine = self.engine
        cfg = engine.config
        self.max_new = self.max_new_tokens or engine.max_new_tokens
        self.dfa = engine.dfa
        self.table = engine._table_for(self.dfa)
        if self.dfa is not None:
            f_len, f_tok, f_end = self.dfa.forced_tables(
                max_run=engine.max_forced_run
            )
            self._forced = tuple(jnp.asarray(a) for a in (f_len, f_tok, f_end))
            self.block_width = 1 + engine.max_forced_run
        else:
            self._forced = None
            self.block_width = 1

        # + block_width + 16: tail slack for the fused decode kernel's
        # aligned in-place row writes (see engine._build_generate).
        self.cache_len = _round_up(
            cfg.video_tokens + self.prompt_len + self.max_new
            + 2 * self.block_width + 17,
            128,
        )
        if self.cache_len > cfg.decoder.max_seq_len:
            raise ValueError("slot cache exceeds max_seq_len")
        self.out_width = self.max_new + 2 * self.block_width
        self._slots = [_Slot() for _ in range(self.slots)]
        self._init_device_state()
        self._prefill = self._build_prefill()
        self._decode = self._build_decode()
        self._rng = jax.random.PRNGKey(7)

    # -- device state -----------------------------------------------------------

    def _init_device_state(self):
        engine = self.engine
        cfg = engine.config
        dtype = jnp.dtype(cfg.dtype)
        mesh = engine.mesh
        data_sharding = NamedSharding(mesh, P(DATA_AXIS))
        cache = init_kv_cache(cfg.decoder, self.slots, self.cache_len, dtype)
        model_axis = mesh.shape[MODEL_AXIS]
        if model_axis > 1 and cfg.decoder.num_kv_heads % model_axis == 0:
            kv_spec = P(DATA_AXIS, MODEL_AXIS)
        else:
            kv_spec = P(DATA_AXIS)
        kv_sharding = NamedSharding(mesh, kv_spec)
        self.cache = {
            "k": [jax.device_put(layer, kv_sharding) for layer in cache["k"]],
            "v": [jax.device_put(layer, kv_sharding) for layer in cache["v"]],
            "index": jax.device_put(cache["index"], data_sharding),
        }
        start = self.dfa.start if self.dfa else 0
        eos = engine.tokenizer.EOS
        self.state = jax.device_put(
            jnp.full((self.slots,), start, jnp.int32), data_sharding
        )
        self.logits = jax.device_put(
            jnp.zeros((self.slots, cfg.decoder.vocab_size), jnp.float32),
            data_sharding,
        )
        self.tokens_out = jax.device_put(
            jnp.full((self.slots, self.out_width), eos, jnp.int32),
            data_sharding,
        )
        self.out_pos = jax.device_put(
            jnp.zeros((self.slots,), jnp.int32), data_sharding
        )
        # Empty slots sit "done" so the decode chunk freezes them.
        self.done = jax.device_put(
            jnp.ones((self.slots,), bool), data_sharding
        )

    # -- compiled programs --------------------------------------------------------

    def _build_prefill(self):
        engine = self.engine
        model = engine.model
        cfg = engine.config
        dfa = self.dfa

        def prefill(params, cache, state, logits, tokens_out, out_pos, done,
                    patches, prompt, length, slot):
            # Single-request prefill into a scratch cache, then splice the
            # slot's rows into the pool (per-layer batch-index update).
            # ``length`` is the request's OWN 128-multiple prompt bucket —
            # generation must start right after it (train/serve prompt-block
            # alignment, train/run.py::_pack_row == engine._assemble_inputs);
            # a shared fixed width would shift positions for rows whose
            # prompt lands in a smaller bucket.
            scratch = init_kv_cache(cfg.decoder, 1, self.cache_len,
                                    jnp.dtype(cfg.dtype))
            first_logits, scratch = model.apply(
                params, patches, prompt, scratch, length,
                method=VideoLM.prefill,
            )
            cache = {
                "k": [
                    jax.lax.dynamic_update_slice(
                        pool, filled, (slot, 0, 0, 0)
                    )
                    for pool, filled in zip(cache["k"], scratch["k"])
                ],
                "v": [
                    jax.lax.dynamic_update_slice(
                        pool, filled, (slot, 0, 0, 0)
                    )
                    for pool, filled in zip(cache["v"], scratch["v"])
                ],
                "index": cache["index"].at[slot].set(scratch["index"][0]),
            }
            state = state.at[slot].set(dfa.start if dfa else 0)
            logits = logits.at[slot].set(first_logits[0].astype(jnp.float32))
            tokens_out = tokens_out.at[slot].set(engine.tokenizer.EOS)
            out_pos = out_pos.at[slot].set(0)
            done = done.at[slot].set(False)
            return cache, state, logits, tokens_out, out_pos, done

        return jax.jit(prefill, donate_argnums=(1, 2, 3, 4, 5, 6))

    def _build_decode(self):
        engine = self.engine
        model = engine.model
        dfa = self.dfa
        table = self.table
        temperature = engine.temperature
        eos = engine.tokenizer.EOS
        max_new = self.max_new
        block_width = self.block_width
        forced = self._forced

        def make_step(params):
          def step(carry, key):
            cache, state, logits, tokens, out_pos, done = carry
            if table is not None:
                masked = dfa.constrain(logits, state, table)
            else:
                masked = logits
            if temperature > 0:
                tok = jax.random.categorical(key, masked / temperature, axis=-1)
            else:
                tok = jnp.argmax(masked, axis=-1)
            tok = jnp.where(done, eos, tok).astype(jnp.int32)

            if table is not None:
                forced_len, forced_tok, forced_end = forced
                mid = dfa.advance(state, tok, table)
                mid = jnp.where(done, state, mid)
                run = jnp.where(done, 0, forced_len[mid])
                cols = jnp.arange(block_width - 1)[None, :]
                run_block = jnp.where(cols < run[:, None], forced_tok[mid], eos)
                block = jnp.concatenate([tok[:, None], run_block], axis=1)
                new_state = jnp.where(run > 0, forced_end[mid], mid)
                done = done | (new_state == dfa.accept)
                state = new_state
            else:
                run = jnp.zeros_like(out_pos)
                block = tok[:, None]
                done = done | (tok == eos)

            write = jax.vmap(
                lambda row, blk, pos: jax.lax.dynamic_update_slice(
                    row, blk, (pos,)
                )
            )
            tokens = write(tokens, block, out_pos)
            advance = jnp.where(done & (run == 0) & (tok == eos), 0, 1 + run)
            out_pos = out_pos + advance
            done = done | (out_pos >= max_new)

            index_before = cache["index"]
            # Logits head narrowed to each row's last valid block column
            # (decode_block_pick): one [B, V] head per step instead of
            # [B, W, V] — the W-1 forced columns never need distributions.
            picked, cache = model.apply(
                params, block, cache, run, method=VideoLM.decode_block_pick
            )
            cache = dict(cache, index=index_before + advance)
            logits = picked.astype(jnp.float32)
            return (cache, state, logits, tokens, out_pos, done), None

          return step

        def decode_chunk(params, cache, state, logits, tokens, out_pos, done,
                         rng, n_steps):
            # ``n_steps`` is a TRACED scalar: one compiled program serves
            # every chunk size (adaptive sizing never recompiles), and the
            # loop exits early once every slot is done instead of burning
            # the rest of the chunk on frozen rows.
            keys = jax.random.split(rng, self.chunk_steps)
            step = make_step(params)

            def cond(carry):
                i, (_, _, _, _, _, done) = carry
                return (i < n_steps) & ~jnp.all(done)

            def body(carry):
                i, inner = carry
                inner, _ = step(inner, keys[jnp.minimum(i, self.chunk_steps - 1)])
                return i + 1, inner

            _, carry = jax.lax.while_loop(
                cond, body, (jnp.int32(0), (cache, state, logits, tokens,
                                            out_pos, done))
            )
            cache, state, logits, tokens, out_pos, done = carry
            # One small packed array carries everything the host scheduler
            # needs per chunk — a single device->host transfer (the axon
            # tunnel charges high latency per transfer, not per byte).
            status = jnp.stack(
                [done.astype(jnp.int32), out_pos, state.astype(jnp.int32)]
            )
            return carry + (status,)

        return jax.jit(decode_chunk, donate_argnums=(1, 2, 3, 4, 5, 6))

    # -- scheduler ----------------------------------------------------------------

    def submit(self, request: Request) -> None:
        import heapq

        heapq.heappush(
            self._queue, (-request.priority, self._submit_seq, request)
        )
        self._submit_seq += 1
        self._submit_time[request.request_id] = time.perf_counter()

    def _fill_slots(self) -> None:
        import heapq

        engine = self.engine
        for i, slot in enumerate(self._slots):
            if slot.request_id is not None or not self._queue:
                continue
            _, _, request = heapq.heappop(self._queue)
            patches = engine.preprocess(request.frames[None])
            prompt_tokens = engine.tokenizer.encode_array(
                request.prompt, self.prompt_len, add_bos=True
            )
            # Per-request prompt bucket (train/serve position alignment).
            n_tokens = len(engine.tokenizer.encode(request.prompt)) + 1
            bucket = min(_round_up(n_tokens, 128), self.prompt_len)
            (self.cache, self.state, self.logits, self.tokens_out,
             self.out_pos, self.done) = self._prefill(
                engine.params, self.cache, self.state, self.logits,
                self.tokens_out, self.out_pos, self.done,
                patches, jnp.asarray(prompt_tokens[None]),
                jnp.asarray([bucket], jnp.int32), i,
            )
            slot.request_id = request.request_id
            slot.started = time.perf_counter()
            slot.first_token_at = 0.0

    def _next_chunk_steps(self) -> int:
        """Latency-optimized short chunks while work is queued, full-width
        chunks when the pool is the only work left."""
        if self._queue:
            return max(1, min(self.latency_steps, self.chunk_steps))
        return self.chunk_steps

    def _harvest(self, status: np.ndarray) -> list[Completion]:
        done, out_pos, state = status
        now = time.perf_counter()
        tokens = None
        results: list[Completion] = []
        for i, slot in enumerate(self._slots):
            if slot.request_id is None:
                continue
            if slot.first_token_at == 0.0:
                slot.first_token_at = now
            if not done[i]:
                continue
            if tokens is None:
                tokens = np.asarray(self.tokens_out)
            ids = tokens[i, : out_pos[i]].tolist()
            text = self.engine.tokenizer.decode(ids)
            complete = True
            if self.dfa is not None:
                complete = int(state[i]) == self.dfa.accept
            submitted = self._submit_time.pop(slot.request_id, slot.started)
            results.append(
                Completion(
                    slot.request_id, text, int(out_pos[i]), complete,
                    first_token_s=round(slot.first_token_at - submitted, 4),
                    token_ids=ids,
                )
            )
            slot.request_id = None
        return results

    def run(
        self,
        on_complete: Callable[[Completion], None] | None = None,
        drain: bool = True,
    ) -> list[Completion]:
        """Drive the scheduler until the queue and all slots drain."""
        all_results: list[Completion] = []
        while self._queue or any(s.request_id is not None for s in self._slots):
            self._fill_slots()
            self._rng, key = jax.random.split(self._rng)
            (self.cache, self.state, self.logits, self.tokens_out,
             self.out_pos, self.done, status) = self._decode(
                self.engine.params, self.cache, self.state, self.logits,
                self.tokens_out, self.out_pos, self.done, key,
                jnp.int32(self._next_chunk_steps()),
            )
            for completion in self._harvest(np.asarray(status)):
                all_results.append(completion)
                if on_complete is not None:
                    on_complete(completion)
            if not drain and not self._queue:
                break
        return all_results
