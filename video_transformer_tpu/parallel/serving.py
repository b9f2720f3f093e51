"""Continuous batching: requests join and leave the decode loop mid-flight.

The batch-mode engine (parallel/engine.py) runs one compiled while_loop
until EVERY row finishes — fine for segment batches of one video, wasteful
for a serving runtime where requests arrive continuously and finish at
different lengths. This scheduler keeps a fixed pool of SLOTS resident on
device (KV cache, grammar state, output buffer) and refills finished slots
with queued requests mid-flight, so the decode matmuls always run at full
pool width regardless of individual request lengths.

Two refill modes:

- **On-device refill** (``device_refill=True``, the default): PAGED. The
  KV pool holds ``slots + queue_depth`` full-length physical rows; each of
  the ``slots`` logical decode lanes addresses its physical row through an
  int32 ``rows`` table (scalar-prefetched by the paged attention kernels,
  ops/decode_attention.py). Staging batch-prefills queued requests into
  host-chosen FREE physical rows (one DMA-kernel scatter, adopt_rows), and
  ONE compiled chunk program decodes and refills: a finished slot adopts
  the ring head by a ``rows`` TABLE UPDATE — no KV bytes move. The
  ``lax.cond`` in the loop carries only small arrays; earlier designs that
  carried the pool through the conditional (or a nested while) made XLA
  copy it every iteration (measured 4.7 / 30 ms per step vs the plain
  loop's 1.74 at base width 8 through the axon tunnel), and the XLA
  scatter staging the parked ring measured ~48 s/GB. The host's only work
  per chunk is one stage dispatch and one completion harvest — crucial
  behind remote-dispatch links (the axon tunnel charges ~1 s per host
  round-trip, which made the host-driven loop lose 32 s vs 4 s against
  the plain engine on the same sweep).
- **Host-driven refill** (``device_refill=False``): the original loop —
  per-request prefill dispatches between fixed decode chunks. Kept for
  local-attached topologies and as the parity oracle in tests.

This is the TPU analog of vLLM-style continuous batching with the grammar
as the stopping criterion; all shapes are static (slot count, queue depth,
cache bucket, prompt bucket) so everything compiles once.

**Speculative decoding composes** (device-refill mode): when the engine has
a draft attached (engine.attach_draft), the chunk program runs the
speculative cycle — draft proposes a K-token block, one wide target
decode_block verifies — over the same paged pools. The draft model gets its
own KV pool addressed through the SAME rows table (a refill repoints both
pools with one int32 update), staging prefills both models, and greedy
acceptance stays exact, so spec-batched output is token-identical to both
the plain batcher and engine.generate. The two serving levers (refill
keeping the pool full + more rows per matmul dispatch) multiply.
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
      backfill at the next refill boundary. In device-refill mode priority
      applies at STAGING time (the device ring is FIFO once staged), so a
      late high-priority request overtakes the un-staged backlog but not
      requests already parked on device.
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
    device_refill: bool = True
    """Refill finished slots from a device-resident request ring inside the
    compiled decode loop (see module docstring). False = host-driven loop."""
    queue_depth: int = 0
    """Device ring capacity (device_refill mode); 0 = 2 * slots."""
    refill_period: int = 8
    """Decode steps between refill checks inside the chunk program. The
    refill branch is checked (and fully drained) every ``refill_period``
    steps instead of every step — the cond's per-step cost amortizes away
    while a finished slot idles at most period-1 steps before refilling."""

    _slots: list[_Slot] = field(default_factory=list)
    _queue: list[tuple[int, int, Request]] = field(default_factory=list)
    _submit_seq: int = 0
    _submit_time: dict[int, float] = field(default_factory=dict)

    def __post_init__(self):
        engine = self.engine
        cfg = engine.config
        # Speculative decoding rides along when the engine has a draft
        # attached: the chunk program drafts K-token blocks with the draft
        # model (its own paged KV pool, same rows table) and verifies each
        # block in one wide target forward — the two serving levers
        # (continuous refill + more rows per matmul dispatch) stack.
        self.spec = getattr(engine, "draft_model", None) is not None
        self.spec_k = int(getattr(engine, "spec_tokens", 0)) if self.spec else 0
        if self.spec and not self.device_refill:
            raise ValueError(
                "speculative decoding requires device_refill=True (the "
                "host-driven loop is the plain-path parity oracle); "
                "detach_draft or use the default mode"
            )
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

        # Step width: the widest multi-token append one iteration can issue
        # — the grammar fast-forward block (plain) or the draft block
        # (speculative; forced runs are subsumed by the grammar-constrained
        # draft, see engine._spec_decode_loop_fn).
        self.step_width = max(self.block_width, self.spec_k) \
            if self.spec else self.block_width
        # + step_width + 16: tail slack for the fused decode kernel's
        # aligned in-place row writes (see engine._build_generate).
        self.cache_len = _round_up(
            cfg.video_tokens + self.prompt_len + self.max_new
            + 2 * self.step_width + 17,
            128,
        )
        if self.cache_len > cfg.decoder.max_seq_len:
            raise ValueError("slot cache exceeds max_seq_len")
        self.out_width = self.max_new + 2 * self.step_width
        self.park_len = cfg.video_tokens + self.prompt_len
        if self.spec:
            dcfg = engine.draft_config
            self.draft_cache_len = _round_up(
                dcfg.video_tokens + self.prompt_len + self.max_new
                + 2 * self.step_width + 17,
                128,
            )
            if self.draft_cache_len > dcfg.decoder.max_seq_len:
                raise ValueError("draft slot cache exceeds draft max_seq_len")
            self.draft_park_len = dcfg.video_tokens + self.prompt_len
        self._slots = [_Slot() for _ in range(self.slots)]
        if self.queue_depth <= 0:
            self.queue_depth = 2 * self.slots
        self._init_device_state()
        self._prefill = self._build_prefill()
        self._decode = self._build_decode()
        if self.device_refill:
            self._init_ring_state()
            # Stage programs are built lazily per lane-count bucket
            # (round_up(take, n_groups)): a 10-request sweep prefills 10
            # lanes, not the full ring depth — at depth 16 the fixed-width
            # program wasted 1.6x the prefill FLOPs/bandwidth of the sweep.
            self._enqueue_progs: dict[int, Any] = {}
            self._decode_refill = self._build_decode_refill()
        self._rng = jax.random.PRNGKey(7)

    # -- device state -----------------------------------------------------------

    def _init_device_state(self):
        """Allocate the KV pool + per-slot decode state.

        Host-driven mode: ``slots`` physical rows, identity addressing.
        Device-refill mode: ``slots + queue_depth`` full-length physical
        rows addressed through the ``rows`` table; logical slot i of device
        group g starts on that group's i-th local physical row, and the
        group's remaining rows are free for staging (rows never cross the
        data-axis shard boundary — the paged kernels index rows locally).
        """
        engine = self.engine
        cfg = engine.config
        dtype = jnp.dtype(cfg.dtype)
        mesh = engine.mesh
        data_sharding = NamedSharding(mesh, P(DATA_AXIS))
        self.n_groups = max(mesh.shape[DATA_AXIS], 1)
        self.total_rows = (
            self.slots + self.queue_depth if self.device_refill else self.slots
        )
        if self.slots % self.n_groups or self.queue_depth % self.n_groups:
            raise ValueError(
                f"slots ({self.slots}) and queue_depth ({self.queue_depth}) "
                f"must divide the data axis ({self.n_groups})"
            )
        cache = init_kv_cache(cfg.decoder, self.total_rows, self.cache_len, dtype)
        model_axis = mesh.shape[MODEL_AXIS]
        if model_axis > 1 and cfg.decoder.num_kv_heads % model_axis == 0:
            kv_spec = P(DATA_AXIS, MODEL_AXIS)
        else:
            kv_spec = P(DATA_AXIS)
        kv_sharding = NamedSharding(mesh, kv_spec)
        self.cache = {
            "k": [jax.device_put(layer, kv_sharding) for layer in cache["k"]],
            "v": [jax.device_put(layer, kv_sharding) for layer in cache["v"]],
            # Logical per-slot fill counts (the rows table owns physical
            # addressing; index rides the small decode state).
            "index": jax.device_put(
                jnp.zeros((self.slots,), jnp.int32), data_sharding
            ),
        }
        if self.spec:
            # Draft KV pool: same physical row numbering (the rows table is
            # shared — a refill repoints both pools with one int32 update),
            # its own per-slot index (the draft's prefill length differs:
            # its encoder emits its own video-token count).
            dcfg = engine.draft_config
            dcache = init_kv_cache(
                dcfg.decoder, self.total_rows, self.draft_cache_len,
                jnp.dtype(dcfg.dtype),
            )
            if model_axis > 1 and dcfg.decoder.num_kv_heads % model_axis == 0:
                dkv_spec = P(DATA_AXIS, MODEL_AXIS)
            else:
                dkv_spec = P(DATA_AXIS)
            dkv_sharding = NamedSharding(mesh, dkv_spec)
            self.dcache = {
                "k": [jax.device_put(l, dkv_sharding) for l in dcache["k"]],
                "v": [jax.device_put(l, dkv_sharding) for l in dcache["v"]],
                "index": jax.device_put(
                    jnp.zeros((self.slots,), jnp.int32), data_sharding
                ),
            }
        else:
            self.dcache = {"k": [], "v": [], "index": jnp.zeros((0,), jnp.int32)}
        # Initial logical -> physical mapping: group-local identity.
        self._rows_host = np.asarray(
            [self._group_rows(i // (self.slots // self.n_groups))[
                i % (self.slots // self.n_groups)]
             for i in range(self.slots)],
            np.int32,
        )
        self.rows = jax.device_put(
            jnp.asarray(self._rows_host), data_sharding
        )
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

    def _group_rows(self, group: int) -> range:
        """Physical row range owned by data-axis shard ``group``."""
        per = self.total_rows // self.n_groups
        return range(group * per, (group + 1) * per)

    # -- compiled programs --------------------------------------------------------

    def _prefill_body(self, params, cache, state, logits, tokens_out,
                      out_pos, done, patches, prompt, length, slot, row):
        """Prefill one request into logical slot ``slot`` of the pool,
        writing K/V at its PHYSICAL row ``row`` (host-driven path).

        Single-request prefill into a scratch cache, then splice the row
        into the pool (per-layer batch-index update). ``length`` is the
        request's OWN 128-multiple prompt bucket — generation must start
        right after it (train/serve prompt-block alignment,
        train/run.py::_pack_row == engine._assemble_inputs); a shared fixed
        width would shift positions for rows whose prompt lands in a
        smaller bucket.
        """
        engine = self.engine
        cfg = engine.config
        dfa = self.dfa
        scratch = init_kv_cache(cfg.decoder, 1, self.cache_len,
                                jnp.dtype(cfg.dtype))
        first_logits, scratch = engine.model.apply(
            params, patches, prompt, scratch, length,
            method=VideoLM.prefill,
        )
        cache = {
            "k": [
                jax.lax.dynamic_update_slice(pool, filled, (row, 0, 0, 0))
                for pool, filled in zip(cache["k"], scratch["k"])
            ],
            "v": [
                jax.lax.dynamic_update_slice(pool, filled, (row, 0, 0, 0))
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

    def _build_prefill(self):
        def prefill(params, cache, state, logits, tokens_out, out_pos, done,
                    patches, prompt, length, slot, row):
            return self._prefill_body(
                params, cache, state, logits, tokens_out, out_pos, done,
                patches, prompt, length, slot, row,
            )

        return jax.jit(prefill, donate_argnums=(1, 2, 3, 4, 5, 6))

    def _process(self, logits, state):
        """Raw logits -> processed next-token log-distribution (grammar
        mask + close bias + temperature), the spec step's carry form —
        mirrors engine._spec_decode_loop_fn.process."""
        engine = self.engine
        if self.table is not None:
            logits = self.dfa.constrain(logits, state, self.table)
        close_bias = engine.close_bias_array()
        if close_bias is not None:
            logits = logits + close_bias
        scale = engine.temperature if engine.temperature > 0 else 1.0
        return jax.nn.log_softmax(logits / scale, axis=-1)

    def _make_spec_step(self, params, draft_params):
        """One speculative decode cycle over all slots (traceable).

        The paged twin of engine._spec_decode_loop_fn's loop body: the
        draft autoregressively proposes a K-token block (t0 sampled from
        the target's carried distribution), ONE wide target decode_block
        verifies every position, and the longest accepted prefix is
        emitted. Greedy acceptance is exact — bit-identical to the plain
        chunk loop — so the batcher's grammar/eviction semantics carry
        over unchanged. Both caches are paged (shared ``rows`` table);
        forced-run fast-forward is subsumed by the grammar-constrained
        draft (single-support q == single-support p).

        carry: (cache, dcache, state, logp, tokens, out_pos, done)
        ``logp`` is the PROCESSED per-slot distribution (_process) — a
        rejection's residual has no raw-logits form.
        """
        engine = self.engine
        model = engine.model
        draft = engine.draft_model
        dfa = self.dfa
        table = self.table
        temperature = engine.temperature
        eos = engine.tokenizer.EOS
        max_new = self.max_new
        spec_k = self.spec_k
        greedy = temperature <= 0
        process = self._process

        def pick(logp, frozen, key):
            if greedy:
                tok = jnp.argmax(logp, axis=-1)
            else:
                tok = jax.random.categorical(key, logp, axis=-1)
            return jnp.where(frozen, eos, tok).astype(jnp.int32)

        def advance_live(state, tok, live):
            if table is None:
                return state
            return jnp.where(live, dfa.advance(state, tok, table), state)

        write_rows = jax.vmap(
            lambda row, block, pos: jax.lax.dynamic_update_slice(
                row, block, (pos,)
            )
        )

        def step(carry, key):
            cache, dcache, state, logp, tokens, out_pos, done = carry
            frozen = done | (out_pos >= max_new)
            b = logp.shape[0]
            k0, kd, ka = jax.random.split(key, 3)

            # t0 comes from the target's own distribution — always correct,
            # so a cycle emits at least one token per live row.
            t0 = pick(logp, frozen, k0)
            s1 = advance_live(state, t0, ~frozen)

            dindex_before = dcache["index"]

            def dstep(c, key_i):
                dc, prev, ds = c
                dlogits, dc = draft.apply(
                    draft_params, prev[:, None], dc, method=VideoLM.decode_step
                )
                lq = process(dlogits, ds)
                x = pick(lq, frozen, key_i)
                return (dc, x, advance_live(ds, x, ~frozen)), (
                    x, (lq if not greedy else jnp.zeros((b, 0))), ds,
                )

            (dcache2, _, _), (prop, slq, sst) = jax.lax.scan(
                dstep, (dcache, t0, s1), jax.random.split(kd, spec_k)
            )
            block = jnp.concatenate(
                [t0[:, None], jnp.moveaxis(prop, 0, 1)[:, : spec_k - 1]],
                axis=1,
            )  # [B, K]

            # One wide target forward verifies every position.
            index_before = cache["index"]
            all_logits, cache = model.apply(
                params, block, cache, method=VideoLM.decode_block
            )  # [B, K, V]

            if not greedy:
                log_u = jnp.log(jax.random.uniform(ka, (b, spec_k)))
            accs = []
            for i in range(1, spec_k):
                p_i = process(all_logits[:, i - 1], sst[i - 1])
                tok_i = block[:, i]
                if greedy:
                    accs.append(tok_i == jnp.argmax(p_i, axis=-1))
                else:
                    lp = jnp.take_along_axis(p_i, tok_i[:, None], 1)[:, 0]
                    lq = jnp.take_along_axis(
                        slq[i - 1], tok_i[:, None], 1
                    )[:, 0]
                    accs.append(log_u[:, i] < lp - lq)

            # Emit the longest accepted prefix; an emitted EOS (or grammar
            # accept edge) finishes the row without counting toward out_pos.
            alive = ~frozen
            adv = jnp.zeros((b,), jnp.int32)
            new_state = state
            new_fin = done
            for i in range(spec_k):
                tok_i = block[:, i]
                emit = alive if i == 0 else (alive & accs[i - 1])
                is_eos = tok_i == eos
                ended = is_eos
                if table is not None:
                    ended = ended | (sst[i] == dfa.accept)
                adv = adv + (emit & ~is_eos)
                new_state = jnp.where(emit, sst[i], new_state)
                new_fin = new_fin | (emit & ended)
                alive = emit & ~ended

            # Next distribution: target's after the emitted prefix, or the
            # rejection residual norm(max(p - q, 0)) for a rejected position.
            next_idx = jnp.maximum(adv - 1, 0)
            p_raw = jnp.take_along_axis(
                all_logits, next_idx[:, None, None], axis=1
            )[:, 0]
            s_next = jnp.take_along_axis(
                jnp.moveaxis(sst, 0, 1), next_idx[:, None], axis=1
            )[:, 0]
            p_next = process(p_raw, s_next)
            if greedy:
                new_logp = p_next
            else:
                q_next = jnp.take_along_axis(
                    jnp.moveaxis(slq, 0, 1), next_idx[:, None, None], axis=1
                )[:, 0]
                resid = jnp.maximum(jnp.exp(p_next) - jnp.exp(q_next), 0.0)
                total = resid.sum(axis=-1, keepdims=True)
                resid = jnp.where(
                    total > 0, resid / jnp.maximum(total, 1e-30),
                    jnp.exp(p_next),
                )
                rejected = (adv < spec_k)[:, None]
                new_logp = jnp.where(rejected, jnp.log(resid + 1e-30), p_next)
            logp = jnp.where(frozen[:, None], logp, new_logp)

            tokens = write_rows(tokens, block, out_pos)
            out_pos = out_pos + adv
            new_fin = new_fin | (out_pos >= max_new)
            cache = dict(cache, index=index_before + adv)
            dcache = dict(dcache2, index=dindex_before + adv)
            return (cache, dcache, new_state, logp, tokens, out_pos,
                    new_fin), None

        return step

    def _make_step(self, params):
        """One grammar-constrained decode iteration over all slots
        (traceable; shared by both chunk programs)."""
        engine = self.engine
        model = engine.model
        dfa = self.dfa
        table = self.table
        temperature = engine.temperature
        eos = engine.tokenizer.EOS
        max_new = self.max_new
        block_width = self.block_width
        forced = self._forced

        close_bias = engine.close_bias_array()

        def step(carry, key):
            cache, state, logits, tokens, out_pos, done = carry
            if table is not None:
                masked = dfa.constrain(logits, state, table)
            else:
                masked = logits
            if close_bias is not None:
                masked = masked + close_bias
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

    def _build_decode(self):
        def decode_chunk(params, cache, state, logits, tokens, out_pos, done,
                         rng, n_steps):
            # ``n_steps`` is a TRACED scalar: one compiled program serves
            # every chunk size (adaptive sizing never recompiles), and the
            # loop exits early once every slot is done instead of burning
            # the rest of the chunk on frozen rows.
            keys = jax.random.split(rng, self.chunk_steps)
            step = self._make_step(params)

            def cond(carry):
                i, (_, _, _, _, _, done) = carry
                return (i < n_steps) & ~jnp.all(done)

            def body(carry):
                i, inner = carry
                inner, _ = step(inner, keys[jnp.minimum(i, self.chunk_steps - 1)])
                return i + 1, inner

            steps, carry = jax.lax.while_loop(
                cond, body, (jnp.int32(0), (cache, state, logits, tokens,
                                            out_pos, done))
            )
            cache, state, logits, tokens, out_pos, done = carry
            # One small packed array carries everything the host scheduler
            # needs per chunk — a single device->host transfer (the axon
            # tunnel charges high latency per transfer, not per byte).
            # Row 3 broadcasts the executed step count (decode_steps stat).
            status = jnp.stack(
                [done.astype(jnp.int32), out_pos, state.astype(jnp.int32),
                 jnp.full_like(out_pos, steps)]
            )
            return carry + (status,)

        return jax.jit(decode_chunk, donate_argnums=(1, 2, 3, 4, 5, 6))

    # -- on-device refill ---------------------------------------------------------

    def _init_ring_state(self):
        """Device-resident request ring metadata + completion buffer.

        A ring entry is a PARKED request: its prefilled K/V lives directly
        in a free physical row of the unified pool (written at stage time
        by the adopt_rows DMA kernel), and the ring itself holds only small
        per-entry metadata — the physical row id (``q_phys``), the cache
        index after prefill, the first-token logits, and the request id.
        The in-loop refill is then an int32 table update (rows[slot] <-
        q_phys[head]) plus small resets: no KV bytes move, and the model
        forward stays out of the decode loop's cond branch (XLA could not
        compile an in-loop prefill in reasonable time at base scale,
        >40 min observed).

        Chunks always run with a full step budget, so every chunk DRAINS
        the ring; the ring is therefore empty at every stage and positions
        rebase to 0..count-1 (``q_head``/``q_tail`` reset each stage) —
        all metadata writes are elementwise selects, no scatters. The
        completion buffer receives evicted finished requests —
        ``comp_meta`` rows are (request_id, out_pos, complete); the host
        harvests + resets it every chunk, so slots + queue_depth rows
        bound one chunk's completions.
        """
        engine = self.engine
        cfg = engine.config
        depth = self.queue_depth
        mesh = engine.mesh
        replicated = NamedSharding(mesh, P())
        data_sharding = NamedSharding(mesh, P(DATA_AXIS))
        dec = cfg.decoder
        self._q_index = jax.device_put(
            jnp.zeros((depth,), jnp.int32), replicated
        )
        # Speculative mode: q_logits parks the PROCESSED start-state
        # log-distribution (grammar mask + close bias + temperature) — the
        # spec step's carry has no raw-logits form (rejection residuals).
        self._q_logits = jax.device_put(
            jnp.zeros((depth, dec.vocab_size), jnp.float32), replicated
        )
        self._q_dindex = jax.device_put(
            jnp.zeros((depth if self.spec else 0,), jnp.int32), replicated
        )
        self._q_req = jax.device_put(
            jnp.full((depth,), -1, jnp.int32), replicated
        )
        self._q_phys = jax.device_put(
            jnp.zeros((depth,), jnp.int32), replicated
        )
        self._q_head = jnp.int32(0)
        self._q_tail = jnp.int32(0)
        self._slot_req = jax.device_put(
            jnp.full((self.slots,), -1, jnp.int32), data_sharding
        )
        comp_rows = self.slots + depth
        self._comp_tokens = jax.device_put(
            jnp.full((comp_rows, self.out_width), engine.tokenizer.EOS,
                     jnp.int32),
            replicated,
        )
        self._comp_meta = jax.device_put(
            jnp.full((comp_rows, 3), -1, jnp.int32), replicated
        )
        self._q_head_host = 0
        self._staged_total = 0
        self._emitted_total = 0

    def _build_enqueue(self, lanes: int):
        """One dispatch stages up to ``lanes`` requests: a BATCHED
        video+prompt prefill over the whole stage into a scratch cache,
        then the adopt_rows DMA kernel scatters each lane's park region
        into its host-chosen free PHYSICAL pool row (``target_rows``).

        Ring positions are rebased to 0..count-1 every stage (chunks drain
        the ring fully — asserted by _stage), so all ring-metadata writes
        are elementwise selects; ``count`` is traced. ``lanes`` is the
        STATIC stage width — _stage buckets take up to round_up(take,
        n_groups) and builds one program per bucket, so a sweep smaller
        than the ring prefills only the lanes it uses. Invalid lanes keep
        their existing metadata and adopt_rows skips their DMA.
        """
        engine = self.engine
        cfg = engine.config
        model = engine.model
        depth = self.queue_depth
        spec = self.spec
        from ..ops.decode_attention import adopt_rows

        def enqueue(params, draft_params, pool_k, pool_v, dpool_k, dpool_v,
                    q_index, q_dindex, q_logits, q_req, q_phys, patches,
                    draft_patches, prompt, lengths, new_req, target_rows,
                    count):
            scratch = init_kv_cache(
                cfg.decoder, lanes, self.park_len, jnp.dtype(cfg.dtype)
            )
            first_logits, scratch = model.apply(
                params, patches, prompt, scratch, lengths,
                method=VideoLM.prefill,
            )
            pool_k = [
                adopt_rows(pool, filled, target_rows, count, self.park_len)
                for pool, filled in zip(pool_k, scratch["k"])
            ]
            pool_v = [
                adopt_rows(pool, filled, target_rows, count, self.park_len)
                for pool, filled in zip(pool_v, scratch["v"])
            ]
            valid = jnp.arange(lanes) < count

            def merge(new, old):
                head = jnp.where(
                    valid.reshape((lanes,) + (1,) * (new.ndim - 1)),
                    new, old[:lanes],
                )
                return jnp.concatenate([head, old[lanes:]]) \
                    if lanes < depth else head

            if spec:
                # Park the DRAFT's prefill alongside (its own pool, same
                # physical row ids), and store the processed start-state
                # distribution — the spec chunk's carry form.
                dcfg = engine.draft_config
                dscratch = init_kv_cache(
                    dcfg.decoder, lanes, self.draft_park_len,
                    jnp.dtype(dcfg.dtype),
                )
                _, dscratch = engine.draft_model.apply(
                    draft_params, draft_patches, prompt, dscratch, lengths,
                    method=VideoLM.prefill,
                )
                dpool_k = [
                    adopt_rows(pool, filled, target_rows, count,
                               self.draft_park_len)
                    for pool, filled in zip(dpool_k, dscratch["k"])
                ]
                dpool_v = [
                    adopt_rows(pool, filled, target_rows, count,
                               self.draft_park_len)
                    for pool, filled in zip(dpool_v, dscratch["v"])
                ]
                q_dindex = merge(dscratch["index"], q_dindex)
                start = jnp.full(
                    (lanes,), self.dfa.start if self.dfa else 0, jnp.int32
                )
                first_logits = self._process(
                    first_logits.astype(jnp.float32), start
                )

            q_index = merge(scratch["index"], q_index)
            q_logits = merge(first_logits.astype(jnp.float32), q_logits)
            q_req = merge(new_req, q_req)
            q_phys = merge(target_rows, q_phys)
            return (pool_k, pool_v, dpool_k, dpool_v, q_index, q_dindex,
                    q_logits, q_req, q_phys)

        return jax.jit(enqueue, donate_argnums=(2, 3, 4, 5, 6, 7, 8, 9, 10))

    def _build_decode_refill(self):
        """The combined chunk program: decode all slots, refilling finished
        ones from the device ring inside the loop.

        Each iteration: (1) if any slot is done and the ring is non-empty,
        evict that slot — completion record into the device buffer (skipped
        for never-occupied slots, request id -1) — and adopt the ring
        head's PARKED prefill by a ``rows`` TABLE UPDATE (its K/V already
        sits in a physical pool row, written at stage time); (2) one decode
        step over all slots through the paged kernels. The ``lax.cond``
        carries ONLY small arrays (int32 tables, logits, token buffers):
        earlier shapes that carried the KV pool through the conditional (or
        a nested while) made XLA copy the pool every iteration — measured
        4.7 / 30 ms per step vs the plain loop's 1.74 at base width 8. The
        model forward stays out of conditional control flow entirely
        (staging prefills; XLA could not compile an in-loop prefill in
        reasonable time at base scale).
        """
        dfa = self.dfa
        depth = self.queue_depth

        # On-device refill removes the reason for short chunks: one dispatch
        # drains the entire staged ring (refills included) and the loop
        # early-exits the moment everything is done — so the key array (and
        # the iteration budget _run_device passes) must UPPER-BOUND a full
        # drain. Worst case, one fast slot serves every parked request
        # sequentially: (depth + 1) generations. The budget only sizes the
        # RNG key array (KBs) — runtime is governed by the early exit — and
        # _stage asserts the ring actually drained. Short chunks would only
        # bound streaming-harvest latency; behind a remote-dispatch tunnel
        # every extra chunk is a ~1 s round-trip (measured: chunk_steps=64
        # cost 44 s of host_other on the 10-segment bench sweep).
        self._device_steps = (
            (self.queue_depth + 1) * (self.max_new + 1) + self.slots
        )

        spec = self.spec

        def chunk(params, draft_params, k_pool, v_pool, dk_pool, dv_pool,
                  rows, index, dindex, state, logits, tokens,
                  out_pos, done, slot_req, q_index, q_dindex, q_logits,
                  q_req, q_phys, q_head, q_tail, comp_tokens, comp_meta,
                  rng, n_steps):
            keys = jax.random.split(rng, self._device_steps)
            step = (
                self._make_spec_step(params, draft_params)
                if spec else self._make_step(params)
            )

            def refill_one(st):
                (rows, index, dindex, state, logits, tokens, out_pos, done,
                 slot_req, q_head, comp_tokens, comp_meta, comp_count) = st
                slot = jnp.argmax(done).astype(jnp.int32)
                live = slot_req[slot] >= 0
                # Eviction record (masked: never-occupied slots write their
                # own buffer row back).
                row = jax.lax.dynamic_index_in_dim(
                    tokens, slot, 0, keepdims=True
                )
                old_row = jax.lax.dynamic_slice_in_dim(
                    comp_tokens, comp_count, 1, 0
                )
                comp_tokens = jax.lax.dynamic_update_slice_in_dim(
                    comp_tokens, jnp.where(live, row, old_row), comp_count, 0
                )
                if dfa is not None:
                    complete = state[slot] == dfa.accept
                else:
                    complete = done[slot]
                meta_row = jnp.stack(
                    [slot_req[slot], out_pos[slot], complete.astype(jnp.int32)]
                )[None, :]
                old_meta = jax.lax.dynamic_slice_in_dim(
                    comp_meta, comp_count, 1, 0
                )
                comp_meta = jax.lax.dynamic_update_slice_in_dim(
                    comp_meta, jnp.where(live, meta_row, old_meta),
                    comp_count, 0,
                )
                comp_count = comp_count + live.astype(jnp.int32)
                # Pop the ring head: adopt its parked prefill by pointing the
                # slot's rows-table entry at the parked physical row. The
                # evicted request's old physical row is implicitly freed —
                # the host recomputes the free set from the status rows.
                qi = q_head % depth
                rows = rows.at[slot].set(q_phys[qi])
                index = index.at[slot].set(q_index[qi])
                if spec:
                    dindex = dindex.at[slot].set(q_dindex[qi])
                state = state.at[slot].set(dfa.start if dfa else 0)
                logits = logits.at[slot].set(q_logits[qi])
                tokens = tokens.at[slot].set(self.engine.tokenizer.EOS)
                out_pos = out_pos.at[slot].set(0)
                done = done.at[slot].set(False)
                slot_req = slot_req.at[slot].set(q_req[qi])
                return (rows, index, dindex, state, logits, tokens, out_pos,
                        done, slot_req, q_head + 1, comp_tokens, comp_meta,
                        comp_count)

            period = max(1, int(self.refill_period))

            def cond(carry):
                i, kv, st = carry
                done_now = st[7]
                q_head_now = st[9]
                return (i < n_steps) & ~(
                    jnp.all(done_now) & (q_head_now >= q_tail)
                )

            def can_refill(s):
                return jnp.any(s[7]) & (s[9] < q_tail)

            def body(carry):
                i, (ks, vs, dks, dvs), st = carry
                # Drain every eligible refill at the boundary, then run
                # ``period`` plain steps before checking again: the per-step
                # refill cond measured ~0.4 ms/step at width 8 (vs a 3.4 ms
                # step) — at period 8 it amortizes to noise, while a
                # finished slot idles at most period-1 steps (~30 ms).
                st = jax.lax.while_loop(can_refill, refill_one, st)
                (rows, index, dindex, state, logits, tokens, out_pos, done,
                 slot_req, q_head, comp_tokens, comp_meta, comp_count) = st
                cache = {"k": ks, "v": vs, "index": index, "rows": rows}

                def substep(j, inner):
                    out, _ = step(
                        inner, keys[jnp.minimum(i + j, self._device_steps - 1)]
                    )
                    return out

                if spec:
                    dcache = {"k": dks, "v": dvs, "index": dindex,
                              "rows": rows}
                    (cache, dcache, state, logits, tokens, out_pos, done) = (
                        jax.lax.fori_loop(
                            0, period, substep,
                            (cache, dcache, state, logits, tokens, out_pos,
                             done),
                        )
                    )
                    dks, dvs, dindex = dcache["k"], dcache["v"], dcache["index"]
                else:
                    cache, state, logits, tokens, out_pos, done = (
                        jax.lax.fori_loop(
                            0, period, substep,
                            (cache, state, logits, tokens, out_pos, done),
                        )
                    )
                st = (rows, cache["index"], dindex, state, logits, tokens,
                      out_pos, done, slot_req, q_head, comp_tokens, comp_meta,
                      comp_count)
                return i + period, (cache["k"], cache["v"], dks, dvs), st

            st = (rows, index, dindex, state, logits, tokens, out_pos, done,
                  slot_req, q_head, comp_tokens, comp_meta, jnp.int32(0))
            steps, (k_pool, v_pool, dk_pool, dv_pool), st = jax.lax.while_loop(
                cond, body, (jnp.int32(0), (k_pool, v_pool, dk_pool, dv_pool),
                             st)
            )
            (rows, index, dindex, state, logits, tokens, out_pos, done,
             slot_req, q_head, comp_tokens, comp_meta, comp_count) = st
            # Packed status: one device->host transfer tells the scheduler
            # everything (per-slot done/out_pos/state/request id/physical
            # row; row 4 broadcasts the executed step count).
            status = jnp.stack(
                [done.astype(jnp.int32), out_pos, state.astype(jnp.int32),
                 slot_req, jnp.full_like(out_pos, steps), rows]
            )
            return (k_pool, v_pool, dk_pool, dv_pool, rows, index, dindex,
                    state, logits, tokens, out_pos, done, slot_req, q_head,
                    comp_tokens, comp_meta, comp_count, status)

        # Donate only buffers the program returns (pools + small decode
        # state + completion buffers); the ring metadata is read-only inside
        # the chunk and stays resident across calls. Arg order: params(0),
        # draft_params(1), k/v/dk/dv pools(2-5), rows(6), index(7),
        # dindex(8), state..slot_req(9-14), q_index(15), q_dindex(16),
        # q_logits(17), q_req(18), q_phys(19), q_head/q_tail(20-21),
        # comp_tokens/comp_meta(22-23), rng(24), n_steps(25).
        return jax.jit(
            chunk,
            donate_argnums=(2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14,
                            22, 23),
        )

    def _free_rows(self) -> list[int]:
        """Physical pool rows not referenced by any slot, grouped-ordered.

        Chunks fully drain the ring, so at stage time the live rows are
        exactly the slots' current rows (``self._rows_host``, refreshed
        from the status pack after every chunk) — everything else is free.
        """
        live = set(int(r) for r in self._rows_host)
        return [r for r in range(self.total_rows) if r not in live]

    def _stage(self) -> None:
        """Move queued requests from the host heap into the device pool:
        one batched preprocess + ONE batched prefill/adopt dispatch for the
        whole stage. Each lane's park region lands in a FREE physical pool
        row from the lane's own data-axis group (rows never cross the
        shard boundary). Per-request prompt buckets are preserved
        (train/serve prompt-block alignment) — ``lengths`` marks each row's
        own round_up(tokens+1, 128) bucket inside the shared prompt block."""
        import heapq

        assert self._ring_occupancy() == 0, (
            "stage with a non-empty ring: chunks are expected to drain it"
        )
        free = self._free_rows()
        take = min(len(self._queue), self.queue_depth, len(free))
        if take <= 0:
            return
        engine = self.engine
        requests = [heapq.heappop(self._queue)[2] for _ in range(take)]
        # Stage width: the smallest data-axis-even lane count covering the
        # take. Preprocess + prefill then run at the sweep's true size (one
        # compiled program per distinct bucket, engine-cached) instead of
        # always paying the full ring depth.
        lanes = min(_round_up(take, self.n_groups), self.queue_depth)
        frames = np.stack([r.frames for r in requests])
        if take < lanes:
            pad = np.zeros(
                (lanes - take,) + frames.shape[1:], frames.dtype
            )
            frames = np.concatenate([frames, pad], axis=0)
        patches = engine.preprocess(frames)
        draft_patches = (
            engine._draft_patches(frames) if self.spec
            else jnp.zeros((lanes, 0), jnp.float32)
        )
        prompts = np.zeros((lanes, self.prompt_len), np.int32)
        buckets = np.full((lanes,), 128, np.int32)
        reqs = np.full((lanes,), -1, np.int32)
        # Lane i of the stage lives on data group i // (lanes / groups):
        # prefer that group's free rows so the adopt DMA stays shard-local
        # (falls back to any free row — a cross-shard copy is a perf wart,
        # not a correctness issue). Pad lanes reuse target 0; adopt_rows
        # skips them (i >= count).
        per_group = lanes // self.n_groups
        rows_per_group = self.total_rows // self.n_groups
        by_group: list[list[int]] = [[] for _ in range(self.n_groups)]
        for r in free:
            by_group[r // rows_per_group].append(r)
        targets = np.zeros((lanes,), np.int32)
        for i in range(take):
            group = by_group[i // per_group]
            pool = group if group else max(by_group, key=len)
            targets[i] = pool.pop(0)
        for i, request in enumerate(requests):
            prompts[i] = engine.tokenizer.encode_array(
                request.prompt, self.prompt_len, add_bos=True
            )
            n_tokens = len(engine.tokenizer.encode(request.prompt)) + 1
            buckets[i] = min(_round_up(n_tokens, 128), self.prompt_len)
            reqs[i] = request.request_id
        enqueue = self._enqueue_progs.get(lanes)
        if enqueue is None:
            enqueue = self._enqueue_progs[lanes] = self._build_enqueue(lanes)
        # Ring positions rebase to 0..take-1 (ring empty — see assert).
        self._q_head = jnp.int32(0)
        self._q_tail = jnp.int32(take)
        self._q_head_host = 0
        (self.cache["k"], self.cache["v"], self.dcache["k"],
         self.dcache["v"], self._q_index, self._q_dindex, self._q_logits,
         self._q_req, self._q_phys) = enqueue(
            engine.params,
            engine.draft_params if self.spec else {},
            self.cache["k"], self.cache["v"],
            self.dcache["k"], self.dcache["v"],
            self._q_index, self._q_dindex, self._q_logits,
            self._q_req, self._q_phys, patches, draft_patches,
            jnp.asarray(prompts), jnp.asarray(buckets), jnp.asarray(reqs),
            jnp.asarray(targets), jnp.int32(take),
        )
        self._staged_total += take

    def _ring_occupancy(self) -> int:
        return int(self._q_tail) - self._q_head_host

    def _emit(self, req_id: int, ids: list[int], complete: bool) -> Completion:
        text = self.engine.tokenizer.decode(ids)
        now = time.perf_counter()
        submitted = self._submit_time.pop(req_id, now)
        self._emitted_total += 1
        self.engine.stats.tokens_generated += len(ids)
        return Completion(
            req_id, text, len(ids), bool(complete),
            # On-device refill: the host cannot observe the true first-token
            # instant mid-chunk; harvest time is an honest upper bound.
            first_token_s=round(now - submitted, 4),
            token_ids=ids,
        )

    def _run_device(
        self,
        on_complete: Callable[[Completion], None] | None,
        drain: bool,
    ) -> list[Completion]:
        """Drive the on-device scheduler: stage -> chunk -> harvest."""
        results: list[Completion] = []
        self._q_head_host = int(self._q_head)
        # Adopt slots prefilled through the host-path API (_fill_slots) so
        # both entry points compose; device refills bypass self._slots.
        host_filled = [
            (i, s.request_id) for i, s in enumerate(self._slots)
            if s.request_id is not None
        ]
        if host_filled:
            slot_req = np.asarray(self._slot_req).copy()
            for i, req_id in host_filled:
                if slot_req[i] < 0:
                    slot_req[i] = req_id
                self._slots[i].request_id = None
            self._slot_req = jax.device_put(
                jnp.asarray(slot_req), self._slot_req.sharding
            )
        if (
            not self._queue
            and self._ring_occupancy() == 0
            and not int((np.asarray(self._slot_req) >= 0).sum())
        ):
            return []

        def harvest_ring(comp_meta, comp_tokens, comp_count) -> None:
            meta = np.asarray(comp_meta)[:comp_count]
            toks = np.asarray(comp_tokens)[:comp_count]
            for row, tok_row in zip(meta, toks):
                req_id, out_pos, complete = int(row[0]), int(row[1]), row[2]
                completion = self._emit(
                    req_id, tok_row[:out_pos].tolist(), bool(complete)
                )
                results.append(completion)
                if on_complete is not None:
                    on_complete(completion)

        stats = self.engine.stats
        while True:
            self._stage()
            self._rng, key = jax.random.split(self._rng)
            chunk_start = time.perf_counter()
            (self.cache["k"], self.cache["v"], self.dcache["k"],
             self.dcache["v"], self.rows, self.cache["index"],
             self.dcache["index"], self.state, self.logits, self.tokens_out,
             self.out_pos, self.done, self._slot_req, self._q_head,
             self._comp_tokens, self._comp_meta, comp_count, status) = (
                self._decode_refill(
                    self.engine.params,
                    self.engine.draft_params if self.spec else {},
                    self.cache["k"], self.cache["v"],
                    self.dcache["k"], self.dcache["v"],
                    self.rows, self.cache["index"], self.dcache["index"],
                    self.state, self.logits,
                    self.tokens_out, self.out_pos, self.done, self._slot_req,
                    self._q_index, self._q_dindex, self._q_logits,
                    self._q_req, self._q_phys,
                    self._q_head, self._q_tail,
                    self._comp_tokens, self._comp_meta, key,
                    jnp.int32(self._device_steps),
                )
            )
            status_np = np.asarray(status)
            stats.generate_calls += 1
            stats.generate_seconds += time.perf_counter() - chunk_start
            comp_n = int(comp_count)
            self._q_head_host = int(self._q_head)
            if comp_n:
                harvest_ring(self._comp_meta, self._comp_tokens, comp_n)
            (done_np, out_pos_np, state_np, slot_req_np, steps_np,
             rows_np) = status_np
            # Refresh the host's row map: _free_rows derives the free set
            # from it at the next stage.
            self._rows_host = rows_np.astype(np.int32)
            stats.decode_steps += int(steps_np[0])
            live = int((slot_req_np >= 0).sum())
            unfinished = int(((slot_req_np >= 0) & (done_np == 0)).sum())
            queued = self._ring_occupancy() > 0 or bool(self._queue)
            if not queued and unfinished == 0:
                # Final harvest: finished slots never evicted (ring empty).
                if live:
                    tokens = np.asarray(self.tokens_out)
                    for i in range(self.slots):
                        if slot_req_np[i] < 0:
                            continue
                        complete = True
                        if self.dfa is not None:
                            complete = int(state_np[i]) == self.dfa.accept
                        completion = self._emit(
                            int(slot_req_np[i]),
                            tokens[i, : out_pos_np[i]].tolist(),
                            complete,
                        )
                        results.append(completion)
                        if on_complete is not None:
                            on_complete(completion)
                    self._slot_req = jax.device_put(
                        jnp.full((self.slots,), -1, jnp.int32),
                        self._slot_req.sharding,
                    )
                break
            if not drain and not queued:
                break
        return results

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

        if self.spec:
            raise RuntimeError(
                "host-path slot prefill has no draft prefill; speculative "
                "batching stages requests through the device ring (submit + "
                "run)"
            )
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
                int(self._rows_host[i]),
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
        done, out_pos, state, steps = status
        self.engine.stats.decode_steps += int(steps[0])
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
        if self.device_refill:
            return self._run_device(on_complete, drain)
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
