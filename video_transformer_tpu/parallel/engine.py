"""The pjit inference engine: sharded prefill + constrained decode loop.

One compiled program per (batch, prompt-length) bucket:

  prefill: video patches + prompt tokens -> KV cache + first logits
  decode:  lax.while_loop of single-token steps, each step doing
           DFA logit masking (one gather), sampling, cache append.

Batches shard over the mesh "data" axis (segments of a long video — the
reference's sequential loop at content_analyzer.py:870-942 — become one
sharded forward); parameters shard over "model" per sharding.py. Everything
inside `_build_generate` is traced once; there is no per-token host
round-trip.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.config import VLMConfig
from ..models.lm import init_kv_cache
from ..models.tokenizer import ByteTokenizer
from ..models.vlm import VideoLM
from ..ops.constrained import JsonDfa
from ..ops.preprocess import preprocess_frames
from ..utils.tracing import tracer
from .mesh import DATA_AXIS, MODEL_AXIS, build_mesh
from .sharding import param_shardings

__all__ = ["InferenceEngine", "EngineStats", "EngineSession"]

# Above this many bytes, a host-resident tree is quantized on the HOST
# before placement (see _place): the fused-jit path stages source + result
# on the chip simultaneously, which a 7b bf16 tree cannot afford.
_HOST_QUANT_BYTES = int(
    os.environ.get("VTX_HOST_QUANT_BYTES", str(4 * 1024**3))
)


def _round_up(x: int, multiple: int) -> int:
    return ((x + multiple - 1) // multiple) * multiple


_compilation_cache_enabled = False


def enable_compilation_cache(cache_dir: str) -> None:
    """Enable JAX's persistent compilation cache (idempotent).

    The full generate program costs minutes of XLA compile on first trace;
    the on-disk cache turns every later process start (serving restarts,
    bench runs, eval sweeps) into a ~40 ms deserialization — measured
    working through the axon remote-compile plugin (jit_generate entries
    round-trip, 2026-08-19). Relative ``cache_dir`` values are anchored at
    the REPO root, not the cwd: tools and verify drives run from scratch
    directories, and a cwd-relative cache would silently recompile the
    whole engine there.
    """
    global _compilation_cache_enabled
    if _compilation_cache_enabled:
        return
    from pathlib import Path

    path = Path(cache_dir)
    if not path.is_absolute():
        path = Path(__file__).resolve().parents[2] / path
    path.mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(path))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    _compilation_cache_enabled = True


@dataclass
class EngineStats:
    """Cumulative device-side throughput counters."""

    generate_calls: int = 0
    tokens_generated: int = 0
    generate_seconds: float = 0.0
    prefill_tokens: int = 0
    frames_preprocessed: int = 0
    preprocess_seconds: float = 0.0
    session_resumes: int = 0
    """Decode-only continuation rounds (each one saved a full re-prefill)."""
    decode_steps: int = 0
    """While-loop iterations (decoder forwards). Each streams the decoder
    weights once — decode_steps / generate_seconds x weight bytes is the
    HBM-bandwidth utilization numerator (bench.py hbm_bw_util)."""

    @property
    def tokens_per_second(self) -> float:
        return self.tokens_generated / self.generate_seconds if self.generate_seconds else 0.0

    def as_dict(self) -> dict[str, Any]:
        return {
            "generate_calls": self.generate_calls,
            "tokens_generated": self.tokens_generated,
            "generate_seconds": round(self.generate_seconds, 3),
            "tokens_per_second": round(self.tokens_per_second, 1),
            "prefill_tokens": self.prefill_tokens,
            "frames_preprocessed": self.frames_preprocessed,
            "preprocess_seconds": round(self.preprocess_seconds, 3),
            "session_resumes": self.session_resumes,
            "decode_steps": self.decode_steps,
        }


@dataclass
class EngineSession:
    """Device-resident decode state for cache-reusing continuation.

    The reference's MAX_TOKENS continuation re-sends the full history each
    round (content_analyzer.py:1385-1464 — text-only history to avoid
    re-uploading the video). Re-prefilling is the TPU analog of that resend;
    a session instead keeps the KV cache, next-token logits, and grammar
    state on device between rounds, so each continuation round is decode
    only — zero prefill FLOPs and no host round-trip of the prefix.
    """

    cache: dict
    logits: Any
    """Next-token logits (plain engine) or the PROCESSED next-token
    log-distribution (speculative engine — rejection residuals have no
    raw-logits form)."""
    state: Any
    done: Any
    b_real: int
    dfa: Any
    rounds_left: int
    draft_cache: dict | None = None
    """The draft model's live KV cache (speculative engines only)."""


class InferenceEngine:
    """Owns params, mesh placement, and the compiled generate function."""

    def __init__(
        self,
        config: VLMConfig,
        mesh: Mesh | None = None,
        dfa: JsonDfa | None = None,
        max_new_tokens: int = 1024,
        temperature: float = 0.7,
        structure_bias: float = 0.0,
        max_forced_run: int = 2,
        seed: int = 0,
        params: Any = None,
        compilation_cache_dir: str | None = "./data/cache/jax",
        tokenizer: Any = None,
        param_dtype: str | None = None,
        quantize: str | None = None,
        fuse_projections: bool | None = None,
        kv_quant: str | None = None,
    ):
        """``structure_bias`` is a length-control logit bias added to JSON
        closing tokens (quote/bracket/brace/EOS) — positive values steer
        generation toward compact output, bounding expected length under the
        token cap (essential for untrained or high-temperature sampling).

        ``max_forced_run`` (grammar fast-forward block width minus one)
        defaults to 2 from the round-4 on-chip forceN ablation at base/int8
        (tools/decode_bench.py, 2026-08-20): narrower blocks trade a sliver
        of tokens/step (1.15 vs 1.19 at width 13) for materially cheaper
        steps, and the gap WIDENS with batch — b32: force2 6,670 tok/s vs
        full 6,362 / force4 6,327 / force8 6,473; b128: force2 7,088 vs
        force4 6,850 vs full 5,496 (+29%). With BPE vocabularies the JSON
        skeleton's forced runs are short, so wide blocks mostly buy unused
        verify columns."""
        if compilation_cache_dir:
            enable_compilation_cache(compilation_cache_dir)
        self.config = config
        self.mesh = mesh if mesh is not None else build_mesh({"model": 1})
        self.dfa = dfa
        self.max_new_tokens = max_new_tokens
        self.temperature = float(temperature)
        self.structure_bias = float(structure_bias)
        self.max_forced_run = int(max_forced_run)
        # int8 KV cache (models/lm.py::init_kv_cache quant=True): halves
        # the decode step's KV stream — the measured dominant scaling term
        # at serving note lengths (tools/stream_bench.py KV sweep: 3.4 us
        # per prompt token at b16, over half the step by L~800). Scales
        # calibrate in-program from the prefill block; the split-write
        # attention path handles quantized caches natively. Opt-in via
        # kwarg or VTX_KV_QUANT=int8 until the quality gate ships it.
        if kv_quant is None and os.environ.get("VTX_KV_QUANT") == "int8":
            kv_quant = "int8"
        if kv_quant not in (None, "int8"):
            raise ValueError(f"unsupported kv_quant mode: {kv_quant!r}")
        self.kv_quant = kv_quant
        # Pluggable tokenizer: byte-level by default, a trained BpeTokenizer
        # (models/bpe.py) for subword decoding with the token grammar.
        if tokenizer is not None and tokenizer.vocab_size != config.decoder.vocab_size:
            raise ValueError(
                f"tokenizer vocab {tokenizer.vocab_size} != decoder vocab "
                f"{config.decoder.vocab_size}"
            )
        self.tokenizer = tokenizer or ByteTokenizer(config.decoder.vocab_size)
        self.model = VideoLM(config)
        self.stats = EngineStats()
        self._rng = jax.random.PRNGKey(seed)
        self._generate_cache: dict[tuple[int, int], Any] = {}

        # Serving-weight dtype: decode at small batch is weight-bandwidth
        # bound, so bf16 resident weights ~double decode throughput vs the
        # f32 training copies (matmuls already run bf16 either way).
        # ``quantize="int8"`` goes further: decoder dense kernels stored
        # int8 + per-channel scales (models/quant.py) halve the bytes again;
        # "int4" halves them once more (nibble pairs packed into a uint8
        # carrier, models/quant.py) at coarser per-channel resolution.
        self.param_dtype = jnp.dtype(param_dtype) if param_dtype else None
        if quantize not in (None, "int8", "int4"):
            raise ValueError(f"unsupported quantize mode: {quantize!r}")
        self.quantize = quantize
        # Serve-time projection fusion (models/fuse.py): one qkv and one
        # gate/up matmul dispatch per block instead of three/two. MEASURED
        # NEUTRAL on-chip (decode_ablate_b16, 2026-08-20: fused 296.6 vs
        # unfused 301.0 steps/s at base/int8 b16) — within-program op launch
        # is NOT the decode residual; narrow-M matmul streaming occupancy
        # is (docs/roofline.md). Default OFF; kept as an opt-in
        # (VTX_FUSE_PROJ=1 or kwarg) so the ablation stays reproducible on
        # future parts where launch overhead may differ. Only legal when
        # the 'model' mesh axis is trivial (the fused concat does not shard
        # under tensor parallelism).
        model_axis = dict(zip(self.mesh.axis_names, self.mesh.devices.shape)).get(
            "model", 1
        )
        if fuse_projections is None:
            fuse_projections = os.environ.get("VTX_FUSE_PROJ", "") == "1"
        self.fuse_projections = bool(fuse_projections) and model_axis == 1

        if params is None:
            params = self.model.init_variables(jax.random.PRNGKey(seed))
        # Restore templates are built from the PRE-cast f32 structure so
        # checkpoints load regardless of the serving transform.
        self._f32_struct = jax.tree_util.tree_map(
            lambda leaf: jax.ShapeDtypeStruct(leaf.shape, leaf.dtype), params
        )
        self.params = self._place(params)
        self._tables: dict[int, Any] = {}
        # Speculative decoding (attach_draft): None = plain decode loop.
        self.draft_model: VideoLM | None = None
        self.draft_params: Any = None
        self.draft_config: VLMConfig | None = None
        self.spec_tokens = 0

    # -- speculative decoding --------------------------------------------------

    def attach_draft(
        self,
        config: VLMConfig,
        params: Any = None,
        checkpoint: str | None = None,
        spec_tokens: int = 6,
        share_target_params: bool = False,
    ) -> None:
        """Enable speculative decoding with a small draft model.

        Each decode iteration drafts ``spec_tokens``-token blocks with the
        draft (its sequential steps stream ~no weights) and verifies the
        whole block in ONE wide target forward, so the target's per-step
        weight stream and per-op overhead amortize over every accepted
        token — the "more rows per matmul dispatch" lever of
        docs/roofline.md. Greedy acceptance is exact (emitted text is
        identical to the plain loop's); temperature > 0 uses speculative
        rejection sampling, which preserves the target distribution.

        The draft must share the target's tokenizer/vocab (e.g. the tiny
        preset distilled on the same corpus drafting for base). Pass
        ``params`` (an f32 tree), ``checkpoint`` (orbax params_N dir), or
        ``share_target_params=True`` (self-draft: the draft serves the
        TARGET's already-placed tree — no init, no extra HBM copy; the
        acceptance-ceiling configuration benches use); omitted = random
        init, which still decodes correctly — every mispredicted token is
        rejected and replaced by the target's own.

        Live EngineSessions created before the attach become unusable
        (their resume carry has no draft cache) — continue_session raises
        rather than resuming them against the wrong compiled program.
        """
        if config.decoder.vocab_size != self.config.decoder.vocab_size:
            raise ValueError(
                f"draft vocab {config.decoder.vocab_size} != target vocab "
                f"{self.config.decoder.vocab_size}"
            )
        if not 2 <= int(spec_tokens) <= 16:
            raise ValueError(f"spec_tokens must be in [2, 16], got {spec_tokens}")
        self.draft_config = config
        self.draft_model = VideoLM(config)
        self.spec_tokens = int(spec_tokens)
        if share_target_params:
            if params is not None or checkpoint is not None:
                raise ValueError(
                    "share_target_params excludes params/checkpoint"
                )
            if (config.decoder != self.config.decoder
                    or config.encoder != self.config.encoder):
                raise ValueError(
                    "share_target_params needs the target's exact geometry"
                )
            self._draft_f32_struct = self._f32_struct
            self.draft_params = self.params
            self._generate_cache.clear()
            return
        if params is None:
            params = self.draft_model.init_variables(jax.random.PRNGKey(1))
        self._draft_f32_struct = jax.tree_util.tree_map(
            lambda leaf: jax.ShapeDtypeStruct(leaf.shape, leaf.dtype), params
        )
        self.draft_params = self._place_draft(params)
        self._generate_cache.clear()
        if checkpoint is not None:
            self.restore_draft(checkpoint)

    def detach_draft(self) -> None:
        """Return to the plain decode loop (drops the draft tree and every
        compiled speculative program). Live sessions from the speculative
        era become unusable, mirroring attach_draft."""
        self.draft_model = None
        self.draft_params = None
        self.draft_config = None
        self.spec_tokens = 0
        self._generate_cache.clear()

    def _place_draft(self, params: Any) -> Any:
        """Serve the draft bf16/f32 (no quantization — it is small enough
        that the unpack would cost more than the stream it saves). The
        projection fusion DOES apply: the draft's sequential decode steps
        are the most op-launch-bound programs in speculative serving."""
        params = self._cast_params(params)
        if not self.fuse_projections:
            return jax.device_put(params, param_shardings(self.mesh, params))
        from ..models.fuse import fuse_projections

        struct = jax.eval_shape(fuse_projections, params)
        shardings = param_shardings(self.mesh, struct)
        return jax.jit(fuse_projections, out_shardings=shardings)(params)

    def restore_draft(self, checkpoint_path: str) -> None:
        """Restore draft parameters from an orbax checkpoint (params_N dir
        or a parent of them — orbax resolution shared with ``restore``;
        HF safetensors directories are NOT accepted here, the draft has no
        HF counterpart)."""
        import orbax.checkpoint as ocp

        from pathlib import Path

        if self.draft_model is None:
            raise ValueError("attach_draft before restore_draft")
        given = Path(checkpoint_path)
        if given.is_dir() and (
            any(given.glob("*.safetensors"))
            or (given / "model.safetensors.index.json").exists()
        ):
            raise ValueError(
                f"{given} looks like an HF safetensors checkpoint; the draft "
                "loads orbax params_N checkpoints only"
            )
        path = self._resolve_params_dir(given)
        shardings = param_shardings(self.mesh, self._draft_f32_struct)
        template = jax.tree_util.tree_map(
            lambda s, sh: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sh),
            self._draft_f32_struct,
            shardings,
        )
        with ocp.StandardCheckpointer() as checkpointer:
            restored = checkpointer.restore(str(path.resolve()), template)
        self.draft_params = self._place_draft(restored)
        # Shapes are unchanged, so compiled programs stay valid (the draft
        # params are a call-time argument, not a traced constant).

    def _place(self, params: Any) -> Any:
        """f32 checkpoint/init tree -> served variables on the mesh
        (dtype cast, optional int8/int4 quantization, shardings applied).

        Quantization runs INSIDE one jit with explicit out_shardings rather
        than eagerly: the tree is 0.6-7 GB and the eager path would
        dispatch a per-leaf op chain through the tunnel; one fused program
        quantizes and places everything device-side. (int4 avoids XLA's
        sub-byte s4 dtype entirely — the axon backend cannot relayout s4
        at any executable boundary; see models/quant.py.)

        EXCEPT for huge host trees: the jit stages the full-precision
        source onto the chip next to its quantized result, so a 7b bf16
        tree (~15 GB) peaks at ~24 GB of HBM and dies with
        RESOURCE_EXHAUSTED on a 16 GB part (observed: the 152k-grammar
        on-chip gate, round 4). When the source leaves are host numpy and
        the cast tree exceeds _HOST_QUANT_BYTES, quantize on the HOST
        (models/quant.py handles numpy leaves without touching the device)
        and device_put only the quantized result — which also halves the
        bytes pushed through the tunnel.
        """
        params = self._cast_params(params)
        if not self.quantize and not self.fuse_projections:
            return jax.device_put(params, param_shardings(self.mesh, params))
        from ..models.fuse import fuse_projections
        from ..models.quant import quantize_decoder

        leaves = jax.tree_util.tree_leaves(params)
        if (
            self.quantize
            and sum(getattr(leaf, "nbytes", 0) for leaf in leaves)
            > _HOST_QUANT_BYTES
            and all(isinstance(leaf, np.ndarray) for leaf in leaves)
        ):
            params = quantize_decoder(params, self.quantize)  # host-side
            if not self.fuse_projections:
                return jax.device_put(
                    params, param_shardings(self.mesh, params)
                )
            struct = jax.eval_shape(fuse_projections, params)
            shardings = param_shardings(self.mesh, struct)
            # No donate_argnums: the argument is host numpy here, and JAX
            # ignores donation of uncommitted host buffers (it only warns).
            return jax.jit(fuse_projections, out_shardings=shardings)(params)

        def transform(p):
            if self.quantize:
                p = quantize_decoder(p, self.quantize)
            if self.fuse_projections:
                p = fuse_projections(p)
            return p

        struct = jax.eval_shape(transform, params)
        shardings = param_shardings(self.mesh, struct)
        return jax.jit(transform, out_shardings=shardings)(params)

    def close_bias_array(self) -> jax.Array | None:
        """Length-control logit bias toward JSON closing tokens (or None).

        Every decode path over this engine's model (the generate program,
        session resumes, the ContinuousBatcher's chunk program) must apply
        the SAME bias, or their samplers diverge: round 3's bench caught
        the batcher decoding to the max_new ceiling (2054-step chunks vs
        the engine's ~700) because it skipped this bias.
        """
        if self.structure_bias == 0.0:
            return None
        bias = np.zeros((self.config.decoder.vocab_size,), np.float32)
        closers = (0x22, 0x5D, 0x7D)  # " ] }
        table = getattr(self.tokenizer, "token_table", None)
        if table is not None:
            # Subword vocab: a token "closes" if its LAST byte is a JSON
            # closer. Biasing raw byte codepoints as ids here would land on
            # arbitrary tokens (the 152k-grammar on-chip test failed exactly
            # that way: 9.5 bias on 4 unrelated ids, note never accepted).
            cols, lens = table()
            last = cols[np.arange(cols.shape[0]), np.maximum(lens - 1, 0)]
            mask = (lens > 0) & np.isin(last, closers)
            bias[mask[: bias.shape[0]]] = self.structure_bias
        else:
            for token in closers:  # byte-level vocab: ids ARE codepoints
                bias[token] = self.structure_bias
        bias[self.tokenizer.EOS] = self.structure_bias
        return jnp.asarray(bias)

    def _cast_params(self, params: Any) -> Any:
        if self.param_dtype is None:
            return params
        target = self.param_dtype

        def cast(leaf):
            if hasattr(leaf, "dtype") and leaf.dtype == jnp.float32:
                return leaf.astype(target)
            return leaf

        return jax.tree_util.tree_map(cast, params)

    def _table_for(self, dfa: JsonDfa | None):
        if dfa is None:
            return None
        key = id(dfa)
        if key not in self._tables:
            tables = dfa.device_table()
            replicated = NamedSharding(self.mesh, P())
            shardings: Any = replicated
            if isinstance(tables, dict) and "bits" in tables:
                # TokenGrammar bitset [S, ceil(V/32)]: the one big grammar
                # array (~114 MB at S≈6k, V=152k). Shard its word axis over
                # "model" — per-chip residency divides by TP degree, and the
                # per-step cost is gathering [B, W/tp] rows that XLA
                # all-gathers (KBs over ICI) inside the decode loop.
                model_axis = self.mesh.shape[MODEL_AXIS]
                words = tables["bits"].shape[1]
                bits_spec = (
                    P(None, MODEL_AXIS)
                    if model_axis > 1 and words % model_axis == 0
                    else P()
                )
                shardings = {
                    name: NamedSharding(
                        self.mesh, bits_spec if name == "bits" else P()
                    )
                    for name in tables
                }
            self._tables[key] = jax.device_put(tables, shardings)
        return self._tables[key]

    @property
    def _subword(self) -> bool:
        """Subword tokenizers expose the grammar primitive ``token_table``
        (models/bpe.py, models/hf_tokenizer.py); the byte tokenizer does
        not."""
        return hasattr(self.tokenizer, "token_table")

    @property
    def byte_vocab(self) -> int:
        """Column width for byte-DFA construction against this tokenizer.

        Byte engines mask logits directly with the byte table, so it must
        span the full vocab; subword engines only walk byte columns (0-255 +
        specials), so grammars build at the canonical 512 width and are
        projected by wrap_grammar.
        """
        return 512 if self._subword else self.tokenizer.vocab_size

    def wrap_grammar(self, byte_dfa):
        """Project a byte-level grammar for this engine's tokenizer.

        Byte tokenizer: returned unchanged. Subword tokenizer (self-trained
        BPE or an HF vocab adapter): wrapped in a TokenGrammar (cached per
        DFA identity — the bitset precompute is host work worth reusing).
        """
        if not self._subword:
            return byte_dfa
        if not hasattr(self, "_wrapped_grammars"):
            self._wrapped_grammars = {}
        key = id(byte_dfa)
        if key not in self._wrapped_grammars:
            from ..ops.token_grammar import TokenGrammar

            self._wrapped_grammars[key] = TokenGrammar(byte_dfa, self.tokenizer)
        return self._wrapped_grammars[key]

    @staticmethod
    def _resolve_params_dir(checkpoint_path):
        """A concrete ``params_N`` dir from either itself or a parent of
        several (highest step wins; orbax in-progress tmp dirs from a
        killed save are skipped)."""
        from pathlib import Path

        path = Path(checkpoint_path)
        if not path.is_dir() or path.name.startswith("params_"):
            return path

        def step_of(p: Path) -> int | None:
            suffix = p.name.split("_")[-1]
            return int(suffix) if suffix.isdigit() else None

        candidates = sorted(
            (
                p for p in path.iterdir()
                if p.name.startswith("params_") and step_of(p) is not None
            ),
            key=step_of,
        )
        if not candidates:
            raise FileNotFoundError(f"no params_N checkpoints under {path}")
        return candidates[-1]

    def restore(self, checkpoint_path: str) -> None:
        """Restore trained parameters from an orbax or HF checkpoint.

        Accepts a concrete ``params_N`` directory, a parent directory of
        them (the highest step is taken), or an **HF checkpoint directory**
        (sharded ``*.safetensors`` + index.json, e.g. a downloaded
        Qwen2-VL-7B-Instruct) — detected by the presence of safetensors
        files and routed through ``models.port.load_qwen2vl_dir``. Restored
        arrays adopt the engine's existing shardings.
        """
        from pathlib import Path

        import orbax.checkpoint as ocp

        path = Path(checkpoint_path)
        if path.is_dir() and (
            any(path.glob("*.safetensors"))
            or (path / "model.safetensors.index.json").exists()
        ):
            self._restore_hf(path)
            return
        path = self._resolve_params_dir(path)
        # Checkpoints are written f32 by the trainer; restore against the
        # engine's pre-transform f32 structure, then re-apply the serving
        # transform (dtype cast / int8 quantization / shardings).
        #
        # Big quantized restores go through HOST memory first: a device
        # template would land the full f32 tree on-chip BEFORE _place
        # quantizes, peaking at ~3x the served bytes — the same
        # RESOURCE_EXHAUSTED class the host-quant branch fixed for HF
        # loads (round 4) would survive on the orbax path otherwise.
        f32_bytes = sum(
            int(np.prod(s.shape)) * s.dtype.itemsize
            for s in jax.tree_util.tree_leaves(self._f32_struct)
        )
        if self.quantize and f32_bytes > _HOST_QUANT_BYTES:
            # Pure-HOST restore (numpy leaves, no device placement): works
            # even where the accelerator plugin exposes no CPU jax backend
            # (axon does not), and the numpy leaves route _place through
            # the host-quantize branch.
            with ocp.Checkpointer(ocp.PyTreeCheckpointHandler()) as ckptr:
                restored = ckptr.restore(
                    str(path.resolve()),
                    restore_args=jax.tree_util.tree_map(
                        lambda s: ocp.RestoreArgs(restore_type=np.ndarray),
                        self._f32_struct,
                    ),
                )
        else:
            shardings = param_shardings(self.mesh, self._f32_struct)
            template = jax.tree_util.tree_map(
                lambda s, sh: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sh),
                self._f32_struct,
                shardings,
            )
            with ocp.StandardCheckpointer() as checkpointer:
                restored = checkpointer.restore(str(path.resolve()), template)
        self.params = self._place(restored)
        self._generate_cache.clear()

    def _restore_hf(self, path) -> None:
        """Load an HF safetensors checkpoint dir into the serving params.

        The ported tree must match the engine's initialized structure leaf
        for leaf (same preset geometry as the checkpoint); shape or
        structure drift raises with the offending paths instead of jitting
        a silently-wrong program.
        """
        from ..models.port import load_qwen2vl_dir

        restored = {"params": load_qwen2vl_dir(str(path), self.config)}

        def paths_of(tree):
            return {
                jax.tree_util.keystr(kp): leaf.shape
                for kp, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]
            }

        expected, got = paths_of(self._f32_struct), paths_of(restored)
        if expected != got:
            missing = sorted(set(expected) - set(got))[:4]
            extra = sorted(set(got) - set(expected))[:4]
            drifted = sorted(
                k for k in set(expected) & set(got) if expected[k] != got[k]
            )[:4]
            raise ValueError(
                f"HF checkpoint does not match preset {self.config.name}: "
                f"missing={missing} extra={extra} shape_drift="
                f"{[(k, got[k], expected[k]) for k in drifted]}"
            )
        self.params = self._place(restored)
        self._generate_cache.clear()

    # -- compiled program ----------------------------------------------------

    def _block_width(self, dfa: JsonDfa | None) -> int:
        if self.draft_model is not None:
            return self.spec_tokens
        return (1 + self.max_forced_run) if dfa is not None else 1

    def _kv_spec(self, cfg: VLMConfig | None = None) -> P:
        # Per-layer cache leaves [B, Hkv, S, D]: batch over "data"; kv heads
        # over "model" too when they divide the axis (k/v are produced
        # head-sharded by the column-parallel projections, so this keeps
        # them resident without an all-gather).
        cfg = cfg or self.config
        model_axis = self.mesh.shape[MODEL_AXIS]
        if model_axis > 1 and cfg.decoder.num_kv_heads % model_axis == 0:
            return P(DATA_AXIS, MODEL_AXIS)
        return P(DATA_AXIS)

    def _decode_loop_fn(self, dfa: JsonDfa | None):
        """Build ``run_decode(params, logits, cache, state, done, rng)``.

        One full constrained decode round: up to max_new_tokens appended per
        row (grammar fast-forward blocks count their forced run). Shared by
        the prefill+decode generate program and the decode-only resume
        program (cache-reusing continuation) — both must trace the IDENTICAL
        loop so a resumed generation is bit-equivalent to a longer budget.
        Returns the final carry so callers can resume again.
        """
        cfg = self.config
        table = self._table_for(dfa)
        model = self.model
        temperature = self.temperature
        max_new = self.max_new_tokens
        eos = self.tokenizer.EOS

        # Grammar fast-forward: per-state forced literal runs let one decoder
        # call append (1 + run) tokens. ~half the JSON skeleton is forced, so
        # this roughly halves decode iterations with zero misprediction.
        if dfa is not None:
            f_len, f_tok, f_end = dfa.forced_tables(max_run=self.max_forced_run)
            forced_len = jnp.asarray(f_len)
            forced_tok = jnp.asarray(f_tok)
            forced_end = jnp.asarray(f_end)
        block_width = self._block_width(dfa)
        # Per-row out_pos may reach max_new - 1 + block_width before the row
        # freezes, and done rows still write an (ignored) EOS block at
        # out_pos each step — 2x block_width of slack guarantees
        # dynamic_update_slice never clamps into valid tokens.
        out_width = max_new + 2 * block_width

        close_bias = self.close_bias_array()

        def sample(logits, state, done, key):
            if table is not None:
                logits = dfa.constrain(logits, state, table)
            if close_bias is not None:
                logits = logits + close_bias
            if temperature > 0:
                tok = jax.random.categorical(key, logits / temperature, axis=-1)
            else:
                tok = jnp.argmax(logits, axis=-1)
            # Finished rows keep emitting EOS.
            return jnp.where(done, eos, tok).astype(jnp.int32)

        write_rows = jax.vmap(
            lambda row, block, pos: jax.lax.dynamic_update_slice(row, block, (pos,))
        )

        def run_decode(params, logits, cache, state, finished, rng):
            # ``finished`` [B] marks PERMANENTLY ended rows (grammar accept,
            # natural EOS, batch padding). The per-round token cap instead
            # freezes a row via out_pos — and since out_pos resets each
            # round, a capped row thaws automatically when a session
            # resumes (the cap is a round budget, not a terminal state).
            def cond(carry):
                step, _, _, _, _, out_pos, finished, _ = carry
                # Rows that hit the token cap freeze individually so one
                # capped row never truncates the rest of the batch.
                return (step < max_new) & ~jnp.all(finished | (out_pos >= max_new))

            def body(carry):
                step, logits, cache, state, tokens, out_pos, finished, rng = carry
                frozen = finished | (out_pos >= max_new)
                b = logits.shape[0]
                rng, key = jax.random.split(rng)
                tok = sample(logits, state, frozen, key)

                if table is not None:
                    mid_state = dfa.advance(state, tok, table)
                    mid_state = jnp.where(frozen, state, mid_state)
                    # Fast-forward the forced literal run from mid_state.
                    run = jnp.where(frozen, 0, forced_len[mid_state])  # [B]
                    cols = jnp.arange(block_width - 1)[None, :]
                    run_block = jnp.where(
                        cols < run[:, None], forced_tok[mid_state], eos
                    )
                    block = jnp.concatenate([tok[:, None], run_block], axis=1)
                    new_state = jnp.where(run > 0, forced_end[mid_state], mid_state)
                    finished = finished | (new_state == dfa.accept)
                    state = new_state
                else:
                    run = jnp.zeros((b,), jnp.int32)
                    block = tok[:, None]
                    finished = finished | (~frozen & (tok == eos))

                tokens = write_rows(tokens, block, out_pos)
                # A natural EOS ends the row without being emitted (run==0 &
                # tok==eos only happens forced-on-frozen or as a live no-dfa
                # stop); frozen rows never advance.
                ended = finished | frozen
                advance = jnp.where(ended & (run == 0) & (tok == eos), 0, 1 + run)
                out_pos = out_pos + advance

                index_before = cache["index"]
                # Each row's next logits sit after its last VALID token
                # (block column ``run``) — the head computes only that
                # column; the decoder advanced index by the full block
                # width, so rewind to the per-row logical position.
                new_logits, cache = model.apply(
                    params, block, cache, run, method=VideoLM.decode_block_pick
                )
                cache = dict(cache, index=index_before + advance)
                # Frozen rows keep their last live logits: the EOS filler
                # block must not poison the next-token distribution a
                # resumed session samples from (the stale k/v it wrote past
                # the row's index is never attended, and is overwritten on
                # resume).
                logits = jnp.where(frozen[:, None], logits, new_logits)
                return step + 1, logits, cache, state, tokens, out_pos, finished, rng

            b = logits.shape[0]
            tokens = jnp.full((b, out_width), eos, jnp.int32)
            out_pos = jnp.zeros((b,), jnp.int32)
            carry = (
                jnp.int32(0), logits, cache, state, tokens, out_pos, finished, rng
            )
            steps, logits, cache, state, tokens, out_pos, finished, _ = (
                jax.lax.while_loop(cond, body, carry)
            )
            # complete = the grammar accepted (or EOS without a grammar) —
            # a False row ran out of token budget and can be continued.
            complete = (state == dfa.accept) if dfa else finished
            return tokens, out_pos, complete, logits, cache, state, finished, steps

        return run_decode

    def _spec_decode_loop_fn(self, dfa: JsonDfa | None):
        """Build the speculative decode loop (draft attached).

        Returns ``(run_spec, process)``:

          run_spec(params, draft_params, logp, cache, draft_cache, state,
                   finished, rng)
            -> (tokens, out_pos, complete, logp, cache, draft_cache,
                state, finished, steps)

        Per iteration: the draft autoregressively proposes a K-token block
        (t0 sampled from the TARGET's carried distribution, then K-1 draft
        proposals, each grammar-constrained), the target verifies the whole
        block in one wide ``decode_block`` forward, and the longest correct
        prefix is emitted. Greedy acceptance (temperature 0) is exact —
        every emitted token is the argmax of the target's constrained
        distribution at its position, bit-identical to the plain loop.
        temperature > 0 accepts proposal x with probability min(1, p(x)/q(x))
        and resamples a rejection from norm(max(p - q, 0)) — standard
        speculative sampling, so the emitted distribution IS the target's.

        A grammar-constrained draft proposes forced-run tokens with
        probability 1 (single-support q == single-support p), so the plain
        loop's forced-table fast-forward is subsumed rather than reimplemented.

        ``logp`` carries the PROCESSED next-token log-distribution
        (grammar mask + close bias + temperature already applied; it must,
        because a rejection's residual distribution has no raw-logits
        form). Entry points process raw prefill logits via ``process``.
        """
        model = self.model
        draft = self.draft_model
        assert draft is not None
        table = self._table_for(dfa)
        temperature = self.temperature
        max_new = self.max_new_tokens
        eos = self.tokenizer.EOS
        spec_k = self.spec_tokens
        greedy = temperature <= 0
        out_width = max_new + 2 * spec_k
        close_bias = self.close_bias_array()

        def process(logits, state):
            if table is not None:
                logits = dfa.constrain(logits, state, table)
            if close_bias is not None:
                logits = logits + close_bias
            scale = temperature if temperature > 0 else 1.0
            return jax.nn.log_softmax(logits / scale, axis=-1)

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
            lambda row, block, pos: jax.lax.dynamic_update_slice(row, block, (pos,))
        )

        def run_spec(params, draft_params, logp, cache, dcache, state, finished, rng):
            def cond(carry):
                step, _, _, _, _, _, out_pos, finished, _ = carry
                return (step < max_new) & ~jnp.all(finished | (out_pos >= max_new))

            def body(carry):
                (step, logp, cache, dcache, state, tokens, out_pos,
                 finished, rng) = carry
                frozen = finished | (out_pos >= max_new)
                b = logp.shape[0]
                rng, k0, kd, ka = jax.random.split(rng, 4)

                # t0 comes from the target's own distribution — always
                # correct, so a cycle emits at least one token per live row.
                t0 = pick(logp, frozen, k0)
                s1 = advance_live(state, t0, ~frozen)

                # Draft phase: K sequential feeds of [t0, x1..x_{K-1}]
                # producing proposals x1..x_{K-1}. Feed K (of the last
                # proposal) keeps the draft cache covering every block
                # position the target verifies, so both caches advance by
                # the same per-row amount afterwards. Scan outputs are the
                # per-position proposal, its processed draft distribution
                # (stochastic acceptance needs q), and the grammar state
                # constraining it.
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
                # prop/sst: [K, B]; sst[i] = grammar state AFTER block token
                # i (it constrained proposal i+1). slq: [K, B, V] processed
                # draft dists (empty when greedy).
                block = jnp.concatenate(
                    [t0[:, None], jnp.moveaxis(prop, 0, 1)[:, : spec_k - 1]], axis=1
                )  # [B, K]

                # One wide target forward verifies every position.
                index_before = cache["index"]
                all_logits, cache = model.apply(
                    params, block, cache, method=VideoLM.decode_block
                )  # [B, K, V]

                # Acceptance per proposal (block position i >= 1):
                # all_logits[:, i-1] is the target's distribution for block
                # position i, constrained at the SAME state sst[i-1] the
                # draft used to propose it.
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
                        lq = jnp.take_along_axis(slq[i - 1], tok_i[:, None], 1)[:, 0]
                        accs.append(log_u[:, i] < lp - lq)

                # Emit the longest accepted prefix. An emitted EOS finishes
                # the row without counting toward out_pos (the plain loop's
                # semantics: the grammar's accept edge IS the EOS token).
                alive = ~frozen
                adv = jnp.zeros((b,), jnp.int32)
                new_state = state
                new_fin = finished
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

                # Next sampling distribution: the target's dist after the
                # emitted prefix — P for greedy / full acceptance, the
                # rejection residual norm(max(p - q, 0)) for a rejected
                # position (that is the distribution speculative sampling
                # must draw the correction from).
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
                    resid = jnp.where(total > 0, resid / jnp.maximum(total, 1e-30),
                                      jnp.exp(p_next))
                    rejected = (adv < spec_k)[:, None]
                    new_logp = jnp.where(rejected, jnp.log(resid + 1e-30), p_next)
                logp = jnp.where(frozen[:, None], logp, new_logp)

                tokens = write_rows(tokens, block, out_pos)
                out_pos = out_pos + adv
                cache = dict(cache, index=index_before + adv)
                dcache = dict(dcache2, index=dindex_before + adv)
                return (step + 1, logp, cache, dcache, new_state, tokens,
                        out_pos, new_fin, rng)

            b = logp.shape[0]
            tokens = jnp.full((b, out_width), eos, jnp.int32)
            out_pos = jnp.zeros((b,), jnp.int32)
            carry = (jnp.int32(0), logp, cache, dcache, state, tokens,
                     out_pos, finished, rng)
            (steps, logp, cache, dcache, state, tokens, out_pos,
             finished, _) = jax.lax.while_loop(cond, body, carry)
            complete = (state == dfa.accept) if dfa else finished
            return (tokens, out_pos, complete, logp, cache, dcache, state,
                    finished, steps)

        return run_spec, process

    def _build_generate(
        self,
        batch: int,
        prompt_len: int,
        with_video: bool,
        dfa: JsonDfa | None,
        extra_rounds: int = 0,
        with_session: bool = False,
    ):
        """Trace + compile the full generate program for one shape bucket.

        ``extra_rounds`` reserves KV-cache room for that many decode-only
        continuation rounds after this one (cache-reusing continuation);
        ``with_session`` additionally returns the live decode carry
        (logits/cache/state/done) so those rounds can resume it.
        """
        cfg = self.config
        model = self.model
        max_new = self.max_new_tokens
        block_width = self._block_width(dfa)

        video_tokens = cfg.video_tokens if with_video else 0
        # + block_width + 16: the fused decode kernel's aligned in-place
        # row write can touch round_up(block_width, 8) + 8 rows past a
        # row's final index, so the cache keeps that much tail slack past
        # the last live position.
        cache_len = _round_up(
            video_tokens
            + prompt_len
            + (1 + extra_rounds) * (max_new + block_width)
            + 1
            + block_width
            + 16,
            128,
        )
        if cache_len > cfg.decoder.max_seq_len:
            raise ValueError(
                f"sequence {cache_len} exceeds max_seq_len {cfg.decoder.max_seq_len}"
            )
        data_sharding = NamedSharding(self.mesh, P(DATA_AXIS))
        kv_spec = self._kv_spec()
        run_decode = self._decode_loop_fn(dfa)

        def generate(params, patches, prompt, lengths, active, init_state, rng):
            b = prompt.shape[0]
            dtype = jnp.dtype(cfg.dtype)
            cache = init_kv_cache(
                cfg.decoder, b, cache_len, dtype,
                quant=self.kv_quant == "int8",
            )
            cache = dict(
                cache,
                k=jax.lax.with_sharding_constraint(
                    cache["k"], NamedSharding(self.mesh, kv_spec)
                ),
                v=jax.lax.with_sharding_constraint(
                    cache["v"], NamedSharding(self.mesh, kv_spec)
                ),
            )
            # ``lengths`` [B] = per-row valid token count in the prompt block
            # (continuation prefixes are ragged); ``init_state`` [B] resumes
            # the grammar mid-document on continuation calls.
            if with_video:
                logits, cache = model.apply(
                    params, patches, prompt, cache, lengths,
                    method=VideoLM.prefill,
                )
            else:
                logits, cache = model.apply(
                    params, prompt, cache, lengths, method=VideoLM.prefill_text
                )
            state = init_state
            # Batch-padding rows start done: they freeze immediately instead
            # of decoding to the token cap (a never-accepting pad row would
            # otherwise pin every call at max_new iterations).
            done = ~active
            if dfa:
                done = done | (state == dfa.accept)
            tokens, out_pos, complete, logits, cache, state, done, steps = (
                run_decode(params, logits, cache, state, done, rng)
            )
            if with_session:
                return (tokens, out_pos, complete, steps,
                        logits, cache, state, done)
            return tokens, out_pos, complete, steps

        replicated = NamedSharding(self.mesh, P())
        if with_video:
            fn = generate
            in_shardings = (
                param_shardings(self.mesh, self.params),
                data_sharding,
                data_sharding,
                data_sharding,
                data_sharding,
                data_sharding,
                replicated,
            )
        else:
            def fn(params, prompt, lengths, active, init_state, rng):  # type: ignore[misc]
                return generate(params, None, prompt, lengths, active, init_state, rng)

            in_shardings = (
                param_shardings(self.mesh, self.params),
                data_sharding,
                data_sharding,
                data_sharding,
                data_sharding,
                replicated,
            )
        replicated_out = NamedSharding(self.mesh, P())
        if with_session:
            cache_shardings = {
                "k": NamedSharding(self.mesh, kv_spec),
                "v": NamedSharding(self.mesh, kv_spec),
                "index": data_sharding,
            }
            out_shardings = (
                data_sharding, data_sharding, data_sharding, replicated_out,
                data_sharding, cache_shardings, data_sharding, data_sharding,
            )
        else:
            out_shardings = (
                data_sharding, data_sharding, data_sharding, replicated_out
            )
        return jax.jit(fn, in_shardings=in_shardings, out_shardings=out_shardings)

    def _build_generate_spec(
        self,
        batch: int,
        prompt_len: int,
        with_video: bool,
        dfa: JsonDfa | None,
        extra_rounds: int = 0,
        with_session: bool = False,
    ):
        """The speculative twin of ``_build_generate``: both models prefill
        (the draft sees the same prompt block and its own preprocessing of
        the same frames), then the spec loop drafts/verifies. Kept separate
        so the plain program — the default serving path — stays untouched
        by the draft machinery."""
        cfg = self.config
        dcfg = self.draft_config
        assert dcfg is not None and self.draft_model is not None
        model, draft = self.model, self.draft_model
        max_new = self.max_new_tokens
        spec_k = self.spec_tokens

        def cache_len_for(c: VLMConfig) -> int:
            video_tokens = c.video_tokens if with_video else 0
            # Same slack rationale as _build_generate, with the spec block
            # width: the wide verify (target) / per-cycle feeds (draft) can
            # overshoot a row's final index by up to a block.
            length = _round_up(
                video_tokens + prompt_len
                + (1 + extra_rounds) * (max_new + spec_k)
                + 1 + spec_k + 16,
                128,
            )
            if length > c.decoder.max_seq_len:
                raise ValueError(
                    f"sequence {length} exceeds max_seq_len "
                    f"{c.decoder.max_seq_len} ({c.name})"
                )
            return length

        cache_len, draft_cache_len = cache_len_for(cfg), cache_len_for(dcfg)
        data_sharding = NamedSharding(self.mesh, P(DATA_AXIS))
        kv_spec = self._kv_spec()
        draft_kv_spec = self._kv_spec(dcfg)
        run_spec, process = self._spec_decode_loop_fn(dfa)

        def init_cache(c, b, length, spec):
            cache = init_kv_cache(c.decoder, b, length, jnp.dtype(c.dtype))
            constrain = NamedSharding(self.mesh, spec)
            return {
                "k": jax.lax.with_sharding_constraint(cache["k"], constrain),
                "v": jax.lax.with_sharding_constraint(cache["v"], constrain),
                "index": cache["index"],
            }

        def generate(params, draft_params, patches, draft_patches, prompt,
                     lengths, active, init_state, rng):
            b = prompt.shape[0]
            cache = init_cache(cfg, b, cache_len, kv_spec)
            dcache = init_cache(dcfg, b, draft_cache_len, draft_kv_spec)
            if with_video:
                logits, cache = model.apply(
                    params, patches, prompt, cache, lengths,
                    method=VideoLM.prefill,
                )
                _, dcache = draft.apply(
                    draft_params, draft_patches, prompt, dcache, lengths,
                    method=VideoLM.prefill,
                )
            else:
                logits, cache = model.apply(
                    params, prompt, cache, lengths, method=VideoLM.prefill_text
                )
                _, dcache = draft.apply(
                    draft_params, prompt, dcache, lengths,
                    method=VideoLM.prefill_text,
                )
            state = init_state
            done = ~active
            if dfa:
                done = done | (state == dfa.accept)
            logp = process(logits, state)
            (tokens, out_pos, complete, logp, cache, dcache, state, done,
             steps) = run_spec(
                params, draft_params, logp, cache, dcache, state, done, rng
            )
            if with_session:
                return (tokens, out_pos, complete, steps,
                        logp, cache, dcache, state, done)
            return tokens, out_pos, complete, steps

        replicated = NamedSharding(self.mesh, P())
        param_sh = param_shardings(self.mesh, self.params)
        draft_sh = param_shardings(self.mesh, self.draft_params)
        if with_video:
            fn = generate
            in_shardings = (
                param_sh, draft_sh, data_sharding, data_sharding,
                data_sharding, data_sharding, data_sharding, data_sharding,
                replicated,
            )
        else:
            def fn(params, draft_params, prompt, lengths, active, init_state, rng):  # type: ignore[misc]
                return generate(
                    params, draft_params, None, None, prompt, lengths,
                    active, init_state, rng,
                )

            in_shardings = (
                param_sh, draft_sh, data_sharding, data_sharding,
                data_sharding, data_sharding, replicated,
            )
        if with_session:
            out_shardings = (
                data_sharding, data_sharding, data_sharding, replicated,
                data_sharding,
                {
                    "k": NamedSharding(self.mesh, kv_spec),
                    "v": NamedSharding(self.mesh, kv_spec),
                    "index": data_sharding,
                },
                {
                    "k": NamedSharding(self.mesh, draft_kv_spec),
                    "v": NamedSharding(self.mesh, draft_kv_spec),
                    "index": data_sharding,
                },
                data_sharding, data_sharding,
            )
        else:
            out_shardings = (data_sharding, data_sharding, data_sharding, replicated)
        jitted = jax.jit(fn, in_shardings=in_shardings, out_shardings=out_shardings)
        # Draft params bind at call time (restore_draft swaps them without
        # recompiling — shapes are part of the trace, values are not).
        return lambda params, *rest: jitted(params, self.draft_params, *rest)

    def _get_generate(
        self,
        batch: int,
        prompt_len: int,
        with_video: bool,
        dfa: JsonDfa | None,
        extra_rounds: int = 0,
        with_session: bool = False,
    ):
        key = (
            batch, prompt_len, with_video, id(dfa) if dfa else 0,
            extra_rounds, with_session,
        )
        if key not in self._generate_cache:
            build = (
                self._build_generate_spec if self.draft_model is not None
                else self._build_generate
            )
            self._generate_cache[key] = build(
                batch, prompt_len, with_video, dfa, extra_rounds, with_session
            )
        return self._generate_cache[key]

    def _get_resume(self, dfa: JsonDfa | None):
        """Decode-only program resuming a session's while_loop (no prefill).

        jit specializes per cache/batch shape on call, so one entry per
        grammar identity suffices. The input cache is donated: the session
        buffer is updated in place rather than copied (KV is the dominant
        allocation at long cache lengths).
        """
        key = ("resume", id(dfa) if dfa else 0)
        if key not in self._generate_cache:
            data_sharding = NamedSharding(self.mesh, P(DATA_AXIS))
            replicated = NamedSharding(self.mesh, P())
            cache_shardings = {
                "k": NamedSharding(self.mesh, self._kv_spec()),
                "v": NamedSharding(self.mesh, self._kv_spec()),
                "index": data_sharding,
            }
            if self.draft_model is not None:
                run_spec, _ = self._spec_decode_loop_fn(dfa)
                draft_cache_shardings = {
                    "k": NamedSharding(self.mesh, self._kv_spec(self.draft_config)),
                    "v": NamedSharding(self.mesh, self._kv_spec(self.draft_config)),
                    "index": data_sharding,
                }
                jitted = jax.jit(
                    run_spec,
                    in_shardings=(
                        param_shardings(self.mesh, self.params),
                        param_shardings(self.mesh, self.draft_params),
                        data_sharding, cache_shardings, draft_cache_shardings,
                        data_sharding, data_sharding, replicated,
                    ),
                    out_shardings=(
                        data_sharding, data_sharding, data_sharding,
                        data_sharding, cache_shardings, draft_cache_shardings,
                        data_sharding, data_sharding, replicated,
                    ),
                    donate_argnums=(3, 4),
                )
                self._generate_cache[key] = (
                    lambda params, *rest: jitted(params, self.draft_params, *rest)
                )
            else:
                run_decode = self._decode_loop_fn(dfa)
                self._generate_cache[key] = jax.jit(
                    run_decode,
                    in_shardings=(
                        param_shardings(self.mesh, self.params),
                        data_sharding, cache_shardings, data_sharding,
                        data_sharding, replicated,
                    ),
                    out_shardings=(
                        data_sharding, data_sharding, data_sharding, data_sharding,
                        cache_shardings, data_sharding, data_sharding, replicated,
                    ),
                    donate_argnums=(2,),
                )
        return self._generate_cache[key]

    # -- public API ----------------------------------------------------------

    @property
    def data_parallel(self) -> int:
        return self.mesh.shape[DATA_AXIS]

    def preprocess(self, frames: np.ndarray) -> jax.Array:
        """uint8 [B, T, H, W, 3] -> patches, timed into stats."""
        start = time.perf_counter()
        with tracer.span("engine.preprocess", frames=frames.shape[0] * frames.shape[1]):
            patches = preprocess_frames(
                jnp.asarray(frames), self.config.encoder, jnp.dtype(self.config.dtype)
            )
            patches.block_until_ready()
        self.stats.preprocess_seconds += time.perf_counter() - start
        self.stats.frames_preprocessed += frames.shape[0] * frames.shape[1]
        return patches

    def _draft_patches(self, frames: np.ndarray) -> jax.Array:
        """The draft model's own view of the clip: temporally resampled to
        its frame count, preprocessed at its encoder geometry (spatial
        resize happens inside preprocess_frames). Cheap — the draft encoder
        is tiny next to the target's."""
        assert self.draft_config is not None
        want = self.draft_config.encoder.num_frames
        have = frames.shape[1]
        if have != want:
            idx = np.round(np.linspace(0, have - 1, want)).astype(int)
            frames = frames[:, idx]
        return preprocess_frames(
            jnp.asarray(frames), self.draft_config.encoder,
            jnp.dtype(self.draft_config.dtype),
        )

    def _prompt_bucket(self, prompts: list[str], with_video: bool) -> int:
        """Smallest 128-multiple holding every prompt (+BOS) untruncated.

        Sizing the compile bucket to the rendered templates (instead of a
        fixed 256) means the model sees its FULL instructions on the hot
        path — the round-1 bench showed `event=prompt_truncated` because the
        389-line-spec-derived prompts never fit a fixed bucket. Template
        variables only nudge the byte count, so in practice each template
        maps to one stable bucket (no recompile churn). The bucket is capped
        so prompt + video tokens + max_new still fit the KV cache.
        """
        longest = max(
            (len(self.tokenizer.encode(p)) + 1 for p in prompts), default=1
        )
        bucket = _round_up(longest, 128)
        video_tokens = self.config.video_tokens if with_video else 0
        # Mirror the cache formula in _build_generate (extra_rounds=0):
        # round_up(video + prompt + max_new + 2*block_width + 17, 128) must
        # fit max_seq_len. Reserve the worst-case block width (grammar on:
        # 1 + max_forced_run) so a full-length prompt never pushes the
        # cache past the ceiling for ANY dfa this engine serves.
        bw_max = max(1 + self.max_forced_run, self.spec_tokens)
        fit = (self.config.decoder.max_seq_len // 128) * 128
        ceiling = fit - video_tokens - self.max_new_tokens - 2 * bw_max - 17
        ceiling = max((ceiling // 128) * 128, 128)
        return min(bucket, ceiling)

    def _pad_and_tokenize(
        self, prompts: list[str], b_real: int, prompt_len: int,
        batch_bucket: int | None = None,
    ) -> tuple[int, np.ndarray]:
        """``batch_bucket`` rounds the padded batch up to a fixed size so
        ragged final chunks reuse an existing compiled program instead of
        tracing a new bucket (pad rows freeze at step 0 — their only cost
        is the dead matmul rows)."""
        quantum = self.data_parallel
        if batch_bucket:
            quantum = _round_up(batch_bucket, self.data_parallel)
        b_padded = _round_up(max(b_real, 1), quantum)
        padded_prompts = prompts + [""] * (b_padded - b_real)
        overflow = sum(
            1 for p in prompts if len(self.tokenizer.encode(p)) + 1 > prompt_len
        )
        if overflow:
            import logging

            logging.getLogger("video_transformer").warning(
                f"event=prompt_truncated count={overflow} prompt_len={prompt_len}"
            )
        prompt_tokens = np.stack(
            [
                self.tokenizer.encode_array(p, prompt_len, add_bos=True)
                for p in padded_prompts
            ]
        )
        return b_padded, prompt_tokens

    @staticmethod
    def _byte_table(dfa) -> np.ndarray:
        """The byte-level transition table behind either grammar flavor."""
        return getattr(dfa, "dfa", dfa).next_state

    def _resume_state(self, dfa, prefix: bytes) -> int:
        """Grammar state after consuming ``prefix`` bytes (continuation)."""
        table = self._byte_table(dfa)
        state = dfa.start
        for byte in prefix:
            state = int(table[state, byte])
            if state < 0:
                raise ValueError("continuation prefix leaves the grammar")
        return state

    def _prefix_bytes(self, ids: list[int]) -> bytes:
        """Exact bytes of a generated id sequence (grammar-resume input).

        Token ids carry exact bytes even when generation was capped mid
        UTF-8 character — re-encoding decoded TEXT there would hit the
        U+FFFD replacement and fall out of the grammar.
        """
        return b"".join(self.tokenizer.token_bytes(int(t)) for t in ids)

    def _assemble_inputs(
        self,
        prompts: list[str],
        prefixes: list[list[int]] | None,
        b_real: int,
        prompt_len: int,
        dfa,
        with_video: bool,
        batch_bucket: int | None = None,
    ) -> tuple[int, int, np.ndarray, np.ndarray, np.ndarray]:
        """Token block [B, prompt_len + prefix_bucket] + per-row lengths and
        grammar resume states.

        Each ROW'S prompt occupies its OWN 128-multiple bucket (PAD-filled),
        and that row's generation starts right after it (per-row cache
        index) — the exact layout training packs (train/run.py::_pack_row),
        so positions line up even when one batch mixes templates of
        different bucket sizes. ``prompt_len`` is the batch-wide array
        width for the prompt region (max row bucket when auto-sized).
        Continuation prefixes (token-id lists) append after the row's prompt
        block and resume the grammar mid-document; the new text continues at
        the exact positions of the original pass.
        """
        b_padded, prompt_tokens = self._pad_and_tokenize(
            prompts, b_real, prompt_len, batch_bucket
        )
        row_buckets = np.full((b_padded,), prompt_len, np.int32)
        for i, p in enumerate(prompts):
            row_buckets[i] = min(
                _round_up(len(self.tokenizer.encode(p)) + 1, 128), prompt_len
            )

        prefix_ids: list[list[int]] = [[] for _ in range(b_padded)]
        if prefixes is not None:
            for i, prefix in enumerate(prefixes):
                prefix_ids[i] = [int(t) for t in prefix] if len(prefix) else []
        prefix_bucket = _round_up(max(map(len, prefix_ids), default=0), 128) if any(
            prefix_ids
        ) else 0

        total = prompt_len + prefix_bucket
        if prefix_bucket:
            # Continuation pre-check (mirrors _build_generate's cache bound,
            # raised here so callers can stop continuing gracefully).
            video_tokens = self.config.video_tokens if with_video else 0
            cache_len = _round_up(
                video_tokens + total + self.max_new_tokens
                + 2 * max(self.max_forced_run + 1, self.spec_tokens) + 17,
                128,
            )
            if cache_len > self.config.decoder.max_seq_len:
                raise ValueError(
                    f"prompt+prefix ({total} tokens) exceeds the sequence "
                    f"budget; cannot continue this generation"
                )

        tokens = np.full((b_padded, total), self.tokenizer.PAD, np.int32)
        tokens[:, :prompt_len] = prompt_tokens
        lengths = row_buckets.copy()
        start_state = dfa.start if dfa is not None else 0
        states = np.full((b_padded,), start_state, np.int32)
        for i, ids in enumerate(prefix_ids):
            if not ids:
                continue
            start = int(row_buckets[i])
            tokens[i, start : start + len(ids)] = ids
            lengths[i] = start + len(ids)
            if dfa is not None:
                states[i] = self._resume_state(dfa, self._prefix_bytes(ids))
        return b_padded, total, tokens, lengths, states

    def _normalize_prefixes(self, prefixes) -> list[list[int]] | None:
        """Accept text or token-id prefixes; ids are the exact path.

        Text prefixes re-encode (BPE boundaries may drift from the original
        pass, and a cap mid UTF-8 char breaks the grammar walk); token ids
        from a prior ``return_tokens=True`` call continue exactly.
        """
        if prefixes is None:
            return None
        return [
            self.tokenizer.encode(p) if isinstance(p, str) else list(p)
            for p in prefixes
        ]

    def _max_session_rounds(
        self, prompt_width: int, with_video: bool, requested: int,
        dfa: JsonDfa | None,
    ) -> int:
        """Largest continuation-round reserve that still fits the KV cache.

        A session's cache must hold prompt + (1 + rounds) * max_new up
        front; when the full request does not fit, grant what does (0 means
        no session — the caller falls back to re-prefill continuation).
        """
        video_tokens = self.config.video_tokens if with_video else 0
        block_width = self._block_width(dfa)
        per_round = self.max_new_tokens + block_width
        # Closed form: round_up(total, 128) <= max_seq_len iff total <= the
        # largest 128-multiple under the cap. The cache formula in
        # _build_generate is video + prompt + (1+rounds)*per_round + 1 +
        # block_width + 16, so the tail slack must come out of the budget
        # too or a maximal grant overflows max_seq_len at build time.
        cap = (self.config.decoder.max_seq_len // 128) * 128
        budget = cap - video_tokens - prompt_width - block_width - 17
        rounds = budget // per_round - 1
        return max(0, min(requested, rounds))

    def generate(
        self,
        frames: np.ndarray,
        prompts: list[str],
        prompt_len: int | None = None,
        dfa: JsonDfa | None = None,
        prefixes: list[str] | list[list[int]] | None = None,
        return_status: bool = False,
        return_tokens: bool = False,
        session_rounds: int = 0,
        return_session: bool = False,
        batch_bucket: int | None = None,
    ):
        """Analyze a batch of clips: returns one decoded text per clip.

        frames: uint8 [B, T, H, W, 3]; B is padded up to a multiple of the
        data-parallel degree before the sharded call. ``dfa`` overrides the
        engine's default decoding grammar for this call; ``prompt_len`` is
        auto-sized to fit the prompts (128-multiple bucket) when omitted.
        ``prefixes`` continues earlier generations (reference MAX_TOKENS
        continuation, content_analyzer.py:1385-1464): each row re-prefills
        prompt + prefix and resumes the grammar mid-document; the returned
        text is the NEW tail only. Prefix rows may be strings or token-id
        lists — ids (from ``return_tokens=True``) resume exactly even when
        the cap landed mid UTF-8 character. ``return_status=True`` appends
        per-row completion flags (False = ran out of token budget);
        ``return_tokens=True`` appends per-row generated token-id lists.
        ``session_rounds=N`` reserves cache room for N decode-only
        continuation rounds and ``return_session=True`` appends the
        EngineSession to drive them (None when the reserve does not fit —
        fall back to ``prefixes``); see ``continue_session``.
        ``batch_bucket`` pads ragged batches up to a fixed size so the
        final chunk of a segment sweep reuses the full-chunk program.
        """
        b_real = frames.shape[0]
        if len(prompts) != b_real:
            raise ValueError("one prompt per clip required")
        if prompt_len is None:
            prompt_len = self._prompt_bucket(prompts, with_video=True)
        dfa = dfa if dfa is not None else self.dfa
        b_padded, total, tokens_in, lengths, states = self._assemble_inputs(
            prompts, self._normalize_prefixes(prefixes), b_real, prompt_len,
            dfa, with_video=True, batch_bucket=batch_bucket,
        )
        # A cache reserve without return_session would be dead HBM and a
        # dead compile bucket — the session is the only way to use it.
        session_rounds = session_rounds if return_session else 0
        if session_rounds:
            session_rounds = self._max_session_rounds(
                total, True, session_rounds, dfa
            )

        if b_padded != b_real:
            pad = np.zeros((b_padded - b_real,) + frames.shape[1:], frames.dtype)
            frames = np.concatenate([frames, pad], axis=0)
        patches = self.preprocess(frames)
        with_session = return_session and session_rounds > 0
        fn = self._get_generate(
            b_padded, total, True, dfa, session_rounds, with_session
        )

        args = (patches, jnp.asarray(tokens_in))
        if self.draft_model is not None:
            args = (patches, self._draft_patches(frames), jnp.asarray(tokens_in))
        return self._execute(
            fn, args, lengths, states, b_real, total, True, return_status,
            return_tokens, span="engine.generate", dfa=dfa,
            session_rounds=session_rounds, return_session=return_session,
        )

    def generate_text(
        self,
        prompts: list[str],
        prompt_len: int | None = None,
        dfa: JsonDfa | None = None,
        prefixes: list[str] | list[list[int]] | None = None,
        return_status: bool = False,
        return_tokens: bool = False,
        session_rounds: int = 0,
        return_session: bool = False,
        batch_bucket: int | None = None,
    ):
        """Text-only generation (validator scoring, consolidation, rewrite)."""
        b_real = len(prompts)
        if prompt_len is None:
            prompt_len = self._prompt_bucket(prompts, with_video=False)
        dfa = dfa if dfa is not None else self.dfa
        b_padded, total, tokens_in, lengths, states = self._assemble_inputs(
            prompts, self._normalize_prefixes(prefixes), b_real, prompt_len,
            dfa, with_video=False, batch_bucket=batch_bucket,
        )
        session_rounds = session_rounds if return_session else 0
        if session_rounds:
            session_rounds = self._max_session_rounds(
                total, False, session_rounds, dfa
            )

        with_session = return_session and session_rounds > 0
        fn = self._get_generate(
            b_padded, total, False, dfa, session_rounds, with_session
        )
        return self._execute(
            fn, (jnp.asarray(tokens_in),), lengths, states, b_real, total,
            False, return_status, return_tokens, span="engine.generate_text",
            dfa=dfa, session_rounds=session_rounds, return_session=return_session,
        )

    def continue_session(
        self, session: EngineSession
    ) -> tuple[list[str], list[bool], list[list[int]]]:
        """One decode-only continuation round over a session's live cache.

        Resumes every row from its device-resident KV cache, next-token
        logits, and grammar state — no prefill, no prefix round-trip (the
        TPU replacement for the reference's history resend,
        content_analyzer.py:1385-1464). Rows already complete stay frozen
        and return empty tails. Returns (new-tail texts, complete flags,
        new-tail token ids); the session advances in place.
        """
        if session.rounds_left <= 0:
            raise ValueError("session cache exhausted; no continuation rounds left")
        if (session.draft_cache is None) != (self.draft_model is None):
            # The resume program's signature follows the ENGINE's current
            # draft state; a session from the other era would be fed to the
            # wrong compiled program (attach_draft/detach_draft document
            # that live sessions do not survive the switch).
            raise ValueError(
                "session predates an attach_draft/detach_draft switch; "
                "restart its generation"
            )
        fn = self._get_resume(session.dfa)
        self._rng, key = jax.random.split(self._rng)
        start = time.perf_counter()
        with tracer.span("engine.continue_session", batch=session.b_real):
            if session.draft_cache is not None:
                (tokens, out_pos, complete, logits, cache, draft_cache,
                 state, done, steps) = fn(
                    self.params, session.logits, session.cache,
                    session.draft_cache, session.state, session.done, key,
                )
                session.draft_cache = draft_cache
            else:
                tokens, out_pos, complete, logits, cache, state, done, steps = fn(
                    self.params, session.logits, session.cache, session.state,
                    session.done, key,
                )
            tokens = np.asarray(tokens)
        out_pos = np.asarray(out_pos)
        complete_np = np.asarray(complete)
        elapsed = time.perf_counter() - start

        session.cache = cache
        session.logits = logits
        session.state = state
        session.done = done
        session.rounds_left -= 1

        b_real = session.b_real
        self.stats.generate_calls += 1
        self.stats.session_resumes += 1
        self.stats.tokens_generated += int(out_pos[:b_real].sum())
        self.stats.generate_seconds += elapsed
        self.stats.decode_steps += int(steps)

        ids = [tokens[i, : out_pos[i]].tolist() for i in range(b_real)]
        texts = [self.tokenizer.decode(row) for row in ids]
        return texts, [bool(c) for c in complete_np[:b_real]], ids

    def _execute(
        self, fn, args, lengths, states, b_real, prompt_width, with_video,
        return_status, return_tokens, span, dfa=None, session_rounds=0,
        return_session=False,
    ):
        active = np.arange(len(lengths)) < b_real
        with_session = return_session and session_rounds > 0
        self._rng, key = jax.random.split(self._rng)
        start = time.perf_counter()
        with tracer.span(span, batch=len(lengths)):
            outs = fn(
                self.params, *args, jnp.asarray(lengths), jnp.asarray(active),
                jnp.asarray(states), key,
            )
            draft_cache = None
            if with_session and self.draft_model is not None:
                (tokens, out_pos, complete, steps,
                 logits, cache, draft_cache, state, done) = outs
            elif with_session:
                (tokens, out_pos, complete, steps,
                 logits, cache, state, done) = outs
            else:
                tokens, out_pos, complete, steps = outs
            tokens = np.asarray(tokens)
        out_pos = np.asarray(out_pos)
        complete_np = np.asarray(complete)
        elapsed = time.perf_counter() - start

        self.stats.generate_calls += 1
        self.stats.tokens_generated += int(out_pos[:b_real].sum())
        self.stats.generate_seconds += elapsed
        self.stats.decode_steps += int(steps)
        video_tokens = self.config.video_tokens if with_video else 0
        self.stats.prefill_tokens += b_real * (video_tokens + prompt_width)

        ids = [tokens[i, : out_pos[i]].tolist() for i in range(b_real)]
        texts = [self.tokenizer.decode(row) for row in ids]
        out: tuple = (texts,)
        if return_status:
            out += ([bool(c) for c in complete_np[:b_real]],)
        if return_tokens:
            out += (ids,)
        if return_session:
            session = None
            if with_session:
                session = EngineSession(
                    cache=cache, logits=logits, state=state, done=done,
                    b_real=b_real, dfa=dfa, rounds_left=session_rounds,
                    draft_cache=draft_cache,
                )
            out += (session,)
        return out if len(out) > 1 else texts
