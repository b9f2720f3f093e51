"""ContentAnalyzer: on-device video analysis producing knowledge notes.

The reference implementation uploads the video to Gemini and streams back
JSON (content_analyzer.py:560-719). This analyzer keeps the same public
surface — ``analyze_video(path) -> AnalysisResult``, ``generate_report``,
``rewrite_visual_schema`` — but the engine is a local JAX video-LM:

  decode frames -> preprocess on device -> ViT encode -> constrained JSON
  generation (schema DFA) -> contract gate (AnalysisResult.from_api_response)

Long videos are segmented by the budget planner and analyzed as **sharded
batches** over the mesh data axis (the reference's sequential loop at
content_analyzer.py:822-964), with the segment manifest keeping per-segment
resume state and per-segment outputs cached to disk as JSON.
"""

from __future__ import annotations

import json
import logging
import time
from pathlib import Path
from typing import Any

import numpy as np

from ..contracts import AnalysisResult
from ..contracts.timefmt import format_seconds
from ..utils.budget_planner import SegmentPlan, plan_segments_with_budget
from ..utils.counter import APICounter, APILimitExceeded
from ..video.containers import read_frames
from ..video.probe import probe_duration
from ..video.segmenter import (
    SegmentEntry,
    get_manifest_path,
    load_or_create_manifest,
    pending_segments,
    save_manifest,
    update_segment_status,
)
from .json_repair import RepairError, dump_failed_json, repair_json
from .prompts import render_prompt
from .schema import note_dfa, schema_dfa
from .segmentation import (
    accept_consolidation,
    format_gap_note,
    merge_segment_outputs,
    offset_timestamps,
)

__all__ = ["ContentAnalyzer"]

REQUIRED_NOTE_FIELDS = {
    "title",
    "one_sentence_summary",
    "key_takeaways",
    "deep_dive",
    "glossary",
}


class ContentAnalyzer:
    """Analyzes videos with a local TPU engine; no network, no API keys."""

    def __init__(
        self,
        config: dict[str, Any],
        api_counter: APICounter,
        logger: logging.Logger | None = None,
        engine: Any = None,
    ):
        self.config = config
        self.api_counter = api_counter
        self.logger = logger or logging.getLogger("video_transformer")
        self.analyzer_config = config.get("analyzer", {})
        self.engine_config = config.get("engine", {})
        self.model_name = self.analyzer_config.get("model", "vtx-local")
        # Prompt profile: "spec" (reference-parity behavioral spec, for
        # real instruction-following weights) or "compact" (the short
        # templates the distilled checkpoints were trained on — their
        # serving prompts must match the training distribution). The
        # absent-key fallback is "compact" because the default
        # engine.checkpoint_dir ships a distilled checkpoint, and serving
        # it the spec prompt collapses grounding; configs for real weights
        # opt into "spec" explicitly (config.yaml documents both).
        self.prompt_profile = str(
            self.analyzer_config.get("prompt_profile", "compact")
        )
        self._engine = engine
        self._extra_llm_calls_used = 0
        # One model-assisted JSON repair per video (reference
        # content_analyzer.py:1607-1633: a single LLM repair attempt before
        # the failed-payload dump). analyze_video resets the allowance.
        self._model_repairs_left = 1

        # Pacing + transient-failure retry around engine calls. Local TPU
        # inference defaults to no pacing (min_call_interval 0); the knobs
        # exist for shared-device deployments and cloud seams
        # (reference gemini_throttle.py semantics).
        from ..utils.pacer import InferencePacer

        self.pacer = InferencePacer(
            min_interval=float(self.analyzer_config.get("min_call_interval", 0) or 0),
            max_retries=int(self.analyzer_config.get("retry_times", 0) or 0),
            max_total_wait=float(self.analyzer_config.get("max_retry_wait", 600.0)),
            logger=self.logger,
        )

        system = config.get("system", {})
        self.temp_dir = Path(system.get("temp_dir", "./data/temp"))

    # -- engine --------------------------------------------------------------

    @property
    def engine(self):
        """The inference engine, built lazily from config when not injected.

        ``engine.tokenizer`` config selects the vocabulary: absent/"byte"
        keeps the byte tokenizer; ``{type: bpe, path: ...}`` loads a trained
        BPE vocab (models/bpe.py), resizes the decoder embedding/logits to
        match, and projects all grammars to token level (token_grammar.py).
        """
        if self._engine is None:
            from dataclasses import replace

            from ..models.config import get_preset
            from ..parallel.engine import InferenceEngine
            from ..parallel.mesh import build_mesh

            preset = get_preset(self.engine_config.get("model_preset", "tiny"))
            tokenizer = None
            tok_cfg = self.engine_config.get("tokenizer") or {}
            tok_type = tok_cfg.get("type") if isinstance(tok_cfg, dict) else None
            if tok_type == "bpe":
                from ..models.bpe import BpeTokenizer

                tokenizer = BpeTokenizer.load(tok_cfg["path"])
            elif tok_type == "hf":
                # Real-checkpoint vocabularies (Qwen2-VL tokenizer.json).
                from ..models.hf_tokenizer import HfTokenizer

                tokenizer = HfTokenizer(
                    tok_cfg["path"],
                    vocab_size=tok_cfg.get("vocab_size"),
                )
            if tokenizer is not None:
                preset = replace(
                    preset,
                    decoder=replace(
                        preset.decoder, vocab_size=tokenizer.vocab_size
                    ),
                )
            byte_vocab = 512 if tokenizer else preset.decoder.vocab_size
            params = None
            if self.engine_config.get("synthetic_weights"):
                # Rehearsal-only (full-pipeline dry runs at real geometry,
                # e.g. qwen2vl-7b before actual safetensors exist): constant
                # bf16 params built on the HOST via eval_shape — no RNG
                # program, no device allocation — so the engine's
                # host-quantize branch places int8 directly and the chip
                # never stages the f32 tree. Mirrors the on-chip 152k
                # grammar gate's setup (tests/test_tpu_integration.py).
                import ml_dtypes
                import numpy as np

                from ..models.vlm import VideoLM

                import jax

                struct = jax.eval_shape(
                    lambda: VideoLM(preset).init_variables(
                        jax.random.PRNGKey(0)
                    )
                )
                params = jax.tree_util.tree_map(
                    lambda s: np.full(
                        s.shape,
                        0.01,
                        ml_dtypes.bfloat16
                        if s.dtype == np.float32
                        else s.dtype,
                    ),
                    struct,
                )
                self.logger.info(
                    "event=engine_synthetic_weights preset="
                    f"{self.engine_config.get('model_preset')}"
                )
            self._engine = InferenceEngine(
                preset,
                params=params,
                mesh=build_mesh(self.engine_config.get("mesh")),
                max_new_tokens=int(self.engine_config.get("max_new_tokens", 3072)),
                temperature=float(self.engine_config.get("temperature", 0.7)),
                structure_bias=float(self.engine_config.get("structure_bias", 1.5)),
                tokenizer=tokenizer,
                param_dtype=self.engine_config.get("param_dtype"),
                quantize=self.engine_config.get("quantize"),
                kv_quant=self.engine_config.get("kv_quant"),
                # Grammar fast-forward block width minus one. Wide blocks
                # make every decode step compute-bound ((1+N)x forward
                # FLOPs) while the measured average advance on note content
                # is only ~1.2 tokens/step — tools/decode_bench.py forceN
                # ablations pick the engine default; the config key
                # overrides it per deployment.
                **(
                    {"max_forced_run": int(self.engine_config["max_forced_run"])}
                    if self.engine_config.get("max_forced_run") is not None
                    else {}
                ),
            )
            # grammar_scale shrinks the note DFA's field budgets (schema.py)
            # — big-vocab rehearsals keep the S x V/32 bitset and its
            # precompute proportional (the 152k bitset is 35.6 MB at 0.25).
            self._engine.dfa = self._engine.wrap_grammar(
                note_dfa(
                    byte_vocab,
                    scale=float(self.engine_config.get("grammar_scale", 1.0)),
                )
            )
            checkpoint_dir = self.engine_config.get("checkpoint_dir")
            if checkpoint_dir:
                try:
                    self._engine.restore(checkpoint_dir)
                    self.logger.info(
                        f"event=engine_restored checkpoint={checkpoint_dir}"
                    )
                except (FileNotFoundError, ValueError) as exc:
                    # Missing/incompatible checkpoint: keep random init —
                    # structure stays valid either way (constrained decoding).
                    self.logger.warning(
                        f"event=engine_restore_failed checkpoint={checkpoint_dir} "
                        f"error={exc}"
                    )
            draft_cfg = self.engine_config.get("draft") or {}
            if draft_cfg.get("model_preset"):
                # Speculative decoding: a small distilled checkpoint (e.g.
                # tiny) drafts token blocks the big model verifies in one
                # wide forward (engine.attach_draft). Greedy output is
                # unchanged; sampling keeps the target distribution.
                draft_preset = get_preset(draft_cfg["model_preset"])
                if tokenizer is not None:
                    draft_preset = replace(
                        draft_preset,
                        decoder=replace(
                            draft_preset.decoder,
                            vocab_size=tokenizer.vocab_size,
                        ),
                    )
                try:
                    self._engine.attach_draft(
                        draft_preset,
                        checkpoint=draft_cfg.get("checkpoint_dir"),
                        spec_tokens=int(draft_cfg.get("spec_tokens", 6)),
                    )
                    self.logger.info(
                        f"event=engine_draft_attached "
                        f"preset={draft_cfg['model_preset']} "
                        f"spec_tokens={self._engine.spec_tokens}"
                    )
                except Exception as exc:
                    # A broken draft must never take serving down (corrupt
                    # orbax metadata raises beyond FileNotFoundError/
                    # ValueError) — drop every trace of it and serve the
                    # plain loop.
                    self._engine.detach_draft()
                    self.logger.warning(
                        f"event=engine_draft_failed error={exc}"
                    )
        return self._engine

    # -- public API ----------------------------------------------------------

    def analyze_video(self, video_path: str | Path) -> AnalysisResult:
        """Analyze one video into a validated AnalysisResult."""
        video_path = Path(video_path)
        start_time = time.perf_counter()
        self._model_repairs_left = 1  # per-video LLM-repair allowance
        duration = probe_duration(video_path)
        plan = plan_segments_with_budget(
            duration, self.config, self.api_counter.current_count
        )
        long_video = self.analyzer_config.get("long_video", {}) or {}

        if self._should_use_segmentation(duration, plan, long_video):
            result = self._analyze_video_segments(video_path, duration, plan)
        else:
            result = self._analyze_single(video_path, duration)

        elapsed = time.perf_counter() - start_time
        result.metadata.setdefault("duration", duration)
        result.metadata["analyze_seconds"] = round(elapsed, 3)
        result.metadata["model"] = self.model_name
        self.logger.info(
            f"event=analyze_complete video={video_path.name} "
            f"duration={duration:.1f} elapsed_s={elapsed:.1f} "
            f"segments={result.metadata.get('segments', 1)}"
        )
        return result

    def analyze_videos(self, video_paths: list[str | Path]) -> list[AnalysisResult]:
        """Batch-analyze many videos, sharding SHORT videos across devices.

        The throughput mode the reference cannot express (its batch loop is
        strictly sequential, pipeline.py:376-394): single-segment videos are
        decoded together and analyzed as one sharded forward per chunk; long
        videos fall back to the segmented path individually (their segments
        already batch internally).
        """
        paths = [Path(p) for p in video_paths]
        durations = [probe_duration(p) for p in paths]
        long_video = self.analyzer_config.get("long_video", {}) or {}

        short_indices: list[int] = []
        results: list[AnalysisResult | None] = [None] * len(paths)
        for i, (path, duration) in enumerate(zip(paths, durations)):
            plan = plan_segments_with_budget(
                duration, self.config, self.api_counter.current_count
            )
            if self._should_use_segmentation(duration, plan, long_video):
                results[i] = self.analyze_video(path)
            else:
                short_indices.append(i)

        long_video = self.analyzer_config.get("long_video", {}) or {}
        per_chip = int(long_video.get("segment_batch_per_chip", 32) or 32)
        chunk_size = max(self.engine.data_parallel, 1) * per_chip
        for chunk_start in range(0, len(short_indices), chunk_size):
            chunk = short_indices[chunk_start : chunk_start + chunk_size]
            if self.api_counter.remaining() < len(chunk):
                raise APILimitExceeded("Model call budget exhausted mid-batch")
            frames = np.stack(
                [self._decode_clip(paths[i], 0.0, durations[i] or None) for i in chunk]
            )
            prompts = [
                render_prompt(
                    "analysis",
                    {"duration_label": format_seconds(durations[i] or 0.0)},
                    profile=self.prompt_profile,
                )
                for i in chunk
            ]
            data_list = self._generate_note(frames, prompts)
            for i, data in zip(chunk, data_list):
                if data is None:
                    raise ValueError(
                        f"Engine produced no valid note JSON for {paths[i]}"
                    )
                results[i] = AnalysisResult.from_api_response(
                    paths[i],
                    data,
                    metadata={
                        "duration": durations[i],
                        "segments": 1,
                        "engine": self.engine.stats.as_dict(),
                        "model": self.model_name,
                    },
                )
        assert all(r is not None for r in results)
        return results  # type: ignore[return-value]

    def generate_report(
        self,
        analysis: AnalysisResult,
        image_relative_path: str | None = None,
        self_check_mode: str = "static",
    ) -> str:
        """Render the final Markdown (render config decides concept index)."""
        system_config = self.config.get("system", {})
        render_config = system_config.get("render", {})
        include_concept_index = render_config.get("include_concept_index")
        return analysis.to_markdown(
            image_paths=[image_relative_path] if image_relative_path else None,
            self_check_mode=self_check_mode,
            include_concept_index=include_concept_index,
        )

    def rewrite_visual_schema(self, original_structure: str, feedback: str) -> str:
        """Regenerate a visual schema addressing validator feedback."""
        prompt = render_prompt(
            "rewrite", {"schema": original_structure, "feedback": feedback}
        )
        self.api_counter.increment("local")
        dfa = self.engine.wrap_grammar(schema_dfa(self.engine.byte_vocab))
        text = self.engine.generate_text([prompt], dfa=dfa)[0]
        try:
            parsed = self._parse_json(text)
            schemas = parsed.get("visual_schemas", [])
            if schemas and isinstance(schemas[0], dict):
                return schemas[0].get("schema", original_structure)
        except (RepairError, ValueError):
            pass
        return original_structure

    # -- single-pass path ------------------------------------------------------

    def _analyze_single(self, video_path: Path, duration: float) -> AnalysisResult:
        if not self.api_counter.can_call():
            raise APILimitExceeded(
                f"Model call budget exhausted: {self.api_counter.current_count}"
            )
        frames = self._decode_clip(video_path, 0.0, duration or None)
        prompt = render_prompt(
            "analysis", {"duration_label": format_seconds(duration or 0.0)},
            profile=self.prompt_profile,
        )
        data = self._generate_note(frames[None], [prompt])[0]
        if data is None:
            raise ValueError("Engine produced no valid note JSON after retries")
        data = self._maybe_consolidate_note(data, context="single")
        return AnalysisResult.from_api_response(
            video_path,
            data,
            metadata={
                "duration": duration,
                "segments": 1,
                "engine": self.engine.stats.as_dict(),
            },
        )

    def _generate_note(
        self, frames: np.ndarray, prompts: list[str], reasks: int = 2,
        batch_bucket: int | None = None,
    ) -> list[dict[str, Any] | None]:
        """Generate + parse note JSON per clip, re-asking failures.

        Mirrors the reference's JSON re-ask loop (content_analyzer.py:508-558:
        <= 2 regeneration attempts per item before giving up) and its
        MAX_TOKENS continuation (content_analyzer.py:1385-1464): rows whose
        grammar did not reach accept within the token budget are continued
        (<= max_continuations rounds, each re-prefilling prompt + generated
        prefix and resuming the grammar mid-document). Each attempt consumes
        budget; None marks a permanently failed item.
        """
        for _ in range(frames.shape[0]):
            self.api_counter.increment("local")
        max_rounds = int(self.analyzer_config.get("max_continuations", 3) or 0)
        # Reserve KV-cache room for the continuation rounds up front: each
        # round then resumes the live cache (decode only) instead of
        # re-prefilling prompt + prefix. The engine grants as many rounds as
        # fit the sequence budget (None session = fall back to re-prefill).
        # Feature-detected so injected stub engines (the reference's test
        # pattern) only need the base generate signature.
        session = None
        if hasattr(self.engine, "continue_session"):
            _, complete, token_ids, session = self.pacer.call_with_retry(
                self.engine.generate, frames, prompts,
                return_status=True, return_tokens=True,
                session_rounds=max_rounds, return_session=True,
                batch_bucket=batch_bucket,
            )
        else:
            _, complete, token_ids = self.pacer.call_with_retry(
                self.engine.generate, frames, prompts,
                return_status=True, return_tokens=True,
            )
        texts = self._continue_incomplete(
            frames, prompts, token_ids, complete, session
        )

        results: list[dict[str, Any] | None] = [None] * len(prompts)
        failed: list[int] = []
        for i, text in enumerate(texts):
            try:
                results[i] = self._parse_note_json(text)
            except (RepairError, ValueError) as exc:
                self.logger.warning(f"event=note_parse_failed item={i} error={exc}")
                failed.append(i)

        for attempt in range(1, reasks + 1):
            if not failed:
                break
            if self.api_counter.remaining() < len(failed):
                self.logger.warning(
                    f"event=note_reask_skipped reason=budget failed={len(failed)}"
                )
                break
            self.logger.info(
                f"event=note_reask attempt={attempt} items={len(failed)}"
            )
            for _ in failed:
                self.api_counter.increment("local")
            retry_texts = self.engine.generate(
                frames[np.asarray(failed)], [prompts[i] for i in failed]
            )
            still_failed: list[int] = []
            for i, text in zip(failed, retry_texts):
                try:
                    results[i] = self._parse_note_json(text)
                except (RepairError, ValueError):
                    still_failed.append(i)
            failed = still_failed
        return results

    def _continue_incomplete(
        self,
        frames: np.ndarray,
        prompts: list[str],
        token_ids: list[list[int]],
        complete: list[bool],
        session=None,
    ) -> list[str]:
        """Continue token-capped generations until the grammar accepts.

        The long-note path: each round appends up to max_new_tokens more to
        every incomplete row. The fast path resumes the engine ``session``
        (KV cache + grammar state held on device — zero prefill FLOPs per
        round); when the session reserve is exhausted or was never granted,
        rounds fall back to re-prefilling with TOKEN-ID prefixes — ids, not
        re-encoded text, so BPE boundaries are preserved and a cap mid
        UTF-8 character resumes the byte-DFA mid-character. Bounded by
        analyzer.max_continuations and the call budget; stops early if a
        prefix no longer fits the sequence budget (the engine raises). Each
        row decodes once at the end so no text is ever assembled across a
        token boundary.
        """
        max_rounds = int(self.analyzer_config.get("max_continuations", 3) or 0)
        for round_idx in range(1, max_rounds + 1):
            pending = [i for i in range(len(token_ids)) if not complete[i]]
            if not pending:
                break
            if self.api_counter.remaining() < len(pending):
                self.logger.warning(
                    f"event=continuation_skipped reason=budget rows={len(pending)}"
                )
                break
            mode = (
                "resume" if session is not None and session.rounds_left > 0
                else "reprefill"
            )
            self.logger.info(
                f"event=note_continuation round={round_idx} rows={len(pending)} "
                f"mode={mode}"
            )
            for _ in pending:
                self.api_counter.increment("local")
            if mode == "resume":
                try:
                    _, now_done, more_ids = self.engine.continue_session(session)
                except Exception as exc:  # transient XLA/runtime failures
                    # The donated session cache may be gone after a failed
                    # resume; the accumulated token ids are intact, so the
                    # remaining rounds degrade to re-prefill continuation.
                    self.logger.warning(
                        f"event=continuation_resume_failed error={exc}"
                    )
                    session = None
                    continue
                for i in range(len(token_ids)):
                    token_ids[i] = token_ids[i] + more_ids[i]
                    complete[i] = now_done[i]
                continue
            try:
                _, now_done, more_ids = self.engine.generate(
                    frames[np.asarray(pending)],
                    [prompts[i] for i in pending],
                    prefixes=[token_ids[i] for i in pending],
                    return_status=True,
                    return_tokens=True,
                )
            except ValueError as exc:
                self.logger.warning(
                    f"event=continuation_stopped reason=sequence_budget error={exc}"
                )
                break
            for i, tail, is_done in zip(pending, more_ids, now_done):
                token_ids[i] = token_ids[i] + tail
                complete[i] = is_done
        return [self.engine.tokenizer.decode(row) for row in token_ids]

    def _get_batcher(self, slots: int, prompt_len: int):
        """One cached ContinuousBatcher, rebuilt when its shape/grammar
        changes.

        The cache lives on the ENGINE, not this analyzer: the pipeline
        builds a fresh ContentAnalyzer per video while the engine is
        long-lived, and an analyzer-held cache made every video re-trace
        and re-compile the batcher's chunk programs (measured as ~10 s of
        host_other per bench run through the axon tunnel). Size-1 on
        purpose: each batcher owns a device-resident slot pool (hundreds
        of MB of KV at base scale), so accumulating one per (slots, prompt
        bucket) would leak HBM in a long-lived service. The grammar is
        compared by IDENTITY with a strong reference held — an id() key
        alone could silently alias a recycled object.
        """
        from ..parallel.serving import ContinuousBatcher

        cached = getattr(self.engine, "_batcher_cache", None)
        if (
            cached is None
            or cached.slots != slots
            or cached.prompt_len != prompt_len
            or cached.dfa is not self.engine.dfa
            # Speculative decoding composes into the batcher's chunk
            # programs — attach/detach of a draft must rebuild them.
            or cached.spec != (getattr(self.engine, "draft_model", None)
                               is not None)
        ):
            self.engine._batcher_cache = ContinuousBatcher(
                self.engine, slots=slots, prompt_len=prompt_len
            )
        return self.engine._batcher_cache

    @staticmethod
    def _route_to_batcher(
        n_segments: int, chunk_size: int, slots: int, mode
    ) -> bool:
        """Sweep routing: the continuous batcher only wins when there is a
        wave boundary to refill across. "auto" sends multi-wave sweeps
        (more segments than one sharded batch) to the batcher and
        single-wave sweeps to the run-to-completion engine (already the
        optimal schedule, and it skips the batcher's staging dispatches).
        Explicit True/False pins the path; either way a sweep must exceed
        the slot pool to be worth staging."""
        if mode in (None, "auto"):
            use_serving = n_segments > chunk_size
        else:
            use_serving = bool(mode)
        return use_serving and n_segments > slots

    def _serve_segments(
        self, segments, slots, segment_prompt, decode_chunk, record,
        manifest, manifest_path,
    ) -> None:
        """Analyze segments through the continuous batcher.

        Slots refill from the queue the moment a note finishes, so the
        pool decodes at full width for the whole sweep — the sharded
        run-to-completion batch instead idles every finished row until its
        slowest sibling ends. Completions arrive out of order; the merge
        sorts by start time. Incomplete rows (token cap before grammar
        accept) continue through the engine's exact token-id path.
        """
        from ..parallel.serving import Request
        from ..video.prefetch import prefetch_map

        prompts = {s["id"]: segment_prompt(s) for s in segments}
        prompt_len = self.engine._prompt_bucket(
            list(prompts.values()), with_video=True
        )
        batcher = self._get_batcher(slots, prompt_len)
        by_id = {s["id"]: s for s in segments}
        self.logger.info(
            f"event=segment_serving slots={slots} segments={len(segments)} "
            f"prompt_len={prompt_len}"
        )

        def handle(completions) -> None:
            for completion in completions:
                segment = by_id[completion.request_id]
                if not completion.complete:
                    incomplete.append((segment, completion.token_ids))
                    continue
                try:
                    data = self._parse_note_json(completion.text)
                except (RepairError, ValueError) as exc:
                    self.logger.warning(
                        f"event=note_parse_failed item={segment['id']} "
                        f"error={exc}"
                    )
                    reparse.append(segment)
                    continue
                record(segment, data)
            save_manifest(manifest_path, manifest)

        incomplete: list[tuple[SegmentEntry, list[int]]] = []
        reparse: list[SegmentEntry] = []
        # Submit in ring-depth waves, not slot-width waves: the chunk
        # program drains the whole staged ring in ONE dispatch (refilling
        # finished slots mid-flight), so a queue_depth wave halves the
        # tunnel round-trips and keeps the pool at full width across what
        # would otherwise be a wave boundary.
        wave = max(batcher.queue_depth, slots)
        chunks = [segments[i : i + wave] for i in range(0, len(segments), wave)]
        for chunk, frames in zip(chunks, prefetch_map(decode_chunk, chunks)):
            for segment, clip in zip(chunk, frames):
                update_segment_status(
                    manifest, segment["id"], "processing",
                    increment_attempts=True,
                )
                self.api_counter.increment("local")
                batcher.submit(
                    Request(segment["id"], clip, prompts[segment["id"]])
                )
            save_manifest(manifest_path, manifest)
            handle(batcher.run(drain=False))
        handle(batcher.run(drain=True))

        # Token-capped rows: exact continuation (engine re-prefills the
        # generated ids and resumes the grammar mid-document). Continued
        # text that still fails to parse joins the re-ask pool below
        # instead of becoming an immediate gap.
        if incomplete:
            frames = decode_chunk([s for s, _ in incomplete])
            texts = self._continue_incomplete(
                frames,
                [prompts[s["id"]] for s, _ in incomplete],
                [list(ids) for _, ids in incomplete],
                [False] * len(incomplete),
            )
            for (segment, _), text in zip(incomplete, texts):
                try:
                    record(segment, self._parse_note_json(text))
                except (RepairError, ValueError) as exc:
                    self.logger.warning(
                        f"event=note_parse_failed item={segment['id']} "
                        f"error={exc}"
                    )
                    reparse.append(segment)
            save_manifest(manifest_path, manifest)

        # Parse failures: full regenerate through the batch engine path
        # (carries the re-ask ladder). These attempts spend budget beyond
        # the 1-call-per-segment plan, so degrade to gap notes rather than
        # letting the counter raise mid-analysis.
        if reparse:
            if self.api_counter.remaining() < len(reparse):
                self.logger.warning(
                    f"event=segment_reask_skipped reason=budget "
                    f"failed={len(reparse)}"
                )
                for segment in reparse:
                    record(segment, None)
            else:
                frames = decode_chunk(reparse)
                data_list = self._generate_note(
                    frames, [prompts[s["id"]] for s in reparse]
                )
                for segment, data in zip(reparse, data_list):
                    record(segment, data)
            save_manifest(manifest_path, manifest)

    # -- segmented path --------------------------------------------------------

    def _analyze_video_segments(
        self, video_path: Path, duration: float, plan: SegmentPlan
    ) -> AnalysisResult:
        if plan.num_segments == 0:
            raise APILimitExceeded(
                "Segment plan does not fit the remaining model-call budget"
            )
        # Long-video mode raises the soft cap to the hard cap
        # (reference content_analyzer.py:837-840).
        self.api_counter.set_max_calls(plan.hard_max_calls, plan.hard_max_calls)

        video_id = video_path.stem
        manifest = load_or_create_manifest(
            video_id=video_id,
            duration=duration,
            segment_seconds=plan.segment_duration,
            overlap_seconds=plan.overlap,
            temp_dir=self.temp_dir,
        )
        manifest_path = get_manifest_path(video_id, self.temp_dir)

        outputs: list[dict[str, Any]] = []
        # (segment start, gap text): completions may arrive out of order
        # (continuous batcher), so gaps sort chronologically before merge.
        gap_entries: list[tuple[float, str]] = []

        # Resume: reload cached outputs of already-completed segments.
        for segment in manifest["segments"]:
            if segment["status"] == "completed":
                cached = self._load_segment_output(segment)
                if cached is not None:
                    outputs.append(cached)
                else:
                    segment["status"] = "pending"

        pending = pending_segments(manifest)
        consolidation_reserve = 1 if self._quality_gates_enabled() else 0
        budget = max(self.api_counter.remaining() - consolidation_reserve, 0)
        to_analyze = pending[:budget]
        skipped = pending[budget:]

        # Sharded batches over the mesh data axis instead of a per-segment
        # loop; host decode of the next chunk overlaps device generation.
        from ..video.prefetch import prefetch_map

        # Per-chip batch width: decode throughput rises steeply with batch
        # (weight reads amortize across rows) and saturates near 16 at
        # base scale on v5e (2.4k/3.7k/4.2k tok/s at 4/8/16), bounded by
        # the KV cache's HBM share (~200 MB/row at base).
        long_video = self.analyzer_config.get("long_video", {}) or {}
        per_chip = int(long_video.get("segment_batch_per_chip", 32) or 32)
        chunk_size = max(self.engine.data_parallel, 1) * per_chip
        total = len(manifest["segments"])
        chunks = [
            to_analyze[i : i + chunk_size]
            for i in range(0, len(to_analyze), chunk_size)
        ]

        def decode_chunk(chunk: list[SegmentEntry]) -> np.ndarray:
            return np.stack(
                [self._decode_clip(video_path, s["start"], s["end"]) for s in chunk]
            )

        def segment_prompt(s: SegmentEntry) -> str:
            return render_prompt(
                "segment_analysis",
                {
                    "segment_index": s["id"] + 1,
                    "segment_total": total,
                    "start_label": format_seconds(s["start"]),
                    "end_label": format_seconds(s["end"]),
                },
                profile=self.prompt_profile,
            )

        def record(segment: SegmentEntry, data: dict[str, Any] | None) -> None:
            if data is None:
                update_segment_status(
                    manifest, segment["id"], "failed", error="note_parse_failed"
                )
                gap_entries.append((
                    segment["effective_start"],
                    format_gap_note(
                        segment["effective_start"], segment["effective_end"]
                    ),
                ))
                self.logger.warning(f"event=segment_failed id={segment['id']}")
                return
            data = offset_timestamps(data, segment["effective_start"])
            output = {
                "start": segment["effective_start"],
                "end": segment["effective_end"],
                "data": data,
            }
            self._save_segment_output(segment, output)
            outputs.append(output)
            update_segment_status(manifest, segment["id"], "completed")

        # Run-to-completion batches pay the straggler: the whole batch
        # waits for its longest note. The continuous batcher refills
        # finished slots mid-flight instead (parallel/serving.py). For a
        # sweep that fits ONE wave, run-to-completion is already the
        # optimal schedule (nothing to refill) and skips the batcher's
        # staging dispatches — so "auto" routes single-wave sweeps to the
        # engine and multi-wave sweeps (more segments than the sharded
        # batch) to the batcher, where refilling across what would be a
        # wave boundary keeps the pool at full width.
        slots = max(self.engine.data_parallel, 1) * int(
            long_video.get("serving_slots_per_chip", 8) or 8
        )
        mode = long_video.get("continuous_batching", "auto")
        use_serving = self._route_to_batcher(
            n_segments=len(to_analyze), chunk_size=chunk_size, slots=slots,
            mode=mode,
        ) and hasattr(self.engine, "continue_session")
        if use_serving:
            self._serve_segments(
                to_analyze, slots, segment_prompt, decode_chunk, record,
                manifest, manifest_path,
            )
        else:
            for chunk, frames in zip(chunks, prefetch_map(decode_chunk, chunks)):
                for segment in chunk:
                    update_segment_status(
                        manifest, segment["id"], "processing",
                        increment_attempts=True,
                    )
                save_manifest(manifest_path, manifest)

                prompts = [segment_prompt(s) for s in chunk]
                # Ragged final chunks pad up to the full chunk width so they
                # reuse the compiled program (pad rows freeze at step 0).
                data_list = self._generate_note(
                    frames, prompts,
                    batch_bucket=chunk_size if len(chunks) > 1 else None,
                )
                for segment, data in zip(chunk, data_list):
                    record(segment, data)
                save_manifest(manifest_path, manifest)

        for segment in skipped:
            update_segment_status(
                manifest, segment["id"], "skipped", error="budget_exhausted"
            )
            gap_entries.append((
                segment["effective_start"],
                format_gap_note(
                    segment["effective_start"], segment["effective_end"]
                ),
            ))
        if skipped:
            save_manifest(manifest_path, manifest)
            self.logger.warning(
                f"event=segments_skipped count={len(skipped)} reason=budget"
            )

        if not outputs:
            raise RuntimeError("All video segments failed to analyze")

        gap_notes = [text for _, text in sorted(gap_entries)]
        merged = merge_segment_outputs(outputs, gap_notes)
        merged = self._maybe_consolidate_note(merged, context="segments")

        return AnalysisResult.from_api_response(
            video_path,
            merged,
            metadata={
                "duration": duration,
                "segments": len(manifest["segments"]),
                "segments_analyzed": len(outputs),
                "segment_gaps": gap_notes,
                "engine": self.engine.stats.as_dict(),
            },
        )

    # -- consolidation ---------------------------------------------------------

    def _maybe_consolidate_note(
        self, note: dict[str, Any], *, context: str
    ) -> dict[str, Any]:
        """One optional model pass reorganizing the note into 2-6 chapters.

        Skipped (with a logged reason) when quality gates are off, the extra
        LLM-call allowance is used up, or the budget is exhausted. A rejected
        candidate falls back to the input note (reference
        content_analyzer.py:1068-1231).
        """
        if not self._quality_gates_enabled():
            self.logger.info(
                f"event=consolidation_skipped reason=quality_gates_disabled context={context}"
            )
            return note
        max_extra = self._max_extra_llm_calls()
        if max_extra <= 0 or self._extra_llm_calls_used >= max_extra:
            self.logger.info(
                f"event=consolidation_skipped reason=extra_llm_calls context={context}"
            )
            return note
        if not self.api_counter.can_call():
            self.logger.warning(
                f"event=consolidation_skipped reason=api_budget_exhausted context={context}"
            )
            return note
        if not note.get("deep_dive"):
            return note
        # Consolidation exists to reorganize over-fragmented merges into 2-6
        # conceptual chapters (reference content_analyzer.py:1124-1231). A
        # note already inside that budget gains nothing — and a local model
        # untrained on the consolidation prompt can only degrade it — so
        # skip unless the chapter count exceeds the acceptance ceiling.
        if len(note.get("deep_dive", [])) <= 6:
            self.logger.info(
                f"event=consolidation_skipped reason=already_within_chapter_budget "
                f"context={context}"
            )
            return note

        self._extra_llm_calls_used += 1
        try:
            prompt = render_prompt(
                "consolidate",
                {
                    "segment_count": len(note.get("deep_dive", [])),
                    "merged_json": json.dumps(note, ensure_ascii=False)[:2000],
                },
            )
            self.api_counter.increment("local")
            text = self.engine.generate_text([prompt])[0]
            parsed = self._parse_json(text)
        except Exception as exc:
            self.logger.warning(
                f"event=consolidation_failed context={context} error={exc}"
            )
            return note

        accepted = accept_consolidation(parsed, note)
        if accepted is None:
            self.logger.warning(
                f"event=consolidation_rejected context={context}"
            )
            return note
        self.logger.info(f"event=consolidation_accepted context={context}")
        return accepted

    # -- helpers -----------------------------------------------------------------

    def _decode_clip(
        self, video_path: Path, start: float, end: float | None
    ) -> np.ndarray:
        cfg = self.engine.config.encoder
        return read_frames(video_path, cfg.num_frames, start=start, end=end)

    def _parse_json(self, text: str) -> dict[str, Any]:
        try:
            parsed = json.loads(text)
        except json.JSONDecodeError:
            try:
                parsed, strategy = repair_json(text)
                self.logger.warning(f"event=json_repaired strategy={strategy}")
            except RepairError:
                parsed = self._model_repair(text)
        if not isinstance(parsed, dict):
            raise ValueError("Engine output is not a JSON object")
        return parsed

    def _model_repair(self, text: str) -> dict[str, Any] | list[Any]:
        """Last rung of the repair ladder: one constrained re-generation.

        Mirrors the reference's LLM repair + failed-payload dump
        (content_analyzer.py:1607-1646): the broken payload goes back
        through the engine under the note grammar (valid-by-construction
        output), at most once per video and only within budget; anything
        still unparseable is dumped to log_dir/failed_json_*.txt before
        the RepairError propagates.
        """
        if self._model_repairs_left > 0 and self.api_counter.can_call():
            self._model_repairs_left -= 1
            self.api_counter.increment("local")
            try:
                prompt = render_prompt(
                    "json_repair", {"broken_json": text[:6000]}
                )
                repaired = self.engine.generate_text([prompt])[0]
                parsed, strategy = repair_json(repaired)
                self.logger.warning(
                    f"event=json_repaired strategy=model+{strategy}"
                )
                return parsed
            except (RepairError, ValueError, KeyError) as exc:
                self.logger.warning(f"event=json_model_repair_failed error={exc}")
        system = self.config.get("system", {})
        dump = dump_failed_json(
            text, system.get("log_dir", "./data/output/logs")
        )
        self.logger.warning(f"event=json_repair_exhausted dump={dump}")
        raise RepairError(f"JSON repair exhausted (payload dumped to {dump})")

    def _parse_note_json(self, text: str) -> dict[str, Any]:
        data = self._parse_json(text)
        missing = REQUIRED_NOTE_FIELDS - data.keys()
        if missing:
            raise ValueError(
                f"Engine output missing required fields: {', '.join(sorted(missing))}"
            )
        return data

    def _segment_output_path(self, segment: SegmentEntry) -> Path:
        return Path(segment["file_path"]).with_suffix(".json")

    def _save_segment_output(
        self, segment: SegmentEntry, output: dict[str, Any]
    ) -> None:
        path = self._segment_output_path(segment)
        path.parent.mkdir(parents=True, exist_ok=True)
        path.write_text(json.dumps(output, ensure_ascii=False), encoding="utf-8")

    def _load_segment_output(self, segment: SegmentEntry) -> dict[str, Any] | None:
        path = self._segment_output_path(segment)
        if not path.exists():
            return None
        try:
            return json.loads(path.read_text(encoding="utf-8"))
        except (json.JSONDecodeError, OSError):
            return None

    def _quality_gates_enabled(self) -> bool:
        system = self.config.get("system", {})
        gates = system.get("quality_gates", {})
        return bool(gates.get("enabled", False)) if isinstance(gates, dict) else False

    def _max_extra_llm_calls(self) -> int:
        system = self.config.get("system", {})
        gates = system.get("quality_gates", {})
        if not isinstance(gates, dict):
            return 0
        try:
            return max(int(gates.get("max_extra_llm_calls", 1)), 0)
        except (TypeError, ValueError):
            return 1

    def _should_use_segmentation(
        self, duration: float, plan: SegmentPlan, long_video_config: dict[str, Any]
    ) -> bool:
        if duration <= 0:
            return False
        if not long_video_config.get("enabled", True):
            return False
        threshold = long_video_config.get("duration_threshold_seconds")
        if threshold is not None:
            try:
                if duration >= float(threshold):
                    return True
            except (TypeError, ValueError):
                pass
        return plan.num_segments > 1
