#!/usr/bin/env python3
"""End-to-end benchmark: minutes of video analyzed per minute per chip.

Synthesizes a lecture-length clip, runs the full on-device analysis path
(decode -> preprocess -> ViT encode -> constrained JSON generation ->
merge -> contract gate) through ContentAnalyzer, and reports throughput.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
The reference publishes no benchmarks (BASELINE.md) — vs_baseline is
measured against the BASELINE.json north-star target of 3.75 analyzed
video-minutes per wall-minute per chip (60-min lecture in <2 min on 8 chips).

A warmup pass compiles all shape buckets first; the measured pass reflects
steady-state serving throughput.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

NORTH_STAR_MIN_PER_MIN_PER_CHIP = 3.75  # 60 min / 2 min / 8 chips

import os

# Official numbers are taken at `base` (0.4B) — a scale that exercises the
# MXU — not `tiny` (a CI-speed toy whose throughput says nothing).
PRESET = os.environ.get("VTX_BENCH_PRESET", "base")


def _shipped_engine_key(key: str) -> str | None:
    """engine.<key> from the SHIPPED config: the official bench must
    measure the configuration users get out of the box (round-4 verdict
    Weak #3 — every round-4 number was int8 while the product default was
    null). VTX_BENCH_* env vars still override for ablations."""
    try:
        import yaml

        cfg = yaml.safe_load(
            (Path(__file__).resolve().parent / "config/config.yaml")
            .read_text()
        )
        return cfg.get("engine", {}).get(key)
    except Exception:
        return None


# Weight-only serving quantization (models/quant.py): decode streams the
# decoder from HBM every step, so int8 residency ~halves step time.
QUANTIZE = os.environ.get("VTX_BENCH_QUANT") or _shipped_engine_key("quantize")
if QUANTIZE in ("none", "null", "0", ""):
    QUANTIZE = None
# int8 KV cache (models/lm.py) — halves the decode step's KV stream.
KV_QUANT = (
    os.environ.get("VTX_BENCH_KV_QUANT")
    or _shipped_engine_key("kv_quant")
)
if KV_QUANT in ("none", "null", "0", ""):
    KV_QUANT = None
# 10 minutes: long enough that the segment batch fills the decode sweet
# spot (10 segments in one sharded call) — the workload the north-star
# measures is a 60-min lecture, which behaves like this batched regime.
VIDEO_SECONDS = float(os.environ.get("VTX_BENCH_VIDEO_SECONDS", "600"))
FPS = 2.0
# Segment length trades decode batch width against per-row note length:
# shorter segments mean more rows per sharded batch (weight reads amortize
# over more rows) but more prefills. 60 is the measured sweet spot default.
SEGMENT_SECONDS = int(os.environ.get("VTX_BENCH_SEGMENT_SECONDS", "60"))
# Continuous batching (parallel/serving.py on-device refill) vs the plain
# run-to-completion sharded sweep for the segment batch.
CONTINUOUS = os.environ.get("VTX_BENCH_CONTINUOUS", "") not in ("", "0", "false")

# Peak dense bf16 throughput per chip, for the MFU estimate.
_PEAK_FLOPS = {"tpu": 197e12, "cpu": 1e12}
# MEASURED HBM copy bandwidth of the attached chip (tools/roofline.py
# copy_bw_fused_gbps: 8 barrier-separated passes in ONE program, so tunnel
# dispatch latency is amortized — the single-dispatch number reads ~139
# GB/s and is an artifact; see docs/roofline.md). Override with
# VTX_HBM_PEAK_GBPS when benching on a different part.
_HBM_PEAK = float(os.environ.get("VTX_HBM_PEAK_GBPS", "478")) * 1e9


def _param_count(tree) -> int:
    import jax

    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(tree))


def build_engine():
    import jax

    from video_transformer_tpu.analyzer.schema import note_dfa
    from video_transformer_tpu.models.config import get_preset
    from video_transformer_tpu.parallel.engine import InferenceEngine
    from video_transformer_tpu.parallel.mesh import build_mesh

    config = get_preset(PRESET)
    mesh = build_mesh({"data": len(jax.devices()), "model": 1})
    engine = InferenceEngine(
        config,
        mesh=mesh,
        dfa=note_dfa(config.decoder.vocab_size, scale=0.5),
        max_new_tokens=2048,
        temperature=1.0,
        structure_bias=2.5,
        seed=0,
        param_dtype="bfloat16",
        quantize=QUANTIZE,
        kv_quant=KV_QUANT,
        # Fast-forward width: engine default unless the sweep overrides.
        **(
            {"max_forced_run": int(os.environ["VTX_BENCH_FORCED_RUN"])}
            if os.environ.get("VTX_BENCH_FORCED_RUN")
            else {}
        ),
    )
    # VTX_BENCH_SPEC=self|tiny: speculative decoding (engine.attach_draft).
    # The bench runs random weights, so "self" (draft = target weights,
    # acceptance ~1) is the mechanism ceiling and "tiny" (random tiny
    # draft) the floor; the real distilled pair is tools/spec_eval.py.
    spec = os.environ.get("VTX_BENCH_SPEC", "")
    if spec:
        spec_k = int(os.environ.get("VTX_BENCH_SPEC_K", "6"))
        if spec == "self":
            engine.attach_draft(
                config, spec_tokens=spec_k, share_target_params=True
            )
        else:
            from dataclasses import replace

            tiny = get_preset("tiny")
            tiny = replace(
                tiny,
                decoder=replace(
                    tiny.decoder, vocab_size=config.decoder.vocab_size
                ),
            )
            engine.attach_draft(tiny, spec_tokens=spec_k)
    return engine


def make_analyzer(engine, temp_dir: Path):
    from video_transformer_tpu.analyzer.content_analyzer import ContentAnalyzer
    from video_transformer_tpu.utils.counter import APICounter

    config = {
        "system": {
            "temp_dir": str(temp_dir),
            "quality_gates": {"enabled": False},
            "render": {"include_concept_index": True},
        },
        "analyzer": {
            "model": "vtx-local",
            # Pin the round-2 prompt regime: the bench runs random weights,
            # where the behavioral spec buys nothing but a 2.7x larger
            # prompt bucket — and silent prompt swaps corrupt cross-round
            # wall-clock comparisons.
            "prompt_profile": "compact",
            "max_continuations": 0,
            "retry_times": 0,
            "long_video": {
                "enabled": True,
                "default_segment_seconds": SEGMENT_SECONDS,
                "overlap_seconds": 4,
                "min_segment_seconds": 16,
                "hard_max_api_calls": 200,
                "consolidate": False,
                "continuous_batching": CONTINUOUS,
                "serving_slots_per_chip": int(
                    os.environ.get("VTX_BENCH_SLOTS", "8")
                ),
            },
        },
        "engine": {},
    }
    return ContentAnalyzer(
        config, APICounter(max_calls=200, hard_max_calls=200), engine=engine
    )


def synth_video(path: Path, seconds: float, fps: float, size: int = 128) -> None:
    """Write a Y4M lecture-length clip: the measured path then includes the
    owned container/codec layer (C++ YUV420 decode, native/framereader.cpp),
    not just raw-array loading."""
    from video_transformer_tpu.video.containers import write_y4m

    rng = np.random.default_rng(0)
    t = int(seconds * fps)
    # Structured frames (moving gradient + noise) rather than pure noise.
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    frames = np.empty((t, size, size, 3), dtype=np.uint8)
    for i in range(t):
        phase = i / max(t, 1)
        base = (
            127
            + 100 * np.sin(2 * np.pi * (xx + phase))
            + 20 * rng.standard_normal((size, size))
        )
        frames[i, :, :, 0] = np.clip(base, 0, 255)
        frames[i, :, :, 1] = np.clip(base * (0.5 + phase / 2), 0, 255)
        frames[i, :, :, 2] = np.clip(255 - base, 0, 255)
    write_y4m(path, frames, fps=fps)


def _decoder_stream_bytes(engine) -> int:
    """HBM bytes one decode step streams: the decoder subtree as placed
    (int8 kernels + scales + bf16 norms/embeds; the embedding gather and
    B-bounded head reads are within noise of the full-subtree figure)."""
    import jax

    import jax.numpy as jnp

    def leaf_bytes(leaf) -> int:
        # int4 kernels are nibble-packed uint8 [in//2, out] (models/quant.py)
        # so nbytes already reports the true streamed bytes.
        return leaf.nbytes

    total = 0
    for collection in engine.params.values():
        decoder = collection.get("decoder") if isinstance(collection, dict) else None
        if decoder is None:
            continue
        total += sum(
            leaf_bytes(leaf) for leaf in jax.tree_util.tree_leaves(decoder)
        )
    return total


def _decode_microbench(engine, batch: int = 16, repeats: int = 3) -> dict:
    """Median tokens/s of the constrained decode at a fixed prompt/batch.

    Reuses the bench engine (grammar + sampling + forced fast-forward — the
    real serving path). Token counts vary slightly with sampling; tok/s =
    tokens/wall is the stable statistic. ``hbm_bw_util`` = decoder bytes x
    decode steps / wall, against the MEASURED chip copy bandwidth
    (docs/roofline.md): decode is weight-stream bound, so this is the
    utilization that matters.
    """
    prompts = ["请根据视频内容生成结构化要点笔记，覆盖全部章节。"] * batch
    engine.generate_text(prompts)  # compile + warm the bucket
    samples = []
    for _ in range(repeats):
        engine.stats.__init__()
        start = time.perf_counter()
        engine.generate_text(prompts)
        wall = time.perf_counter() - start
        samples.append(
            (engine.stats.tokens_generated / wall, wall,
             engine.stats.decode_steps)
        )
    samples.sort()
    tok_s, wall, steps = samples[len(samples) // 2]
    bw_util = _decoder_stream_bytes(engine) * (steps / wall) / _HBM_PEAK
    return {"decode_fixed_tok_s": round(tok_s, 1),
            "decode_fixed_wall_s": round(wall, 3),
            "decode_fixed_batch": batch,
            "decode_fixed_steps": int(steps),
            "hbm_bw_util": round(bw_util, 4)}


def _recent_decode_bench(backend: str, max_runs: int = 8) -> list[dict]:
    """Compact view of the latest tools/decode_bench.py runs (appended to
    data/output/decode_bench_runs.jsonl) so the official bench artifact
    carries the ablation table, not just the fixed microbench row. Rows
    from a different backend (e.g. a CPU smoke run) are excluded."""
    path = Path(__file__).resolve().parent / "data/output/decode_bench_runs.jsonl"
    if not path.exists():
        return []
    rows = []
    for line in path.read_text().splitlines():
        try:
            run = json.loads(line)
        except json.JSONDecodeError:
            continue
        if run.get("backend") != backend:
            continue
        rows.append({
            "batch": run.get("batch"),
            "quant": run.get("quant"),
            "spec_k": run.get("spec_k"),
            "unix_time": run.get("unix_time"),
            "variants": [
                {k: v.get(k) for k in
                 ("variant", "tok_per_s", "steps_per_s", "tok_per_step_row",
                  "hbm_bw_util")}
                for v in run.get("variants", [])
            ],
        })
    return rows[-max_runs:]


def run_once(engine, work_dir: Path, label: str):
    clip = work_dir / f"bench_{label}.y4m"
    synth_video(clip, VIDEO_SECONDS, FPS)
    analyzer = make_analyzer(engine, work_dir / f"tmp_{label}")
    start = time.perf_counter()
    result = analyzer.analyze_video(clip)
    elapsed = time.perf_counter() - start
    return result, elapsed


def _probe_device(timeout_s: float = 480.0) -> bool:
    """Bounded-time device liveness check in a subprocess.

    A wedged accelerator tunnel hangs jax.devices() FOREVER (observed:
    multi-hour axon outage) — better to fail the bench fast with a clear
    message than to hang the caller's pipeline. Timeout must clear a HEALTHY
    tunnel's cold backend init, measured at 80-150 s per fresh process —
    and leave slack for a busy host core: a 300 s budget was observed to
    fail on a LIVE tunnel twice (round 5) when CPU test runs were
    competing with the init.
    """
    import subprocess

    code = (
        "import jax, jax.numpy as jnp;"
        "x = jnp.ones((64, 64)); float((x @ x).sum());"
        "print('DEVICE_OK', jax.default_backend())"
    )
    try:
        out = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            timeout=timeout_s,
        )
        return "DEVICE_OK" in out.stdout
    except subprocess.TimeoutExpired:
        return False


def main() -> int:
    if not _probe_device():
        print(
            "FATAL: device backend unreachable (tunnel down?) — bench "
            "aborted instead of hanging",
            file=sys.stderr,
        )
        # Machine-readable failure marker: downstream tooling that archives
        # bench lines must never mistake an aborted run for a perf number
        # (round-3 advisor finding — BENCH_r03.json was a tunnel-down rc=2
        # with nothing parseable on stdout).
        print(json.dumps({
            "metric": "video_minutes_analyzed_per_min_per_chip",
            "value": None, "unit": "min/min/chip", "vs_baseline": None,
            "captured": False, "error": "device backend unreachable",
        }))
        return 2

    import jax

    n_chips = len(jax.devices())
    backend = jax.default_backend()

    # Fail loudly if any prompt is truncated during the measured run — the
    # model must see its full instructions on the hot path.
    import logging

    truncations: list[str] = []

    class _TruncationGuard(logging.Handler):
        def emit(self, record):
            if "prompt_truncated" in record.getMessage():
                truncations.append(record.getMessage())

    logging.getLogger("video_transformer").addHandler(_TruncationGuard())

    work_dir = Path(tempfile.mkdtemp(prefix="vtx_bench_"))
    try:
        engine = build_engine()

        # Warmup: compile every shape bucket (prefill + decode + preprocess).
        run_once(engine, work_dir, "warmup")

        # Five measured runs (fresh manifest dirs so nothing is cached):
        # sampled note lengths gate wall time through the batch's slowest
        # row, so single runs swing ~±15% (round-4 medians of 3 spread
        # 282-305 min/min across identical configs). The OFFICIAL number is
        # the median pass (best-of-N biases upward; cross-round comparisons
        # need an unbiased statistic); all walls ride in extras. A pass is
        # ~2 s at base/seg60, so the extra two runs cost nothing next to
        # the warmup compile.
        runs = []
        for label in ("measured", "measured2", "measured3", "measured4",
                      "measured5"):
            engine.stats.__init__()
            result, elapsed = run_once(engine, work_dir, label)
            runs.append((elapsed, result, engine.stats.as_dict()))
        if truncations:
            print(f"FATAL: prompts truncated during bench: {truncations[:3]}",
                  file=sys.stderr)
            return 1
        all_walls = [round(e, 2) for e, _, _ in runs]
        elapsed, result, stats_dict = sorted(runs, key=lambda r: r[0])[len(runs) // 2]

        # Fixed decode microbench: one steady-state serving-path decode
        # sweep (batch 16, grammar on, shared prompt) timed median-of-3 —
        # a low-variance tokens/s line for cross-round perf tracking that
        # the slowest-note gating above cannot distort.
        decode_fixed = _decode_microbench(engine)

        analyzed_minutes = float(result.metadata.get("duration", VIDEO_SECONDS)) / 60.0
        wall_minutes = elapsed / 60.0
        value = analyzed_minutes / wall_minutes / max(n_chips, 1)
        stats = stats_dict
        preproc_fps = (
            stats["frames_preprocessed"] / stats["preprocess_seconds"]
            if stats["preprocess_seconds"]
            else 0.0
        )

        # Decode MFU: generated tokens x ~2 FLOPs per active decoder param,
        # against the chip's peak dense bf16 rate. Small-batch decode is
        # weight-bandwidth-bound, so this is expected to be low — it is an
        # honesty metric, not a score.
        n_params = _param_count(engine.params)
        peak = _PEAK_FLOPS.get(backend, 197e12) * max(n_chips, 1)
        mfu_decode = (
            stats["tokens_per_second"] * 2.0 * n_params / peak
            if stats["tokens_per_second"]
            else 0.0
        )

        print(
            json.dumps(
                {
                    "metric": "video_minutes_analyzed_per_min_per_chip",
                    "value": round(value, 3),
                    "unit": "min/min/chip",
                    "vs_baseline": round(value / NORTH_STAR_MIN_PER_MIN_PER_CHIP, 3),
                    "extras": {
                        "backend": backend,
                        "n_chips": n_chips,
                        "video_seconds": VIDEO_SECONDS,
                        "wall_seconds": round(elapsed, 2),
                        "wall_seconds_median": round(elapsed, 2),
                        "wall_seconds_all_runs": all_walls,
                        **decode_fixed,
                        "segments": result.metadata.get("segments"),
                        "decode_tokens_per_s": stats["tokens_per_second"],
                        "preproc_frames_per_s": round(preproc_fps, 1),
                        # Wall decomposition: device generate / preprocess /
                        # everything else (host decode, contract gate, IO).
                        "generate_seconds": stats["generate_seconds"],
                        "preprocess_seconds": stats["preprocess_seconds"],
                        "host_other_seconds": round(
                            max(
                                elapsed
                                - stats["generate_seconds"]
                                - stats["preprocess_seconds"],
                                0.0,
                            ),
                            2,
                        ),
                        "model_preset": PRESET,
                        "quantize": QUANTIZE,
                        "kv_quant": KV_QUANT,
                        "continuous_batching": CONTINUOUS,
                        "segment_seconds": SEGMENT_SECONDS,
                        "model_params": n_params,
                        "mfu_decode": round(mfu_decode, 5),
                        "prompt_truncations": len(truncations),
                        "decode_bench_recent": _recent_decode_bench(backend),
                    },
                },
                ensure_ascii=False,
            )
        )
        return 0
    finally:
        shutil.rmtree(work_dir, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
