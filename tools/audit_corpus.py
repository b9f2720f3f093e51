#!/usr/bin/env python3
"""Matched/mismatched blueprint corpus: decide `auditor.use_engine` by data.

The reference audits EVERY rendered diagram with a vision model
(reference quality_auditor.py:151-245); this repo ships pixel forensics by
default and keeps the vision-grounded engine audit opt-in. Round-4 verdict
(#7) asks for the default to be DECIDED from a measured corpus, not a
config comment. This tool builds that corpus deterministically:

  matched pair     note_i  +  blueprint rendered from note_i's schema
  mismatched pair  note_i  +  blueprint rendered from note_j's schema (j!=i)

and scores every pair under (a) forensic-only and (b) engine-on (50/50
forensic+model average — pipeline/auditor.py:66). A good auditor passes
matched pairs and fails mismatched ones; the discrimination statistic is
  pass(matched) - pass(mismatched)   (1.0 = perfect, 0.0 = blind).

Forensic-only is expected to score 0.0 by construction — it never reads
the note — so the engine side carries the decision: flip the default only
if its discrimination is meaningfully positive, because a judge that
cannot tell pairs apart adds decode cost and score noise for nothing.

  PYTHONPATH=/root/repo python tools/audit_corpus.py \
      [--engine] [--checkpoint DIR] [--pairs 20] [--out docs/audit_corpus.json]

Prints one JSON line per mode and writes the combined table to --out.
"""

from __future__ import annotations

import argparse
import json
import logging
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def build_corpus(n_pairs: int, out_dir: Path) -> list[dict]:
    """Render n_pairs (note, matched_png, mismatched_png) triples."""
    from video_transformer_tpu.contracts.knowledge import AnalysisResult
    from video_transformer_tpu.pipeline.visualizer import ImageGenerator
    from video_transformer_tpu.train.grounded import TOPIC_BANK, grounded_note

    rng = np.random.default_rng(7)
    gen = ImageGenerator({"image_generator": {"backend": "local"}})
    out_dir.mkdir(parents=True, exist_ok=True)

    stride = max(len(TOPIC_BANK) // n_pairs, 1)
    ids = [(i * stride) % len(TOPIC_BANK) for i in range(n_pairs)]

    rows = []
    for i, topic_id in enumerate(ids):
        topic = TOPIC_BANK[topic_id]
        note = grounded_note(topic, rng)
        schema = note["visual_schemas"][0]["schema"]
        markdown = AnalysisResult.from_api_response(
            f"corpus_{i}", note
        ).to_markdown(self_check_mode="static")
        png = gen.generate_blueprint(schema)
        path = out_dir / f"blueprint_{i:02d}.png"
        path.write_bytes(png)
        rows.append(
            {"topic": topic.name, "note": markdown, "schema": schema,
             "image": str(path)}
        )
    # Mismatched image: a far-away topic's blueprint (offset keeps every
    # pair mismatched even when n_pairs spans the whole bank).
    for i, row in enumerate(rows):
        row["mismatched_image"] = rows[(i + len(rows) // 2) % len(rows)][
            "image"
        ]
    return rows


def score_corpus(rows: list[dict], auditor) -> dict:
    matched_scores, mismatched_scores = [], []
    matched_pass = mismatched_pass = 0
    for row in rows:
        m = auditor.audit_image(row["image"], row["note"])
        x = auditor.audit_image(row["mismatched_image"], row["note"])
        matched_scores.append(m.score)
        mismatched_scores.append(x.score)
        matched_pass += m.passed
        mismatched_pass += x.passed
    n = len(rows)
    return {
        "pairs": n,
        "matched_pass_rate": round(matched_pass / n, 3),
        "mismatched_pass_rate": round(mismatched_pass / n, 3),
        "discrimination": round((matched_pass - mismatched_pass) / n, 3),
        "matched_score_mean": round(float(np.mean(matched_scores)), 1),
        "mismatched_score_mean": round(float(np.mean(mismatched_scores)), 1),
        "score_gap": round(
            float(np.mean(matched_scores) - np.mean(mismatched_scores)), 1
        ),
    }


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--pairs", type=int, default=20)
    parser.add_argument("--engine", action="store_true",
                        help="also score with the on-device vision judge")
    parser.add_argument("--preset", default="base")
    parser.add_argument(
        "--checkpoint",
        default="data/checkpoints/base-zh-grounded-r3d-bf16/params_3700",
    )
    parser.add_argument("--tokenizer",
                        default="data/tokenizers/bpe-zh-2048.json")
    parser.add_argument("--quantize", default=None, choices=["int8", "int4"])
    parser.add_argument("--out", default="docs/audit_corpus.json")
    parser.add_argument("--corpus-dir", default="data/temp/audit_corpus")
    args = parser.parse_args()

    from video_transformer_tpu.pipeline.auditor import QualityAuditor
    from video_transformer_tpu.utils.counter import APICounter

    logging.basicConfig(level=logging.WARNING)
    rows = build_corpus(args.pairs, Path(args.corpus_dir))

    report: dict = {"pairs": args.pairs}
    forensic = QualityAuditor(
        {"auditor": {"threshold": 75, "use_engine": False}},
        APICounter(max_calls=10_000, hard_max_calls=10_000),
    )
    report["forensic_only"] = score_corpus(rows, forensic)
    print(json.dumps({"mode": "forensic_only", **report["forensic_only"]},
                     ensure_ascii=False), flush=True)

    if args.engine:
        from dataclasses import replace

        from video_transformer_tpu.analyzer.schema import note_dfa
        from video_transformer_tpu.models.bpe import BpeTokenizer
        from video_transformer_tpu.models.config import get_preset
        from video_transformer_tpu.parallel.engine import InferenceEngine

        config = get_preset(args.preset)
        tok = BpeTokenizer.load(args.tokenizer)
        config = replace(
            config, decoder=replace(config.decoder, vocab_size=tok.vocab_size)
        )
        engine = InferenceEngine(
            config,
            tokenizer=tok,
            max_new_tokens=256,
            temperature=0.7,
            param_dtype="bfloat16",
            quantize=args.quantize,
            seed=1,
        )
        engine.dfa = engine.wrap_grammar(note_dfa(engine.byte_vocab))
        engine.restore(args.checkpoint)

        judged = QualityAuditor(
            {"auditor": {"threshold": 75, "use_engine": True}},
            APICounter(max_calls=10_000, hard_max_calls=10_000),
            engine=engine,
        )
        report["engine_on"] = score_corpus(rows, judged)
        report["checkpoint"] = args.checkpoint
        print(json.dumps({"mode": "engine_on", **report["engine_on"]},
                         ensure_ascii=False), flush=True)

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(report, ensure_ascii=False, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
