"""Quality auditor: judges a rendered blueprint image against the note.

The reference uploads the PNG to Gemini vision and parses 评分/反馈/通过 lines
(quality_auditor.py:151-343), defaulting to pass on a parse failure. The
TPU-native auditor combines deterministic image forensics (resolution,
blankness, contrast, ink coverage — cheap host-side checks that catch the
actual failure modes of diagram renderers) with an optional engine pass under
the audit grammar. Parse/engine failures keep the reference's default-pass
semantics.
"""

from __future__ import annotations

import json
import logging
from dataclasses import dataclass
from pathlib import Path
from typing import Any

from ..utils.counter import APICounter

__all__ = ["AuditResult", "QualityAuditor"]


@dataclass
class AuditResult:
    score: float
    passed: bool
    feedback: str


class QualityAuditor:
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
        auditor_config = config.get("auditor", {})
        self.threshold = float(auditor_config.get("threshold", 75.0))
        self.use_engine = bool(auditor_config.get("use_engine", False))
        self._engine = engine

    def attach_engine(self, engine: Any) -> None:
        """Late-bind the shared inference engine; only consulted when
        auditor.use_engine is set (image forensics are the default judge)."""
        if self.use_engine and engine is not None:
            self._engine = engine

    def audit_image(
        self, image_path: str | Path, knowledge_doc_content: str
    ) -> AuditResult:
        """Audit the rendered diagram; failures default to pass (reference
        quality_auditor.py:336-343)."""
        try:
            score, feedback = self._forensic_score(Path(image_path))
            if self._engine is not None:
                model_score, model_feedback = self._model_score(
                    Path(image_path), knowledge_doc_content
                )
                score = 0.5 * score + 0.5 * model_score
                feedback = f"{feedback}；{model_feedback}"
            self.api_counter.increment("auditor")
            return AuditResult(
                score=round(score, 1),
                passed=score >= self.threshold,
                feedback=feedback,
            )
        except Exception as exc:
            self.logger.warning(f"event=audit_parse_failed default=pass error={exc}")
            return AuditResult(
                score=self.threshold,
                passed=True,
                feedback=f"审核过程异常，默认通过: {exc}",
            )

    def _forensic_score(self, image_path: Path) -> tuple[float, str]:
        """Deterministic diagram forensics: size, blankness, contrast, ink."""
        from PIL import Image
        import numpy as np

        with Image.open(image_path) as img:
            img = img.convert("L")
            width, height = img.size
            pixels = np.asarray(img, dtype=np.float32)

        issues: list[str] = []
        score = 100.0

        if width < 320 or height < 240:
            score -= 40
            issues.append("分辨率过低")
        std = float(pixels.std())
        if std < 5.0:
            score -= 50
            issues.append("图片近乎空白")
        elif std < 20.0:
            score -= 20
            issues.append("对比度偏低")
        # Ink coverage: fraction of pixels departing from the background.
        background = float(np.median(pixels))
        ink = float((abs(pixels - background) > 40).mean())
        if ink < 0.005:
            score -= 30
            issues.append("内容覆盖过少")
        elif ink > 0.6:
            score -= 15
            issues.append("画面过于密集")

        feedback = "、".join(issues) if issues else "图像质量检查通过"
        return max(score, 0.0), feedback

    def _model_score(self, image_path: Path, note: str) -> tuple[float, str]:
        """Vision-grounded audit: the rendered PNG goes through the VLM's
        vision tower alongside the note excerpt, mirroring the reference's
        image upload to the vision judge (quality_auditor.py:151-245). The
        still image is tiled to the encoder's clip length so the standard
        video preprocess path serves it unchanged."""
        from ..analyzer.prompts import render_prompt
        from ..analyzer.schema import audit_dfa

        prompt = render_prompt(
            "audit",
            {"note_excerpt": note[:1200], "threshold": int(self.threshold)},
        )
        dfa = self._engine.wrap_grammar(audit_dfa(self._engine.byte_vocab))
        frames = self._image_clip(image_path)
        text = self._engine.generate(frames, [prompt], dfa=dfa)[0]
        parsed = json.loads(text)
        return float(parsed.get("score", 0)), str(parsed.get("feedback", ""))

    def _image_clip(self, image_path: Path) -> "np.ndarray":
        """PNG -> uint8 [1, T, H, W, 3] still clip at the engine's frame
        count. Host-side downscale bounds the device resize matmul; the
        exact target size comes from preprocess_frames."""
        from PIL import Image
        import numpy as np

        num_frames = int(self._engine.config.encoder.num_frames)
        with Image.open(image_path) as img:
            img = img.convert("RGB")
            long_edge = max(img.size)
            if long_edge > 512:
                scale = 512 / long_edge
                img = img.resize(
                    (max(1, round(img.width * scale)),
                     max(1, round(img.height * scale)))
                )
            still = np.asarray(img, dtype=np.uint8)
        return np.broadcast_to(
            still[None, None], (1, num_frames) + still.shape
        ).copy()
