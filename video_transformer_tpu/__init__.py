"""video_transformer_tpu — a TPU-native video-understanding framework.

Re-implements the capabilities of shizhenneko/Video-Transformer (a cloud-LLM
video knowledge-distillation pipeline) as a self-contained, TPU-first stack:

- ``contracts``  — the structured output contract (KnowledgeDocument /
  AnalysisResult JSON schema, Markdown render modes, structure validators).
- ``models``     — JAX/Flax video-language model (video ViT encoder +
  decoder-only LM) designed for MXU-friendly shapes and pjit sharding.
- ``ops``        — Pallas TPU kernels and fused ops (flash attention, fused
  frame preprocessing + tubelet embedding, constrained JSON decoding tables).
- ``parallel``   — device mesh construction, sharding rules, and the
  pjit-compiled inference engine (prefill + decode).
- ``train``      — distillation training step (pjit over dp/tp mesh),
  optimizer and checkpointing.
- ``analyzer``   — ContentAnalyzer: the on-device replacement for the
  reference's cloud Gemini call (reference: src/analyzer/content_analyzer.py).
- ``video``      — probing, segmentation (long-video engine), frame decoding.
- ``pipeline``   — orchestration (download -> analyze -> validate -> visualize
  -> audit), mirroring reference src/pipeline.py.
- ``utils``      — config, logging, budget counters/planners, note refiner,
  quality gates, progress tracking.
"""

__version__ = "0.1.0"
