"""Orchestration layer: pipeline, downloader, validator, visualizer, auditor."""

from .pipeline import VideoPipeline

__all__ = ["VideoPipeline"]
