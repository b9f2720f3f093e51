"""Distillation training: pjit train step, optimizer, checkpointing."""

from .trainer import TrainConfig, Trainer, make_train_step

__all__ = ["TrainConfig", "Trainer", "make_train_step"]
