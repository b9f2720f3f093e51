"""Distillation training on the (data, model) mesh.

The reference has no training at all — its "teacher" is the Gemini cloud.
This trainer closes the loop TPU-natively: (clip, teacher-note-JSON) pairs
train the local VideoLM with next-token cross-entropy on the text tokens
(video tokens are input-only). The step is one pjit program: batch sharded
over "data", parameters over "model" (sharding.py), gradients all-reduced by
GSPMD, optional remat on decoder blocks for HBM headroom.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.config import VLMConfig
from ..models.tokenizer import ByteTokenizer
from ..models.vlm import VideoLM
from ..parallel.mesh import DATA_AXIS
from ..parallel.sharding import param_shardings

__all__ = ["TrainConfig", "Trainer", "make_train_step"]


@dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 3e-4
    weight_decay: float = 0.01
    warmup_steps: int = 100
    total_steps: int = 10_000
    max_grad_norm: float = 1.0
    b1: float = 0.9
    b2: float = 0.95
    accum_steps: int = 1
    """Gradient accumulation: optimizer applies every accum_steps micro-steps
    (effective batch = device batch * accum_steps)."""
    remat: bool = False
    """Rematerialize decoder blocks (HBM for FLOPs; base/7b presets)."""
    prompt_len: int = 0
    """Width of the serving prompt block at the start of each sequence
    (masked out of the loss; aligns train positions with inference)."""
    pp_microbatches: int = 4
    """GPipe microbatch count when training on a "pipe" mesh (the batch
    must divide by it; utilization = n_micro / (n_micro + stages - 1))."""
    pp_schedule: str = "gpipe"
    """Pipeline backward schedule: "gpipe" (jax.grad through the staged
    forward; stashes O(n_micro) activations per stage) or "1f1b" (hand
    scheduled recompute+backward waves; O(stages) stash — pick it when
    growing n_micro to fill the bubble exhausts HBM)."""


def make_optimizer(config: TrainConfig) -> optax.GradientTransformation:
    schedule = optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=config.learning_rate,
        warmup_steps=config.warmup_steps,
        decay_steps=max(config.total_steps, config.warmup_steps + 1),
        end_value=config.learning_rate * 0.1,
    )
    optimizer = optax.chain(
        optax.clip_by_global_norm(config.max_grad_norm),
        optax.adamw(
            schedule,
            b1=config.b1,
            b2=config.b2,
            weight_decay=config.weight_decay,
        ),
    )
    if config.accum_steps > 1:
        optimizer = optax.MultiSteps(optimizer, every_k_schedule=config.accum_steps)
    return optimizer


def distillation_loss(
    model: VideoLM,
    params: Any,
    patches: jax.Array,  # [B, Nv, patch_dim]
    tokens: jax.Array,  # [B, St] teacher text (BOS ... EOS PAD*)
    pad_id: int,
    prompt_lens: jax.Array | None = None,  # [B] per-row prompt block widths
    logits_fn: Any = None,
) -> tuple[jax.Array, dict[str, jax.Array]]:
    """Next-token CE on text positions; video tokens condition only.

    ``prompt_lens`` masks each row's serving prompt block (positions
    0..prompt_lens[i]) out of the loss so the model learns to CONTINUE the
    prompt, never to reproduce it. PER ROW because the serving engine sizes
    every prompt's block to its own 128-multiple bucket
    (engine._assemble_inputs) — training must mask the same widths or
    generation starts at out-of-distribution positions.

    ``logits_fn(params, patches, tokens)`` overrides the forward (the
    pipeline-parallel path stages the decoder blocks; same loss math).
    """
    video_tokens = model.config.video_tokens
    if logits_fn is None:
        logits = model.apply(params, patches, tokens)  # [B, Nv+St, V]
    else:
        logits = logits_fn(params, patches, tokens)
    # Position Nv+k-1 predicts text token k (inputs are [video, text]).
    text_logits = logits[:, video_tokens - 1 : -1, :]  # predicts tokens[:, 0:St]
    targets = tokens
    mask = (targets != pad_id).astype(jnp.float32)
    if prompt_lens is not None:
        positions = jnp.arange(targets.shape[1])[None, :]
        mask = mask * (positions >= prompt_lens[:, None]).astype(jnp.float32)
    log_probs = jax.nn.log_softmax(text_logits.astype(jnp.float32), axis=-1)
    token_ll = jnp.take_along_axis(log_probs, targets[..., None], axis=-1)[..., 0]
    denom = jnp.maximum(mask.sum(), 1.0)
    loss = -(token_ll * mask).sum() / denom
    accuracy = (
        ((jnp.argmax(text_logits, axis=-1) == targets) * mask).sum() / denom
    )
    return loss, {"loss": loss, "accuracy": accuracy, "tokens": mask.sum()}


def make_train_step(
    model: VideoLM,
    optimizer: optax.GradientTransformation,
    pad_id: int = ByteTokenizer.PAD,
    logits_fn: Any = None,
):
    """Build the (jittable) train step: (params, opt_state, batch) -> updated."""

    def train_step(params, opt_state, patches, tokens, prompt_lens):
        (loss, metrics), grads = jax.value_and_grad(
            lambda p: distillation_loss(
                model, p, patches, tokens, pad_id, prompt_lens,
                logits_fn=logits_fn,
            ),
            has_aux=True,
        )(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics["grad_norm"] = optax.global_norm(grads)
        return params, opt_state, metrics

    return train_step


class Trainer:
    """Owns sharded params + optimizer state and the compiled step."""

    def __init__(
        self,
        model_config: VLMConfig,
        mesh: Mesh,
        train_config: TrainConfig | None = None,
        seed: int = 0,
    ):
        self.mesh = mesh
        self.train_config = train_config or TrainConfig()
        from ..parallel.pipeline_parallel import PIPE_AXIS

        self.use_pp = PIPE_AXIS in mesh.axis_names
        # On a pipe mesh the BLOCK STACK shards inside shard_map (GPipe);
        # the VideoLM's own remat flag stays off — pipeline_blocks_forward
        # applies per-block remat itself.
        self.model = VideoLM(
            model_config, remat=self.train_config.remat and not self.use_pp
        )
        self.optimizer = make_optimizer(self.train_config)

        logits_fn = None
        if self.use_pp:
            from ..parallel.pipeline_parallel import pipeline_vlm_logits

            n_micro = max(self.train_config.pp_microbatches, 1)
            if model_config.decoder.num_layers % mesh.shape[PIPE_AXIS]:
                raise ValueError(
                    f"decoder layers {model_config.decoder.num_layers} must "
                    f"divide into {mesh.shape[PIPE_AXIS]} pipeline stages"
                )
            logits_fn = lambda p, patches, tokens: pipeline_vlm_logits(
                self.model, p, patches, tokens, mesh, n_micro,
                remat=self.train_config.remat,
                schedule=self.train_config.pp_schedule,
            )

        params = self.model.init_variables(jax.random.PRNGKey(seed))
        if self.use_pp:
            # Parameters/optimizer replicate across stages (each stage slices
            # its block rows locally inside shard_map); batch is replicated.
            def replicated(tree):
                return jax.tree_util.tree_map(
                    lambda _: NamedSharding(mesh, P()), tree
                )

            sharding = replicated(params)
            data_sharding = NamedSharding(mesh, P())
        else:
            sharding = param_shardings(mesh, params)
            data_sharding = NamedSharding(mesh, P(DATA_AXIS))
        self.params = jax.device_put(params, sharding)
        opt_state = self.optimizer.init(self.params)
        # Optimizer moments mirror parameter sharding automatically: they are
        # pytrees of the same leaves, so reuse the same rule pass.
        opt_sharding = (
            replicated(opt_state) if self.use_pp
            else param_shardings(mesh, opt_state)
        )
        self.opt_state = jax.device_put(opt_state, opt_sharding)

        self._step = jax.jit(
            make_train_step(self.model, self.optimizer, logits_fn=logits_fn),
            in_shardings=(sharding, opt_sharding,
                          data_sharding, data_sharding, data_sharding),
            out_shardings=(sharding, opt_sharding, None),
            donate_argnums=(0, 1),
        )
        self.step_count = 0

    def step(
        self,
        patches: jax.Array,
        tokens: jax.Array,
        prompt_lens: jax.Array | None = None,
    ) -> dict[str, float]:
        """One sharded optimization step; returns host-side metrics.

        ``prompt_lens`` [B] = per-row prompt block widths to mask from the
        loss; defaults to the uniform TrainConfig.prompt_len.
        """
        import numpy as np

        if prompt_lens is None:
            prompt_lens = np.full(
                (tokens.shape[0],), self.train_config.prompt_len, np.int32
            )
        self.params, self.opt_state, metrics = self._step(
            self.params, self.opt_state, patches, tokens, prompt_lens
        )
        self.step_count += 1
        return {k: float(v) for k, v in metrics.items()}

    # -- checkpointing ---------------------------------------------------------

    def save_checkpoint(self, directory: str) -> None:
        from pathlib import Path

        import orbax.checkpoint as ocp

        # orbax rejects relative paths ("Checkpoint path should be absolute").
        target = Path(directory).resolve() / f"params_{self.step_count}"
        if target.exists():
            return  # already saved at this step (periodic + final overlap)
        with ocp.StandardCheckpointer() as checkpointer:
            checkpointer.save(target, self.params)

    def restore_checkpoint(self, path: str) -> None:
        from pathlib import Path

        import orbax.checkpoint as ocp

        resolved = Path(path).resolve()
        with ocp.StandardCheckpointer() as checkpointer:
            self.params = checkpointer.restore(resolved, self.params)
        # Resumed runs continue the checkpoint numbering: params_N encodes
        # the step the weights were saved at, so a crash-resume writes
        # params_{N+every} next to the originals instead of colliding with
        # (and silently skipping, via the exists() guard above) params_every.
        name = resolved.name
        if name.startswith("params_") and name.split("_")[-1].isdigit():
            self.step_count = int(name.split("_")[-1])
