#!/usr/bin/env python3
"""Re-save an orbax params checkpoint with float params cast to bfloat16.

Halves the on-disk (and in-git) size of a shipped checkpoint. Drop-in
compatible with engine.restore()/trainer restore: orbax's StandardCheckpointer
casts restored arrays to the caller's template dtype (verified: bf16-saved
arrays restore as f32 against an f32 template), and serving casts params to
bf16 anyway (engine param_dtype default).

  PYTHONPATH=/root/repo python tools/shrink_checkpoint.py SRC_params_N DST_DIR
"""

from __future__ import annotations

import sys
from pathlib import Path


def shrink(src: str, dst: str) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    src_path = Path(src).resolve()
    dst_path = Path(dst).resolve()
    with ocp.StandardCheckpointer() as checkpointer:
        tree = checkpointer.restore(str(src_path))
        cast = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16)
            if hasattr(a, "dtype") and a.dtype == jnp.float32
            else a,
            tree,
        )
        checkpointer.save(str(dst_path), cast, force=True)
    total = sum(
        a.nbytes for a in jax.tree_util.tree_leaves(cast) if hasattr(a, "nbytes")
    )
    print(f"saved {dst_path} ({total / 1e9:.2f} GB params)")


if __name__ == "__main__":
    if len(sys.argv) != 3:
        print(__doc__)
        sys.exit(2)
    shrink(sys.argv[1], sys.argv[2])
