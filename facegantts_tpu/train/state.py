"""Train state containers (replace Lightning's mutable module state)."""

from typing import Any, Optional

import jax
import optax
from flax import struct


class Batch(struct.PyTreeNode):
    """One training batch (schema parity with reference
    data/lrs2_dataset.py:280-286, TPU layouts).

    x:      (B, T_x)  int32 interspersed symbol ids
    x_len:  (B,)      int32
    y:      (B, n_feats, T_y) float32 log-mel
    y_len:  (B,)      int32
    spk:    (B, 224, 224, 3) float32 face frames
    """

    x: jax.Array
    x_len: jax.Array
    y: jax.Array
    y_len: jax.Array
    spk: jax.Array


class TrainState(struct.PyTreeNode):
    """Generator (+ optional discriminator) parameters and optimizer states.

    `model_state` holds non-optimized variable collections (SyncNet BatchNorm
    running statistics — the pretrained `batch_stats`, reference
    syncnet_hifigan.py:87-99 loads them from the checkpoint)."""

    step: jax.Array
    params: Any
    opt_state: optax.OptState
    model_state: Any = None
    disc_params: Optional[Any] = None
    disc_opt_state: Optional[optax.OptState] = None
