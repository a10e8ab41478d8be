"""Probe which train-step variants compile on the real TPU (axon tunnel)."""

import sys
import time

import jax
import numpy as np

from facegantts_tpu.config import default_config
from facegantts_tpu.train import Batch, init_state, make_gan_train_step, make_plain_train_step

TINY = dict(
    n_enc_channels=16, filter_channels=32, filter_channels_dp=16,
    n_enc_layers=1, dec_dim=8, vid_emb_dim=32, micro_batch_size=2,
    timesteps=2, learning_rate=1e-4, warmup_steps=0,
)


def tiny_batch(b=4, tx=8, ty=32, n_mels=128, seed=0):
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    return Batch(
        x=jnp.asarray(rng.integers(1, 100, (b, tx)), jnp.int32),
        x_len=jnp.asarray(np.full(b, tx), jnp.int32),
        y=jnp.asarray(rng.standard_normal((b, n_mels, ty)), jnp.float32),
        y_len=jnp.asarray(np.full(b, ty), jnp.int32),
        spk=jnp.asarray(rng.standard_normal((b, 224, 224, 3)) * 0.1, jnp.float32),
    )


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "plain"
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    mb = int(sys.argv[3]) if len(sys.argv) > 3 else TINY["micro_batch_size"]
    TINY["micro_batch_size"] = mb
    batch = tiny_batch(b=b)
    if which == "plain":
        cfg = default_config(env={}, overrides=dict(TINY, use_gan=0))
        state = init_state(cfg, jax.random.PRNGKey(0), batch)
        step, _ = make_plain_train_step(cfg)
        t0 = time.time()
        state, m = step(state, batch, jax.random.PRNGKey(1))
        jax.block_until_ready(m)
        print(f"plain step OK in {time.time()-t0:.0f}s:",
              {k: round(float(v), 4) for k, v in m.items()})
    else:
        use_r1 = which == "gan_r1"
        cfg = default_config(env={}, overrides=dict(TINY, use_gan=1))
        state = init_state(cfg, jax.random.PRNGKey(0), batch)
        step, _ = make_gan_train_step(cfg)
        t0 = time.time()
        state, m = step(state, batch, jax.random.PRNGKey(1), use_r1=use_r1)
        jax.block_until_ready(m)
        print(f"{which} step OK in {time.time()-t0:.0f}s:",
              {k: round(float(v), 4) for k, v in m.items()})


if __name__ == "__main__":
    main()
