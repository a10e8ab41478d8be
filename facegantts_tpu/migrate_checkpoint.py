"""Checkpoint migration CLI (reference migrate_checkpoint.py:4-19, widened).

The reference's tool does one thing: inject a missing
``pytorch-lightning_version`` key so old torch checkpoints load in newer
Lightning.  This framework's equivalent covers the migrations that actually
arise on the TPU side:

1. ``torch -> orbax`` (the main path): convert a reference ``.pt``/``.ckpt``
   (plain FaceTTS or GAN checkpoint; discriminator keys stripped exactly like
   train.py:110-121) into an orbax checkpoint directory that
   ``train.loop.warm_start`` / ``checkpoint.restore_checkpoint`` consume.
2. ``fix-lightning``: the reference behavior verbatim — add the missing
   Lightning version key to a torch checkpoint so it remains loadable by the
   original repo (round-trip compatibility).

Usage:
  python -m facegantts_tpu.migrate_checkpoint src=<ckpt.pt> dst=<orbax_dir> \
      [mode=torch2orbax|fix-lightning] [config overrides...]
"""

import os
import sys

from facegantts_tpu.config import default_config, parse_cli_overrides


def torch_to_orbax(src: str, dst: str, cfg) -> None:
    """Import reference torch weights into a fresh TrainState and save it as
    an orbax checkpoint at step 0 (optimizer state freshly initialized —
    the reference's warm start also restarts optimization, train.py:110-121)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from facegantts_tpu.train import checkpoint as ck
    from facegantts_tpu.train.state import Batch
    from facegantts_tpu.train.step import init_state

    rng = np.random.default_rng(0)
    b, tx, ty = 2, 16, 64
    batch = Batch(
        x=jnp.asarray(rng.integers(1, 100, (b, tx)), jnp.int32),
        x_len=jnp.asarray(np.full(b, tx), jnp.int32),
        y=jnp.asarray(rng.standard_normal((b, cfg.n_mels, ty)), jnp.float32),
        y_len=jnp.asarray(np.full(b, ty), jnp.int32),
        spk=jnp.asarray(rng.standard_normal((b, 224, 224, 3)), jnp.float32),
    )
    state = init_state(cfg, jax.random.PRNGKey(cfg.seed), batch)
    params, stats = ck.import_facetts(src)
    merged = ck.merge_imported(state.params, params)
    mstate = dict(state.model_state or {})
    if "batch_stats" in mstate:
        mstate["batch_stats"] = ck.merge_imported(mstate["batch_stats"], stats)
    state = state.replace(params=merged, model_state=mstate)
    ck.save_checkpoint(dst, state, step=0, keep=1)
    print(f"[INFO] wrote orbax checkpoint: {dst} (step 0)")


def fix_lightning_version(src: str, dst: str) -> None:
    """Reference migrate_checkpoint.py behavior: add the
    ``pytorch-lightning_version`` key if absent and re-save."""
    import torch

    ckpt = torch.load(src, map_location="cpu", weights_only=False)
    if not isinstance(ckpt, dict):
        raise SystemExit(f"{src} is not a dict checkpoint")
    if "pytorch-lightning_version" in ckpt:
        print("[INFO] checkpoint already has pytorch-lightning_version; copying")
    else:
        ckpt["pytorch-lightning_version"] = "1.9.0"
        print("[INFO] injected pytorch-lightning_version=1.9.0")
    torch.save(ckpt, dst)
    print(f"[INFO] wrote {dst}")


def main(argv=None):
    overrides = parse_cli_overrides(argv if argv is not None else sys.argv[1:])
    src = overrides.pop("src", None)
    dst = overrides.pop("dst", None)
    mode = overrides.pop("mode", "torch2orbax")
    if not src or not dst:
        raise SystemExit(__doc__)
    if not os.path.exists(src):
        raise SystemExit(f"source checkpoint not found: {src}")
    if mode == "fix-lightning":
        fix_lightning_version(src, dst)
    elif mode == "torch2orbax":
        cfg = default_config(overrides=overrides)
        torch_to_orbax(src, os.path.abspath(dst), cfg)
    else:
        raise SystemExit(f"unknown mode {mode!r} (torch2orbax | fix-lightning)")


if __name__ == "__main__":
    main()
