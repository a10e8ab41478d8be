#!/usr/bin/env python
"""Training entry point (reference train.py equivalent).

Usage:
  python train.py [key=value ...]        # e.g. use_gan=1 batch_size=64

Every reference config key works as an override (env vars too, reference
config.py:10-181).  Selects FaceTTS vs FaceTTS+discriminator on use_gan
(reference train.py:90-96), warm-starts from resume_from (torch .pt/.ckpt or
an orbax dir), and runs the jitted training loop data-parallel over all
visible devices."""

import sys

from facegantts_tpu.config import default_config, parse_cli_overrides
from facegantts_tpu.train.loop import train


def main(argv=None):
    overrides = parse_cli_overrides(argv if argv is not None else sys.argv[1:])
    work_dir = overrides.pop("work_dir", "runs/default")
    # config=<file.json>: preset file (e.g. configs/tpu_fast.json), lower
    # precedence than explicit key=value overrides and env vars
    json_path = overrides.pop("config", None)
    if str(overrides.pop("jax_distributed", "0")) == "1":
        # multi-host pod: every worker runs this same command
        # (scripts/launch_pod.sh); topology comes from the TPU metadata
        import jax

        jax.distributed.initialize()
        print(f"[INFO] jax.distributed: process {jax.process_index()}"
              f"/{jax.process_count()}, {jax.local_device_count()} local devices")
    cfg = default_config(overrides=overrides, json_path=json_path)
    print(f"[INFO] use_gan={cfg.use_gan} batch_size={cfg.batch_size} "
          f"max_steps={cfg.max_steps} work_dir={work_dir} "
          f"families={cfg.unet_family}/{cfg.disc_family} "
          f"r1_interval={cfg.r1_interval}")
    train(cfg, work_dir=work_dir)


if __name__ == "__main__":
    main()
