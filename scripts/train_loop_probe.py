"""Production-loop probe on the REAL chip: the full `train.py` machinery —
bucketed loader, fused GAN steps, JSONL metric logging, epoch-end
validation, metric-ranked orbax checkpointing — run end to end on the TPU
with synthetic LRS2-shaped data, at reference dims scaled down one notch.

The overfit probe (scripts/overfit_probe.py) proves the OBJECTIVE learns;
this proves the OPERATIONAL loop around it works on the actual hardware:
data feeding keeps the chip busy, checkpoints appear and are ranked,
validation runs at epoch boundaries, metrics stream to disk.  The metrics
file is committed as ``artifacts/tpu_loop_metrics.jsonl`` and asserted by
``tests/test_train.py::test_committed_tpu_loop_artifact``.

Usage:  python scripts/train_loop_probe.py [max_steps=60] [work_dir]
"""

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NOTCH = dict(
    n_enc_channels="96", filter_channels="384", filter_channels_dp="128",
    n_enc_layers="3", dec_dim="32", use_gan="1", use_r1_penalty="1",
    spk_emb="face", warmup_steps="0",
    learning_rate="3e-4", disc_learning_rate="1e-4",
    # loop shape: global batch 16 on one chip, micro 8; single mel bucket
    # pair keeps this a two-executable run (one train, one val compile)
    batch_size="16", num_gpus="1", micro_batch_size="8",
    text_buckets="192", mel_buckets="256",
    eval_interval="0", log_every_n_steps="5", keep_top_k="2",
    snapshot_epochs="0",
)


def main():
    max_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    work = sys.argv[2] if len(sys.argv) > 2 else "/tmp/tpu_loop_run"

    import jax

    from facegantts_tpu.config import default_config
    from facegantts_tpu.data.dataset import SyntheticDataset
    from facegantts_tpu.train.loop import train
    from facegantts_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    env = dict(NOTCH)
    if os.environ.get("EVAL_INTERVAL"):
        # exercise the in-train eval (reference StepwiseEval) on-device
        env["eval_interval"] = os.environ["EVAL_INTERVAL"]
    for k in ("UNET_FAMILY", "DISC_FAMILY"):
        if os.environ.get(k):
            env[k.lower()] = os.environ[k]
    if os.environ.get("MIXED_BUCKETS"):
        # epoch-realistic shape mix: two mel buckets -> per-bucket
        # executables interleave inside one loop (the real LRS2 situation)
        env["text_buckets"] = "96,192"
        env["mel_buckets"] = "128,256"
    cfg = default_config(env=env)
    print(f"device {jax.devices()[0]}; loop probe {max_steps} steps, "
          f"work_dir {work}", flush=True)
    if os.path.isdir(work):
        shutil.rmtree(work)
    # small synthetic corpus: ~2 epochs inside max_steps so epoch-end val +
    # snapshot + ranked checkpoints all fire (clips capped at 2.5 s so the
    # single-bucket collate stays one executable; with MIXED_BUCKETS the
    # length span covers both buckets so both executables really run)
    min_frames = 40 if os.environ.get("MIXED_BUCKETS") else 150
    # mixed mode: items split across 2 buckets, and the loader only emits
    # FULL batches per bucket — the val set must be big enough that every
    # bucket still forms at least one batch (train/loop.py warns loudly
    # when an epoch's validation yields zero batches)
    n_val = 64 if os.environ.get("MIXED_BUCKETS") else 16
    train_ds = SyntheticDataset(n_items=16 * 16, n_mels=cfg.n_mels,
                                min_frames=min_frames,
                                max_frames=250, spk_mode="face")
    val_ds = SyntheticDataset(n_items=n_val, n_mels=cfg.n_mels, seed=1,
                              min_frames=min_frames,
                              max_frames=250, spk_mode="face")
    t0 = time.time()
    state = train(cfg, work_dir=work, max_steps=max_steps,
                  train_ds=train_ds, val_ds=val_ds)
    wall = time.time() - t0
    print(f"loop done: step {int(state.step)} in {wall:.0f}s", flush=True)

    lines = [json.loads(l) for l in open(os.path.join(work, "metrics.jsonl"))]
    train_lines = [l for l in lines if any(k.startswith("train/") for k in l)]
    val_lines = [l for l in lines if "val/total_loss" in l]
    ckpts = os.listdir(os.path.join(work, "checkpoints"))
    print(f"{len(train_lines)} train log lines, {len(val_lines)} val lines, "
          f"checkpoints: {sorted(ckpts)}", flush=True)
    print(f"artifacts: {sorted(os.listdir(work))}", flush=True)

    if os.environ.get("MIXED_BUCKETS"):
        name = "tpu_loop_mixed_metrics.jsonl"
    elif os.environ.get("EVAL_INTERVAL"):
        name = "tpu_loop_eval_metrics.jsonl"
    else:
        name = "tpu_loop_metrics.jsonl"
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "artifacts", name)
    meta = {"meta": {"device": str(jax.devices()[0]), "max_steps": max_steps,
                     "wall_s": round(wall, 1),
                     "checkpoints": sorted(ckpts),
                     "work_entries": sorted(os.listdir(work))}}
    with open(out, "w") as f:
        f.write(json.dumps(meta) + "\n")
        for l in lines:
            f.write(json.dumps(l) + "\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
