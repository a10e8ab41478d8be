"""Trip-count-aware FLOP audit of the GAN training step.

``compiled.cost_analysis()['flops']`` counts every While BODY exactly once —
the fused GAN step contains a scan over micro-batches and, inside the
sampler, a scan over the T reverse-diffusion steps, so its self-reported
FLOPs understate the true work by roughly ``n_micro x`` and ``T x`` on those
segments (round-2 bench reported 24.6 TFLOP/step; the audited count at the
same config is ~2x that).  This module lowers the while-free PIECES the step
scans over — one U-Net eval, the sampler prologue (text encoder + duration
path), the D-phase grad, the G-phase grad, the optimizer updates — reads
XLA's own cost model for each, and assembles

    step = n_micro * (prologue + T * unet_eval + d_grad + g_grad) + updates

Must run on a platform whose ``lower().cost_analysis()`` is implemented
(XLA:CPU; the axon TPU plugin returns None) — bench.py runs it in a scrubbed
CPU subprocess via utils.hostenv.
"""

import json
from typing import Dict

import numpy as np


def _flops(fn, *args) -> float:
    import jax

    ca = jax.jit(fn).lower(*args).cost_analysis()
    if not ca or "flops" not in ca:
        raise RuntimeError("lower().cost_analysis() unavailable on this platform")
    return float(ca["flops"])


def gan_step_flops(cfg, ty: int, tx: int) -> Dict[str, float]:
    """Audited FLOPs of one GAN train step at per-device batch
    ``cfg.micro_batch_size * 2`` (the bench shape), bucket lengths (tx, ty)."""
    import jax
    import jax.numpy as jnp

    from facegantts_tpu.models.facetts import FaceTTS
    from facegantts_tpu.train.state import Batch
    from facegantts_tpu.train.step import (
        build_models, make_gan_loss_fns,
    )

    model, disc = build_models(cfg)
    sample_fake, d_loss_fn, g_loss_fn = make_gan_loss_fns(cfg, model, disc)
    mb = cfg.micro_batch_size
    rng = jax.random.PRNGKey(0)
    batch = Batch(
        x=jnp.ones((mb, tx), jnp.int32),
        x_len=jnp.full((mb,), tx, jnp.int32),
        y=jnp.zeros((mb, cfg.n_mels, ty)),
        y_len=jnp.full((mb,), ty, jnp.int32),
        spk=jnp.zeros((mb, cfg.image_size, cfg.image_size, 3))
        if cfg.spk_emb == "face" else jnp.zeros((mb, cfg.n_mels, ty)),
    )
    variables = model.init(
        rng, rng, batch.x, batch.x_len, batch.y, batch.y_len, batch.spk,
        cfg.out_size, method=FaceTTS.compute_loss,
    )
    params = variables["params"]
    model_state = {k: v for k, v in variables.items() if k != "params"}
    disc_params = disc.init(rng, batch.y[..., None])["params"]

    # one U-Net score-estimator eval at the sampler's working shape — the
    # body of the T-step reverse scan (constructed exactly as Diffusion.setup
    # does, models/diffusion.py — incl. the family switch; its params live
    # at decoder/estimator)
    from facegantts_tpu.models.unet import (
        GradLogPEstimator2d,
        GradLogPEstimator2dTpuOpt,
    )

    if cfg.unet_family == "tpu_opt":
        unet = GradLogPEstimator2dTpuOpt(
            dim=cfg.dec_dim * 2,
            multi_spks=1 if cfg.n_spks > 1 else 0,
            spk_emb_dim=cfg.vid_emb_dim,
            n_feats=cfg.n_mels,
            pe_scale=1000.0,
        )
    else:
        unet = GradLogPEstimator2d(
            dim=cfg.dec_dim,
            multi_spks=1 if cfg.n_spks > 1 else 0,
            spk_emb_dim=cfg.vid_emb_dim,
            n_feats=cfg.n_mels,
            pe_scale=1000.0,
        )
    est_params = params["decoder"]["estimator"]
    x_t = jnp.zeros((mb, cfg.n_mels, ty))
    mask = jnp.ones((mb, 1, ty))
    spk_emb = jnp.zeros((mb, cfg.vid_emb_dim))
    tt = jnp.full((mb,), 0.5)
    unet_eval = _flops(
        lambda p, a, m, mu, t_, s: unet.apply({"params": p}, a, m, mu, t_, s),
        est_params, x_t, mask, x_t, tt, spk_emb,
    )

    # the full sampler (prologue + scan counted once) -> prologue = this
    # minus ONE unet eval (the scan body single count)
    sampler_once = _flops(
        lambda p, ms, b_, r: sample_fake(p, ms, b_, r),
        params, model_state, batch, rng,
    )
    prologue = max(sampler_once - unet_eval, 0.0)

    fake = jnp.zeros((mb, cfg.n_mels, ty))
    d_grad = _flops(
        lambda dp, y, f: jax.grad(
            lambda dp_: d_loss_fn(dp_, y, f, True)[0]
        )(dp),
        disc_params, batch.y, fake,
    )
    g_grad = _flops(
        lambda p, ms, dp, b_, f, r: jax.grad(
            lambda p_: g_loss_fn(p_, ms, dp, b_, f, r, True, None)[0]
        )(p),
        params, model_state, disc_params, batch, fake, rng,
    )

    n_micro = 2  # bench: per-device batch = 2 * micro_batch_size
    t_train = cfg.train_fake_timesteps  # resolved training-fake T
    step = n_micro * (prologue + t_train * unet_eval + d_grad + g_grad)
    return {
        "unet_eval": unet_eval,
        "sampler": prologue + t_train * unet_eval,
        "d_grad": d_grad,
        "g_grad": g_grad,
        "step": step,
    }


def main():
    """CLI for the scrubbed-CPU subprocess: prints one JSON line.

    $FLOPS_OVERRIDES (JSON dict) applies config overrides — bench.py uses
    it to audit non-default configs (e.g. unet_family=tpu_opt)."""
    import os

    import jax

    jax.config.update("jax_platforms", "cpu")

    from facegantts_tpu.config import default_config

    overrides = json.loads(os.environ.get("FLOPS_OVERRIDES", "{}"))
    cfg = default_config(env={}, overrides=overrides)
    out = gan_step_flops(cfg, ty=436, tx=128)
    print(json.dumps({k: round(v) for k, v in out.items()}))


if __name__ == "__main__":
    main()
