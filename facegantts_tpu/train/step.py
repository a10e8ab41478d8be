"""Jitted training steps.

One fused XLA program per optimizer step — the TPU redesign of the
reference's Lightning loops:

- plain step = FaceTTS losses + grad + clip + Adam (reference
  face_tts.py:243-279, train.py:132-143).
- GAN step = micro-batched D phase (hinge/BCE/MSE + optional R1
  gradient penalty, NaN-guarded) and G phase (adversarial + FaceTTS losses),
  two optimizers, one jit (reference face_tts_w_discriminator.py:127-349).

Parallelism: the whole loss/grad computation runs inside `shard_map` over
the 1-D `data` mesh — every device scans its LOCAL micro-batches with purely
local math, then gradients/metrics are `pmean`-ed ONCE after the scan, and
the (replicated) optimizer update happens outside.  This places the
all-reduce explicitly at the top level of the program: collectives inside a
While loop deadlock XLA:CPU's rendezvous and are wasteful on TPU; per-device
local loss normalization + gradient mean is exactly DDP's semantics
(reference train.py:132-143).

Key behavioral facts carried over (and exploited):
- The reference's `FaceTTS.forward` is @torch.no_grad (face_tts.py:92), so
  its G-phase adversarial/fm terms carry NO generator gradient.  We
  therefore sample each micro-batch's fake mel ONCE and reuse it for both D
  and G phases — identical training dynamics at half the reference's
  sampler cost.  cfg.adv_grad_through_sampler=1 instead differentiates
  through the (rematerialized) reverse scan.
- Micro-batch gradients are averaged by n_micro with non-finite-loss
  micro-batches contributing zero, matching the reference's NaN skip
  (face_tts_w_discriminator.py:203-207).
- The GAN G-phase runs compute_loss at full length (out_size=None), like the
  reference (face_tts_w_discriminator.py:285-287); the plain step crops to
  the static 2-second out_size.
"""

from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from facegantts_tpu.config import Config
from facegantts_tpu.models.discriminator import SpectrogramDiscriminator
from facegantts_tpu.models.facetts import FaceTTS
from facegantts_tpu.parallel.mesh import create_mesh, fsdp_spec
from facegantts_tpu.train.optim import (
    build_discriminator_optimizer,
    build_gan_generator_optimizer,
    build_generator_optimizer,
)
from facegantts_tpu.train.state import Batch, TrainState


def build_models(cfg: Config):
    model = FaceTTS.from_config(cfg)
    disc = SpectrogramDiscriminator(
        base_channels=cfg.disc_base_channels,
        num_layers=cfg.disc_num_layers,
        kernel_height=cfg.kernel_height,
        kernel_width=cfg.kernel_width,
        stride=cfg.disc_stride,
        padding=cfg.disc_padding,
        lrelu_slope=cfg.disc_lrelu_slope,
        use_spectral_norm=cfg.use_spectral_norm,
        multi_speaker=cfg.multi_spks,
        residual_channels=cfg.residual_channels,
        family=cfg.disc_family,
    )
    return model, disc


def init_state(cfg: Config, rng: jax.Array, batch: Batch) -> TrainState:
    """Initialize parameters and optimizer states from one example batch.

    Runs under jit: eager op-by-op dispatch of the full loss graph takes
    minutes on small hosts, while one compiled (and persistently cached)
    init program is cheap and reproducible."""
    model, disc = build_models(cfg)

    def _init(rng: jax.Array) -> TrainState:
        rng_p, rng_l, rng_d = jax.random.split(rng, 3)
        variables = model.init(
            rng_p, rng_l, batch.x, batch.x_len, batch.y, batch.y_len,
            batch.spk, cfg.out_size, method=FaceTTS.compute_loss,
        )
        params = variables["params"]
        model_state = {k: v for k, v in variables.items() if k != "params"}
        if cfg.use_gan:
            disc_params = disc.init(rng_d, batch.y[..., None])["params"]
            gen_tx = build_gan_generator_optimizer(cfg, params)
            disc_tx = build_discriminator_optimizer(cfg)
            return TrainState(
                step=jnp.zeros((), jnp.int32),
                params=params,
                opt_state=gen_tx.init(params),
                model_state=model_state,
                disc_params=disc_params,
                disc_opt_state=disc_tx.init(disc_params),
            )
        gen_tx = build_generator_optimizer(cfg, params)
        return TrainState(
            step=jnp.zeros((), jnp.int32), params=params,
            opt_state=gen_tx.init(params), model_state=model_state,
        )

    return jax.jit(_init)(rng)


# --------------------------------------------------------------------------
# adversarial criteria (reference face_tts_w_discriminator.py:37-54,168-176)
# --------------------------------------------------------------------------

def _disc_loss(loss_type: str, real_logits, fake_logits):
    if loss_type == "hinge":
        return jnp.mean(jax.nn.relu(1.0 - real_logits)) + jnp.mean(
            jax.nn.relu(1.0 + fake_logits)
        )
    if loss_type == "mse":
        return 0.5 * (
            jnp.mean((real_logits - 1.0) ** 2) + jnp.mean(fake_logits**2)
        )
    # bce with logits
    return 0.5 * (
        jnp.mean(optax.sigmoid_binary_cross_entropy(real_logits, jnp.ones_like(real_logits)))
        + jnp.mean(optax.sigmoid_binary_cross_entropy(fake_logits, jnp.zeros_like(fake_logits)))
    )


def _gen_adv_loss(loss_type: str, fake_logits):
    if loss_type == "hinge":
        return -jnp.mean(fake_logits)
    if loss_type == "mse":
        return jnp.mean((fake_logits - 1.0) ** 2)
    return jnp.mean(
        optax.sigmoid_binary_cross_entropy(fake_logits, jnp.ones_like(fake_logits))
    )


def _disc_accuracy(loss_type: str, real_logits, fake_logits):
    if loss_type == "hinge":
        return 0.5 * ((real_logits > 0).mean() + (fake_logits < 0).mean())
    return 0.5 * (
        (jax.nn.sigmoid(real_logits) > 0.5).mean()
        + (jax.nn.sigmoid(fake_logits) < 0.5).mean()
    )


def _feature_matching(real_fmap, fake_fmap):
    fm = 0.0
    for r, f in zip(real_fmap, fake_fmap):
        fm += jnp.mean(jnp.abs(r - f))
    return fm


def _frame_energy(mel):
    """Per-frame energy of a log-mel, in log domain: (B, F, T) -> (B, T).

    On-device replacement for the reference's librosa RMS on sample[0]
    (face_tts_w_discriminator.py:277-282, feature_extractor.py:46-49)."""
    return jnp.log(jnp.mean(jnp.exp(mel), axis=1) + 1e-8)


def _soft_pitch(mel):
    """Differentiable pitch-contour proxy: softmax-weighted mel-bin centroid
    per frame, (B, F, T) -> (B, T) in bin units.

    The reference runs librosa pYIN on the (detached) mel matrix of
    sample[0] only — a constant w.r.t. parameters, so it only monitors
    (face_tts_w_discriminator.py:266-275).  This proxy tracks the same
    contour-matching objective but on-device, for the whole micro-batch,
    and with a usable gradient.  The protocol-faithful pYIN itself lives
    in evaluation/pyin.py, surfaced through
    facegantts_tpu.feature_extractor.VoiceFeatureExtractor (the reference
    C10 API) for host-side monitoring/eval."""
    w = jax.nn.softmax(mel, axis=1)
    centers = jnp.arange(mel.shape[1], dtype=mel.dtype)
    return jnp.sum(w * centers[None, :, None], axis=1)


def _contour_loss(feat_real, feat_fake, y_len):
    """Masked L1 between per-frame contours (B, T)."""
    t = feat_real.shape[-1]
    mask = (jnp.arange(t)[None, :] < y_len[:, None]).astype(feat_real.dtype)
    diff = jnp.abs(feat_real - feat_fake) * mask
    return jnp.sum(diff) / jnp.maximum(jnp.sum(mask), 1.0)


def _micro_split(batch: Batch, mb_size: int):
    """(B_local, ...) -> (n_micro, mb, ...); B_local must be a multiple of
    mb_size, or smaller than it (one under-sized micro-batch).

    A non-divisible larger batch is a hard error: silently rounding n down
    (as a naive ``b // mb_size`` would) runs oversized micro-batches and
    blows past the memory budget the user configured."""
    b = batch.x.shape[0]
    if b <= mb_size:
        n = 1
    elif b % mb_size == 0:
        n = b // mb_size
    else:
        raise ValueError(
            f"per-device batch {b} is not a multiple of micro_batch_size "
            f"{mb_size}; pick sizes so B_local % micro_batch_size == 0 "
            "(or B_local <= micro_batch_size)"
        )
    return n, jax.tree.map(lambda a: a.reshape(n, b // n, *a.shape[1:]), batch)


def _device_rng(rng, fast: bool = False):
    """Per-device key: fold in the mesh position; optionally re-key into the
    hardware RBG generator.  Threefry mask/noise generation showed up as ~50
    ms/step of broadcast_compare fusions in the GAN-step device trace; the
    TPU-native RBG implementation generates bits at full VPU rate.  All keys
    derived from the returned key (splits, dropout streams, sampler noise)
    inherit the impl.  Flag-gated (cfg.fast_rng) since RBG draws differ from
    threefry draws for the same seed — training distributions are identical,
    per-seed reproducibility across impls is not."""
    rng = jax.random.fold_in(rng, jax.lax.axis_index("data"))
    if fast:
        rng = jax.random.wrap_key_data(
            jax.random.bits(rng, (4,), jnp.uint32), impl="rbg"
        )
    return rng


def _cast_floats(tree, dtype):
    """Cast float leaves (mixed precision); int/bool leaves pass through."""
    return jax.tree.map(
        lambda a: a.astype(dtype)
        if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating) else a,
        tree,
    )


def _mp_caster(cfg: Config):
    """Mixed-precision cast hooks: with cfg.train_bf16 the model computes in
    bfloat16 on the MXU while master params, optimizer state, and gradient
    accumulation stay f32 (the casts sit INSIDE the loss functions, so grads
    flow through `astype` back to the f32 leaves).  Identity when off."""
    if cfg.train_bf16:
        return (lambda t: _cast_floats(t, jnp.bfloat16),
                lambda t: _cast_floats(t, jnp.float32))
    return (lambda t: t), (lambda t: t)


# --------------------------------------------------------------------------
# step factories
# --------------------------------------------------------------------------

def _fsdp_constrainer(mesh: Mesh):
    """Pin a state pytree to its ZeRO layout (parallel/mesh.py fsdp_spec)
    inside the jitted step, so updated params/opt leaves stay SHARDED over
    `data` across steps instead of drifting to whatever layout GSPMD
    propagates from the replicated gradients.  Only reached when cfg.fsdp —
    the default path's HLO is untouched."""
    n = mesh.size

    def constrain(tree):
        return jax.tree.map(
            lambda a: jax.lax.with_sharding_constraint(
                a, NamedSharding(mesh, fsdp_spec(a.shape, n))
            ),
            tree,
        )

    return constrain


def make_plain_train_step(cfg: Config, mesh: Optional[Mesh] = None):
    """No-GAN training step (reference face_tts.py:243-279)."""
    model, _ = build_models(cfg)
    mesh = mesh if mesh is not None else create_mesh()
    gen_tx = None  # built lazily against the param tree
    down, up = _mp_caster(cfg)

    def loss_fn(params, model_state, batch: Batch, rng, train: bool):
        # Training runs with dropout live (reference trains with prenet
        # dropout 0.5 hardwired, model/text_encoder.py:355, plus
        # enc_dropout elsewhere); validation stays deterministic.
        rng, rng_do = jax.random.split(rng)
        parts, _ = model.apply(
            {"params": down(params), **down(model_state)}, rng, batch.x,
            batch.x_len, down(batch.y), batch.y_len, down(batch.spk),
            cfg.out_size, deterministic=not train,
            method=FaceTTS.compute_loss,
            rngs={"dropout": rng_do} if train else {},
        )
        parts = up(parts)
        metrics = {
            "duration_loss": parts.dur_loss,
            "prior_loss": parts.prior_loss,
            "diffusion_loss": parts.diff_loss,
            "spk_loss": parts.spk_loss,
            "total_loss": parts.total,
        }
        return parts.total, metrics

    def local_grads(params, model_state, batch, rng):
        rng = _device_rng(rng, bool(cfg.fast_rng))
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, model_state, batch, rng, True
        )
        return (
            jax.lax.pmean(grads, "data"),
            jax.lax.pmean(metrics, "data"),
        )

    def local_metrics(params, model_state, batch, rng):
        rng = _device_rng(rng, bool(cfg.fast_rng))
        _, metrics = loss_fn(params, model_state, batch, rng, False)
        return jax.lax.pmean(metrics, "data")

    grads_sm = jax.shard_map(
        local_grads, mesh=mesh,
        in_specs=(P(), P(), P("data"), P()), out_specs=(P(), P()),
    )
    val_sm = jax.shard_map(
        local_metrics, mesh=mesh,
        in_specs=(P(), P(), P("data"), P()), out_specs=P(),
    )

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch: Batch, rng) -> Tuple[TrainState, Dict]:
        nonlocal gen_tx
        if gen_tx is None:
            gen_tx = build_generator_optimizer(cfg, state.params)
        grads, metrics = grads_sm(state.params, state.model_state, batch, rng)
        updates, opt_state = gen_tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        if cfg.fsdp:
            constrain = _fsdp_constrainer(mesh)
            params, opt_state = constrain(params), constrain(opt_state)
        metrics["grad_norm"] = optax.global_norm(grads)
        return state.replace(step=state.step + 1, params=params, opt_state=opt_state), metrics

    @jax.jit
    def val_step(state: TrainState, batch: Batch, rng) -> Dict:
        return val_sm(state.params, state.model_state, batch, rng)

    return train_step, val_step


def make_gan_loss_fns(cfg: Config, model=None, disc=None):
    """The three per-micro-batch GAN loss computations, as standalone
    functions: ``sample_fake(params, model_state, mb, rng)``,
    ``d_loss_fn(disc_params, y_real, fake, use_r1)`` and
    ``g_loss_fn(params, model_state, disc_params, mb, fake, rng, train_disc,
    reuse)``.

    Factored out of ``make_gan_train_step`` so the FLOP audit
    (utils/flops.py) can lower exactly the pieces the step scans over —
    XLA's cost model counts a While body ONCE, so the fused step's own
    cost_analysis undercounts by the micro-batch and sampler trip counts."""
    if model is None or disc is None:
        model, disc = build_models(cfg)
    loss_type = cfg.disc_loss_type
    down, up = _mp_caster(cfg)

    def sample_fake(params, model_state, mb: Batch, rng):
        """No-grad fake-mel sampler (reference @no_grad forward,
        face_tts_w_discriminator.py:163-165).  With cfg.gan_sampler_bf16
        (the DEFAULT since r3) the 10-step reverse diffusion runs in
        bfloat16 — the same precision the default inference path uses
        (cfg.use_bf16) — and the result is cast back to f32 before the f32
        D/G loss math.  r3 matrix on v5e: 1721.8 vs 1764.0 ms/step (+2.5%),
        identical g_loss at the probe point (4.5677 under both dtypes);
        set gan_sampler_bf16=0 for strict f32 reference parity."""
        y_bucket = mb.y.shape[-1]
        if cfg.gan_sampler_bf16:
            s_down = lambda t: _cast_floats(t, jnp.bfloat16)  # noqa: E731
        else:
            s_down = down
        t_train = cfg.train_fake_timesteps
        _, dec, _, _ = model.apply(
            {"params": s_down(params), **s_down(model_state)}, mb.x, mb.x_len,
            t_train, y_bucket, 1.0, False, s_down(mb.spk), 1.0, rng,
        )
        return dec.astype(jnp.float32)  # (B, F, T)

    def d_loss_fn(disc_params, y_real, fake, use_r1: bool):
        if cfg.disc_bf16:
            # D-phase-only mixed precision (experimental perf knob): the
            # discriminator forward/backward AND the R1 double-backward run
            # in bf16; loss/penalty assembly is f32.  Master disc params
            # stay f32 (cast sits inside the loss, like train_bf16).
            d_down = lambda t: _cast_floats(t, jnp.bfloat16)  # noqa: E731
        else:
            d_down = down
        disc_params = d_down(disc_params)
        y_real, fake = d_down(y_real), d_down(fake)
        if use_r1:
            # One real-input forward serves both the hinge logits and the R1
            # input-gradient (the reference runs a second discriminator
            # forward just for R1, face_tts_w_discriminator.py:191-201;
            # value_and_grad with aux logits makes the fused form explicit
            # instead of hoping XLA CSEs the twin forward out of the grad
            # trace).
            def logits_sum(y_in):
                logits = disc.apply({"params": disc_params}, y_in)[1]
                return logits.sum(), logits

            (_, real_logits), g = jax.value_and_grad(logits_sum, has_aux=True)(
                y_real[..., None]
            )
            r1 = up(jnp.mean(jnp.sum(g.astype(jnp.float32) ** 2, axis=(1, 2, 3))))
        else:
            _, real_logits = disc.apply({"params": disc_params}, y_real[..., None])
            r1 = 0.0
        fake_fmap, fake_logits = disc.apply({"params": disc_params}, fake[..., None])
        # loss assembly in f32 regardless of the compute dtype
        real_logits = real_logits.astype(jnp.float32)
        fake_logits = fake_logits.astype(jnp.float32)
        d_loss = up(_disc_loss(loss_type, real_logits, fake_logits))
        acc = up(_disc_accuracy(loss_type, real_logits, fake_logits))
        if use_r1:
            # effective_r1_gamma = r1_gamma * r1_interval: with lazy R1
            # (cfg.r1_interval > 1) the penalty lands on 1/N of the steps
            # at N-fold weight (StyleGAN2 lazy regularization); at the
            # default interval 1 this is exactly the reference's gamma
            d_loss = d_loss + cfg.effective_r1_gamma * 0.5 * r1
        # The fake logits/feature-maps are returned for the G phase: with the
        # default no-grad sampler the reference's adv/fm terms carry NO
        # generator gradient (@torch.no_grad forward, face_tts.py:92).  In
        # THIS repo's single-fused-step semantics both phases see the same
        # pre-update disc params and the same fake, so the G-phase forward
        # would recompute exactly these values — handing them over makes the
        # dedup explicit instead of relying on XLA CSE across two grad
        # traces.  NOTE this intentionally deviates from the reference,
        # which steps opt_disc BEFORE its G phase and resamples a fresh fake
        # (face_tts_w_discriminator.py:210,243) — its G-phase logits come
        # from post-update disc params, not these.
        return d_loss, ({"disc_acc": acc, "r1_penalty": r1},
                        (fake_logits, fake_fmap))

    def g_loss_fn(params, model_state, disc_params, mb: Batch, fake, rng,
                  train_disc: bool, reuse=None):
        # SyncNet is FULLY frozen in GAN mode (reference optimizer covers
        # encoder+decoder only, face_tts_w_discriminator.py:120-123, and its
        # per-group grad clips never see syncnet): stop-gradient the frozen
        # subtree so XLA dead-code-eliminates the 224x224 video-trunk
        # backward instead of computing weight grads the optimizer zeroes.
        # Activation gradients THROUGH the audio trunk (spk_loss -> xt_hat
        # -> decoder) are unaffected — they flow through the forward, not
        # the parameters.
        if "syncnet" in params:
            params = dict(
                params,
                syncnet=jax.tree.map(jax.lax.stop_gradient, params["syncnet"]),
            )
        if cfg.adv_grad_through_sampler:
            rng, rng_s = jax.random.split(rng)
            fake = sample_fake(params, model_state, mb, rng_s)
        fake = down(fake)
        disc_params_c = down(disc_params)
        if train_disc:
            if reuse is not None:
                fake_logits, fake_fmap = jax.lax.stop_gradient(reuse)
            else:
                fake_fmap, fake_logits = disc.apply({"params": disc_params_c}, fake[..., None])
            adv = up(_gen_adv_loss(loss_type, fake_logits))
        else:
            fake_fmap, adv = None, jnp.zeros(())
        fm = jnp.zeros(())
        if cfg.use_fm_loss and train_disc:
            real_fmap, _ = disc.apply({"params": disc_params_c}, down(mb.y)[..., None])
            fm = up(_feature_matching(jax.lax.stop_gradient(real_fmap), fake_fmap))
        # optional pitch/energy contour losses (reference :266-282, off by
        # default, config.py:89-90); computed on-device over the micro-batch
        pitch = jnp.zeros(())
        energy = jnp.zeros(())
        if cfg.use_pitch_loss:
            pitch = up(_contour_loss(
                _soft_pitch(jax.lax.stop_gradient(down(mb.y))),
                _soft_pitch(fake), mb.y_len,
            ))
        if cfg.use_energy_loss:
            energy = up(_contour_loss(
                _frame_energy(jax.lax.stop_gradient(down(mb.y))),
                _frame_energy(fake), mb.y_len,
            ))
        # GAN G-phase: full-length losses (out_size=None), reference :285-287.
        # cfg.gan_g_crop=1 opts back into the plain-path 2-s crop (see
        # config.py — loss values become crop averages, adv unchanged).
        # Dropout is live here like the reference's train-mode module
        # (prenet p=0.5, model/text_encoder.py:355).
        g_out_size = cfg.out_size if cfg.gan_g_crop else None
        rng, rng_do = jax.random.split(rng)
        parts, _ = model.apply(
            {"params": down(params), **down(model_state)}, rng, mb.x, mb.x_len,
            down(mb.y), mb.y_len, down(mb.spk), g_out_size,
            deterministic=False,
            method=FaceTTS.compute_loss,
            rngs={"dropout": rng_do},
        )
        parts = up(parts)
        g_loss = (
            cfg.lambda_adv * adv
            + parts.dur_loss + parts.prior_loss + parts.diff_loss + parts.spk_loss
            + cfg.use_fm_loss * fm
            + cfg.use_pitch_loss * pitch
            + cfg.use_energy_loss * energy
        )
        # Guard loss for the G-phase non-finite gate: with the default
        # no-grad sampler the adv/fm/pitch/energy terms are VALUES with no
        # generator-gradient path (stop-grad fake + reused stop-grad
        # logits), so a saturated discriminator driving adv -> inf must NOT
        # zero the (finite) generator gradients — measured on the r4
        # overfit probe: at full-T fakes the D collapsed at step ~210, adv
        # went inf, and the old g_loss-based gate FROZE the generator for
        # the remaining 190 steps.  When adv_grad_through_sampler=1 the adv
        # term really feeds the gradient, so the gate must include it.
        guard = g_loss if cfg.adv_grad_through_sampler else parts.total
        metrics = {
            "adv_loss": adv,
            "fm_loss": fm,
            "pitch_loss": pitch,
            "energy_loss": energy,
            "duration_loss": parts.dur_loss,
            "prior_loss": parts.prior_loss,
            "diffusion_loss": parts.diff_loss,
            "spk_loss": parts.spk_loss,
            "g_loss": g_loss,
            "g_guard_loss": guard,
        }
        return g_loss, metrics

    return sample_fake, d_loss_fn, g_loss_fn


def make_gan_train_step(cfg: Config, mesh: Optional[Mesh] = None):
    """GAN training step (reference face_tts_w_discriminator.py:127-349).

    Static flags: train_disc (epoch >= warmup_disc_epochs), train_gen
    (epoch >= freeze_gen_epochs), use_r1 (epoch >= r1_start_epoch).
    cfg.micro_batch_size is the PER-DEVICE micro-batch (reference: per-GPU,
    config.py:112)."""
    if cfg.micro_batch_size_gen not in (0, cfg.micro_batch_size):
        raise ValueError(
            "micro_batch_size_gen must equal micro_batch_size (or 0 = "
            "follow it): the fused step samples each fake once and shares "
            "it between the D and G phases (see config.py)."
        )
    model, disc = build_models(cfg)
    mesh = mesh if mesh is not None else create_mesh()
    gen_tx = None
    disc_tx = build_discriminator_optimizer(cfg)
    loss_type = cfg.disc_loss_type
    sample_fake, d_loss_fn, g_loss_fn = make_gan_loss_fns(cfg, model, disc)

    def local_gan_grads(
        params, model_state, disc_params, batch, rng,
        train_disc: bool, use_r1: bool,
    ):
        """Per-device: scan local micro-batches, return pmean'd grad sums."""
        rng = _device_rng(rng, bool(cfg.fast_rng))
        n_micro, micro = _micro_split(batch, cfg.micro_batch_size)
        rngs = jax.random.split(rng, n_micro)
        # grad accumulators are data-varying (per-device partial sums): mark
        # them so the scan carry types match inside shard_map
        pvary = lambda t: jax.tree.map(  # noqa: E731
            lambda a: jax.lax.pcast(jnp.zeros_like(a), ("data",), to="varying"), t
        )
        zero_d = pvary(disc_params)
        zero_g = pvary(params)

        # NOTE on sampler batching: sampling all fakes in ONE batched pass
        # over B_local was measured SLOWER than per-micro-batch sampling
        # inside the scan (1108 ms at b=32 vs 2x540 ms at b=16 on v5e — the
        # U-Net is already saturated at micro-batch size, and the fused
        # scan lets XLA overlap sampler work with grad work), so each
        # micro-batch samples its own fake here.
        # cfg.grad_remat: rematerialize each loss's forward during its
        # backward (jax.checkpoint).  Caps the live-activation footprint of
        # a micro-batch chain at the remat boundary, which is what
        # micro_unroll=2 needs to fit in HBM (the plain unroll OOMs on two
        # full-res activation chains — BENCH_NOTES r3/r4) in exchange for
        # one extra forward per grad phase.
        d_fn = (jax.checkpoint(d_loss_fn, static_argnums=(3,))
                if cfg.grad_remat else d_loss_fn)
        g_fn = (jax.checkpoint(g_loss_fn, static_argnums=(6,))
                if cfg.grad_remat else g_loss_fn)

        def micro_body(carry, inp):
            d_acc, g_acc = carry
            mb, mrng = inp
            rng_fake, rng_g = jax.random.split(mrng)
            fake = sample_fake(params, model_state, mb, rng_fake)  # no G grad
            metrics = {}
            reuse = None
            if train_disc:
                (d_loss, (d_m, d_reuse)), d_grads = jax.value_and_grad(
                    d_fn, has_aux=True
                )(disc_params, mb.y, fake, use_r1)
                ok = jnp.isfinite(d_loss)
                d_grads = jax.tree.map(lambda g: jnp.where(ok, g, 0.0), d_grads)
                d_acc = jax.tree.map(jnp.add, d_acc, d_grads)
                metrics.update(d_m)
                metrics["d_loss"] = jnp.where(ok, d_loss, 0.0)
                metrics["d_nan_skipped"] = (~ok).astype(jnp.float32)
                # with grad-through-sampler the G phase resamples its own
                # fake, so the D-phase logits are for a different tensor
                if not cfg.adv_grad_through_sampler:
                    reuse = d_reuse
            else:
                metrics["d_loss"] = jnp.zeros(())
                metrics["disc_acc"] = jnp.zeros(())
                metrics["r1_penalty"] = jnp.zeros(())
                metrics["d_nan_skipped"] = jnp.zeros(())
            (g_loss, g_m), g_grads = jax.value_and_grad(g_fn, has_aux=True)(
                params, model_state, disc_params, mb, fake, rng_g, train_disc,
                reuse
            )
            # mirror the D-phase non-finite guard (reference NaN/Inf skip,
            # face_tts_w_discriminator.py:203-205, applies to BOTH phases):
            # a non-finite G loss contributes zero grads instead of
            # poisoning the whole accumulation.  Gate on the GRAD-CARRYING
            # loss (g_guard_loss), not the logged g_loss — see g_loss_fn.
            ok_g = jnp.isfinite(g_m["g_guard_loss"])
            g_grads = jax.tree.map(lambda g: jnp.where(ok_g, g, 0.0), g_grads)
            g_acc = jax.tree.map(jnp.add, g_acc, g_grads)
            metrics.update(g_m)
            metrics["g_nan_skipped"] = (~ok_g).astype(jnp.float32)
            return (d_acc, g_acc), metrics

        (d_grads, g_grads), metrics = jax.lax.scan(
            micro_body, (zero_d, zero_g), (micro, rngs),
            unroll=max(1, min(cfg.micro_unroll, n_micro)),
        )
        inv = 1.0 / n_micro
        d_grads = jax.lax.pmean(jax.tree.map(lambda g: g * inv, d_grads), "data")
        g_grads = jax.lax.pmean(jax.tree.map(lambda g: g * inv, g_grads), "data")
        metrics = jax.lax.pmean(jax.tree.map(jnp.mean, metrics), "data")
        return d_grads, g_grads, metrics

    def _grads_sm(train_disc: bool, use_r1: bool):
        return jax.shard_map(
            partial(local_gan_grads, train_disc=train_disc, use_r1=use_r1),
            mesh=mesh,
            in_specs=(P(), P(), P(), P("data"), P()),
            out_specs=(P(), P(), P()),
        )

    @partial(
        jax.jit,
        static_argnames=("train_disc", "train_gen", "use_r1"),
        donate_argnums=(0,),
    )
    def train_step(
        state: TrainState,
        batch: Batch,
        rng,
        train_disc: bool = True,
        train_gen: bool = True,
        use_r1: bool = True,
    ) -> Tuple[TrainState, Dict[str, Any]]:
        nonlocal gen_tx
        if gen_tx is None:
            gen_tx = build_gan_generator_optimizer(cfg, state.params)
        d_grads, g_grads, metrics = _grads_sm(train_disc, use_r1)(
            state.params, state.model_state, state.disc_params, batch, rng
        )

        if train_disc:
            d_updates, disc_opt_state = disc_tx.update(
                d_grads, state.disc_opt_state, state.disc_params
            )
            disc_params = optax.apply_updates(state.disc_params, d_updates)
        else:
            disc_params, disc_opt_state = state.disc_params, state.disc_opt_state

        if train_gen:
            g_updates, opt_state = gen_tx.update(
                g_grads, state.opt_state, state.params
            )
            params = optax.apply_updates(state.params, g_updates)
        else:
            params, opt_state = state.params, state.opt_state

        if cfg.fsdp:
            constrain = _fsdp_constrainer(mesh)
            params, opt_state = constrain(params), constrain(opt_state)
            disc_params = constrain(disc_params)
            disc_opt_state = constrain(disc_opt_state)

        new_state = state.replace(
            step=state.step + 1,
            params=params,
            opt_state=opt_state,
            disc_params=disc_params,
            disc_opt_state=disc_opt_state,
        )
        return new_state, metrics

    def local_val(params, model_state, disc_params, batch, rng, train_disc: bool):
        rng = _device_rng(rng, bool(cfg.fast_rng))
        rng_f, rng_l = jax.random.split(rng)
        fake = sample_fake(params, model_state, batch, rng_f)
        metrics = {}
        if train_disc:
            _, fake_logits = disc.apply({"params": disc_params}, fake[..., None])
            metrics["adv_loss"] = _gen_adv_loss(loss_type, fake_logits)
        else:
            metrics["adv_loss"] = jnp.zeros(())
        parts, _ = model.apply(
            {"params": params, **model_state}, rng_l, batch.x, batch.x_len,
            batch.y, batch.y_len, batch.spk, cfg.out_size,
            method=FaceTTS.compute_loss,
        )
        metrics.update(
            duration_loss=parts.dur_loss,
            prior_loss=parts.prior_loss,
            diffusion_loss=parts.diff_loss,
            spk_loss=parts.spk_loss,
            total_loss=cfg.lambda_adv * metrics["adv_loss"] + parts.total,
        )
        return jax.lax.pmean(metrics, "data")

    @partial(jax.jit, static_argnames=("train_disc",))
    def val_step(state: TrainState, batch: Batch, rng, train_disc: bool = True) -> Dict:
        sm = jax.shard_map(
            partial(local_val, train_disc=train_disc),
            mesh=mesh,
            in_specs=(P(), P(), P(), P("data"), P()),
            out_specs=P(),
        )
        return sm(state.params, state.model_state, state.disc_params, batch, rng)

    return train_step, val_step
