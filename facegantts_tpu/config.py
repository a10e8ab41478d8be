"""Typed configuration system.

Capability parity with the reference's Sacred experiment (reference
config.py:6-181): every parameter keeps the reference's key name, every one
is overridable by environment variable, by CLI ``key=value`` pairs, and by a
JSON file — so reference recipes carry over unchanged.  Unlike the reference
(a Sacred-generated dict), this is a frozen dataclass: typo-safe, typed,
hashable pieces can be closed over by jitted functions.
"""

from __future__ import annotations

import dataclasses
import json
import os
from dataclasses import dataclass, field, fields
from typing import Any, Dict, List, Optional, Tuple


def _fix_len_compatibility(length: int, num_downsamplings_in_unet: int = 2) -> int:
    """Round ``length`` up to a multiple of 2**num_downsamplings (U-Net levels).

    Mirrors reference model/utils.py:14-18.
    """
    factor = 2**num_downsamplings_in_unet
    return ((length + factor - 1) // factor) * factor


@dataclass(frozen=True)
class Config:
    """All framework parameters.  Key names match reference config.py:10-181."""

    # -- run --------------------------------------------------------------
    seed: int = 37
    perceptual_loss: int = 1  # generate xt_hat for the speaker-binding loss

    # -- dataset ----------------------------------------------------------
    dataset: str = "lrs2"
    lrs2_train: str = "data/lrs2/datalist/lrs2_train_long.list"
    lrs2_val: str = "data/lrs2/datalist/lrs2_val_long.list"
    lrs2_test: str = "data/lrs2/datalist/lrs2_test_long.list"
    lrs2_path: str = "data/lrs2"
    cmudict_path: str = "data/cmu_dictionary"
    packed_data_dir: str = ""  # preprocessed ArrayRecord/npz shards (TPU input path)

    # -- data -------------------------------------------------------------
    image_size: int = 224
    max_frames: int = 30
    image_augment: int = 0
    retinaface_ckpt: str = ""  # optional mobilenet0.25 RetinaFace torch ckpt
    #                            for data-prep face detection (labeling.py:6);
    #                            empty = Haar-cascade ensemble fallback

    # hifigan-16k audio front end (reference config.py:30-36)
    n_fft: int = 1024
    sample_rate: int = 16000
    hop_len: int = 160
    win_len: int = 1024
    f_min: float = 0.0
    f_max: float = 8000.0
    n_mels: int = 128

    # -- encoder (reference config.py:39-50) -------------------------------
    spk_emb_dim: int = 64
    vid_emb_dim: int = 512
    n_enc_channels: int = 192
    filter_channels: int = 768
    filter_channels_dp: int = 256
    n_enc_layers: int = 6
    enc_kernel: int = 3
    enc_dropout: float = 0.0
    n_heads: int = 2
    window_size: int = 4

    # -- decoder (reference config.py:52-56) --------------------------------
    dec_dim: int = 64
    beta_min: float = 0.05
    beta_max: float = 20.0
    pe_scale: float = 1000.0
    unet_family: str = "parity"  # score-net family: "parity" = the
    #                      reference U-Net shape at dims dec_dim*(1,2,4)
    #                      over (full, /2, /4) resolution — checkpoint-
    #                      compatible with reference weights (the default);
    #                      "tpu_opt" = lane-aligned patchify family (2x2
    #                      stride-2 stem + trunk at dims dec_dim*(2,4) over
    #                      (/2, /4) + 2x2 transposed-conv head) that removes
    #                      the C=64 full-resolution level whose f32 lane-
    #                      padding tax capped the parity family at 24% MFU
    #                      (BENCH_NOTES r4/r5).  A NEW model family: not
    #                      importable from reference checkpoints, loss
    #                      trajectory verified equivalent on the overfit
    #                      probe (artifacts/overfit_metrics_tpuopt.jsonl).

    # -- syncnet ------------------------------------------------------------
    syncnet_stride: int = 1
    # SyncNet channel width multiplier: 1.0 = the exact reference trunk
    # (required for pretrained-weight import); tiny values are for smoke /
    # dry-run configs only (the 224x224 trunk is otherwise the one component
    # no other dim knob shrinks)
    syncnet_width_mult: float = 1.0
    syncnet_ckpt: Optional[str] = None
    spk_emb: str = "face"  # or "speech"
    syncnet_initw: float = 10.0
    syncnet_initb: float = -5.0

    # -- experiment ---------------------------------------------------------
    batch_size: int = 256
    add_blank: int = 1
    snet_emb: int = 1
    n_spks: int = 7358
    multi_spks: int = 1
    denoise_factor: float = 0.7

    # preprocessing filter experiments (reference config.py:75-83)
    use_bandstop_filter: int = 0
    bandstop_q_value: float = 1.0
    use_highpass_filter: int = 0
    highpass_cutoff: float = 70.0
    use_lowpass_filter: int = 0
    lowpass_cutoff: float = 4500.0

    # -- GAN (reference config.py:88-136) ------------------------------------
    use_gan: int = 1
    use_pitch_loss: int = 0
    use_energy_loss: int = 0
    use_fm_loss: int = 0
    disc_loss_type: str = "hinge"  # "hinge" | "mse" | "bce"
    lambda_adv: float = 0.7
    gamma: float = 0.02  # speaker-binding loss weight

    disc_family: str = "parity"  # discriminator conv ladder: "parity" =
    #                      the reference shape (models/discriminator.py);
    #                      "tpu_opt" = lane-aligned patchify variant whose
    #                      C=128 half-res convs fill the MXU (the parity
    #                      ladder's 64x64-channel convs run at ~12% of
    #                      peak — device trace, BENCH_NOTES r5).  OPT-IN:
    #                      a different D is a different adversary; no
    #                      pretrained D artifact exists either way (the
    #                      reference trains D from scratch and strips disc
    #                      keys from warm-start ckpts, train.py:110-121).
    disc_lrelu_slope: float = 0.3
    disc_learning_rate: float = 1e-4
    use_spectral_norm: int = 0
    disc_base_channels: int = 64
    disc_num_layers: int = 5
    residual_channels: int = 256
    kernel_width: int = 5
    kernel_height: int = 12
    disc_stride: int = 1
    disc_padding: int = 6

    warmup_disc_epochs: int = 0
    freeze_gen_epochs: int = 0
    micro_batch_size: int = 16
    micro_batch_size_gen: int = 0  # 0 = follow micro_batch_size (the
    #                      reference's own default resolution,
    #                      face_tts_w_discriminator.py:138).  The reference
    #                      allows a DIFFERENT G-phase micro size; this
    #                      framework's fused step samples each fake ONCE
    #                      and shares it between the D and G phases, which
    #                      requires equal micro sizes — train/step.py
    #                      rejects an explicit unequal override rather than
    #                      silently ignoring it.

    use_r1_penalty: int = 1
    r1_gamma: float = 15.0
    r1_start_epoch: int = 0
    r1_interval: int = 1  # apply the R1 penalty every N-th step ("lazy
    #                      regularization", StyleGAN2 §B): 1 = every step
    #                      (the reference's behavior,
    #                      face_tts_w_discriminator.py:189-201); N>1 skips
    #                      the double-backward on the other steps and
    #                      scales gamma by N on the steps that apply it
    #                      (effective_r1_gamma) so the time-averaged
    #                      regularization strength is unchanged.  Measured
    #                      on v5e at the dopt config: R1-off steps run
    #                      348 vs 382 ms, so interval=16 ~= +9% throughput
    #                      (BENCH_NOTES r5).  The train loop alternates the
    #                      two compiled executables; use_r1 is already a
    #                      static argument of the fused step.

    # Whether the adversarial G-loss backpropagates through the reverse
    # diffusion sampler.  The reference's FaceTTS.forward is decorated with
    # @torch.no_grad() (face_tts.py:92), so its G-step adversarial term
    # carries NO generator gradient; 0 reproduces that (cheap), 1 enables a
    # true differentiable sampler (rematerialised lax.scan).
    adv_grad_through_sampler: int = 0

    # Opt-in DEVIATION: apply the plain-FaceTTS random 2-second crop
    # (out_size, face_tts.py:181-215) to the GAN G-phase compute_loss too.
    # The reference's GAN G step computes dur/prior/diff/spk at FULL mel
    # length (out_size=None, face_tts_w_discriminator.py:285-287) even
    # though the plain trainer it warm-starts from cropped; 1 restores the
    # crop there, shrinking the G-phase U-Net/SyncNet passes from the
    # bucket length (up to 872 frames) to 128 frames.  The adv term is
    # unchanged (the sampler still produces the full-length fake the
    # discriminator judges).  Loss VALUES differ from the reference
    # (diff/prior/spk are crop averages, as in plain training), so the
    # default stays 0 = reference semantics.
    gan_g_crop: int = 0

    disc_betas_0: float = 0.9
    disc_betas_1: float = 0.999
    disc_eps: float = 1e-8

    # -- optimizer / schedule (reference config.py:126-136) ------------------
    optim_type: str = "adam"  # adam | adamw | adam_diff | sgd
    schedule_type: str = "constant"
    learning_rate: float = 1e-8
    end_lr: float = 1e-7
    weight_decay: float = 0.1
    decay_power: Any = 1.0  # "cosine" | "linear" | "constant" | float poly power
    max_steps: int = 100000
    save_step: int = 10000
    warmup_steps: int = 2
    gen_eps: float = 1e-8
    grad_clip: float = 1.0

    video_data_root: str = "mp4"
    image_data_root: str = "jpg"
    audio_data_root: str = "wav"
    log_every_n_steps: int = 1000

    # -- distributed (TPU mesh replaces reference num_gpus/num_nodes) --------
    num_gpus: int = 4  # retained name; = number of devices on the data axis
    num_nodes: int = 1
    num_workers: int = 8
    prefetch_factor: int = 2
    mesh_shape: Tuple[int, ...] = ()  # () = 1-D data mesh over all devices
    fsdp: int = 0  # ZeRO-style fully-sharded state: master params + Adam
    #                      moments sharded over the data axis (largest
    #                      divisible dim per leaf), all-gathered by GSPMD in
    #                      front of each step.  Cuts per-chip optimizer HBM
    #                      ~mesh-size fold; numerics identical to replicated
    #                      DDP (same grads, same update).  Default off =
    #                      reference DDP layout.
    use_bf16: int = 1  # bfloat16 activations on the MXU path (inference)
    train_bf16: int = 0  # mixed-precision training: f32 master params,
    #                      bf16 model compute (grads accumulate in f32)
    gan_sampler_bf16: int = 1  # no-grad GAN fake-mel sampler in bf16 (same
    #                      precision as the DEFAULT inference path, use_bf16;
    #                      grads stay f32).  r3 matrix on v5e: 1721.8 vs
    #                      1764.0 ms/step (+2.5%), identical g_loss at the
    #                      probe point (4.5677 under both dtypes; the
    #                      sampler is no-grad and its output is cast back
    #                      to f32, so only the fake mel's rounding differs).
    disc_bf16: int = 0  # D-phase-only mixed precision: discriminator
    #                      fwd/bwd and the R1 double-backward in bf16,
    #                      f32 loss assembly and master params.  r4 matrix
    #                      on v5e: no win (see BENCH_NOTES r4) — kept OFF;
    #                      strict f32 D math is also the reference default.
    sampler_unroll: int = 1  # reverse-sampler scan unroll (perf knob; same math)
    disc_fake_timesteps: int = -1  # reverse-diffusion steps for the TRAINING
    #                      fake-mel sampler only (inference is untouched).
    #                      -1 = AUTO: 4 steps when the fake is provably
    #                      GENERATOR-INERT — the reference's fake sampler is
    #                      no-grad (@torch.no_grad forward, face_tts.py:92),
    #                      so with adv_grad_through_sampler/fm/pitch/energy
    #                      all off (the reference defaults) the fake feeds
    #                      ONLY the discriminator and generator updates are
    #                      bit-identical under ANY T (tests/test_train.py::
    #                      test_disc_fake_timesteps_leaves_generator_updates
    #                      _identical); full T otherwise.  0 = always full T
    #                      (strict reference D-telemetry parity,
    #                      face_tts_w_discriminator.py:163); >0 = forced.
    #                      The two full-T samplers were 47% of the step
    #                      (BENCH_NOTES r3); AUTO-4 on v5e: 1208 vs 1709
    #                      ms/step (+41% throughput).  What changes at T=4:
    #                      the D trains on less-converged fakes, so d_loss/
    #                      disc_acc/adv_loss telemetry shifts; what cannot
    #                      change: any generator parameter, ever.
    fused_gn_mish: int = 0  # U-Net GroupNorm+Mish+mask as ONE Pallas chain
    #                      (ops/gn_mish.py): lane-packed stats + normalize +
    #                      activation + in-kernel time mask, exact reference
    #                      math (non-TPU platforms fall back to plain XLA).
    #                      MEASURED SLOWER on v5e and kept OFF: standalone
    #                      2.6 vs 1.0 ms/op against XLA's own fused chain
    #                      (scripts/bench_gnmish.py) and 2782 vs 1709 ms on
    #                      the full GAN step (bench_matrix fused/nofused,
    #                      r4) — XLA already fuses this pattern near HBM
    #                      speed-of-light and the pallas_call only adds
    #                      fusion breaks + relayouts (BENCH_NOTES r4).
    grad_remat: int = 0  # rematerialize each loss forward during its
    #                      backward (jax.checkpoint on the D/G loss fns):
    #                      caps per-micro-batch live activations so
    #                      micro_unroll>1 (or bigger micro-batches) fit in
    #                      HBM, at one extra forward per grad phase (same
    #                      math).  r4 on v5e: 1485 ms (+23%) alone, 1517 ms
    #                      with micro_unroll=2 — a capacity knob, not a
    #                      speed knob (BENCH_NOTES r4).
    micro_unroll: int = 1  # micro-batch scan unroll: >1 exposes the
    #                      INDEPENDENT micro-batch chains to the scheduler
    #                      so sampler/grad work can interleave (same math)
    fast_rng: int = 1  # re-key train-step RNG into the TPU hardware RBG
    #                      generator (threefry mask/noise generation measured
    #                      ~50 ms/step in device traces).  Draw VALUES differ
    #                      from threefry for the same seed; distributions are
    #                      identical.  Set 0 for cross-impl per-seed
    #                      reproducibility.

    # -- checkpoints ----------------------------------------------------------
    resume_from: str = ""
    checkpoint_dir: str = "checkpoints"
    keep_top_k: int = 3  # metric-ranked top-k on val total_loss (train.py:48-60)
    snapshot_epochs: Tuple[int, ...] = (0, 96)  # SaveEpochZero/SaveEpoch96
    # which metric ranks checkpoints (min is better for all supported keys):
    # "total_loss" (epoch-end val loss, the reference ModelCheckpoint
    # monitor, train.py:48-60) or an in-train eval key such as
    # "Composite Metric" (the reference StepwiseEval ranking,
    # evaluation/eval.py:229-253) — ranked saves then fire at eval intervals
    checkpoint_monitor: str = "total_loss"
    #                       (reference custom_callbacks.py:110-127,288-304)

    # -- inference -------------------------------------------------------------
    test_txt: str = "test/text.txt"
    use_custom: int = 2
    test_faceimg: str = "test/face.png"
    timesteps: int = 10
    temperature: float = 1.5
    length_scale: float = 0.91
    output_dir: str = "outputs"
    vocoder_ckpt: str = ""  # bshall hifigan16k torch ckpt (importable)
    ground_truth_dir: str = ""
    results_path: str = "evaluation"
    infr_resume_from_orig: str = ""
    infr_resume_from_gan: str = ""

    # -- eval / early stop --------------------------------------------------
    val_check_interval: float = 1.0
    test_only: int = 0
    eval_interval: int = 1000
    eval_n_samples: int = 4  # utterances synthesized per in-training eval
    f0_protocol: str = "world"  # "world" = reference dio+stonemask+fastdtw
    #                              protocol (eval.py:49-79); "yin" = faster;
    #                              "pyin" = HMM-smoothed probabilistic YIN
    #                              (the reference C10 extractor protocol)
    mos_ckpt: str = ""  # optional UTMOS-style linear-head checkpoint
    early_stopping_patience: int = 30
    early_stopping_min_delta: float = 0.001

    # -- profiling (TPU addition; reference has none, SURVEY.md §5) ----------
    profile_dir: str = ""  # set to enable a jax.profiler trace
    profile_start_step: int = 10
    profile_num_steps: int = 5

    id: str = "unknown"
    working_dir: str = ""

    # -- static-shape buckets (TPU addition; reference pads dynamically) ------
    max_text_len: int = 256
    max_mel_len: int = 872  # fix_len_compatibility'd
    text_buckets: Tuple[int, ...] = (64, 128, 192, 256)
    mel_buckets: Tuple[int, ...] = (256, 436, 656, 872)

    # ------------------------------------------------------------------ api
    @property
    def n_feats(self) -> int:
        # reference config.py:40 aliases n_feats = n_mels
        return self.n_mels

    @property
    def out_size(self) -> int:
        # random 2-second training crop (reference config.py:69)
        return _fix_len_compatibility(2 * self.sample_rate // 256)

    @property
    def per_gpu_batchsize(self) -> int:
        return max(1, self.batch_size // max(1, self.num_gpus))

    @property
    def effective_r1_gamma(self) -> float:
        """R1 weight on the steps that apply it: gamma * interval keeps
        the time-averaged regularization strength equal to every-step R1
        (StyleGAN2 lazy-regularization convention)."""
        return self.r1_gamma * max(1, self.r1_interval)

    @property
    def train_fake_timesteps(self) -> int:
        """Resolved T for the TRAINING fake-mel sampler (see
        disc_fake_timesteps above): forced value, full T, or AUTO-4 when
        the fake is provably generator-inert."""
        if self.disc_fake_timesteps > 0:
            return min(self.disc_fake_timesteps, self.timesteps)
        if self.disc_fake_timesteps == 0:
            return self.timesteps
        inert = not (self.adv_grad_through_sampler or self.use_fm_loss
                     or self.use_pitch_loss or self.use_energy_loss)
        return min(4, self.timesteps) if inert else self.timesteps

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)

    def as_dict(self) -> Dict[str, Any]:
        d = dataclasses.asdict(self)
        d["n_feats"] = self.n_feats
        d["out_size"] = self.out_size
        d["per_gpu_batchsize"] = self.per_gpu_batchsize
        return d

    def __getitem__(self, key: str) -> Any:
        """Dict-style access so recipes written against the reference's
        `_config["key"]` convention keep working."""
        return getattr(self, key)

    def get(self, key: str, default: Any = None) -> Any:
        return getattr(self, key, default)


_FIELD_TYPES = {f.name: f.type for f in fields(Config)}


def _coerce(name: str, raw: Any) -> Any:
    """Coerce a string override to the declared field type."""
    default = getattr(Config(), name)
    if name == "decay_power" and isinstance(raw, str):
        # "cosine" | "linear" | "constant" | float polynomial power
        # (reference scheduler.py:51-70); the float-typed default would
        # otherwise make the named schedules unreachable from the CLI
        try:
            return float(raw)
        except ValueError:
            return raw
    if isinstance(raw, str):
        t = type(default) if default is not None else str
        if t is bool:
            return raw.lower() in ("1", "true", "yes")
        if t is int:
            return int(raw)
        if t is float:
            return float(raw)
        if t is tuple:
            if not raw.strip():
                return ()
            return tuple(int(x) for x in raw.replace("(", "").replace(")", "").split(","))
        if default is None:
            # Optional[str]-style field
            return None if raw.lower() in ("none", "null", "") else raw
        if name == "decay_power":
            try:
                return float(raw)
            except ValueError:
                return raw
        return raw
    return raw


def default_config(
    env: Optional[Dict[str, str]] = None,
    overrides: Optional[Dict[str, Any]] = None,
    json_path: Optional[str] = None,
) -> Config:
    """Build a Config with (lowest→highest precedence): defaults, JSON file,
    environment variables, explicit overrides.

    Environment-variable override of every key mirrors reference
    config.py:12-181 (`os.getenv(name, default)`)."""
    env = dict(os.environ if env is None else env)
    overrides = dict(overrides) if overrides else {}
    # `config=<file.json>` works on EVERY CLI (train/inference/serve/eval/
    # hyperopt — any caller that feeds parse_cli_overrides output here):
    # the file is a preset (e.g. configs/tpu_fast.json) at the lowest
    # precedence, below env vars and explicit key=value overrides
    if json_path is None and "config" in overrides:
        json_path = overrides.pop("config")
    values: Dict[str, Any] = {}
    if json_path:
        with open(json_path) as f:
            values.update(json.load(f))
    for name in _FIELD_TYPES:
        if name in env:
            values[name] = env[name]
    if overrides:
        values.update(overrides)
    clean = {k: _coerce(k, v) for k, v in values.items() if k in _FIELD_TYPES}
    return Config(**clean)


def parse_cli_overrides(argv: List[str]) -> Dict[str, Any]:
    """Parse `key=value` CLI args (reference Sacred `with key=value`,
    hyperopt/hyperopt.py:105)."""
    out: Dict[str, Any] = {}
    for a in argv:
        if "=" in a:
            k, v = a.split("=", 1)
            out[k.strip()] = v.strip()
    return out
