"""Training loop: the Lightning-Trainer replacement.

Covers the reference harness's behavior (train.py:19-158 + callbacks):
GAN/plain model selection on use_gan, warm-start from reference .pt/.ckpt
with discriminator-key stripping (train.py:110-121), epoch-gated GAN phases
(warmup_disc / freeze_gen / r1_start), top-k + last checkpointing on
val/total_loss, epoch snapshots, best-checkpoint naming, early stopping, and
periodic in-process evaluation (replacing the subprocess hack of
custom_callbacks.py:57-92) — all around one jitted step.
"""

import json
import os
import time
from typing import Dict, Optional

import jax
import numpy as np

from facegantts_tpu.config import Config
from facegantts_tpu.data.dataset import BucketedLoader, SyntheticDataset, load_packed
from facegantts_tpu.parallel import create_mesh, shard_batch, shard_state
from facegantts_tpu.train import checkpoint as ck
from facegantts_tpu.train.state import TrainState
from facegantts_tpu.train.step import init_state, make_gan_train_step, make_plain_train_step
from facegantts_tpu.utils.profiling import StepProfiler


class MetricLogger:
    """JSONL metrics + optional TensorBoard scalars (reference logs through
    Lightning self.log / TB, face_tts.py:273-277, custom_callbacks.py:13-55)."""

    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, "metrics.jsonl")
        self._f = open(self.path, "a")
        self.tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter

            self.tb = SummaryWriter(log_dir)
        except Exception:
            pass

    def log(self, step: int, metrics: Dict[str, float], prefix: str = "train"):
        rec = {"step": step, **{f"{prefix}/{k}": float(v) for k, v in metrics.items()}}
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self.tb:
            for k, v in metrics.items():
                self.tb.add_scalar(f"{prefix}/{k}", float(v), step)

    def log_audio(self, step: int, tag: str, wav, sample_rate: int):
        """TB audio like the reference's add_audio walk
        (custom_callbacks.py:44-55)."""
        if self.tb:
            import torch

            self.tb.add_audio(tag, torch.as_tensor(wav).reshape(1, -1), step,
                              sample_rate=sample_rate)


class EarlyStopping:
    """Patience-based stop on a monitored value (reference train.py:75-81)."""

    def __init__(self, patience: int, min_delta: float):
        self.patience, self.min_delta = patience, min_delta
        self.best = float("inf")
        self.bad = 0

    def update(self, value: float) -> bool:
        if value < self.best - self.min_delta:
            self.best, self.bad = value, 0
        else:
            self.bad += 1
        return self.bad > self.patience


class DivergenceWatchdog:
    """Failure detection the reference lacks (SURVEY.md §5: only a per-micro-
    batch NaN skip, face_tts_w_discriminator.py:203-205): a run whose total
    loss is non-finite for `patience` consecutive logged steps is diverged —
    the loop saves a final checkpoint and halts instead of burning the
    remaining accelerator-hours."""

    def __init__(self, patience: int = 10):
        self.patience = patience
        self.streak = 0

    def update(self, metrics) -> bool:
        vals = [float(v) for v in metrics.values()]
        if vals and not all(np.isfinite(v) for v in vals):
            self.streak += 1
        else:
            self.streak = 0
        return self.streak >= self.patience


class GracefulShutdown:
    """Preemption-safe training (absent in the reference; SLURM just kills
    it, train.sh): SIGTERM/SIGINT set a flag, the loop checkpoints at the
    next step boundary and returns cleanly — a preempted TPU job resumes
    from its final step instead of the last periodic save."""

    def __init__(self):
        self.requested = False
        self._old = {}

    def _handle(self, signum, frame):
        self.requested = True

    def install(self):
        import signal as _signal

        for sig in (_signal.SIGTERM, _signal.SIGINT):
            try:
                self._old[sig] = _signal.signal(sig, self._handle)
            except ValueError:  # not the main thread (e.g. under a server)
                break
        return self

    def restore(self):
        import signal as _signal

        for sig, old in self._old.items():
            _signal.signal(sig, old)
        self._old = {}


def warm_start(cfg: Config, state: TrainState) -> TrainState:
    """Load reference torch weights (strict=False, disc-stripped) or resume
    an orbax checkpoint (reference train.py:110-123 falls back to scratch)."""
    path = cfg.resume_from
    if not path:
        return state
    if os.path.isdir(path):
        restored = ck.restore_checkpoint(path, state)
        return restored if restored is not None else state
    if not os.path.exists(path):
        print(f"[INFO] resume_from {path} not found; training from scratch")
        return state
    print(f"[INFO] warm-starting generator from {path}")
    params, stats = ck.import_facetts(path)
    merged = ck.merge_imported(state.params, params)
    mstate = dict(state.model_state or {})
    if "batch_stats" in mstate:
        mstate["batch_stats"] = ck.merge_imported(mstate["batch_stats"], stats)
    return state.replace(params=merged, model_state=mstate)


def train(cfg: Config, work_dir: str = "runs/default", max_steps: Optional[int] = None,
          train_ds=None, val_ds=None):
    """Run training until max_steps; returns the final TrainState.

    ``train_ds``/``val_ds`` default to the packed corpus under
    ``cfg.packed_data_dir`` (falling back to synthetic data); tests and
    benchmarks may inject any dataset with the PackedDataset interface."""
    max_steps = max_steps or cfg.max_steps
    # catch preemption from the very start — a SIGTERM during data/compile
    # warmup must still produce a clean early exit, not a dead process
    shutdown = GracefulShutdown().install()
    # multi-host: only process 0 logs/evals (reference gates on
    # trainer.global_rank, custom_callbacks.py:112,141,177,213)
    is_main = jax.process_index() == 0
    logger = MetricLogger(work_dir) if is_main else None
    # persistent managers; every process participates in saves (orbax
    # coordinates multi-host), retention is metric-ranked (val total_loss)
    policy = ck.CheckpointPolicy(
        work_dir, keep_top_k=cfg.keep_top_k, monitor=cfg.checkpoint_monitor,
        snapshot_epochs=cfg.snapshot_epochs,
    )

    if train_ds is None:
        train_ds = load_packed(cfg, "train") or SyntheticDataset(n_items=256, n_mels=cfg.n_mels)
    if val_ds is None:
        val_ds = load_packed(cfg, "val") or SyntheticDataset(n_items=32, n_mels=cfg.n_mels, seed=1)
    per_device_batch = cfg.per_gpu_batchsize
    n_dev = len(jax.devices())
    global_batch = per_device_batch * n_dev
    loader = BucketedLoader(train_ds, cfg, global_batch)
    # val batch: largest device-count multiple that fits the val set (the
    # batch must split evenly over the data mesh and, multi-host, over
    # processes — process-sharded loading divides rows by process_count)
    val_batch = max(n_dev, min(global_batch, len(val_ds)) // n_dev * n_dev)
    val_loader = BucketedLoader(val_ds, cfg, val_batch, shuffle=False)

    mesh = create_mesh()
    rng = jax.random.PRNGKey(cfg.seed)
    example = next(loader.epoch(0))
    state = init_state(cfg, rng, example)
    state = warm_start(cfg, state)
    state = shard_state(mesh, state, fsdp=bool(cfg.fsdp))

    if cfg.use_gan:
        train_step, val_step = make_gan_train_step(cfg, mesh)
    else:
        train_step, val_step = make_plain_train_step(cfg, mesh)

    # Build the in-training evaluator ONCE: imports cfg.vocoder_ckpt (the
    # reference vocodes eval samples with pretrained bshall HiFi-GAN,
    # inference.py:79) and keeps compiled synthesis programs warm across
    # eval intervals instead of re-tracing every time.
    evaluator = None
    if cfg.eval_interval and is_main:
        from facegantts_tpu.evaluation.intrain import IntrainEvaluator

        evaluator = IntrainEvaluator(
            cfg, val_ds, os.path.join(work_dir, "inference")
        )
        # stamp the eval-backend provenance ONCE into the metrics JSONL so
        # downstream readers of eval/* rows know whether the numbers came
        # from real pretrained backends or documented fallbacks
        if logger is not None:
            logger._f.write(json.dumps(
                {"eval_backends": evaluator.provenance}) + "\n")
            logger._f.flush()

    stopper = EarlyStopping(cfg.early_stopping_patience, cfg.early_stopping_min_delta)
    watchdog = DivergenceWatchdog()
    profiler = StepProfiler(cfg.profile_dir, cfg.profile_start_step, cfg.profile_num_steps)
    step = int(state.step)
    # resume: continue the epoch/shuffle sequence where the checkpoint
    # left off instead of replaying epoch 0's data order
    epoch = step // max(1, len(loader))
    t_last, n_last = time.time(), step

    while step < max_steps:
        for batch in loader.epoch(epoch):
            profiler.step(step)
            batch = shard_batch(mesh, batch)
            rng, srng = jax.random.split(rng)
            if cfg.use_gan:
                state, metrics = train_step(
                    state, batch, srng,
                    train_disc=epoch >= cfg.warmup_disc_epochs,
                    train_gen=epoch >= cfg.freeze_gen_epochs,
                    # lazy R1 (cfg.r1_interval > 1): the penalty fires on
                    # every N-th step at N-fold gamma; use_r1 is a STATIC
                    # arg, so the loop alternates two compiled executables
                    use_r1=bool(cfg.use_r1_penalty)
                    and epoch >= cfg.r1_start_epoch
                    and step % max(1, cfg.r1_interval) == 0,
                )
            else:
                state, metrics = train_step(state, batch, srng)
            step += 1

            if shutdown.requested:
                print(f"[INFO] shutdown signal received; checkpointing at "
                      f"step {step} and exiting")
                policy.save_step(state, step)
                policy.close()
                profiler.close()
                shutdown.restore()
                return state

            if step % cfg.log_every_n_steps == 0 or step == 1:
                m = {k: float(v) for k, v in metrics.items()}
                if watchdog.update(m):
                    print(f"[FATAL] losses non-finite for {watchdog.patience} "
                          f"consecutive logged steps; halting at step {step}")
                    policy.save_step(state, step)
                    policy.close()
                    profiler.close()
                    shutdown.restore()
                    return state
                if is_main:
                    dt = time.time() - t_last
                    m["steps_per_sec"] = (step - n_last) / max(dt, 1e-9)
                    t_last, n_last = time.time(), step
                    logger.log(step, m)
                    print(f"[step {step}] " + " ".join(f"{k}={v:.4f}" for k, v in m.items()))

            if step % cfg.save_step == 0:
                policy.save_step(state, step)

            if evaluator is not None and step % cfg.eval_interval == 0:
                results = evaluator.run(jax.device_get(state), step)
                logger.log(step, results, prefix="eval")
                # TB audio of the synthesized samples (reference walks the
                # wav dir into add_audio, custom_callbacks.py:44-55)
                step_dir = os.path.join(
                    work_dir, "inference", f"step_{step:08d}"
                )
                for i in range(int(results.get("Samples", 0))):
                    wav_path = os.path.join(step_dir, f"sample_{i}.wav")
                    if os.path.exists(wav_path):
                        from facegantts_tpu.utils.audio import load_wav

                        wav, sr = load_wav(wav_path)
                        logger.log_audio(step, f"eval/sample_{i}", wav, sr)
                print(f"[eval step {step}] "
                      + " ".join(f"{k}={v:.4f}" for k, v in results.items()))
                # with an eval-metric monitor (e.g. "Composite Metric"),
                # ranked/best checkpointing fires here — the reference's
                # StepwiseEval-ranked retention (custom_callbacks.py:57-92)
                if policy.monitor in results:
                    policy.save_epoch(state, step, epoch, results,
                                      with_snapshot=False)

            if step >= max_steps:
                break

        # ---- validation at epoch end (val_check_interval=1.0 equivalent) ----
        vals = []
        for vb in val_loader.epoch(0):
            rng, vrng = jax.random.split(rng)
            if cfg.use_gan:
                vm = val_step(state, shard_batch(mesh, vb), vrng,
                              train_disc=epoch >= cfg.warmup_disc_epochs)
            else:
                vm = val_step(state, shard_batch(mesh, vb), vrng)
            vals.append({k: float(v) for k, v in vm.items()})
        if not vals and is_main:
            # a val set smaller than batch_size per bucket yields ZERO full
            # batches from the bucketed loader — without this line the run
            # silently skips validation (and with it epoch-ranked
            # checkpointing) every epoch
            print(f"[WARN] epoch {epoch}: validation produced 0 batches — "
                  f"val set too small for batch_size={cfg.per_gpu_batchsize} "
                  "per bucket; no val metrics or ranked checkpoints this "
                  "epoch")
        if vals:
            avg = {k: float(np.mean([v[k] for v in vals])) for k in vals[0]}
            if is_main:
                logger.log(step, avg, prefix="val")
                print(f"[epoch {epoch}] val "
                      + " ".join(f"{k}={v:.4f}" for k, v in avg.items()))
            val_loss = avg.get("total_loss", float("inf"))
            if policy.monitor in avg:
                policy.save_epoch(state, step, epoch, avg)
            else:
                # monitor is an eval-interval metric: ranked saves happen
                # there; still honor the fixed-epoch snapshot here
                policy.snapshot(state, step, epoch)
            if stopper.update(val_loss):
                print(f"[INFO] early stopping at epoch {epoch} (patience exceeded)")
                break
        epoch += 1

    profiler.close()
    policy.save_step(state, step)
    policy.close()
    shutdown.restore()
    return state
