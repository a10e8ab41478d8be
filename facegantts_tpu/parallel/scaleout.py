"""Scale-out dossier: the measured, regression-guarded math from one chip's
GAN-step rate to the >=10x-the-reference training-throughput north star
(BASELINE.json:5).

The reference trains on 4xA100 at global batch 256, 100k steps inside a
3-day SLURM window (reference config.py:132,144, train.sh:2-7) — an upper
bound of ~0.39 steps/s ~= 99 samples/s across the rig (~25 samples/s per
A100).  10x that is ~990 samples/s.

This repo's data-parallel step (train/step.py) is structured so scaling is
honest to first order:

- every device computes its local micro-batch scan with purely LOCAL math;
- gradients are pmean'd ONCE per step per tree (generator + discriminator)
  AFTER the scan — asserted by the HLO collective audit
  (tests/test_train.py::test_gan_step_collective_audit: zero all-reduce in
  any While body, O(1) combined top-level all-reduces);
- so per-step communication is one all-reduce of the two grad trees, and
  the scaling model is  t_step(n) = t_compute + t_allreduce(n),
  samples/s(n) = n * b_local / t_step(n).

All hardware constants below are public numbers; the per-chip step rates
come from the committed BENCH artifacts.  ``python -m
facegantts_tpu.parallel.scaleout`` prints the dossier table;
tests/test_scaleout.py pins the math.
"""

import math
from typing import Dict, Optional, Tuple

# ------------------------------------------------------------------ hardware
# TPU v5e (v5 lite), public spec: 197 TFLOP/s bf16, 819 GB/s HBM.
# ICI: 2-D torus, per-link one-directional bandwidth ~45 GB/s, up to 4
# links per chip (jax-ml.github.io/scaling-book hardware table).  A ring
# all-reduce over one torus axis moves 2*G*(n-1)/n bytes through each
# chip's link pair, so the effective per-chip all-reduce bandwidth is
# ~one link's worth in each direction.
V5E_ICI_LINK_BYTES_PER_S = 4.5e10
# DCN (between v5e hosts / pods): ~25 GB/s per host of 8 chips — the
# conservative figure for cross-host all-reduce segments.
V5E_DCN_BYTES_PER_S_PER_HOST = 2.5e10
V5E_CHIPS_PER_HOST = 8

# -------------------------------------------------------- reference baseline
# 4xA100, global batch 256, 100k steps / 3 days => ~99 samples/s rig-wide
REF_RIG_SAMPLES_PER_SEC = 99.0
TARGET_MULTIPLE = 10.0

# ------------------------------------------------------------- measured rates
# Per-chip GAN-step throughput on ONE v5e chip at the bench shape
# (batch 32 = 2x16 micro, tx=128, ty=436, R1 on) — BENCH_r04.json and the
# r5 bench matrix (BENCH_NOTES).  Keys are unet_family values.
MEASURED_SAMPLES_PER_SEC: Dict[str, Optional[float]] = {
    "parity": 26.62,   # BENCH_r04 train_samples_per_sec
    "tpu_opt": 41.55,  # r5 bench matrix (scripts/bench_matrix.py tpu_opt:
    #                    770.2 ms/step at batch 32, same-day base_r5 control
    #                    1209.4 ms / 26.46 — BENCH_NOTES r5)
    "tpu_opt+disc": 83.89,  # r5 bench matrix dopt (unet+disc tpu_opt):
    #                    381.5 ms/step at batch 32 — BENCH_NOTES r5;
    #                    D-health: artifacts/overfit_metrics_dopt.jsonl
}
BENCH_LOCAL_BATCH = 32


def flagship_grad_bytes(cfg=None) -> Tuple[int, int]:
    """(generator_bytes, discriminator_bytes) of the f32 gradient trees at
    flagship dims, via ``jax.eval_shape`` (no arrays materialized).

    These are the bytes each step's two all-reduces move per chip."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from facegantts_tpu.config import default_config
    from facegantts_tpu.train.step import build_models

    if cfg is None:
        cfg = default_config(env={})
    model, disc = build_models(cfg)

    def init_gen():
        return model.init(
            jax.random.PRNGKey(0), jax.random.PRNGKey(1),
            jnp.zeros((1, 64), jnp.int32), jnp.ones((1,), jnp.int32),
            jnp.zeros((1, cfg.n_mels, 256)),
            jnp.full((1,), 256, jnp.int32),
            jnp.zeros((1, cfg.image_size, cfg.image_size, 3)),
            cfg.out_size,
            method=type(model).compute_loss,
        )

    def init_disc():
        return disc.init(
            jax.random.PRNGKey(2), jnp.zeros((1, cfg.n_mels, 256, 1))
        )

    def nbytes(tree):
        return int(sum(
            int(np.prod(l.shape)) * np.dtype(l.dtype).itemsize
            for l in jax.tree.leaves(tree)
        ))

    gen_vars = jax.eval_shape(init_gen)
    disc_vars = jax.eval_shape(init_disc)
    return nbytes(gen_vars["params"]), nbytes(disc_vars["params"])


def allreduce_seconds(n_bytes: int, n_chips: int,
                      bw_per_chip: float = V5E_ICI_LINK_BYTES_PER_S) -> float:
    """Ring all-reduce wall time: each chip sends/receives
    2*G*(n-1)/n bytes at ``bw_per_chip``."""
    if n_chips <= 1:
        return 0.0
    return 2.0 * n_bytes * (n_chips - 1) / n_chips / bw_per_chip


def projected_samples_per_sec(
    n_chips: int,
    per_chip_sps: float,
    grad_bytes: int,
    local_batch: int = BENCH_LOCAL_BATCH,
    crosses_dcn: Optional[bool] = None,
) -> float:
    """DP scale-out projection with the per-step all-reduce charged and NOT
    overlapped with compute (conservative: XLA can overlap it with the
    optimizer update).

    Within one v5e host/slice (<= 8 chips or a single ICI torus) the
    all-reduce rides ICI; beyond, the slowest segment is DCN at
    ~25 GB/s per 8-chip host (assumption stated in the module docstring)."""
    t_compute = local_batch / per_chip_sps
    if crosses_dcn is None:
        crosses_dcn = n_chips > V5E_CHIPS_PER_HOST
    if crosses_dcn:
        n_hosts = math.ceil(n_chips / V5E_CHIPS_PER_HOST)
        # DCN segment dominates: ring over hosts at per-host DCN bandwidth
        t_comm = allreduce_seconds(
            grad_bytes, n_hosts, V5E_DCN_BYTES_PER_S_PER_HOST
        )
        # plus the intra-host ICI reduce-scatter/all-gather legs
        t_comm += allreduce_seconds(grad_bytes, V5E_CHIPS_PER_HOST)
    else:
        t_comm = allreduce_seconds(grad_bytes, n_chips)
    return n_chips * local_batch / (t_compute + t_comm)


def chips_for_multiple(
    per_chip_sps: float,
    target_multiple: float = TARGET_MULTIPLE,
    grad_bytes: Optional[int] = None,
) -> int:
    """Smallest chip count whose PROJECTED throughput reaches
    target_multiple x the reference rig."""
    target = target_multiple * REF_RIG_SAMPLES_PER_SEC
    if grad_bytes is None:
        grad_bytes = 120_000_000  # conservative upper bound; see dossier
    n = max(1, math.ceil(target / per_chip_sps))
    while projected_samples_per_sec(n, per_chip_sps, grad_bytes) < target:
        n += 1
    return n


def dossier() -> str:
    """The printable scale-out dossier (also summarized in BENCH_NOTES r5
    and README)."""
    gen_b, disc_b = flagship_grad_bytes()
    grad_b = gen_b + disc_b
    lines = [
        "scale-out dossier (v5e, data-parallel GAN step)",
        f"  grad bytes/step: generator {gen_b/1e6:.1f} MB + "
        f"discriminator {disc_b/1e6:.1f} MB = {grad_b/1e6:.1f} MB (f32)",
        f"  reference rig: {REF_RIG_SAMPLES_PER_SEC:.0f} samples/s "
        f"(4xA100); 10x target = {TARGET_MULTIPLE*REF_RIG_SAMPLES_PER_SEC:.0f}",
    ]
    for fam, sps in MEASURED_SAMPLES_PER_SEC.items():
        if not sps:
            continue
        lines.append(f"  family={fam}: measured {sps:.2f} samples/s/chip")
        for n in (8, 16, 32, 64):
            proj = projected_samples_per_sec(n, sps, grad_b)
            t_comm_ms = 1e3 * (
                allreduce_seconds(grad_b, min(n, 8))
                + (allreduce_seconds(grad_b, math.ceil(n / 8),
                                     V5E_DCN_BYTES_PER_S_PER_HOST)
                   if n > 8 else 0.0)
            )
            lines.append(
                f"    v5e-{n:<3d}: projected {proj:8.1f} samples/s "
                f"({proj / REF_RIG_SAMPLES_PER_SEC:5.2f}x reference rig; "
                f"all-reduce {t_comm_ms:.1f} ms vs compute "
                f"{1e3*BENCH_LOCAL_BATCH/sps:.0f} ms)"
            )
        n10 = chips_for_multiple(sps, grad_bytes=grad_b)
        lines.append(
            f"    chips for 10x: {n10} "
            f"({math.ceil(n10/V5E_CHIPS_PER_HOST)} hosts)"
        )
    return "\n".join(lines)


if __name__ == "__main__":
    print(dossier())
