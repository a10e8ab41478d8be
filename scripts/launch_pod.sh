#!/usr/bin/env bash
# Multi-host TPU pod launch (replaces the reference's SLURM DDP launch,
# train.sh:2-7).  Run THE SAME command on every worker of the pod slice —
# e.g. with `gcloud compute tpus tpu-vm ssh $TPU --worker=all --command=...`.
#
# jax.distributed.initialize() picks up the TPU pod topology automatically
# (coordinator, process_index, local devices) from the TPU metadata; the
# training loop shards the global batch over all chips via the 1-D data
# mesh, and only process 0 writes checkpoints/eval artifacts.
#
#   scripts/launch_pod.sh use_gan=1 batch_size=1024 packed_data_dir=gs://...
set -euo pipefail
cd "$(dirname "$0")/.."

export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-.jax_cache}"
exec python train.py jax_distributed=1 "$@"
