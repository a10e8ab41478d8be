#!/usr/bin/env bash
# Single-host TPU training launch (reference train.sh, SLURM -> plain shell).
# All reference config keys pass through as key=value.
#
#   scripts/train_tpu.sh use_gan=1 batch_size=256 packed_data_dir=packed/
set -euo pipefail
cd "$(dirname "$0")/.."

export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-.jax_cache}"
exec python train.py "$@"
