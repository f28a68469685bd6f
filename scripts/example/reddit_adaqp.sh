#!/bin/bash
# AdaQP on Reddit, 4 partitions (reference: scripts/example/reddit_adaqp.sh).
# Single-controller JAX: no torchrun; the mesh spans all visible devices.
# For a CPU simulation of 4 chips:
#   JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=4 ./reddit_adaqp.sh
set -e
cd "$(dirname "$0")/../.."
python main.py \
  --dataset reddit \
  --num_parts 4 \
  --model_name gcn \
  --mode AdaQP \
  --assign_scheme adaptive \
  --logger_level INFO
