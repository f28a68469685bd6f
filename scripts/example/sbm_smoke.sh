#!/bin/bash
# No-download smoke run on the synthetic SBM dataset, all four modes.
set -e
cd "$(dirname "$0")/../.."
export JAX_PLATFORMS=${JAX_PLATFORMS:-cpu}
export XLA_FLAGS="${XLA_FLAGS} --xla_force_host_platform_device_count=4"
for mode in Vanilla AdaQP AdaQP-q AdaQP-p; do
  python main.py --dataset sbm --num_parts 4 --mode "$mode" \
    --assign_scheme uniform --num_epochs 20 --log_steps 5
done
