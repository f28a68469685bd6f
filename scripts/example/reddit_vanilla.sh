#!/bin/bash
# Vanilla (fp32, no overlap) on Reddit, 4 partitions
# (reference: scripts/example/reddit_vanilla.sh).
set -e
cd "$(dirname "$0")/../.."
python main.py \
  --dataset reddit \
  --num_parts 4 \
  --model_name gcn \
  --mode Vanilla \
  --logger_level INFO
