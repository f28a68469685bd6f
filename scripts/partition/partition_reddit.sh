#!/bin/bash
# Offline partitioning for Reddit (reference: scripts/partition/partition_reddit.sh)
set -e
cd "$(dirname "$0")/../.."
python graph_partition.py --dataset reddit --raw_dir data/dataset \
  --partition_dir data/part_data --partition_size "${1:-4}" --method ldg
