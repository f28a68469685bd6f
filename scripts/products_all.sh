#!/bin/bash
# Reproduction grid for ogbn-products (reference: scripts/products_all.sh).
set -e
cd "$(dirname "$0")/.."
for parts in 4 8; do
  for model in gcn sage; do
    python main.py --dataset ogbn-products --num_parts $parts --model_name $model --mode Vanilla
    python main.py --dataset ogbn-products --num_parts $parts --model_name $model --mode AdaQP --assign_scheme adaptive
  done
done
