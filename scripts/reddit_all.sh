#!/bin/bash
# Reproduction grid for Reddit (reference: scripts/reddit_all.sh — there:
# 2 servers x {1,2} workers via torchrun; here: partition counts over one
# mesh, both models, Vanilla + AdaQP).
set -e
cd "$(dirname "$0")/.."
for parts in 2 4; do
  for model in gcn sage; do
    python main.py --dataset reddit --num_parts $parts --model_name $model --mode Vanilla
    python main.py --dataset reddit --num_parts $parts --model_name $model --mode AdaQP --assign_scheme adaptive
  done
done
