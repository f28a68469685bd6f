"""Offline graph partitioning CLI (reference: ``graph_partition.py``).

Partitions a dataset and caches the membership vector so training runs
skip the partitioning step.
"""
import argparse

import numpy as np

from adaqp_tpu.graph import partition_graph
from adaqp_tpu.helper import load_dataset


def main():
    p = argparse.ArgumentParser(description="adaqp_tpu graph partitioner")
    p.add_argument("--dataset", type=str, required=True)
    p.add_argument("--raw_dir", type=str, default="data/dataset")
    p.add_argument("--partition_dir", type=str, default="data/part_data")
    p.add_argument("--partition_size", type=int, required=True)
    p.add_argument("--method", type=str, default="ldg", choices=["ldg", "metis", "random"])
    args = p.parse_args()

    g = load_dataset(args.dataset, args.raw_dir)
    part = partition_graph(g, args.partition_size, args.method)
    import os

    os.makedirs(args.partition_dir, exist_ok=True)
    out = f"{args.partition_dir}/{g.name}_{args.partition_size}part_{args.method}.npy"
    np.save(out, part)
    sizes = np.bincount(part, minlength=args.partition_size)
    cut = int((part[g.src] != part[g.dst]).sum())
    print(f"saved {out}; part sizes {sizes.tolist()}; edge cut {cut}/{g.num_edges}")


if __name__ == "__main__":
    main()
