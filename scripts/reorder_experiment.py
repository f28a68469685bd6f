"""Does RCM node reordering pull ELL tail edges into dense strip tiles?

Round-3 VERDICT next-step #4: every kernel-side formulation of the
aggregation floor was measured and lost (EXPERIMENTS round 3) — the named
remaining lever is FEWER ELL edge visits. The strip/block layouts split
edges into dense bitmask tiles (amortized MXU cost) and an ELL straggler
tail (~17 ns/row gather floor); a bandwidth-reducing relabeling (RCM over
the symmetrized graph) concentrates neighbors into nearby rows, which can
move tail edges into tiles.

Host-side analysis (this script): build the strip forward layout of the
bench graph under the original and RCM orders and compare the tile/ELL
split, tile count, and window count. If the split improves, measure the
epoch on the chip with ``python bench.py --reorder rcm``.

    JAX_PLATFORMS=cpu python scripts/reorder_experiment.py [--min_edges 192]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import bench  # noqa: E402
from adaqp_tpu.ops.spmm_strip import strip_layout  # noqa: E402

CACHE = bench.CACHE_DIR
N, E, F = bench.REDDIT_N, bench.REDDIT_E, bench.REDDIT_F


def split_stats(lay, e_total):
    ell = 0
    if lay.straggler is not None:
        ell = int(sum(int(lens.sum()) for _, _, _, lens in lay.straggler.buckets))
    tiles = int(lay.tile_src.shape[0])
    wins = int(lay.win_src.shape[0] - 1)
    return {
        "tiles": tiles,
        "windows": wins,
        "reuse": round(tiles / max(wins, 1), 2),
        "ell_edges": ell,
        "tile_edges": e_total - ell,
        "ell_frac": round(ell / e_total, 4),
        "mask_mb": round(lay.masks.nbytes / 1e6, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--min_edges", type=int, nargs="+", default=[192])
    args = ap.parse_args()

    src, dst, feats, labels, tm = bench.synth_reddit(N, E, F, bench.REDDIT_C)
    t0 = time.perf_counter()
    perm = bench.rcm_perm(src, dst, N)
    print(f"RCM perm in {time.perf_counter() - t0:.0f}s")
    src_r, dst_r, *_ = bench.apply_reorder(src, dst, feats, labels, tm, perm)

    for me in args.min_edges:
        orig = strip_layout(src, dst, N, min_edges=me,
                            cache_key=f"{CACHE}/stp_u_{N}_{E}_me{me}_fwd")
        rcm = strip_layout(src_r, dst_r, N, min_edges=me,
                           cache_key=f"{CACHE}/stp_u_{N}_{E}_me{me}_rcm_fwd")
        so, sr = split_stats(orig, E), split_stats(rcm, E)
        print(f"\nmin_edges={me}")
        print(f"{'':>12s} {'orig':>12s} {'rcm':>12s}")
        for k in so:
            print(f"{k:>12s} {so[k]:>12} {sr[k]:>12}")


if __name__ == "__main__":
    main()
