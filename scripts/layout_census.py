"""Host-side census of the bench graph's tile structure + kernel cost model.

Loads the cached unique-edge bench graph and reports, for candidate
(BD, BS) tilings:

  * edges-per-tile histogram (how much mass is tileable at each threshold)
  * occupied-src-column counts per tile (the compact-tile scheme's budget)
  * (dst-strip, src-window) pair counts (the fused strip kernel's DMA count)

then predicts per-aggregation-pass time for each candidate scheme from
pluggable primitive costs. Measured-on-chip constants (EXPERIMENTS.md):
tile MXU ~BD*BS*F*2/197e12, window DMA ~BS*F*2/819e9, XLA HBM row gather
~17 ns/row. The VMEM dynamic_gather cost is UNKNOWN until
scripts/microbench_gather.py runs on the chip — sweep plausible values.

    python scripts/layout_census.py            # reddit-u graph
    python scripts/layout_census.py --products # products-u graph
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK_BF16 = 197e12  # v5e MXU flop/s
HBM_BW = 819e9      # v5e HBM bytes/s
HBM_GATHER_NS = 17.0  # measured descriptor floor, ns per gathered row


def load_graph(products: bool):
    from bench import CACHE_DIR, REDDIT_C, REDDIT_E, REDDIT_F, REDDIT_N, synth_reddit

    if products:
        n, e, f, c = 2_449_029, 123_718_280, 100, 47
        cache = os.path.join(CACHE_DIR, f"synthreddit_u_{n}_{e}_{f}.npz")
        if not os.path.exists(cache):
            # products bench uses its own generator; fall back to any cached file
            import glob

            cands = glob.glob(os.path.join(CACHE_DIR, "*prod*u*.npz"))
            if not cands:
                raise SystemExit("no cached products graph; run scripts/bench_products.py once")
            cache = cands[0]
        z = np.load(cache)
        return z["src"], z["dst"], n
    src, dst, *_ = synth_reddit(REDDIT_N, REDDIT_E, REDDIT_F, REDDIT_C)
    return src, dst, REDDIT_N


def census(src, dst, n, bd, bs, strip_rows=2048):
    n_pad = -(-n // max(bs, bd)) * max(bs, bd)
    tb = dst.astype(np.int64) // bd
    sb = src.astype(np.int64) // bs
    nw = n_pad // bs
    key = tb * nw + sb
    key_s = np.sort(key)
    uniq, start = np.unique(key_s, return_index=True)
    counts = np.diff(np.append(start, len(key_s)))

    # occupied columns per tile: unique (tile, src) pairs
    ck = key * np.int64(n_pad) + src
    ck_u = np.unique(ck)
    tile_of = ck_u // n_pad
    _, col_start = np.unique(tile_of, return_index=True)
    col_counts = np.diff(np.append(col_start, len(ck_u)))

    # (strip, window) pairs with >=1 edge
    spw = (dst.astype(np.int64) // strip_rows) * nw + sb
    n_pairs = len(np.unique(spw))

    return {
        "n_pad": n_pad,
        "tiles": uniq,
        "counts": counts,
        "col_counts": col_counts,
        "n_pairs": n_pairs,
        "nw": nw,
    }


def t_tile(bd, bs, f, window_amortized):
    mxu = bd * bs * f * 2 / PEAK_BF16
    dma = 0.0 if window_amortized else bs * f * 2 / HBM_BW
    return max(mxu, dma)


def model(cen, bd, bs, f, min_edges, vmem_gather_ns, label):
    counts, cols = cen["counts"], cen["col_counts"]
    dense = counts >= min_edges
    ell_edges = counts[~dense].sum()
    tiles = dense.sum()
    # scheme 1: current (full bitmask tiles, HBM-gather ELL, no window reuse)
    cur = tiles * t_tile(bd, bs, f, False) + ell_edges * HBM_GATHER_NS * 1e-9
    # scheme 2: strip-fused — window DMA once per (strip,window) pair, tiles
    # MXU-only, ELL edges gathered from the VMEM window (dst-major ELLPACK,
    # pad waste ignored => optimistic)
    dma = cen["n_pairs"] * bs * f * 2 / HBM_BW
    fused = max(
        dma,
        tiles * t_tile(bd, bs, f, True) + ell_edges * vmem_gather_ns * 1e-9,
    )
    # scheme 3: compact-column tiles — per dense tile, gather its occupied
    # columns (padded to 128) from the VMEM window then a narrow matmul;
    # sparse leftovers gathered per edge from VMEM
    cpad = -(-cols // 128) * 128
    # a compact tile pays: column gather + narrow MXU; cap at the full tile
    comp_cost = np.minimum(
        cpad * vmem_gather_ns * 1e-9 + bd * cpad * f * 2 / PEAK_BF16,
        t_tile(bd, bs, f, True),
    )
    # compact only pays when cheaper than per-edge gather of its edges
    per_edge = counts * vmem_gather_ns * 1e-9
    tile_cost = np.minimum(comp_cost, per_edge)
    compact = max(dma, tile_cost.sum())
    print(
        f"  {label:28s} tiles={tiles:7d} ell={ell_edges/1e6:6.2f}M "
        f"pairs={cen['n_pairs']:6d} | cur={cur*1e3:7.1f}ms "
        f"fused={fused*1e3:7.1f}ms compact={compact*1e3:7.1f}ms"
    )
    return cur, fused, compact


def region_stats(src, dst, n):
    """One pass over the edges -> per-region (uniq keys, edge counts,
    occupied-column counts) for the spmm_compact geometry."""
    bd, bs, sb = 256, 2048, 8
    n_pad = -(-n // (sb * bd)) * (sb * bd)
    nw = n_pad // bs
    blk = dst.astype(np.int64) // bd
    win = src.astype(np.int64) // bs
    region = blk * nw + win
    region_s = np.sort(region)
    uniq, start = np.unique(region_s, return_index=True)
    counts = np.diff(np.append(start, len(region_s)))
    ck = np.unique(region * np.int64(n_pad) + src)
    _, cstart = np.unique(ck // n_pad, return_index=True)
    cols = np.diff(np.append(cstart, len(ck)))
    return uniq, counts, cols, nw


def model_group_kernel(
    stats, f, me_ell, full_cols, vg_ns, expand_us=0.65,
    hbm_gather_ns=HBM_GATHER_NS,
):
    """Exact cost model of the spmm_compact group kernel (BD=256, BS=2048,
    GROUP=8, CSUB=256) including dummy-slot padding in partially-filled
    groups. ``vg_ns`` = per-virtual-column cost of the square [2048, F]
    window permutation at this F (measure with scripts/microbench_gather).
    Returns (seconds_per_pass, stats dict)."""
    bd, bs, csub, group, sb = 256, 2048, 256, 8, 8
    uniq, counts, cols, nw = stats

    ell = counts < me_ell
    full = (~ell) & (cols > full_cols)
    comp = (~ell) & (~full)
    subtiles = np.ceil(cols[comp] / csub).astype(np.int64)
    # groups are packed within (strip, window): count per-pair subtiles
    strip = (uniq // nw) // sb
    wid = uniq % nw
    pair = strip * nw + wid
    pair_sub = np.zeros(0, np.int64)
    if comp.any():
        order = np.argsort(pair[comp], kind="stable")
        ps = pair[comp][order]
        st = subtiles[order]
        _, pstart = np.unique(ps, return_index=True)
        pair_sub = np.add.reduceat(st, pstart)
    groups = int(np.ceil(pair_sub / group).sum())

    t_mxu_full = bd * bs * f * 2 / PEAK_BF16
    t_mxu_sub = bd * csub * f * 2 / PEAK_BF16
    t_gather = bs * vg_ns * 1e-9 * (f / 256) ** 0.0  # vg measured per F
    t_expand = expand_us * 1e-6
    cost = (
        full.sum() * (t_mxu_full + t_expand)
        + groups * (t_gather + t_expand + group * t_mxu_sub)
        + counts[ell].sum() * hbm_gather_ns * 1e-9
    )
    # window DMA (overlapped; reported to check it stays under compute)
    pairs_used = len(np.unique(pair[~ell]))
    dma = pairs_used * bs * f * 2 / HBM_BW
    stats = dict(
        full=int(full.sum()), groups=groups,
        subtiles=int(subtiles.sum()),
        fill=float(subtiles.sum() / max(groups * group, 1)),
        ell_edges=int(counts[ell].sum()), pairs=pairs_used,
        dma_ms=dma * 1e3,
    )
    return max(cost, dma), stats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--products", action="store_true")
    ap.add_argument("--strip_rows", type=int, default=2048)
    ap.add_argument("--group_model", action="store_true",
                    help="sweep the exact spmm_compact cost model only")
    args = ap.parse_args()
    src, dst, n = load_graph(args.products)
    print(f"graph: n={n} e={len(src)/1e6:.1f}M unique directed")

    if args.group_model:
        stats = region_stats(src, dst, n)
        for f in (768, 256):
            print(f"--- spmm_compact exact model, F={f} ---")
            for vg in (1.0, 2.0, 4.0, 8.0, 16.0):
                for me_ell, fc in ((32, 1024), (64, 1024), (64, 1536),
                                   (128, 1024), (192, 1536)):
                    t, s = model_group_kernel(stats, f, me_ell, fc, vg)
                    print(
                        f"  vg={vg:4.1f}ns me_ell={me_ell:3d} fc={fc:4d}: "
                        f"{t*1e3:7.1f}ms  full={s['full']:6d} "
                        f"groups={s['groups']:6d} fill={s['fill']:.2f} "
                        f"ell={s['ell_edges']/1e6:5.2f}M dma={s['dma_ms']:.0f}ms"
                    )
        return

    for bd, bs in [(256, 2048), (256, 1024), (256, 512), (512, 2048), (128, 512)]:
        cen = census(src, dst, n, bd, bs, args.strip_rows)
        counts = cen["counts"]
        print(f"\nBD={bd} BS={bs}: {len(counts)} occupied tiles, n_pad={cen['n_pad']}")
        for th in (32, 64, 128, 192, 384, 512, 1024):
            d = counts >= th
            print(
                f"  >= {th:5d} edges: {d.sum():7d} tiles hold "
                f"{counts[d].sum()/1e6:6.1f}M edges; ELL {counts[~d].sum()/1e6:6.2f}M"
            )
        occ = cen["col_counts"] / bs
        print(
            f"  col occupancy (all tiles): p50={np.percentile(occ,50):.3f} "
            f"p90={np.percentile(occ,90):.3f} mean={occ.mean():.3f}"
        )
        for f in (640, 256):
            print(f"  --- F={f} ---")
            for vg in (2.0, 4.0, 8.0):
                model(cen, bd, bs, f, 192, vg, f"me=192 vmem_gather={vg}ns")
            model(cen, bd, bs, f, 512, 4.0, "me=512 vmem_gather=4ns")


if __name__ == "__main__":
    main()
