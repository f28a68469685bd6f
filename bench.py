"""Benchmark harness — prints ONE JSON line for the driver.

Headline metric (fixed across rounds): **full-graph GCN training epoch
time at exact Reddit scale on one TPU chip** — N=232,965 nodes,
~114.6M directed edges (incl. self-loops), 602 features, hidden 256,
3 layers, fp32 — forward + backward + Adam update.

Baseline: the reference's sample run (`BASELINE.md`): 1.09-1.16 s/epoch
(midpoint 1.125 s) for Vanilla GCN on Reddit over 1 node x 4 NVIDIA 32 GB
GPUs with gloo (0.79-0.85 s of that is communication). A single chip has no
inter-chip comm, so this compares one chip's whole-graph compute against the
reference cluster's full epoch. ``vs_baseline = 1.125 / ours`` (>1 means
faster than the reference cluster).

The graph is synthetic (this environment cannot download Reddit): a banded
small-world + heavy-tail generator matching Reddit's N/E/F and the locality
of an RCM-reordered real graph; cached under data/bench_cache/.

    python bench.py            # full scale (first run generates + caches)
    python bench.py --quick    # small-scale smoke (CI)
"""
import argparse
import json
import os
import sys
import time

import jax

if os.environ.get("JAX_PLATFORMS"):
    try:
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    except Exception:
        pass

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from adaqp_tpu.utils.compilation_cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

REDDIT_N = 232_965
REDDIT_E = 114_615_892  # directed edges incl. self-loops (DGL reddit)
REDDIT_F = 602
REDDIT_C = 41
BASELINE_EPOCH_S = 1.125  # BASELINE.md midpoint (reference 4-GPU cluster)
CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data", "bench_cache")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def unique_banded_keys(n, target, rng, log=lambda *a: None):
    """``target`` UNIQUE directed non-loop edges as int64 keys src*n+dst:
    zipf-banded rounds (locality + heavy tail) topped up with uniform
    random pairs once the small-delta band saturates."""
    keys = np.empty(0, np.int64)
    for rnd in range(8):
        short = target - len(keys)
        if short <= 0:
            break
        m = int(short * 1.6) + 1024
        src = rng.integers(0, n, m, dtype=np.int64)
        delta = np.minimum(rng.zipf(1.3, m).astype(np.int64), n // 2)
        sign = rng.integers(0, 2, m, dtype=np.int64) * 2 - 1
        dst = (src + sign * delta) % n
        before = len(keys)
        keys = np.unique(np.concatenate([keys, src * n + dst]))
        log(f"  zipf round {rnd}: {len(keys)/1e6:.1f}M unique")
        if len(keys) - before < short // 20:  # band saturated
            break
    while len(keys) < target:  # uniform top-up: collisions are rare
        short = target - len(keys)
        m = int(short * 1.3) + 1024
        src = rng.integers(0, n, m, dtype=np.int64)
        dst = rng.integers(0, n, m, dtype=np.int64)
        k = (src * n + dst)[src != dst]
        keys = np.unique(np.concatenate([keys, k]))
        log(f"  uniform top-up: {len(keys)/1e6:.1f}M unique")
    if len(keys) > target:  # trim a random subset, not a sorted prefix
        keep = rng.permutation(len(keys))[:target]
        keys = keys[np.sort(keep)]
    return keys


def synth_reddit(n, e, f, c, seed=0):
    """Banded small-world + heavy-tail graph at Reddit scale.

    All ``e`` edges are UNIQUE directed pairs (incl. one self-loop per
    node) — real Reddit's 114.6M directed edges are unique, and the
    bitmask tiles aggregate the deduplicated graph, so a multigraph here
    would silently understate the aggregation work (the round-1/2 "u"-less
    cache had only 41.7M unique pairs)."""
    cache = os.path.join(CACHE_DIR, f"synthreddit_u_{n}_{e}_{f}.npz")
    if os.path.exists(cache):
        log(f"loading cached bench graph {cache}")
        z = np.load(cache)
        return z["src"], z["dst"], z["feats"], z["labels"], z["train_mask"]
    log(f"generating bench graph n={n} e={e} unique (one-time, cached)")
    rng = np.random.default_rng(seed)
    keys = unique_banded_keys(n, e - n, rng, log)  # reserve self-loops
    src = (keys // n).astype(np.int32)
    dst = (keys % n).astype(np.int32)
    loop = np.arange(n, dtype=np.int32)
    src = np.concatenate([src, loop])
    dst = np.concatenate([dst, loop])
    order = np.argsort(dst, kind="stable")
    src, dst = src[order], dst[order]
    feats = rng.normal(size=(n, f)).astype(np.float32)
    labels = rng.integers(0, c, n).astype(np.int32)
    train_mask = rng.random(n) < 0.66
    os.makedirs(CACHE_DIR, exist_ok=True)
    np.savez(cache, src=src, dst=dst, feats=feats, labels=labels, train_mask=train_mask)
    return src, dst, feats, labels, train_mask


def rcm_perm(src, dst, n, cache_tag=""):
    """Reverse-Cuthill-McKee ordering of the (symmetrized) graph, cached.

    Round-3 VERDICT next-step #4: the ELL gather floor is a per-edge-visit
    cost, so the remaining aggregation lever is pulling tail edges into
    dense bitmask tiles; RCM tightens the bandwidth so nearby dst rows
    share source windows."""
    cache = os.path.join(CACHE_DIR, f"rcm_perm_{n}{cache_tag}.npz")
    if os.path.exists(cache):
        return np.load(cache)["perm"]
    import scipy.sparse as sp
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    log(f"computing RCM permutation over {len(src)/1e6:.1f}M edges (one-time)")
    a = sp.csr_matrix(
        (np.ones(len(src), np.int8), (src, dst)), shape=(n, n)
    )
    perm = np.asarray(
        reverse_cuthill_mckee(a + a.T, symmetric_mode=True), np.int64
    )
    os.makedirs(CACHE_DIR, exist_ok=True)
    np.savez(cache, perm=perm)
    return perm


def apply_reorder(src, dst, feats, labels, train_mask, perm):
    """Relabel the graph so new id j is old node perm[j]."""
    inv = np.empty_like(perm)
    inv[perm] = np.arange(len(perm))
    return (inv[src].astype(np.int32), inv[dst].astype(np.int32),
            feats[perm], labels[perm], train_mask[perm])


def run_bench(n, e, f, c, hidden, layers, epochs, edge_chunk, agg_dtype,
              min_edges=512, impl="block", me_ell=64, full_cols=1024,
              reorder="none"):
    src, dst, feats, labels, train_mask = synth_reddit(n, e, f, c)
    rtag = ""
    if reorder == "rcm":
        perm = rcm_perm(src, dst, n)
        src, dst, feats, labels, train_mask = apply_reorder(
            src, dst, feats, labels, train_mask, perm
        )
        rtag = "_rcm"
    cmp_pair = blk_pair = stp_pair = None
    if impl == "strip":
        from adaqp_tpu.ops.spmm_strip import strip_layout

        log(f"building strip layout (host, one-time), min_edges={min_edges}")
        key = os.path.join(CACHE_DIR, f"stp_u_{n}_{e}_me{min_edges}{rtag}")
        fwd = strip_layout(src, dst, n, min_edges=min_edges, cache_key=key + "_fwd")
        bwd = strip_layout(dst, src, n, min_edges=min_edges, cache_key=key + "_bwd")
        log(f"tiles fwd={fwd.tile_src.shape[0]} windows={fwd.win_src.shape[0]-1} "
            f"bwd={bwd.tile_src.shape[0]}")
        feat_mult = 128
        stp_pair = (fwd, bwd)
    if impl in ("compact", "mixed"):
        if jax.devices()[0].platform != "tpu":
            # the portable fallback unrolls one jit op per work item — at
            # bench scale that is an hours-long CPU trace, not a benchmark
            raise SystemExit(f"--impl {impl} requires the TPU backend")
        from adaqp_tpu.ops.spmm_compact import (
            compact_layout,
            dynamic_gather_supported,
        )

        if not dynamic_gather_supported():
            raise SystemExit(
                f"--impl {impl}: this TPU backend cannot lower the compact "
                "kernel's cross-vreg Mosaic gather (see spmm_compact."
                "dynamic_gather_supported / EXPERIMENTS.md); use --impl block"
            )

        log(f"building compact layout (host, one-time), me_ell={me_ell} "
            f"full_cols={full_cols}")
        key = os.path.join(CACHE_DIR, f"cmp_u_{n}_{e}_me{me_ell}_fc{full_cols}{rtag}")
        fwd = compact_layout(
            src, dst, n, me_ell=me_ell, full_cols=full_cols,
            cache_key=key + "_fwd",
        )
        bwd = compact_layout(
            dst, src, n, me_ell=me_ell, full_cols=full_cols,
            cache_key=key + "_bwd",
        )
        log(f"items fwd={fwd.masks.shape[0]} (full={int((fwd.kind==0).sum())} "
            f"group={int((fwd.kind==1).sum())}) bwd={bwd.masks.shape[0]} "
            f"ell_fwd={'y' if fwd.straggler else 'n'}")
        # compact F-chunking wants F divisible by 384 or 256 (spmm_compact
        # _f_chunk): pad features 602 -> 768 rather than riding 5x128 chunks
        feat_mult = 384
        cmp_pair = (fwd, bwd)
    if impl in ("block", "mixed"):
        from adaqp_tpu.ops.spmm_block import block_layout

        log(f"building bitmask block layout (host, one-time), min_edges={min_edges}")
        key = os.path.join(CACHE_DIR, f"blk_u_{n}_{e}{rtag}")
        if min_edges != 512:
            key += f"_me{min_edges}"
        fwd = block_layout(src, dst, n, min_edges=min_edges, cache_key=key + "_fwd")
        bwd = block_layout(dst, src, n, min_edges=min_edges, cache_key=key + "_bwd")
        log(f"tiles fwd={fwd.masks.shape[0]} bwd={bwd.masks.shape[0]}")
        # mixed: layer-0 aggregates at F=640 via the block kernel; hidden
        # (256-wide) passes ride compact — no 768 feature padding needed
        feat_mult = 128
        blk_pair = (fwd, bwd)
    n_pad = fwd.n_pad
    assert cmp_pair is None or blk_pair is None or (
        cmp_pair[0].n_pad == blk_pair[0].n_pad
        and cmp_pair[0].n_src_pad == blk_pair[0].n_pad
    )
    assert stp_pair is None or stp_pair[0].n_src_pad == n_pad

    deg_in = np.maximum(np.bincount(dst, minlength=n), 1).astype(np.float32)
    deg_out = np.maximum(np.bincount(src, minlength=n), 1).astype(np.float32)

    # pad rows to the tile grid and features to the lane multiple the Pallas
    # kernel needs (compact: an F-chunk multiple, see above)
    f_pad = -(-f // feat_mult) * feat_mult
    feats_p = np.zeros((n_pad, f_pad), np.float32)
    feats_p[:n, :f] = feats
    rs_in = np.ones(n_pad, np.float32)
    rs_out = np.ones(n_pad, np.float32)
    rs_in[:n] = deg_in**-0.5
    rs_out[:n] = deg_out**-0.5
    labels_p = np.zeros(n_pad, np.int32)
    labels_p[:n] = labels
    mask_p = np.zeros(n_pad, bool)
    mask_p[:n] = train_mask

    dev = {
        "feats": jnp.asarray(feats_p),
        "labels": jnp.asarray(labels_p),
        "mask": jnp.asarray(mask_p),
        "rs_in": jnp.asarray(rs_in),
        "rs_out": jnp.asarray(rs_out),
    }
    # device layout pairs, all passed as explicit jit args (never closures)
    lay_dev = {}
    if blk_pair is not None:
        lay_dev["blk"] = (blk_pair[0].to_device(), blk_pair[1].to_device())
    if cmp_pair is not None:
        lay_dev["cmp"] = (cmp_pair[0].to_device(), cmp_pair[1].to_device())
    if stp_pair is not None:
        lay_dev["stp"] = (stp_pair[0].to_device(), stp_pair[1].to_device())
    f = f_pad

    import optax

    from adaqp_tpu.model.loss import masked_loss_sum

    rngk = jax.random.PRNGKey(0)
    dims = [(f, hidden)] + [(hidden, hidden)] * (layers - 2) + [(hidden, c)]
    params = []
    for i, (a, b) in enumerate(dims):
        rngk, k = jax.random.split(rngk)
        lim = float(np.sqrt(6.0 / (a + b)))
        params.append(
            {"w": jax.random.uniform(k, (a, b), jnp.float32, -lim, lim),
             "b": jnp.zeros((b,))}
        )
    tx = optax.adam(0.01)
    opt_state = tx.init(params)
    train_count = float(train_mask.sum())

    use_pallas = jax.devices()[0].platform == "tpu"

    # everything the step touches is an explicit argument: closure-captured
    # arrays would be embedded as HLO constants, and at 100M-edge scale that
    # multi-GB payload stalls compilation
    def loss_fn(params, dev, lay_dev):
        def agg(h):
            hs = (h * dev["rs_out"][:, None]).astype(agg_dtype)
            # mixed: the wide layer-0 pass keeps the full-bitmask kernel
            # (compact's gather overhead scales with F); hidden-width
            # passes ride the compact kernel (h widths are trace-static)
            if impl == "mixed":
                which = "cmp" if hs.shape[1] == hidden else "blk"
            elif impl == "compact":
                which = "cmp"
            elif impl == "strip":
                which = "stp"
            else:
                which = "blk"
            fd, bd = lay_dev[which]
            if which == "cmp":
                from adaqp_tpu.ops.spmm_compact import spmm_compact as fn
            elif which == "stp":
                from adaqp_tpu.ops.spmm_strip import spmm_strip as fn
            else:
                from adaqp_tpu.ops.spmm_block import spmm_block as fn
            out = fn(fd, hs, bd, use_pallas).astype(jnp.float32)
            return out * dev["rs_in"][:, None]

        h = dev["feats"]
        for i, layer in enumerate(params):
            # NOTE: aggregate-then-transform (reference order) is kept on
            # purpose: although agg(h) @ W == agg(h @ W) and transform-first
            # shrinks the aggregated dim, it also forces a layer-0 BACKWARD
            # aggregation (for dW) that aggregate-first lets XLA eliminate
            # (input features carry no gradient) — measured net -9%.
            h = agg(h) @ layer["w"] + layer["b"]
            if i < layers - 1:
                h = jax.nn.relu(h)
        return masked_loss_sum(h, dev["labels"], dev["mask"], False) / train_count

    @jax.jit
    def step(params, opt_state, dev, lay_dev):
        loss, grads = jax.value_and_grad(loss_fn)(params, dev, lay_dev)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    log("compiling train step...")
    t0 = time.perf_counter()
    params, opt_state, loss = step(params, opt_state, dev, lay_dev)
    _ = float(loss)  # force completion (block_until_ready is lazy over the tunnel)
    log(f"compile+first epoch: {time.perf_counter()-t0:.1f}s, loss {float(loss):.4f}")
    times = []
    for i in range(epochs):
        t0 = time.perf_counter()
        params, opt_state, loss = step(params, opt_state, dev, lay_dev)
        _ = float(loss)
        times.append(time.perf_counter() - t0)
        log(f"epoch {i}: {times[-1]:.3f}s loss {float(loss):.4f}")
    return float(np.median(times))


def run_trainer_bench(n, e, f, c, hidden, layers, epochs, agg_dtype,
                      model_name="gcn", impl="block", me_ell=64,
                      full_cols=1024):
    """Same Reddit-scale graph through the REAL Trainer runtime (K=1
    Vanilla, block-MXU impl) — headline and product share the code path
    (round-1 VERDICT weak #1 / next #9). Includes the full product layer
    stack (LayerNorm + dropout) the raw loop omits; eval runs separately
    and is not counted in per_epoch (reference measurement protocol,
    ``AdaQP/trainer/trainer.py:195-234``)."""
    from adaqp_tpu.helper.dataset import GraphData
    from adaqp_tpu.trainer import RunConfig, Trainer

    src, dst, feats, labels, train_mask = synth_reddit(n, e, f, c)
    rng = np.random.default_rng(7)
    rest = ~train_mask
    val = rest & (rng.random(n) < 0.4)
    test = rest & ~val
    g = GraphData(
        n, src, dst, feats, labels, train_mask, val, test, c, False,
        f"benchreddit{n}u",  # "u": unique-edge graph (distinct cache identity)
    )
    cfg = RunConfig(
        dataset=g.name,
        model_name=model_name,
        num_parts=1,
        partition_method="random",
        num_epochs=epochs,
        hidden_dim=hidden,
        num_layers=layers,
        mode="Vanilla",
        log_steps=1,
        measure_breakdown=False,
        spmm_impl=impl,
        compact_me_ell=me_ell,
        compact_full_cols=full_cols,
        agg_dtype=str(jnp.dtype(agg_dtype)),
        partition_dir=os.path.join(CACHE_DIR, "trainer_parts"),
        exp_path=os.path.join(CACHE_DIR, "trainer_exp"),
    )
    t = Trainer(cfg, graph=g)
    rec = t.train()
    return float(rec["per_epoch"])


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true", help="small-scale smoke run")
    p.add_argument("--trainer", action="store_true",
                   help="run the same scale through the full Trainer runtime")
    p.add_argument("--epochs", type=int, default=5)
    p.add_argument("--agg_dtype", type=str, default="bfloat16", choices=["float32", "bfloat16"])
    # tile-vs-ELL split threshold: in-situ tile cost ~3.3us and ELL gather
    # ~17 ns/edge put the breakeven near 190 edges/tile (EXPERIMENTS.md)
    p.add_argument("--min_edges", type=int, default=192)
    p.add_argument("--reorder", type=str, default="none",
                   choices=["none", "rcm"],
                   help="relabel nodes before layout (rcm: tighten the "
                        "bandwidth to pull tail edges into dense tiles)")
    p.add_argument("--impl", type=str, default="strip",
                   choices=["block", "compact", "mixed", "strip"],
                   help="raw-loop aggregation kernel (strip = v3 per-strip "
                        "window reuse; compact = v2 window-reuse + column-"
                        "compaction, retired on this chip; mixed = block for "
                        "layer 0, compact for hidden passes)")
    p.add_argument("--me_ell", type=int, default=64,
                   help="compact: regions below this edge count go to ELL")
    p.add_argument("--full_cols", type=int, default=1024,
                   help="compact: regions above this occupied-column count "
                        "stay full-bitmask")
    p.add_argument("--model", type=str, default="gcn", choices=["gcn", "sage"],
                   help="trainer-mode model family")
    args = p.parse_args()

    if args.quick:
        n, e, f, c = 50_000, 4_000_000, 128, 16
        # hidden must be a 128-lane multiple or aggregation falls off the
        # Pallas fast path onto the unrolled jnp tile loop
        hidden, layers = 128, 3
    else:
        n, e, f, c = REDDIT_N, REDDIT_E, REDDIT_F, REDDIT_C
        hidden, layers = 256, 3

    log(f"devices: {jax.devices()}")
    if args.trainer:
        if args.impl == "mixed":
            raise SystemExit("--trainer supports --impl block|compact")
        val = run_trainer_bench(
            n, e, f, c, hidden, layers, args.epochs, jnp.dtype(args.agg_dtype),
            model_name=args.model, impl=args.impl, me_ell=args.me_ell,
            full_cols=args.full_cols,
        )
        base = "reddit" if not args.quick else "quick"
        suffix = "" if args.model == "gcn" else f"_{args.model}"
        metric = f"{base}_trainer{suffix}_epoch_s"
    else:
        val = run_bench(
            n, e, f, c, hidden, layers, args.epochs,
            edge_chunk=1 << 18, agg_dtype=jnp.dtype(args.agg_dtype),
            min_edges=args.min_edges, impl=args.impl,
            me_ell=args.me_ell, full_cols=args.full_cols,
            reorder=args.reorder,
        )
        metric = "reddit_full_epoch_s" if not args.quick else "quick_epoch_s"
    vs = BASELINE_EPOCH_S / val if not args.quick else 0.0
    print(json.dumps({
        "metric": metric, "value": round(val, 4), "unit": "s",
        "vs_baseline": round(vs, 3),
    }))


if __name__ == "__main__":
    main()
