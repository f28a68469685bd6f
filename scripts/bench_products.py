"""ogbn-products-scale single-chip measurement (EXPERIMENTS.md).

Synthetic UNDIRECTED graph at the real dataset's scale (reference loads it
via OGB, `/root/reference/AdaQP/helper/partition.py:10-30`; this environment
has no egress): 2.449M nodes, ~123.7M directed edges after symmetrization +
self-loops, 100 features, 47 classes. 3-layer GCN, bf16 aggregation,
fwd/bwd share one symmetric-graph block layout.

    python scripts/bench_products.py --hidden 256
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from adaqp_tpu.model.loss import masked_loss_sum
from adaqp_tpu.ops.spmm_block import block_layout, spmm_block

from adaqp_tpu.utils.compilation_cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

N, E_TARGET, F, C = 2_449_029, 123_718_280, 100, 47
CACHE = "data/bench_cache"


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--hidden", type=int, default=256)
    p.add_argument("--layers", type=int, default=3)
    p.add_argument("--epochs", type=int, default=3)
    p.add_argument("--min_edges", type=int, default=192)
    p.add_argument("--impl", type=str, default="strip",
                   choices=["block", "compact", "strip"],
                   help="aggregation kernel (raw loop and trainer)")
    p.add_argument("--me_ell", type=int, default=64)
    p.add_argument("--full_cols", type=int, default=1024)
    p.add_argument("--trainer", action="store_true",
                   help="run through the full Trainer runtime instead of "
                        "the raw loop (LayerNorm, dropout, eval, artifacts)")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize layers in backward (trainer mode; "
                        "needed for hidden 256 on a 16 GB chip)")
    args = p.parse_args()
    if args.layers < 2:
        p.error("--layers must be >= 2 (input + output projections)")

    # "u": all directed pairs UNIQUE (ogbn-products' real edge list is a
    # simple graph; a zipf multigraph here silently understated the work —
    # the earlier prod_{N} cache held only 79.4M unique of 123.7M)
    key = f"{CACHE}/prod_u_{N}"
    if os.path.exists(key + "_edges.npz"):
        z = np.load(key + "_edges.npz")
        src, dst = z["src"], z["dst"]
    else:
        from bench import unique_banded_keys

        rng = np.random.default_rng(0)
        half = (E_TARGET - N) // 2
        keys = unique_banded_keys(N, 2 * half, rng, print)
        s0, d0 = keys // N, keys % N
        canon = np.unique(np.minimum(s0, d0) * N + np.maximum(s0, d0))
        # symmetrize canonical pairs; top up to exactly `half` of them
        while len(canon) < half:
            extra = unique_banded_keys(
                N, 2 * (half - len(canon)), rng, print
            )
            es, ed = extra // N, extra % N
            canon = np.unique(np.concatenate(
                [canon, np.minimum(es, ed) * N + np.maximum(es, ed)]
            ))
        canon = canon[np.sort(rng.permutation(len(canon))[:half])]
        s0, d0 = canon // N, canon % N
        loop = np.arange(N, dtype=np.int64)
        src = np.concatenate([s0, d0, loop]).astype(np.int32)
        dst = np.concatenate([d0, s0, loop]).astype(np.int32)
        os.makedirs(CACHE, exist_ok=True)
        np.savez(key + "_edges.npz", src=src, dst=dst)
    print(f"edges: {len(src) / 1e6:.1f}M", flush=True)

    if args.trainer:
        run_trainer(src, dst, args)
        return

    t0 = time.perf_counter()
    # symmetric graph: one layout serves forward and backward
    if args.impl == "compact":
        from adaqp_tpu.ops.spmm_compact import compact_layout
        from adaqp_tpu.ops.spmm_compact import spmm_compact as spmm_kernel

        lay = compact_layout(
            src, dst, N, me_ell=args.me_ell, full_cols=args.full_cols,
            cache_key=f"{key}_cmp_me{args.me_ell}_fc{args.full_cols}",
        )
    elif args.impl == "strip":
        from adaqp_tpu.ops.spmm_strip import strip_layout
        from adaqp_tpu.ops.spmm_strip import spmm_strip as spmm_kernel

        lay = strip_layout(
            src, dst, N, min_edges=args.min_edges,
            cache_key=f"{key}_stp_me{args.min_edges}",
        )
    else:
        spmm_kernel = spmm_block
        lay = block_layout(
            src, dst, N, min_edges=args.min_edges,
            cache_key=f"{key}_blk_me{args.min_edges}",
        )
    n_items = (
        lay.tile_src.shape[0] if args.impl == "strip" else lay.masks.shape[0]
    )
    print(f"layout {time.perf_counter() - t0:.0f}s items={n_items}", flush=True)
    dev = lay.to_device()
    n_pad = lay.n_pad
    f_pad = 128

    rng = np.random.default_rng(1)
    feats = np.zeros((n_pad, f_pad), np.float32)
    feats[:N, :F] = rng.normal(size=(N, F)).astype(np.float32)
    deg = np.maximum(np.bincount(dst, minlength=n_pad), 1).astype(np.float32)
    data = dict(
        feats=jnp.asarray(feats),
        labels=jnp.asarray(rng.integers(0, C, n_pad).astype(np.int32)),
        mask=jnp.asarray(np.concatenate([np.ones(N, bool), np.zeros(n_pad - N, bool)])),
        rs=jnp.asarray(deg ** -0.5),
    )

    params = []
    kk = jax.random.PRNGKey(0)
    dims = [(f_pad, args.hidden)]
    dims += [(args.hidden, args.hidden)] * (args.layers - 2)
    dims += [(args.hidden, C)]
    for a, b in dims:
        kk, k1 = jax.random.split(kk)
        lim = float(np.sqrt(6 / (a + b)))
        params.append(
            {"w": jax.random.uniform(k1, (a, b), jnp.float32, -lim, lim),
             "b": jnp.zeros(b)}
        )
    tx = optax.adam(0.01)
    opt = tx.init(params)

    def loss_fn(params, data, dd):
        h = data["feats"]
        for i, l in enumerate(params):
            hs = (h * data["rs"][:, None]).astype(jnp.bfloat16)
            agg = spmm_kernel(dd, hs, dd, True) * data["rs"][:, None]
            h = agg.astype(jnp.bfloat16) @ l["w"].astype(jnp.bfloat16) + l[
                "b"
            ].astype(jnp.bfloat16)
            if i < args.layers - 1:
                h = jax.nn.relu(h)
        return masked_loss_sum(h.astype(jnp.float32), data["labels"], data["mask"], False) / N

    @jax.jit
    def step(params, opt, data, dd):
        loss, g = jax.value_and_grad(loss_fn)(params, data, dd)
        up, opt = tx.update(g, opt)
        return optax.apply_updates(params, up), opt, loss

    t0 = time.perf_counter()
    params, opt, loss = step(params, opt, data, dev)
    _ = float(loss)
    print(f"compile+first: {time.perf_counter() - t0:.0f}s", flush=True)
    ts = []
    for i in range(args.epochs):
        t0 = time.perf_counter()
        params, opt, loss = step(params, opt, data, dev)
        _ = float(loss)
        ts.append(time.perf_counter() - t0)
        print(f"epoch {i}: {ts[-1]:.2f}s loss {float(loss):.4f}", flush=True)
    print("PRODUCTS_EPOCH_S", float(np.median(ts)))


def run_trainer(src, dst, args):
    """Products-scale graph through the REAL Trainer (K=1, Vanilla):
    LayerNorm + dropout + per-epoch eval + reference artifacts."""
    from adaqp_tpu.helper.dataset import GraphData
    from adaqp_tpu.trainer import RunConfig, Trainer

    rng = np.random.default_rng(1)
    feats = rng.normal(size=(N, F)).astype(np.float32)
    labels = rng.integers(0, C, N).astype(np.int32)
    train = rng.random(N) < 0.1
    rest = ~train
    val = rest & (rng.random(N) < 0.3)
    test = rest & ~val
    g = GraphData(N, src, dst, feats, labels, train, val, test, C, False,
                  f"prodsynth{N}u")
    cfg = RunConfig(
        dataset=g.name,
        num_parts=1,
        partition_method="random",
        num_epochs=args.epochs,
        hidden_dim=args.hidden,
        num_layers=args.layers,
        mode="Vanilla",
        log_steps=1,
        measure_breakdown=False,
        spmm_impl=args.impl,
        compact_me_ell=args.me_ell,
        compact_full_cols=args.full_cols,
        agg_dtype="bfloat16",
        remat=args.remat,
        log_hbm=True,  # surface the footprint this scale runs up against
        block_min_edges=args.min_edges,
        partition_dir=f"{CACHE}/trainer_parts",
        exp_path=f"{CACHE}/trainer_exp",
    )
    t = Trainer(cfg, graph=g)
    rec = t.train()
    print("PRODUCTS_TRAINER_EPOCH_S", float(rec["per_epoch"]))


if __name__ == "__main__":
    main()
