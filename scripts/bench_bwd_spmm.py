"""Microbench: segment-SpMM backward via prebuilt transposed lists vs AD's
scatter-transpose (round-1 VERDICT missing #4 done-criterion).

Runs on whatever backend JAX exposes (the real TPU chip under axon). The
custom VJP (ops/dist_ops.pair_seg_spmm) re-runs a dst-sorted gather+
segment-sum on the transposed edge lists; AD's transpose of the forward is
an unsorted scatter-add, the documented slow path on TPU (docs/DESIGN.md).
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from adaqp_tpu.utils.compilation_cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()


def force(x):
    # axon block_until_ready is lazy; a host readback forces completion
    return float(jnp.asarray(x).sum())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=200_000)
    ap.add_argument("--avg_deg", type=int, default=32)
    ap.add_argument("--feats", type=int, default=256)
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()

    from adaqp_tpu.helper.dataset import rmat_graph
    from adaqp_tpu.ops.spmm import segment_spmm

    print("backend:", jax.default_backend())
    g = rmat_graph(n=args.n, avg_degree=args.avg_deg, num_feats=8, seed=1)
    n, e = g.num_nodes, len(g.src)
    order = np.argsort(g.dst, kind="stable")
    src = jnp.asarray(g.src[order].astype(np.int32))
    dst = jnp.asarray(g.dst[order].astype(np.int32))
    # transpose, dst-sorted
    ordT = np.argsort(g.src, kind="stable")
    tsrc = jnp.asarray(g.dst[ordT].astype(np.int32))
    tdst = jnp.asarray(g.src[ordT].astype(np.int32))
    h = jnp.asarray(np.random.default_rng(0).normal(size=(n, args.feats)).astype(np.float32))
    print(f"graph: {n} nodes, {e} edges, f={args.feats}")

    def fwd_ad(h):
        return segment_spmm(src, dst, None, h, n).sum()

    @jax.custom_vjp
    def agg(h):
        return segment_spmm(src, dst, None, h, n)

    def agg_f(h):
        return segment_spmm(src, dst, None, h, n), None

    def agg_b(_, gy):
        return (segment_spmm(tsrc, tdst, None, gy, n),)

    agg.defvjp(agg_f, agg_b)

    def fwd_custom(h):
        return agg(h).sum()

    for name, fn in (("AD scatter-transpose", fwd_ad), ("transposed-list VJP", fwd_custom)):
        gfn = jax.jit(jax.grad(fn))
        out = gfn(h)
        force(out)  # compile + warm
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = gfn(h)
        force(out)
        dt = (time.perf_counter() - t0) / args.reps
        gbps = (e * args.feats * 4 * 2) / dt / 1e9  # read msg + write acc
        print(f"{name:24s}: {dt * 1e3:8.2f} ms/iter (~{gbps:6.1f} GB/s eff)")


if __name__ == "__main__":
    main()
