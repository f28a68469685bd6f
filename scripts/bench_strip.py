"""Strip-kernel (window reuse) vs v1 block kernel at bench shapes.

Builds the fwd layouts of the corrected Reddit-scale bench graph in both
forms and times one aggregation pass at the bench's real widths (F=640
layer 0, F=256 hidden) on the chip. Timing inside one jit (chained
fori_loop + forced readback — dispatch over the axon tunnel costs ~28 ms).

    python scripts/bench_strip.py [--iters 5] [--min_edges 192]
"""
import argparse
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

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from adaqp_tpu.utils.compilation_cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

CACHE = "data/bench_cache"
N, E, F0 = 232_965, 114_615_892, 602


def time_pass(run, dev, h, iters):
    @jax.jit
    def loop(dev, h):
        # chain iterations through h: a loop-invariant body would be
        # hoisted by XLA and time ONE pass regardless of iters
        def body(k, hh):
            return hh + run(dev, hh).astype(hh.dtype) * 1e-6

        return jax.lax.fori_loop(0, iters, body, h)[:8, :8]

    out = loop(dev, h)
    jax.block_until_ready(out)
    _ = float(jnp.asarray(out).astype(jnp.float32).sum())
    t0 = time.perf_counter()
    out = loop(dev, h)
    _ = float(jnp.asarray(out).astype(jnp.float32).sum())
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--min_edges", type=int, default=192)
    args = ap.parse_args()

    from adaqp_tpu.ops.spmm_block import block_layout, run_block
    from adaqp_tpu.ops.spmm_strip import strip_layout, run_strip

    z = np.load(f"{CACHE}/synthreddit_u_{N}_{E}_{F0}.npz")
    src, dst = z["src"], z["dst"]
    me = args.min_edges

    print("building/loading layouts...")
    blk = block_layout(src, dst, N, min_edges=me,
                       cache_key=f"{CACHE}/blk_u_{N}_{E}_me{me}_fwd")
    stp = strip_layout(src, dst, N, min_edges=me,
                       cache_key=f"{CACHE}/stp_u_{N}_{E}_me{me}_fwd")
    t_b = blk.masks.shape[0]
    t_s = stp.tile_src.shape[0]
    n_w = stp.win_src.shape[0] - 1
    print(f"block tiles {t_b} | strip tiles {t_s}, windows {n_w} "
          f"(reuse {t_s / max(n_w, 1):.2f}x), grid {stp.w_ord.shape[0]}")
    blk_d, stp_d = blk.to_device(), stp.to_device()

    rng = np.random.default_rng(0)
    for f in (640, 256):
        h = jnp.asarray(
            rng.normal(size=(blk.n_src_pad, f)).astype(np.float32)
        ).astype(jnp.bfloat16)
        hs = h if stp.n_src_pad == blk.n_src_pad else jnp.pad(
            h, ((0, stp.n_src_pad - blk.n_src_pad), (0, 0)))
        # correctness first (tiles only; shared ELL straggler excluded by
        # comparing full outputs which both include it identically)
        ob = run_block(blk_d, h)
        os_ = run_strip(stp_d, hs)
        lim = min(ob.shape[0], os_.shape[0])
        err = float(jnp.abs(
            ob[:lim].astype(jnp.float32) - os_[:lim].astype(jnp.float32)
        ).max())
        ref = float(jnp.abs(ob[:lim].astype(jnp.float32)).max())
        print(f"F={f}: strip-vs-block max err {err:.3e} (ref mag {ref:.1f})")
        tb = time_pass(run_block, blk_d, h, args.iters)
        ts = time_pass(run_strip, stp_d, hs, args.iters)
        print(f"F={f}: block {tb*1e3:7.1f} ms/pass | strip {ts*1e3:7.1f} "
              f"ms/pass ({tb/ts:.2f}x)")


if __name__ == "__main__":
    main()
