"""A/B microbench: bitmask->bf16 expansion variants in the block SpMM kernel.

The corrected unique-edge Reddit graph has 32.3K fwd tiles at
min_edges=192; the per-tile cost is dominated by the [BD, BS] mask
expansion (~6 VPU ops over 512 vregs), not the MXU matmul. This script
times the REAL aggregation pass (the cached bench layout's full grid,
real masks, random activations) under alternative expansion formulations,
on the real chip, without paying a full bench run per variant:

  v0 current   rep>>bit & 1 -> f32 -> bf16         (6 elementwise ops)
  v1 dcast     rep>>bit & 1 -> bf16 direct          (5; does Mosaic fuse?)
  v2 sign      (rep << (31-bit)) < 0 -> select 1/0  (5, no div)
  v3 floor     rep -> bf16 (WRONG math, timing floor: repeat+cast+matmul)

Variants that fail to lower are reported and skipped. Run after any
kernel change: `python scripts/microbench_expand.py [--f 640]`.
"""
import argparse
import functools
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
from adaqp_tpu.ops.spmm_block import BD, BS, WORDS, block_layout  # noqa: E402
from adaqp_tpu.utils.compilation_cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

CACHE = "data/bench_cache/blk_u_232965_114615892_me192_fwd"


def make_run(variant: str, f: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(ss_ref, fi_ref, db_ref, mask_ref, h_ref, out_ref, win, sems, acc):
        t = pl.program_id(0)
        nt = pl.num_programs(0)
        slot = jax.lax.rem(t, 2)

        def dma(tile, slot):
            start = pl.multiple_of(ss_ref[tile], BS)
            return pltpu.make_async_copy(
                h_ref.at[pl.ds(start, BS), :], win.at[slot], sems.at[slot]
            )

        @pl.when(t == 0)
        def _():
            dma(0, 0).start()

        @pl.when(t + 1 < nt)
        def _():
            dma(t + 1, jax.lax.rem(t + 1, 2)).start()

        dma(t, slot).wait()
        words = mask_ref[0]
        rep = pltpu.repeat(words.astype(jnp.int32), 16, axis=1)
        lane = jax.lax.broadcasted_iota(jnp.int32, (BD, BS), 1)
        if variant == "v0":
            bit = lane // WORDS
            a = ((rep >> bit) & 1).astype(jnp.float32).astype(jnp.bfloat16)
        elif variant == "v1":
            bit = lane // WORDS
            a = ((rep >> bit) & 1).astype(jnp.bfloat16)
        elif variant == "v2":
            shl = 31 - lane // WORDS
            a = jnp.where(
                (rep << shl) < 0,
                jnp.bfloat16(1),
                jnp.bfloat16(0),
            )
        elif variant == "v3":
            a = rep.astype(jnp.bfloat16)  # WRONG math: timing floor only
        else:
            raise ValueError(variant)

        @pl.when(fi_ref[t] == 1)
        def _():
            acc[:] = jnp.zeros_like(acc)

        acc[:] += jnp.dot(
            a, win[slot].astype(jnp.bfloat16), preferred_element_type=jnp.float32
        )
        nxt = db_ref[jnp.minimum(t + 1, nt - 1)]
        last = jnp.logical_or(t + 1 == nt, nxt != db_ref[t])

        @pl.when(last)
        def _():
            out_ref[:] = acc[:].astype(out_ref.dtype)

    return kernel


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--f", type=int, default=640)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if not os.path.exists(CACHE + ".npz"):
        raise SystemExit(f"run `python bench.py` once to build {CACHE}.npz")
    lay = block_layout(np.zeros(0, np.int32), np.zeros(0, np.int32),
                       232965, min_edges=192, cache_key=CACHE)
    dev = lay.to_device()
    t = dev.masks.shape[0]
    n_pad = lay.n_pad
    f = args.f
    rng = np.random.default_rng(0)
    h = jnp.asarray(rng.normal(size=(n_pad, f)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    print(f"tiles={t} n_pad={n_pad} f={f}")

    for variant in ("v0", "v1", "v2", "v3"):
        kern = make_run(variant, f)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(t,),
            in_specs=[
                pl.BlockSpec((1, BD, WORDS), lambda i, ss, fi, db: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec(
                (BD, f), lambda i, ss, fi, db: (db[i], 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((2, BS, f), h.dtype),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.VMEM((BD, f), jnp.float32),
            ],
        )
        call = pl.pallas_call(
            kern, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n_pad, f), h.dtype),
        )

        # chain the passes so nothing can be elided/cached away: each
        # iteration aggregates the previous output (square graph)
        @jax.jit
        def fn(ss, fi, db, m, hh):
            return jax.lax.fori_loop(
                0, args.iters, lambda k, cur: call(ss, fi, db, m, cur), hh
            )

        try:
            # NB over the axon tunnel block_until_ready is not a sync point;
            # only a literal readback forces completion (same as
            # microbench_gather.time_fn)
            out = fn(dev.src_start, dev.is_first, dev.dst_blk, dev.masks, h)
            _ = float(jnp.asarray(out).astype(jnp.float32)[:4, :4].sum())
            t0 = time.perf_counter()
            out = fn(dev.src_start, dev.is_first, dev.dst_blk, dev.masks, h)
            _ = float(jnp.asarray(out).astype(jnp.float32)[:4, :4].sum())
            dt = (time.perf_counter() - t0) / args.iters
            print(f"{variant}: {dt*1e3:8.2f} ms/pass  ({dt/t*1e6:.2f} us/tile)")
        except Exception as e:
            print(f"{variant}: FAILED: {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
