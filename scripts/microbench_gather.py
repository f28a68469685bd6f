"""Microbench: Mosaic tpu.dynamic_gather vs XLA row gather (real chip).

Decides whether a Pallas band-ELL kernel can beat the XLA gather's
~17 ns/row descriptor floor (EXPERIMENTS.md): `jnp.take_along_axis`
inside a Pallas kernel lowers to `tpu.dynamic_gather` (jax
_src/pallas/mosaic/lowering.py:2464-2525), a VPU-side reindex of a
VMEM-resident window — no per-row DMA descriptors. If the full-depth
[4096, f] form lowers and runs fast, the ELL tail (the headline's
dominant cost on the unique-edge graph) can ride it.

All timings inside ONE jit (lax.fori_loop) — the axon tunnel costs
~28 ms per dispatch, which would swamp microsecond kernels.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from adaqp_tpu.utils.compilation_cache import enable_compilation_cache

enable_compilation_cache()

R, F = 4096, 256
ITERS = 200


def time_fn(fn, *args):
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    _ = float(jnp.asarray(out).astype(jnp.float32).sum())  # force readback
    t0 = time.perf_counter()
    out = jax.jit(fn)(*args)
    _ = float(jnp.asarray(out).astype(jnp.float32).sum())
    return (time.perf_counter() - t0) / ITERS


def main():
    from jax.experimental import pallas as pl

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(R, F)).astype(np.float32))
    xb = x.astype(jnp.bfloat16)
    idx_rows = jnp.asarray(rng.integers(0, R, R).astype(np.int32))
    idx_full = jnp.broadcast_to(idx_rows[:, None], (R, F))

    # --- XLA row-gather baseline (the current ELL path's primitive)
    def xla_gather(x, i):
        def body(k, acc):
            return acc + x[i]
        return jax.lax.fori_loop(0, ITERS, body, jnp.zeros_like(x))

    t = time_fn(xla_gather, x, idx_rows)
    print(f"XLA row gather      [{R},{F}] f32 : {t*1e6:8.1f} us/iter "
          f"({t/R*1e9:.1f} ns/row)")

    # --- Pallas dynamic_gather (VMEM window reindex)
    def mk_kernel(iters):
        def kern(x_ref, idx_ref, o_ref):
            x = x_ref[...]
            idx = idx_ref[...]

            def body(k, acc):
                return acc + jnp.take_along_axis(x, idx, axis=0)

            o_ref[...] = jax.lax.fori_loop(0, iters, body, jnp.zeros_like(x))
        return kern

    for name, xx in (("f32", x), ("bf16", xb)):
        try:
            fn = pl.pallas_call(
                mk_kernel(ITERS),
                out_shape=jax.ShapeDtypeStruct((R, F), xx.dtype),
            )
            t = time_fn(lambda a, b: fn(a, b), xx, idx_full)
            # correctness (single iteration)
            one = pl.pallas_call(
                mk_kernel(1), out_shape=jax.ShapeDtypeStruct((R, F), xx.dtype)
            )(xx, idx_full)
            ref = np.take_along_axis(np.asarray(xx, np.float32),
                                     np.asarray(idx_full), 0)
            ok = np.allclose(np.asarray(one, np.float32), ref, atol=1e-2)
            print(f"pallas dyn_gather   [{R},{F}] {name:4s}: {t*1e6:8.1f} us/iter "
                  f"({t/R*1e9:.1f} ns/row) correct={ok}")
        except Exception as e:
            print(f"pallas dyn_gather {name}: FAILED TO LOWER/RUN: "
                  f"{type(e).__name__}: {str(e)[:300]}")

    # --- smaller depth variants (if full depth fails, find the limit)
    for depth in (8, 256, 1024):
        try:
            xx = x[:depth]
            ii = jnp.broadcast_to(
                jnp.asarray(rng.integers(0, depth, depth).astype(np.int32))[:, None],
                (depth, F),
            )
            fn = pl.pallas_call(
                mk_kernel(ITERS),
                out_shape=jax.ShapeDtypeStruct((depth, F), jnp.float32),
            )
            t = time_fn(lambda a, b: fn(a, b), xx, ii)
            print(f"pallas dyn_gather   [{depth},{F}] f32 : {t*1e6:8.1f} us/iter "
                  f"({t/depth*1e9:.1f} ns/row)")
        except Exception as e:
            print(f"pallas dyn_gather depth={depth}: FAILED: {str(e)[:160]}")


if __name__ == "__main__":
    main()
