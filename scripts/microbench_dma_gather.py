"""Microbench: pipelined-DMA Pallas row gather vs the XLA gather floor.

Round-2 measured the ELL tail's XLA row gather at ~17-34 ns/row
(descriptor-bound) and a SERIAL Pallas per-row-DMA loop at 61 ns/row; the
untried formulation (round-2 VERDICT missing #2) keeps N row DMAs in
flight over a ring of semaphores.

Mosaic constraint discovered on the way: DMA slices of a tiled HBM memref
must be tile-aligned — a [1, F] row slice of an (8,128)-tiled [N, F]
buffer cannot lower (f32 AND bf16 2-D tiles are 8 sublanes; 1-D memrefs
tile at 1024 elements). So the kernel DMAs the aligned 8-row tile group
containing the target row ([N/8, 8, F] view, dim-0 slices are legal) and
extracts the row with a VPU masked-reduce. 8x the wire bytes per row —
viable iff the XLA path is descriptor-bound, not bandwidth-bound.

Also sweeps index LOCALITY (uniform / sorted / banded) for the XLA
baseline: the gather cost turns out to depend strongly on DRAM row
locality, which the flat "17 ns/row" story ignored.

All timings inside ONE kernel invocation (iters passes over the chunk) —
the axon tunnel costs ~28 ms per dispatch.
"""
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
from adaqp_tpu.utils.compilation_cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

N = 233_472        # source rows (reddit-scale, /8 aligned)
CHUNK = 4096       # gathered rows per pass
ITERS = int(os.environ.get("DG_ITERS", "50"))
F = int(os.environ.get("DG_F", "256"))
GRP = 8            # sublane tile rows (f32 and bf16 both 8)


def time_call(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    _ = float(jnp.asarray(out).astype(jnp.float32)[:8, :8].sum())  # readback
    t0 = time.perf_counter()
    out = fn(*args)
    _ = float(jnp.asarray(out).astype(jnp.float32)[:8, :8].sum())
    return time.perf_counter() - t0


def mk_dma_gather(depth: int, iters: int, chunk: int, dtype):
    """out[j] = h[idx[j]] for j < chunk, repeated `iters` passes.

    h arrives as [N/GRP, GRP, F]; each DMA moves one aligned GRP-row tile
    into a ring slot; the target row is extracted by masked reduce and 8
    extracted rows are stored per aligned [8, F] block write.
    """
    total = iters * chunk  # rows; outer loop steps 8 rows at a time

    def kern(idx_ref, hbm_ref, o_ref, scratch, sems):
        def dma(k):
            slot = jax.lax.rem(k, depth)
            r = idx_ref[jax.lax.rem(k, chunk)]
            return pltpu.make_async_copy(
                hbm_ref.at[r // GRP], scratch.at[slot], sems.at[slot]
            )

        def warm(k, _):
            dma(k).start()
            return 0

        jax.lax.fori_loop(0, depth, warm, 0)

        sub = jax.lax.broadcasted_iota(jnp.int32, (GRP, F), 0)

        def body(k8, _):
            k = k8 * 8
            rows = []
            for b in range(8):  # unrolled: 8 waits+extracts+reissues
                kb = k + b
                dma(kb).wait()
                r = idx_ref[jax.lax.rem(kb, chunk)]
                tile = scratch[jax.lax.rem(kb, depth)]
                rows.append(
                    jnp.sum(
                        jnp.where(sub == r - (r // GRP) * GRP, tile, 0),
                        axis=0,
                        keepdims=True,
                    )
                )

                @pl.when(kb + depth < total)
                def _():
                    dma(kb + depth).start()

            j8 = jax.lax.rem(k8, chunk // 8)
            o_ref[pl.ds(pl.multiple_of(j8 * 8, 8), 8), :] = jnp.concatenate(
                rows, axis=0
            )
            return 0

        jax.lax.fori_loop(0, total // 8, body, 0)

    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((chunk, F), dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((depth, GRP, F), dtype),
            pltpu.SemaphoreType.DMA((depth,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )


def idx_variants(rng):
    uni = rng.integers(0, N, CHUNK).astype(np.int32)
    return {
        "uniform": uni,
        "sorted": np.sort(uni),
        "banded": (
            (np.arange(CHUNK) * (N // CHUNK)) + rng.integers(0, 1024, CHUNK)
        ).astype(np.int32) % N,
    }


def main():
    rng = np.random.default_rng(0)
    variants = idx_variants(rng)
    for name, dtype in (("bf16", jnp.bfloat16), ("f32", jnp.float32)):
        h = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32)).astype(dtype)
        h3 = h.reshape(N // GRP, GRP, F)

        def xla_gather(x, i):
            def body(k, acc):
                return acc + x[i]

            return jax.lax.fori_loop(
                0, ITERS, body, jnp.zeros((CHUNK, F), dtype)
            )

        for vname, vi in variants.items():
            t = time_call(jax.jit(xla_gather), h, jnp.asarray(vi))
            print(f"XLA gather {name} {vname:8s} [{CHUNK},{F}] of [{N}]: "
                  f"{t/(ITERS*CHUNK)*1e9:7.1f} ns/row")

        for vname in ("uniform", "banded"):
            vi = jnp.asarray(variants[vname])
            for depth in (4, 8, 16, 32, 64):
                try:
                    jfn = jax.jit(mk_dma_gather(depth, ITERS, CHUNK, dtype))
                    out = np.asarray(jfn(vi, h3).astype(jnp.float32))
                    want = np.asarray(h.astype(jnp.float32))[np.asarray(vi)]
                    ok = np.allclose(out, want)
                    t = time_call(jfn, vi, h3)
                    print(f"DMA tile-gather {name} {vname:8s} depth={depth:3d}: "
                          f"{t/(ITERS*CHUNK)*1e9:7.1f} ns/row  correct={ok}")
                except Exception as e:
                    print(f"DMA tile-gather {name} {vname} depth={depth}: "
                          f"FAILED {type(e).__name__}: {str(e)[:160]}")
        if os.environ.get("DG_F32", "0") != "1":
            break


if __name__ == "__main__":
    main()
