"""Round-5 chip probes for the wire-compute redesign.

1. Mosaic in-kernel transpose: can a Pallas kernel emit (rb, wpr) u32 as
   a (wpr, rb) block (plane-major wire stream, no lane padding)?
2. Scatter-add cost: random vs destination-sorted indices (the bwd unpack
   term) — does `indices_are_sorted` + locality buy anything on TPU?
3. Per-plane 1-D DUS: wpr small dynamic-update-slices per slot vs one 2-D
   DUS on the lane-padded [rows, wpr] view.

Run: python scripts/probe_r5.py   (needs the chip)
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from adaqp_tpu.utils.compilation_cache import enable_compilation_cache

enable_compilation_cache()

N = 1_857_024  # ~products boundary rows (multiple of 1024)
OUT = 1_857_024
REPS = 6


def log(*a):
    print(*a, flush=True)


def timeit(body, *args):
    @functools.partial(jax.jit, static_argnums=0)
    def loop(iters, *a):
        def f(i, c):
            return c + body(i, *a).sum(dtype=jnp.float32)
        return lax.fori_loop(0, iters, f, jnp.zeros((), jnp.float32))

    def run(iters):
        ts = []
        _ = float(loop(iters, *args))
        for _ in range(REPS):
            t0 = time.perf_counter()
            _ = float(loop(iters, *args))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t2, t10 = run(2), run(10)
    return (t10 - t2) / 8 * 1e3


def probe_transpose():
    rb, wpr = 1024, 25

    def kern(x_ref, o_ref):
        o_ref[:] = x_ref[:].T

    x = jnp.arange(4 * rb * wpr, dtype=jnp.uint32).reshape(4 * rb, wpr)
    try:
        out = pl.pallas_call(
            kern,
            grid=(4,),
            in_specs=[pl.BlockSpec((rb, wpr), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((wpr, rb), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((wpr, 4 * rb), jnp.uint32),
        )(x)
        ok = np.array_equal(np.asarray(out), np.asarray(x).T)
        log(f"transpose kernel (rb={rb}, wpr={wpr}): ok={ok}")
    except Exception as e:
        log(f"transpose kernel: UNSUPPORTED -> {repr(e)[:300]}")


def probe_scatter():
    rng = np.random.default_rng(0)
    rows = jnp.asarray(rng.normal(size=(N, 128)).astype(np.float32))
    idx_r = rng.integers(0, OUT, N).astype(np.int32)
    idx_s = np.sort(idx_r)
    for name, idx, hint in (("rand", idx_r, False), ("sorted", idx_s, False),
                            ("sorted+hint", idx_s, True)):
        ix = jnp.asarray(idx)

        def body(i, r, ix, hint=hint):
            tgt = jnp.zeros((OUT, 128), jnp.float32)
            r = r + i.astype(jnp.float32) * 1e-30
            if hint:
                d = jax.lax.scatter_add(
                    tgt, ix[:, None], r,
                    jax.lax.ScatterDimensionNumbers(
                        update_window_dims=(1,), inserted_window_dims=(0,),
                        scatter_dims_to_operand_dims=(0,)),
                    indices_are_sorted=True, unique_indices=False,
                )
            else:
                d = tgt.at[ix].add(r, mode="drop")
            return d[:8]

        t = timeit(body, rows, ix)
        log(f"scatter-add f32 [N,128] {name:12s} {t:8.2f} ms")
    # gather+set baseline (fwd form)
    inv = rng.permutation(OUT).astype(np.int32)

    def gbody(i, r, ix):
        return r[(ix + i) % N]

    t = timeit(gbody, rows, jnp.asarray(inv))
    log(f"gather      f32 [N,128] perm   {t:8.2f} ms")


def probe_plane_dus():
    rng = np.random.default_rng(0)
    wpr, cnt, k1 = 25, 265_216, 7
    sbcap = 56_000_000
    words2 = jnp.asarray(
        rng.integers(0, 2**31, (k1 * cnt, wpr), dtype=np.int64).astype(np.uint32))
    wordsT = jnp.asarray(np.asarray(words2).T.copy())  # [wpr, k1*cnt]
    bases = (np.arange(k1) * (cnt * (wpr + 1) + 512)).astype(np.int32)

    def dus2d(i, w2):
        w2 = w2 ^ i.astype(jnp.uint32)
        buf = jnp.zeros((sbcap,), jnp.uint32)
        for j in range(k1):
            blk = lax.dynamic_slice(w2, (j * cnt, 0), (cnt, wpr))
            b2 = buf.reshape(-1, wpr)
            b2 = lax.dynamic_update_slice(b2, blk, (bases[j] // wpr, 0))
            buf = b2.reshape(-1)
        return buf[:8]

    t = timeit(dus2d, words2)
    log(f"DUS 2-D [*,{wpr}] view        {t:8.2f} ms")

    def dusplane(i, wT):
        wT = wT ^ i.astype(jnp.uint32)
        buf = jnp.zeros((sbcap,), jnp.uint32)
        for j in range(k1):
            for c in range(wpr):
                blk = lax.dynamic_slice(wT, (c, j * cnt), (1, cnt))[0]
                buf = lax.dynamic_update_slice_in_dim(
                    buf, blk, bases[j] + c * cnt, 0)
        return buf[:8]

    t = timeit(dusplane, wordsT)
    log(f"DUS per-plane 1-D ({k1 * wpr} ops) {t:8.2f} ms")

    def slice2d(i, buf):
        buf = buf ^ i.astype(jnp.uint32)
        out = []
        for j in range(k1):
            out.append(lax.dynamic_slice(
                buf.reshape(-1, wpr), (bases[j] // wpr, 0), (cnt, wpr)))
        return jnp.concatenate(out, axis=0)

    buf0 = jnp.asarray(rng.integers(0, 2**31, sbcap, dtype=np.int64
                                    ).astype(np.uint32))
    t = timeit(slice2d, buf0)
    log(f"slices 2-D [*,{wpr}] view     {t:8.2f} ms")

    def sliceplane(i, buf):
        buf = buf ^ i.astype(jnp.uint32)
        planes = []
        for c in range(wpr):
            parts = [lax.dynamic_slice_in_dim(buf, bases[j] + c * cnt, cnt, 0)
                     for j in range(k1)]
            planes.append(jnp.concatenate(parts, 0))
        return jnp.stack(planes, 0)[:, :8]

    t = timeit(sliceplane, buf0)
    log(f"slices per-plane 1-D          {t:8.2f} ms")


def main():
    assert jax.devices()[0].platform == "tpu", "needs the chip"
    probe_transpose()
    probe_scatter()
    probe_plane_dus()


if __name__ == "__main__":
    main()
