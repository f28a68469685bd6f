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
import os
import sys
import time

import jax

# the axon plugin wins over the JAX_PLATFORMS env var alone; honor the env
# explicitly so CPU smoke runs don't touch the TPU tunnel
if os.environ.get("JAX_PLATFORMS"):
    try:
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    except Exception:
        pass

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from adaqp_tpu.utils.compilation_cache import enable_compilation_cache

enable_compilation_cache()

R, F = 4096, 256
ITERS = int(os.environ.get("GB_ITERS", "200"))
INTERPRET = bool(int(os.environ.get("GB_INTERPRET", "0")))


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
                out_shape=jax.ShapeDtypeStruct((R, F), xx.dtype), interpret=INTERPRET,
            )
            t = time_fn(lambda a, b: fn(a, b), xx, idx_full)
            # correctness (single iteration)
            one = pl.pallas_call(
                mk_kernel(1), out_shape=jax.ShapeDtypeStruct((R, F), xx.dtype), interpret=INTERPRET
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
                out_shape=jax.ShapeDtypeStruct((depth, F), jnp.float32), interpret=INTERPRET,
            )
            t = time_fn(lambda a, b: fn(a, b), xx, ii)
            print(f"pallas dyn_gather   [{depth},{F}] f32 : {t*1e6:8.1f} us/iter "
                  f"({t/depth*1e9:.1f} ns/row)")
        except Exception as e:
            print(f"pallas dyn_gather depth={depth}: FAILED: {str(e)[:160]}")

    # --- The compact-tile kernel's exact primitive: SQUARE window
    # permutation. Mosaic's gather lowering requires x/idx/out to share one
    # shape (lowering.py:2482-2493), so a group of 8 compact subtiles
    # gathers its 8x256 virtual columns as ONE [2048, F] take_along_axis
    # from the resident [2048, F] window. Probe both axes:
    #   axis=0 (sublane gather, window [2048, F] as stored today)
    #   axis=1 (lane gather, transposed window [F, 2048])
    # and both idx forms: prebuilt full [.., ..] (upper bound) vs built
    # in-kernel from a 1-D column list (what the real kernel must do).
    def mk_sq(iters, axis, inkernel_idx):
        def kern(x_ref, idx_ref, o_ref):
            xw = x_ref[...]
            if inkernel_idx:
                v = idx_ref[...]  # [1, D] i32
                if axis == 0:
                    idx = jnp.broadcast_to(v.reshape(-1, 1), xw.shape)
                else:
                    idx = jnp.broadcast_to(v, xw.shape)
            else:
                idx = idx_ref[...]

            def body(k, acc):
                return acc + jnp.take_along_axis(xw, idx, axis=axis)

            o_ref[...] = jax.lax.fori_loop(0, iters, body, jnp.zeros_like(xw))
        return kern

    D = 2048
    for ff in (256, 640):
        for axis in (0, 1):
            shape = (D, ff) if axis == 0 else (ff, D)
            xx = jnp.asarray(
                rng.normal(size=shape).astype(np.float32)
            ).astype(jnp.bfloat16)
            col = rng.integers(0, D, D).astype(np.int32)
            for inkernel, iname in ((False, "full-idx"), (True, "1d-idx")):
                if inkernel:
                    ii = jnp.asarray(col)[None, :]
                else:
                    ii = jnp.asarray(col)
                    ii = (
                        jnp.broadcast_to(ii[:, None], shape)
                        if axis == 0
                        else jnp.broadcast_to(ii[None, :], shape)
                    )
                try:
                    fn = pl.pallas_call(
                        mk_sq(ITERS, axis, inkernel),
                        out_shape=jax.ShapeDtypeStruct(shape, jnp.bfloat16),
                        interpret=INTERPRET,
                    )
                    t = time_fn(lambda a, b: fn(a, b), xx, ii)
                    one = pl.pallas_call(
                        mk_sq(1, axis, inkernel),
                        out_shape=jax.ShapeDtypeStruct(shape, jnp.bfloat16),
                        interpret=INTERPRET,
                    )(xx, ii)
                    ref = np.take_along_axis(
                        np.asarray(xx, np.float32),
                        np.broadcast_to(
                            col[:, None] if axis == 0 else col[None, :], shape
                        ),
                        axis,
                    )
                    ok = np.allclose(np.asarray(one, np.float32), ref, atol=1e-2)
                    print(
                        f"window perm ax={axis} {iname:8s} [{shape[0]},{shape[1]}] "
                        f"bf16: {t*1e6:8.2f} us/iter ({t/D*1e9:.2f} ns/vcol) "
                        f"correct={ok}"
                    )
                except Exception as e:
                    print(
                        f"window perm ax={axis} {iname} F={ff}: FAILED: "
                        f"{type(e).__name__}: {str(e)[:200]}"
                    )

    # --- XLA gather F sweep (descriptor- vs bandwidth-bound check at the
    # tail's real widths)
    for ff in (256, 640):
        xx = jnp.asarray(rng.normal(size=(R, ff)).astype(np.float32)
                         ).astype(jnp.bfloat16)
        t = time_fn(xla_gather, xx, idx_rows)
        print(f"XLA row gather      [{R},{ff}] bf16: {t*1e6:8.1f} us/iter "
              f"({t/R*1e9:.1f} ns/row)")

    # --- spmm_compact work-item cost, end to end (expand + [gather +
    # 8 narrow matmuls | one full-width matmul] into an f32 accumulator):
    # the model constants layout_census.py --group_model consumes
    from adaqp_tpu.ops.spmm_compact import BD, BS, CSUB, GROUP, WORDS
    from jax.experimental.pallas import tpu as pltpu

    def mk_item(iters, kind, fc):
        def kern(mask_ref, col_ref, win_ref, o_ref, acc):
            words = mask_ref[...]
            win = win_ref[...]

            def body(k, _):
                rep = pltpu.repeat(words.astype(jnp.int32), 16, axis=1)
                bit = jax.lax.broadcasted_iota(jnp.int32, (BD, BS), 1) // WORDS
                a = ((rep >> bit) & 1).astype(jnp.float32).astype(jnp.bfloat16)
                if kind == 0:
                    acc[pl.ds(0, BD), :] += jnp.dot(
                        a, win, preferred_element_type=jnp.float32
                    )
                else:
                    colv = col_ref[...]
                    idx = jnp.broadcast_to(colv.reshape(BS, 1), (BS, fc))
                    g = jnp.take_along_axis(win, idx, axis=0)
                    for s in range(GROUP):
                        acc[pl.ds(s % SBK * BD, BD), :] += jnp.dot(
                            a[:, s * CSUB : (s + 1) * CSUB],
                            g[s * CSUB : (s + 1) * CSUB, :],
                            preferred_element_type=jnp.float32,
                        )
                return 0

            jax.lax.fori_loop(0, iters, body, 0)
            o_ref[...] = acc[:].astype(jnp.bfloat16)
        return kern

    SBK = 8
    for fc in (256, 384):
        mask = jnp.asarray(
            rng.integers(0, 1 << 16, (BD, WORDS)).astype(np.uint16).view(np.int16)
        )
        col = jnp.asarray(
            rng.integers(0, BS, BS).astype(np.int32).reshape(16, 128)
        )
        win = jnp.asarray(
            rng.normal(size=(BS, fc)).astype(np.float32)
        ).astype(jnp.bfloat16)
        for kind, name in ((0, "full"), (1, "group")):
            try:
                fn = pl.pallas_call(
                    mk_item(ITERS, kind, fc),
                    out_shape=jax.ShapeDtypeStruct((SBK * BD, fc), jnp.bfloat16),
                    scratch_shapes=[
                        pltpu.VMEM((SBK * BD, fc), jnp.float32)
                    ],
                    interpret=INTERPRET,
                )
                t = time_fn(lambda a, b, c: fn(a, b, c), mask, col, win)
                print(f"compact {name}-item  fc={fc}: {t*1e6:8.2f} us/item")
            except Exception as e:
                print(f"compact {name}-item fc={fc}: FAILED: "
                      f"{type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
