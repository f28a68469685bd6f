"""Pallas TPU kernels for stochastic message quantization.

Fused per-row-block: min/max reduction -> scale -> hardware-PRNG stochastic
rounding -> uint8 codes, in one VMEM pass (the TPU replacement for the
reference's ``quant_cuda.pack_single_precision`` CUDA kernel,
``src/quantization_cuda_kernel.cu:35-103``; Philox RNG becomes the TPU
per-core PRNG via ``pltpu.prng_random_bits``).

Semantics are identical to the portable jnp path in ``quant.py`` (same
``scale = (2^b-1)/(rmax-rmin)``, same ``floor(y + u)`` stochastic rounding);
only the random stream differs. Sub-byte bit-packing happens outside the
kernel in XLA (``quant.pack_rows``) — the packed stream's byte count is tiny
relative to the f32 input, so the extra HBM pass is noise; keeping packing in
XLA lets it fuse with the all-to-all staging copy.

Row blocks of 256 keep uint8 tiles aligned (int8 min tile is (32, 128));
callers pad N to a multiple of the block.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROW_BLOCK = 256
_RANGE_EPS = 1e-10


def _quant_kernel(bits: int, f_true: int, seed_ref, x_ref, q_ref, scale_ref, rmin_ref):
    # Decorrelate blocks by passing the grid position as a second seed word
    # (the TPU PRNG hashes all seed words; adjacent integer seeds would
    # otherwise yield correlated streams).
    pltpu.prng_seed(seed_ref[0], pl.program_id(0))
    x = x_ref[:].astype(jnp.float32)
    if f_true < x.shape[1]:
        # mask layout-padding columns out of the range (see quant._row_minmax)
        col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1) < f_true
        rmin = jnp.min(jnp.where(col, x, jnp.inf), axis=1, keepdims=True)
        rmax = jnp.max(jnp.where(col, x, -jnp.inf), axis=1, keepdims=True)
    else:
        rmin = jnp.min(x, axis=1, keepdims=True)
        rmax = jnp.max(x, axis=1, keepdims=True)
    scale = (2.0**bits - 1.0) / jnp.maximum(rmax - rmin, _RANGE_EPS)
    y = (x - rmin) * scale
    rb = pltpu.bitcast(pltpu.prng_random_bits(x.shape), jnp.int32)
    # Low 24 bits -> uniform in [0, 1) with full f32 mantissa coverage
    # (int32 path: Mosaic has no uint32->f32 cast).
    u = (rb & jnp.int32(0xFFFFFF)).astype(jnp.float32) * (1.0 / (1 << 24))
    q = jnp.clip(jnp.floor(y + u), 0.0, 2.0**bits - 1.0)
    # Mosaic lacks direct f32->u8 casts; hop through int32.
    q_ref[:] = q.astype(jnp.int32).astype(jnp.uint8)
    scale_ref[:] = scale
    rmin_ref[:] = rmin


@functools.partial(jax.jit, static_argnames=("bits", "interpret", "f_true"))
def quantize_rows_tpu(
    x: jnp.ndarray,
    bits: int,
    seed: jnp.ndarray,
    interpret: bool = False,
    f_true: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Quantize rows of ``x`` [N, F] (N % ROW_BLOCK == 0).

    Returns ``(q uint8 [N, F], scale f32 [N], rmin f32 [N])`` — same contract
    as ``quant.quantize_rows`` (incl. ``f_true`` range masking) but seeded by
    an int32 scalar (TPU hardware PRNG) instead of a jax PRNG key.
    """
    n, f = x.shape
    if n % ROW_BLOCK:
        raise ValueError(f"row count {n} must be a multiple of {ROW_BLOCK}")
    grid = (n // ROW_BLOCK,)
    seed_arr = jnp.asarray(seed, dtype=jnp.int32).reshape(1)
    q, scale, rmin = pl.pallas_call(
        functools.partial(_quant_kernel, bits, f if f_true is None else f_true),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((ROW_BLOCK, f), lambda i, s: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((ROW_BLOCK, f), lambda i, s: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((ROW_BLOCK, 1), lambda i, s: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((ROW_BLOCK, 1), lambda i, s: (i, 0), memory_space=pltpu.VMEM),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((n, f), jnp.uint8),
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
        ],
        interpret=interpret,
    )(seed_arr, x)
    return q, scale[:, 0], rmin[:, 0]


def _quant_pack_kernel(
    bits: int, f_true: int, f_wire: int, seed_ref, x_ref, w_ref, scale_ref,
    rmin_ref,
):
    """Fused quantize + word-pack: f32 rows -> u32 wire words in one VMEM
    pass. The word-interleaved layout (``quant.pack_words``) makes each
    in-word slot a CONTIGUOUS lane slice of the code matrix, so packing is
    m shift-or'd slices — the u8 code matrix never exists in HBM (the
    separate u8->u32 bitcast path cost ~100 ms/exchange at the 1.86M-row
    products boundary: a (32,128)->(8,128) tile relayout over 186 MB)."""
    pltpu.prng_seed(seed_ref[0], pl.program_id(0))
    x = x_ref[:].astype(jnp.float32)
    if f_true < x.shape[1]:
        col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1) < f_true
        rmin = jnp.min(jnp.where(col, x, jnp.inf), axis=1, keepdims=True)
        rmax = jnp.max(jnp.where(col, x, -jnp.inf), axis=1, keepdims=True)
    else:
        rmin = jnp.min(x, axis=1, keepdims=True)
        rmax = jnp.max(x, axis=1, keepdims=True)
    scale = (2.0**bits - 1.0) / jnp.maximum(rmax - rmin, _RANGE_EPS)
    y = (x - rmin) * scale
    rb = pltpu.bitcast(pltpu.prng_random_bits(x.shape), jnp.int32)
    u = (rb & jnp.int32(0xFFFFFF)).astype(jnp.float32) * (1.0 / (1 << 24))
    q = jnp.clip(jnp.floor(y + u), 0.0, 2.0**bits - 1.0).astype(jnp.int32)
    m = 32 // bits
    wpr = f_wire // m
    # PRE-shift every code by its in-word bit offset (elementwise, iota on
    # the full block), then OR the m un-shifted slot slices. Shifting the
    # SLICES instead (`q[:, t*wpr:..] << bits*t`) mis-lowers in Mosaic for
    # row blocks > 8: contributions to bits 16..22 of the word are dropped
    # unless bit 23 is set (observed on v5e at RB>=64, any bits; fine at
    # RB=8) — shift-of-unaligned-slice across multiple sublane vregs is
    # the trigger, so keep shifts full-width and slices shift-free.
    col = jax.lax.broadcasted_iota(jnp.int32, q.shape, 1)
    qs = q << (jnp.int32(bits) * jnp.clip(col // wpr, 0, m - 1))
    w = qs[:, 0:wpr]
    for t in range(1, m):
        w = w | qs[:, t * wpr : (t + 1) * wpr]
    w_ref[:] = pltpu.bitcast(w, jnp.uint32)
    scale_ref[:] = scale
    rmin_ref[:] = rmin


@functools.partial(
    jax.jit, static_argnames=("bits", "f_wire", "interpret", "f_true")
)
def quantize_pack_rows_tpu(
    x: jnp.ndarray,
    bits: int,
    seed: jnp.ndarray,
    f_wire: int,
    interpret: bool = False,
    f_true: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Quantize + pack rows of ``x`` [N, F] (N % ROW_BLOCK == 0) into the
    word-interleaved wire format.

    Returns ``(words u32 [N, f_wire*bits/32], scale f32 [N], rmin f32 [N])``
    — ``words`` equals ``quant.pack_words(q[:, :f_wire], bits)`` for the
    codes ``q`` this kernel's PRNG stream draws (same stream as
    :func:`quantize_rows_tpu`)."""
    n, f = x.shape
    m = 32 // bits
    if f_wire % m or f_wire > f:
        raise ValueError(f"f_wire={f_wire} invalid for bits={bits}, F={f}")
    wpr = f_wire * bits // 32
    rb = ROW_BLOCK
    if n % rb:
        raise ValueError(f"row count {n} must be a multiple of {rb}")
    grid = (n // rb,)
    w_block = (rb, wpr)
    w_shape = (n, wpr)
    seed_arr = jnp.asarray(seed, dtype=jnp.int32).reshape(1)
    w, scale, rmin = pl.pallas_call(
        functools.partial(
            _quant_pack_kernel, bits, f if f_true is None else f_true, f_wire
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((rb, f), lambda i, s: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec(w_block, lambda i, s: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((rb, 1), lambda i, s: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((rb, 1), lambda i, s: (i, 0), memory_space=pltpu.VMEM),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct(w_shape, jnp.uint32),
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
        ],
        interpret=interpret,
    )(seed_arr, x)
    return w, scale[:, 0], rmin[:, 0]


def _unpack_dequant_kernel(
    bits: int, f_true: int, f_wire: int, f_pad: int, w_ref, scale_ref,
    rmin_ref, out_ref
):
    """Fused word-unpack + dequantize: u32 wire words -> f32 rows, columns
    >= f_true zeroed, zero-padded to f_pad. Arithmetic-shift-then-mask is
    exact for every slot (the mask strips sign-extension bits)."""
    w = pltpu.bitcast(w_ref[:], jnp.int32)
    scale = scale_ref[:].astype(jnp.float32)
    rmin = rmin_ref[:].astype(jnp.float32)
    m = 32 // bits
    wpr = f_wire // m
    mask = jnp.int32(2**bits - 1)
    cols = []
    for t in range(m):
        qt = (w >> jnp.int32(bits * t)) & mask
        xt = qt.astype(jnp.float32) / scale + rmin
        if f_true < (t + 1) * wpr:
            col = jax.lax.broadcasted_iota(jnp.int32, xt.shape, 1) + (t * wpr)
            xt = jnp.where(col < f_true, xt, 0.0)
        cols.append(xt)
    out = jnp.concatenate(cols, axis=1)
    if f_wire < f_pad:
        out = jnp.pad(out, ((0, 0), (0, f_pad - f_wire)))
    out_ref[:] = out


@functools.partial(
    jax.jit, static_argnames=("bits", "f_true", "f_wire", "f_pad", "interpret")
)
def unpack_dequantize_rows_tpu(
    w: jnp.ndarray,
    scale: jnp.ndarray,
    rmin: jnp.ndarray,
    bits: int,
    f_true: int,
    f_wire: int,
    f_pad: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """(u32 words [N, wpr], f32 scale/rmin [N]) -> f32 rows [N, f_pad].

    Inverse of :func:`quantize_pack_rows_tpu` + the portable dequant
    semantics (``x = q/scale + rmin``, cols >= f_true zeroed)."""
    wpr = f_wire * bits // 32
    n = w.shape[0]
    if w.shape[1] != wpr:
        raise ValueError(f"f_wire={f_wire} inconsistent with wpr={w.shape[1]}")
    rb = ROW_BLOCK
    if n % rb:
        raise ValueError(f"row count {n} must be a multiple of {rb}")
    grid = (n // rb,)
    w_block = (rb, wpr)
    return pl.pallas_call(
        functools.partial(
            _unpack_dequant_kernel, bits, f_true, f_wire, f_pad
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(w_block, lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rb, f_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, f_pad), jnp.float32),
        interpret=interpret,
    )(w, scale.reshape(n, 1), rmin.reshape(n, 1))


def _dequant_kernel(q_ref, scale_ref, rmin_ref, out_ref):
    scale = scale_ref[:].astype(jnp.float32)
    rmin = rmin_ref[:].astype(jnp.float32)
    # u8 -> i32 -> f32 (Mosaic lacks direct u8->f32 casts)
    out_ref[:] = q_ref[:].astype(jnp.int32).astype(jnp.float32) / scale + rmin


@functools.partial(jax.jit, static_argnames=("interpret",))
def dequantize_rows_tpu(
    q: jnp.ndarray, scale: jnp.ndarray, rmin: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """Dequantize uint8 codes [N, F] with per-row (scale, rmin) -> f32 [N, F].

    TPU replacement for ``quant_cuda.unpack_single_precision``'s dequant step
    (``quantization_cuda_kernel.cu:107-122``).
    """
    n, f = q.shape
    if n % ROW_BLOCK:
        raise ValueError(f"row count {n} must be a multiple of {ROW_BLOCK}")
    grid = (n // ROW_BLOCK,)
    return pl.pallas_call(
        _dequant_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((ROW_BLOCK, f), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ROW_BLOCK, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ROW_BLOCK, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ROW_BLOCK, f), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, f), jnp.float32),
        interpret=interpret,
    )(q, scale.reshape(n, 1), rmin.reshape(n, 1))
