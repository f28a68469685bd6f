"""Stochastic integer message quantization (2/4/8-bit) — JAX reference path.

Semantics match the reference CUDA kernels
(``src/quantization_cuda_kernel.cu:35-122`` via ``AdaQP/model/op_util.py:20-83``):

- per-ROW (per boundary node) ``rmin``/``rmax`` over the feature axis
  (``op_util.py:20-22``);
- ``scale = (2**bits - 1) / (rmax - rmin)`` (``op_util.py:36-38``);
- stochastic rounding ``q = clip(floor((x - rmin) * scale + u), 0, 2**bits-1)``
  with ``u ~ Uniform[0,1)`` — distributionally identical to the reference's
  ``round_nearest((x-rmin)*scale + u - 0.5)`` (``quantization_cuda_kernel.cu:47-48``)
  and unbiased: ``E[dequant(q)] == x``;
- dequantize ``x_hat = q / scale + rmin`` (``quantization_cuda_kernel.cu:107-122``);
- (scale, rmin) travel on the wire as bfloat16 params (``op_util.py:69-83``).

Wire layout — deliberately DIFFERENT from the reference. The CUDA kernel packs
``8/bits`` consecutive *rows* into one output byte per feature column
(``quantization_cuda_kernel.cu:59-64``), which couples rows and forces
row-count round-up. Here we pack ``8/bits`` consecutive *feature columns*
into one byte, so every row owns a contiguous ``F*bits/8``-byte slice of the
wire stream: rows stay independent (per-peer / per-bit-bucket row ranges are
contiguous byte ranges), and the lane-major layout is what the TPU VPU wants.
Features are padded to a multiple of ``values_per_byte(bits)``.

This module is the portable jnp implementation (runs on CPU test meshes and
inside ``shard_map``). The fused Pallas TPU kernels live in
``quant_pallas.py``; both obey the same semantics.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..common.types import BITS_SET

# Guard against zero dynamic range (constant rows). The reference divides by
# (rmax - rmin) unguarded (op_util.py:36-38); we clamp to keep jit-safe.
RANGE_EPS = 1e-10


def values_per_byte(bits: int) -> int:
    if bits not in BITS_SET:
        raise ValueError(f"bits must be one of {BITS_SET}, got {bits}")
    return 8 // bits


def pad_features(f: int, bits: int = 2) -> int:
    """Smallest F' >= f divisible by values_per_byte(bits).

    Padding to a multiple of 4 satisfies every bit-width in BITS_SET.
    """
    m = values_per_byte(bits)
    return -(-f // m) * m


def bytes_per_row(f_pad: int, bits: int) -> int:
    """Packed wire bytes per row (reference analog: get_qsize,
    AdaQP/communicator/buffer.py:181-186)."""
    m = values_per_byte(bits)
    if f_pad % m:
        raise ValueError(f"f_pad={f_pad} not divisible by {m} for bits={bits}")
    return f_pad * bits // 8


def _row_minmax(
    x: jnp.ndarray, f_true: Optional[int] = None
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-row min/max (reference: compute_minmax_params, op_util.py:20-22).

    ``f_true``: number of VALID feature columns; columns beyond it are
    zero padding and must not poison the range (the reference quantizes
    exact F, ``op_util.py:20-22`` — an all-positive row would otherwise get
    rmin dragged to 0 by the pad zeros, widening the step).
    """
    f = x.shape[-1]
    if f_true is not None and f_true < f:
        col = jnp.arange(f) < f_true
        rmin = jnp.min(jnp.where(col, x, jnp.inf), axis=-1)
        rmax = jnp.max(jnp.where(col, x, -jnp.inf), axis=-1)
        return rmin, rmax
    return jnp.min(x, axis=-1), jnp.max(x, axis=-1)


@partial(jax.jit, static_argnames=("bits", "stochastic", "f_true"))
def quantize_rows(
    x: jnp.ndarray,
    bits: int,
    key: jax.Array,
    stochastic: bool = True,
    f_true: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Quantize rows of ``x`` [N, F] to unpacked uint8 codes.

    Returns ``(q uint8 [N, F], scale f32 [N], rmin f32 [N])``. Codes in
    columns >= ``f_true`` are garbage (their range is unconstrained); callers
    must drop or zero them after dequantization.
    """
    x = x.astype(jnp.float32)
    rmin, rmax = _row_minmax(x, f_true)
    scale = (2.0**bits - 1.0) / jnp.maximum(rmax - rmin, RANGE_EPS)
    y = (x - rmin[:, None]) * scale[:, None]
    if stochastic:
        u = jax.random.uniform(key, x.shape, dtype=jnp.float32)
        q = jnp.floor(y + u)
    else:
        q = jnp.round(y)
    q = jnp.clip(q, 0.0, 2.0**bits - 1.0).astype(jnp.uint8)
    return q, scale, rmin


@partial(jax.jit, static_argnames=("bits",))
def dequantize_rows(q: jnp.ndarray, scale: jnp.ndarray, rmin: jnp.ndarray, bits: int) -> jnp.ndarray:
    """Inverse of :func:`quantize_rows`: ``x_hat = q / scale + rmin`` (f32 [N, F])."""
    del bits  # layout-independent once unpacked
    return q.astype(jnp.float32) / scale[:, None].astype(jnp.float32) + rmin[
        :, None
    ].astype(jnp.float32)


@partial(jax.jit, static_argnames=("bits",))
def pack_rows(q: jnp.ndarray, bits: int) -> jnp.ndarray:
    """Pack uint8 codes [N, F_pad] into the wire stream uint8 [N, F_pad*bits/8].

    Column-packed: byte ``j`` of row ``n`` holds codes
    ``q[n, j*m : (j+1)*m]`` with code ``k`` at bit offset ``k*bits``
    (``m = 8//bits``).
    """
    m = values_per_byte(bits)
    n, f_pad = q.shape
    if f_pad % m:
        raise ValueError(f"feature dim {f_pad} not padded for bits={bits}")
    if bits == 8:
        return q
    g = q.reshape(n, f_pad // m, m).astype(jnp.uint32)
    shifts = (jnp.arange(m, dtype=jnp.uint32) * bits)[None, None, :]
    return (g << shifts).sum(axis=-1).astype(jnp.uint8)


@partial(jax.jit, static_argnames=("bits", "f_pad"))
def unpack_rows(p: jnp.ndarray, bits: int, f_pad: int) -> jnp.ndarray:
    """Unpack wire stream uint8 [N, F_pad*bits/8] back to codes uint8 [N, F_pad]."""
    m = values_per_byte(bits)
    if bits == 8:
        return p
    n = p.shape[0]
    shifts = (jnp.arange(m, dtype=jnp.uint32) * bits)[None, None, :]
    mask = jnp.uint32(2**bits - 1)
    g = (p[..., None].astype(jnp.uint32) >> shifts) & mask
    return g.reshape(n, f_pad).astype(jnp.uint8)


@partial(jax.jit, static_argnames=("bits",))
def pack_words(q: jnp.ndarray, bits: int) -> jnp.ndarray:
    """Pack uint8 codes [N, F_wire] into u32 wire WORDS [N, F_wire*bits/32].

    Word-interleaved layout (the ragged wire's native format): word ``j`` of
    a row holds the codes of feature columns ``{t*wpr + j : t in [0, m)}``
    (``m = 32//bits``, ``wpr = F_wire//m``), code ``t`` at bit offset
    ``t*bits``. Unlike the byte-packed form (:func:`pack_rows` + a u8->u32
    bitcast, whose (32,128)->(8,128) tile relayout costs ~100 ms at the
    products-scale boundary on TPU), every slot is a CONTIGUOUS [N, wpr]
    slice of the code matrix — shift-or over m slices, no byte relayout —
    and the same construction runs inside the fused Pallas kernel
    (``quant_pallas.quantize_pack_rows_tpu``).
    """
    m = 32 // bits
    n, fw = q.shape
    if fw % m:
        raise ValueError(f"feature dim {fw} not word-aligned for bits={bits}")
    g = q.astype(jnp.uint32).reshape(n, m, fw // m)
    shifts = (jnp.arange(m, dtype=jnp.uint32) * bits)[None, :, None]
    # slots occupy disjoint bit ranges: sum == bitwise-or
    return (g << shifts).sum(axis=1, dtype=jnp.uint32)


@partial(jax.jit, static_argnames=("bits", "f_wire"))
def unpack_words(w: jnp.ndarray, bits: int, f_wire: int) -> jnp.ndarray:
    """Inverse of :func:`pack_words`: u32 words [N, wpr] -> codes u8 [N, F_wire]."""
    m = 32 // bits
    n = w.shape[0]
    shifts = (jnp.arange(m, dtype=jnp.uint32) * bits)[None, :, None]
    mask = jnp.uint32(2**bits - 1)
    g = (w[:, None, :] >> shifts) & mask  # [N, m, wpr]
    return g.reshape(n, f_wire).astype(jnp.uint8)


@partial(jax.jit, static_argnames=("bits", "stochastic", "f_true"))
def message_quantize(
    x: jnp.ndarray,
    bits: int,
    key: jax.Array,
    stochastic: bool = True,
    f_true: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full send-side transform: rows [N, F_pad] -> (wire uint8
    [N, F_wire*bits/8], params bf16 [N, 2] = (scale, rmin)) where
    ``F_wire = pad_features(f_true)`` — only TRUE feature columns (rounded to
    the packing multiple) travel on the wire, matching the reference's exact-F
    quantization (``op_util.py:20-22``).

    Reference analog: message_quantization (op_util.py:69-76).
    """
    f_pad = x.shape[-1]
    ft = f_pad if f_true is None else f_true
    q, scale, rmin = quantize_rows(x, bits, key, stochastic, ft)
    f_wire = pad_features(ft)
    if f_wire <= f_pad:
        q = q[:, :f_wire]
    else:  # stored width itself not packing-aligned: pad codes with zeros
        q = jnp.pad(q, ((0, 0), (0, f_wire - f_pad)))
    packed = pack_rows(q, bits)
    params = jnp.stack([scale, rmin], axis=-1).astype(jnp.bfloat16)
    return packed, params


@partial(jax.jit, static_argnames=("bits", "f_pad", "f_true"))
def message_dequantize(
    packed: jnp.ndarray,
    params: jnp.ndarray,
    bits: int,
    f_pad: int,
    f_true: Optional[int] = None,
) -> jnp.ndarray:
    """Recv-side transform: (wire, bf16 params) -> f32 rows [N, F_pad].

    Columns >= ``f_true`` are zeroed (they are layout padding, absent from
    the wire). Reference analog: message_dequantization (op_util.py:78-83).
    """
    ft = f_pad if f_true is None else f_true
    f_wire = pad_features(ft)
    q = unpack_rows(packed, bits, f_wire)
    scale = params[:, 0].astype(jnp.float32)
    rmin = params[:, 1].astype(jnp.float32)
    x = q.astype(jnp.float32) / scale[:, None] + rmin[:, None]
    if ft < f_wire:
        x = jnp.where(jnp.arange(f_wire) < ft, x, 0.0)
    if f_wire < f_pad:
        x = jnp.pad(x, ((0, 0), (0, f_pad - f_wire)))
    elif f_wire > f_pad:
        x = x[:, :f_pad]
    return x
