"""Block-sparse BITMASK SpMM on the MXU — the TPU-native aggregation kernel.

The insight: neighbor aggregation ``out = A^T h`` with an unweighted (0/1)
adjacency is a matmul with a binary matrix. On TPU the MXU is ~1000x faster
than scatter/gather pipelines, so instead of edge-wise gathers we:

1. HOST: tile the adjacency into (BD=256 dst x BS=2048 src) blocks; every
   tile holding >= ``min_edges`` edges is packed as a BITMASK (BD x BS bits
   = 64 KB — 32x smaller than an int32 edge list at typical densities, and
   dense-matmul-ready). Leftover edges in sparse tiles go to the ELLPACK
   gather path (``spmm_fast``).
2. DEVICE (Pallas): for each tile, DMA the 2048-row source window
   HBM->VMEM (double-buffered), expand the bitmask to a bf16 0/1 matrix
   with VPU shifts (``pltpu.repeat`` + bit tests), and accumulate
   ``A_tile @ window`` on the MXU into the dst block (revisited output
   block, one flush per dst block).

GCN/SAGE normalizations are rank-1 row/col scalings applied outside the
kernel, so the unweighted kernel covers both models (``AdaQP/model/
ops.py:17-67`` semantics preserved end-to-end). Backward runs the same
kernel on the pre-built reverse-graph layout via ``jax.custom_vjp``
(the reference's bwd_graph aggregation, ``ops.py:83-95``).

Duplicate edges are not representable in a bitmask; layouts are built from
de-duplicated edge lists (all four reference datasets are simple graphs).
"""
from __future__ import annotations

import functools
import os
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .spmm_fast import EllDevice, EllLayout, _run_ell, ell_from_csr

BD = 256  # dst rows per tile
BS = 2048  # src cols per tile
# masks are packed in 16-bit halfwords so the minor dim is 128 lanes: XLA
# tiles s32[..., 256, 64] as T(8,128) and PADS lanes 64->128 (2x HBM for
# every tile set, measured 1.3 GB wasted at products scale); s16[..., 256,
# 128] tiles as T(16,128) with zero padding at identical true bytes
WORDS = BS // 16
MASK_SCHEME = 2  # cache-format version (bump when the packing changes)
# tiles below this go to the ELL straggler path; ~190 is the measured
# in-situ breakeven (3.3 us/tile vs ~17 ns/gathered edge, EXPERIMENTS.md)
MIN_EDGES = 192


@dataclass
class BlockLayout:
    """Host-side block-sparse bitmask layout + ELL straggler layout.

    Rectangular in general: source rows (the ``h`` operand, padded to
    ``n_src_pad``) and destination rows (the output, padded to ``n_pad``)
    may differ — e.g. halo aggregation maps remote slots -> local rows.
    """

    n: int
    n_pad: int  # out rows padded to a BD multiple (BS multiple when square)
    masks: np.ndarray  # int16 [T, BD, WORDS] (16-bit halfwords, 128 lanes)
    src_start: np.ndarray  # int32 [T]
    dst_blk: np.ndarray  # int32 [T]
    is_first: np.ndarray  # int32 [T] (first tile of its dst block)
    straggler: Optional[EllLayout]
    n_src_pad: int = 0  # h rows (== n_pad when square)

    def __post_init__(self):
        if self.n_src_pad == 0:
            self.n_src_pad = self.n_pad

    def to_device(self) -> "BlockDevice":
        return BlockDevice(
            self.n,
            self.n_pad,
            jnp.asarray(self.masks),
            jnp.asarray(self.src_start),
            jnp.asarray(self.dst_blk),
            jnp.asarray(self.is_first),
            self.straggler.to_device() if self.straggler else None,
            self.n_src_pad,
        )


@dataclass
class BlockDevice:
    n: int
    n_pad: int
    masks: jnp.ndarray
    src_start: jnp.ndarray
    dst_blk: jnp.ndarray
    is_first: jnp.ndarray
    straggler: Optional[EllDevice]
    n_src_pad: int = 0


jax.tree_util.register_pytree_node(
    BlockDevice,
    lambda b: (
        (b.masks, b.src_start, b.dst_blk, b.is_first, b.straggler),
        (b.n, b.n_pad, b.n_src_pad),
    ),
    lambda aux, leaves: BlockDevice(
        aux[0], aux[1], *leaves, aux[2]
    ),
)


def _dedup(src: np.ndarray, dst: np.ndarray, n: int):
    key = src.astype(np.int64) * n + dst
    uniq = np.unique(key)
    return (uniq // n).astype(np.int32), (uniq % n).astype(np.int32)


def block_layout(
    src: np.ndarray,
    dst: np.ndarray,
    n: int,
    min_edges: int = MIN_EDGES,
    cache_key: Optional[str] = None,
    dedup: bool = True,
    n_src: Optional[int] = None,
) -> BlockLayout:
    """Build the tile layout for edges src -> dst; ``n`` destination rows,
    ``n_src`` source rows (defaults to ``n`` — the square case)."""
    from .spmm_fast import ell_cache_ok, ell_load_npz, ell_save_npz

    if cache_key and os.path.exists(cache_key + ".npz"):
        z = np.load(cache_key + ".npz")
        # legacy caches lack min_edges/n_src keys; treat missing as match
        # (every existing cache key mangles min_edges into the filename)
        stale = (
            int(z.get("mask_scheme", 1)) != MASK_SCHEME
            or not ell_cache_ok(z)
            or int(z.get("min_edges", min_edges)) != min_edges
            or int(z["n"]) != n
        )
        if stale:
            z = None
    else:
        z = None
    if z is not None:
        return BlockLayout(
            int(z["n"]), int(z["n_pad"]), z["masks"], z["src_start"],
            z["dst_blk"], z["is_first"], ell_load_npz(z),
            int(z.get("n_src_pad", z["n_pad"])),
        )

    square = n_src is None
    if n_src is None:
        n_src = n
    if dedup:
        nn = max(n, n_src)
        src, dst = _dedup(src, dst, nn)
    elif len(src) and len(np.unique(src.astype(np.int64) * n + dst)) != len(src):
        # a bitmask cannot represent edge multiplicity; silently dropping
        # duplicates would diverge from the segment path's semantics
        raise ValueError(
            "block layout requires a simple graph (duplicate edges found); "
            "deduplicate upstream or pass dedup=True"
        )
    n_pad = -(-n // BS) * BS if square else -(-n // BD) * BD
    n_src_pad = n_pad if square else -(-n_src // BS) * BS
    tb = dst.astype(np.int64) // BD
    sb = src.astype(np.int64) // BS
    tile_key = tb * (n_src_pad // BS) + sb
    order = np.argsort(tile_key, kind="stable")
    tile_key_s = tile_key[order]
    src_s, dst_s = src[order], dst[order]
    uniq_tiles, tile_ptr = np.unique(tile_key_s, return_index=True)
    tile_ptr = np.append(tile_ptr, len(tile_key_s))
    counts = np.diff(tile_ptr)

    dense = counts >= min_edges
    # straggler edges -> ELL
    str_edges_mask = np.zeros(len(src_s), bool)
    for ti in np.where(~dense)[0]:
        str_edges_mask[tile_ptr[ti] : tile_ptr[ti + 1]] = True
    straggler = None
    if str_edges_mask.any():
        straggler = ell_from_csr(
            src_s[str_edges_mask], dst_s[str_edges_mask], n_pad
        )

    sel = np.where(dense)[0]
    n_blocks = n_pad // BD
    covered = np.zeros(n_blocks, bool)
    masks_list = []
    src_start = []
    dst_blk = []
    for ti in sel:
        key = uniq_tiles[ti]
        b_dst = int(key // (n_src_pad // BS))
        b_src = int(key % (n_src_pad // BS))
        sl = slice(tile_ptr[ti], tile_ptr[ti + 1])
        i = (dst_s[sl] - b_dst * BD).astype(np.int64)
        j = (src_s[sl] - b_src * BS).astype(np.int64)
        m = np.zeros(BD * WORDS, np.uint16)
        # column j lives at (halfword = j % WORDS, bit = j // WORDS): this
        # layout matches pltpu.repeat's TILE (concatenate-copies) semantics,
        # so the kernel expands with `bit = lane // WORDS` after repeating.
        np.bitwise_or.at(
            m, i * WORDS + j % WORDS, np.uint16(1) << (j // WORDS).astype(np.uint16)
        )
        masks_list.append(m.reshape(BD, WORDS))
        src_start.append(b_src * BS)
        dst_blk.append(b_dst)
        covered[b_dst] = True
    # every dst block needs at least one (possibly empty) tile so the output
    # block gets zero-initialized
    for b in np.where(~covered)[0]:
        masks_list.append(np.zeros((BD, WORDS), np.uint16))
        src_start.append(0)
        dst_blk.append(int(b))
    if not masks_list:  # completely empty graph
        masks_list.append(np.zeros((BD, WORDS), np.uint16))
        src_start.append(0)
        dst_blk.append(0)
    masks = np.stack(masks_list).view(np.int16)
    src_start = np.asarray(src_start, np.int32)
    dst_blk = np.asarray(dst_blk, np.int32)
    order = np.argsort(dst_blk, kind="stable")
    masks, src_start, dst_blk = masks[order], src_start[order], dst_blk[order]
    is_first = np.ones(len(dst_blk), np.int32)
    is_first[1:] = (dst_blk[1:] != dst_blk[:-1]).astype(np.int32)

    lay = BlockLayout(n, n_pad, masks, src_start, dst_blk, is_first, straggler, n_src_pad)
    if cache_key:
        os.makedirs(os.path.dirname(cache_key) or ".", exist_ok=True)
        save = dict(
            n=n, n_pad=n_pad, n_src_pad=n_src_pad, masks=masks,
            src_start=src_start, dst_blk=dst_blk, is_first=is_first,
            min_edges=min_edges, mask_scheme=MASK_SCHEME,
        )
        ell_save_npz(save, straggler)
        np.savez(cache_key + ".npz", **save)
    return lay


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------


def _block_kernel(f: int, ss_ref, fi_ref, db_ref, mask_ref, h_ref, out_ref, win, sems, acc):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t = pl.program_id(0)
    nt = pl.num_programs(0)
    slot = jax.lax.rem(t, 2)

    def dma(tile, slot):
        # src_start values are multiples of BS; the hint lets Mosaic prove
        # sublane-tiling divisibility for the dynamic slice
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

    words = mask_ref[0]  # [BD, WORDS] int16 halfwords
    # pltpu.repeat has TILE semantics: element at lane l holds
    # halfword[l % WORDS]; the host packs column j at (halfword j % WORDS,
    # bit j // WORDS), so the bit index here is lane // WORDS. The i32
    # sign-extension is harmless: bits 0..15 are unchanged under it.
    # Widen BEFORE the repeat: converting [BD, WORDS] costs 16x fewer
    # lanes than converting the expanded [BD, BS].
    rep = pltpu.repeat(words.astype(jnp.int32), 16, axis=1)
    bit = jax.lax.broadcasted_iota(jnp.int32, (BD, BS), 1) // WORDS
    a = ((rep >> bit) & 1).astype(jnp.float32).astype(jnp.bfloat16)

    @pl.when(fi_ref[t] == 1)
    def _():
        acc[:] = jnp.zeros_like(acc)

    # accumulate across the dst block's tiles in an f32 scratch; the HBM
    # output buffer is written once per block in h's dtype (bf16 under
    # agg_dtype=bfloat16 — halves the [n_pad, F] output residents that
    # dominate HBM at products scale)
    acc[:] += jnp.dot(
        a, win[slot].astype(jnp.bfloat16), preferred_element_type=jnp.float32
    )
    nxt = db_ref[jnp.minimum(t + 1, nt - 1)]
    last = jnp.logical_or(t + 1 == nt, nxt != db_ref[t])

    @pl.when(last)
    def _():
        out_ref[:] = acc[:].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _run_block_pallas(layout: BlockDevice, h: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_src_pad, f = h.shape
    assert n_src_pad == layout.n_src_pad, (n_src_pad, layout.n_src_pad)
    n_pad = layout.n_pad
    t = layout.masks.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(t,),
        in_specs=[
            pl.BlockSpec(
                (1, BD, WORDS), lambda i, ss, fi, db: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.ANY),  # h stays in HBM
        ],
        out_specs=pl.BlockSpec(
            (BD, f), lambda i, ss, fi, db: (db[i], 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, BS, f), h.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((BD, f), jnp.float32),  # f32 block accumulator
        ],
    )
    out = pl.pallas_call(
        functools.partial(_block_kernel, f),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, f), h.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(14.5 * 1024 * 1024),
        ),
    )(layout.src_start, layout.is_first, layout.dst_blk, layout.masks, h)
    return out


def _run_block_jnp(layout: BlockDevice, h: jnp.ndarray) -> jnp.ndarray:
    """Portable (CPU-testable) reference of the tile kernel semantics."""
    f = h.shape[1]
    assert h.shape[0] == layout.n_src_pad
    out = jnp.zeros((layout.n_pad, f), jnp.float32)
    t = layout.masks.shape[0]
    words = layout.masks.astype(jnp.int32) & 0xFFFF  # undo sign-extension
    bits = (
        words[..., None] >> jnp.arange(16, dtype=jnp.int32)[None, None, None, :]
    ) & 1  # [T, BD, WORDS, 16]; column j = bit * WORDS + halfword
    a = bits.transpose(0, 1, 3, 2).reshape(t, BD, BS).astype(jnp.float32)
    for i in range(t):
        start = layout.src_start[i]
        window = jax.lax.dynamic_slice_in_dim(h, start, BS, axis=0)
        tile_out = a[i] @ window.astype(jnp.float32)
        out = jax.lax.dynamic_update_slice_in_dim(
            out,
            jax.lax.dynamic_slice_in_dim(out, layout.dst_blk[i] * BD, BD, 0) + tile_out,
            layout.dst_blk[i] * BD,
            axis=0,
        )
    return out.astype(h.dtype)


def run_block(layout: BlockDevice, h: jnp.ndarray, use_pallas: bool = True) -> jnp.ndarray:
    """out = A^T h over [n_pad, F] arrays (rows >= n are zero padding).

    Output dtype follows ``h.dtype`` (accumulation is always f32 — in VMEM
    scratch on the Pallas path): under agg_dtype=bfloat16 the [n_pad, F]
    aggregation residents are half-width, which is what fits products-scale
    hidden 256 training in one chip's HBM.

    The Pallas path needs F % 128 == 0 (Mosaic requires lane-aligned sliced
    DMAs); aggregation runs on layer inputs (padded feats / hidden dims), so
    callers pad F to a lane multiple. Falls back to the jnp form otherwise.
    """
    if use_pallas and h.shape[1] % 128:
        use_pallas = False
    if use_pallas:
        out = _run_block_pallas(layout, h)
    else:
        out = _run_block_jnp(layout, h)
    if layout.straggler is not None:
        # gather in h's dtype (bf16 halves HBM traffic), accumulate in f32,
        # store the [n_pad, F] result back in h's dtype (keeps the big
        # residents half-width under agg_dtype=bfloat16)
        ell = _run_ell(layout.straggler, h, acc_dtype=jnp.float32)
        out = out + ell.astype(h.dtype)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def spmm_block(layout_fwd: BlockDevice, h: jnp.ndarray, reverse: BlockDevice, use_pallas: bool = True):
    """A^T h with bitmask-MXU tiles; VJP runs the reverse layout."""
    return run_block(layout_fwd, h, use_pallas)


def _fwd(layout_fwd, h, reverse, use_pallas):
    # zero-size residual carries h's dtype (residuals must be JAX types)
    return run_block(layout_fwd, h, use_pallas), (reverse, jnp.zeros((0,), h.dtype))


def _bwd(use_pallas, res, g):
    reverse, proto = res
    return None, run_block(reverse, g.astype(proto.dtype), use_pallas).astype(proto.dtype), None


spmm_block.defvjp(_fwd, _bwd)
