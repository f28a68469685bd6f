"""Strip-ordered bitmask SpMM — the v3 aggregation kernel (window reuse).

The v1 block kernel (``spmm_block``) DMAs the [BS, F] source window
HBM->VMEM once PER TILE. On the Reddit-scale bench layout the same
(strip, window) pair is shared by ~7 tiles (32,297 tiles but only 4,580
unique windows per 8-block destination strip), so ~86% of the window
traffic is redundant — and the F=640 pass is window-DMA-bound (3.2 of
4.39 us/tile, EXPERIMENTS.md round 2). This kernel:

- orders tiles by (destination STRIP = 8 dst blocks, source window) so
  each window is DMA'd once per strip that needs it (double-buffered
  across window changes);
- accumulates the whole strip in a [2048, F] f32 VMEM scratch;
- flushes through 8 synthetic FLUSH steps appended per strip, each
  writing one [BD, F] output block (output blocks stay small, and empty
  strips are zero-filled by the same path).

This is the window-reuse half of the retired v2 compact kernel (whose
column-compaction half needs a cross-vreg Mosaic gather this chip
generation lacks) — rebuilt without any gather. Mask format, expansion
trick, ELL straggler handling, and the custom-VJP reverse-layout backward
are shared with ``spmm_block``.

VMEM gate: the strip accumulator + double-buffered windows need
``2048*F*4 + 2*2048*F*esize`` bytes; at F=640 this only fits for bf16
windows. ``run_strip`` falls back to the portable twin (tests) or the
caller keeps the v1 kernel (f32 wide configs).

Reference analog: the same DGL/cuSPARSE SpMM as v1
(``AdaQP/model/ops.py:17-32``) — TPU-first reformulation, round 3.
"""
from __future__ import annotations

import functools
import os
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .spmm_block import BD, BS, WORDS, _dedup
from .spmm_fast import EllDevice, EllLayout, _run_ell, ell_from_csr

SB = 8             # dst blocks per strip
STRIP = SB * BD    # 2048 dst rows
MIN_EDGES = 192
STRIP_SCHEME = 1   # cache-format version
# VMEM budget for the Pallas kernel (accumulator + double buffers); the
# single source of truth for the run_strip gate, the pallas_call limit, and
# the Trainer's auto impl selection
VMEM_LIMIT_BYTES = int(14.5 * 2**20)

# flags bits
_F_STRIP_FIRST = 1
_F_FLUSH = 2
_F_WIN_FIRST = 4


@dataclass
class StripLayout:
    """Host-side strip-ordered layout + ELL straggler."""

    n: int
    n_pad: int        # out rows, STRIP multiple
    n_src_pad: int    # h rows, BS multiple
    masks: np.ndarray     # int16 [T, BD, WORDS] (dense tiles only)
    win_src: np.ndarray   # int32 [W + 1] window start row (BS multiple)
    w_ord: np.ndarray     # int32 [T2] window ordinal per grid step
    out_idx: np.ndarray   # int32 [T2] output block index per grid step
    sub: np.ndarray       # int32 [T2] dst sub-block within the strip
    flags: np.ndarray     # int32 [T2] _F_* bits
    mask_idx: np.ndarray  # int32 [T2] row into masks (0 for flush steps)
    tile_src: np.ndarray  # int32 [T] tile window start (portable twin)
    tile_dst: np.ndarray  # int32 [T] tile dst block (portable twin)
    straggler: Optional[EllLayout]

    def to_device(self) -> "StripDevice":
        return StripDevice(
            self.n, self.n_pad, self.n_src_pad,
            jnp.asarray(self.masks), jnp.asarray(self.win_src),
            jnp.asarray(self.w_ord), jnp.asarray(self.out_idx),
            jnp.asarray(self.sub), jnp.asarray(self.flags),
            jnp.asarray(self.mask_idx), jnp.asarray(self.tile_src),
            jnp.asarray(self.tile_dst),
            self.straggler.to_device() if self.straggler else None,
        )


@dataclass
class StripDevice:
    n: int
    n_pad: int
    n_src_pad: int
    masks: jnp.ndarray
    win_src: jnp.ndarray
    w_ord: jnp.ndarray
    out_idx: jnp.ndarray
    sub: jnp.ndarray
    flags: jnp.ndarray
    mask_idx: jnp.ndarray
    tile_src: jnp.ndarray
    tile_dst: jnp.ndarray
    straggler: Optional[EllDevice]
    # per-shard REAL window count ([1] i32) for shard-padded grids whose
    # win_src is padded to the shard max; None derives it from win_src
    n_win: Optional[jnp.ndarray] = None


jax.tree_util.register_pytree_node(
    StripDevice,
    lambda b: (
        (b.masks, b.win_src, b.w_ord, b.out_idx, b.sub, b.flags, b.mask_idx,
         b.tile_src, b.tile_dst, b.straggler, b.n_win),
        (b.n, b.n_pad, b.n_src_pad),
    ),
    lambda aux, leaves: StripDevice(*aux, *leaves),
)


def strip_layout(
    src: np.ndarray,
    dst: np.ndarray,
    n: int,
    min_edges: int = MIN_EDGES,
    cache_key: Optional[str] = None,
    dedup: bool = True,
    n_src: Optional[int] = None,
) -> StripLayout:
    """Build the strip-ordered tile layout for edges src -> dst."""
    from .spmm_fast import ell_cache_ok, ell_load_npz, ell_save_npz

    if cache_key and os.path.exists(cache_key + ".npz"):
        z = np.load(cache_key + ".npz")
        if (
            int(z.get("strip_scheme", 0)) == STRIP_SCHEME
            and ell_cache_ok(z)
            and int(z.get("min_edges", -1)) == min_edges
            and int(z["n"]) == n
        ):
            return StripLayout(
                int(z["n"]), int(z["n_pad"]), int(z["n_src_pad"]), z["masks"],
                z["win_src"], z["w_ord"], z["out_idx"], z["sub"], z["flags"],
                z["mask_idx"], z["tile_src"], z["tile_dst"], ell_load_npz(z),
            )

    if n_src is None:
        n_src = n
    if dedup:
        nn = max(n, n_src)
        src, dst = _dedup(src, dst, nn)
    elif len(src) and len(np.unique(src.astype(np.int64) * n + dst)) != len(src):
        raise ValueError(
            "strip layout requires a simple graph (duplicate edges found); "
            "deduplicate upstream or pass dedup=True"
        )
    n_pad = -(-n // STRIP) * STRIP
    n_src_pad = -(-n_src // BS) * BS

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

    straggler = None
    str_mask = np.zeros(len(src_s), bool)
    for ti in np.where(~dense)[0]:
        str_mask[tile_ptr[ti] : tile_ptr[ti + 1]] = True
    if str_mask.any():
        straggler = ell_from_csr(src_s[str_mask], dst_s[str_mask], n_pad)

    # pack dense tile masks; record (strip, window, dst block) per tile
    sel = np.where(dense)[0]
    t_strip = np.empty(len(sel), np.int64)
    t_sb = np.empty(len(sel), np.int64)
    t_tb = np.empty(len(sel), np.int64)
    masks_list = []
    for oi, ti in enumerate(sel):
        key = uniq_tiles[ti]
        b_dst = int(key // (n_src_pad // BS))
        b_src = int(key % (n_src_pad // BS))
        sl = slice(tile_ptr[ti], tile_ptr[ti + 1])
        i = (dst_s[sl] - b_dst * BD).astype(np.int64)
        j = (src_s[sl] - b_src * BS).astype(np.int64)
        m = np.zeros(BD * WORDS, np.uint16)
        np.bitwise_or.at(
            m, i * WORDS + j % WORDS, np.uint16(1) << (j // WORDS).astype(np.uint16)
        )
        masks_list.append(m.reshape(BD, WORDS))
        t_strip[oi] = b_dst // SB
        t_sb[oi] = b_src
        t_tb[oi] = b_dst
    if not masks_list:  # mask_idx 0 must be addressable
        masks_list.append(np.zeros((BD, WORDS), np.uint16))
    masks = np.stack(masks_list).view(np.int16)

    # strip-major, window-minor tile order
    t_order = np.lexsort((t_tb, t_sb, t_strip))
    n_strips = n_pad // STRIP

    win_src: list = []
    w_ord: list = []
    out_idx: list = []
    subs: list = []
    flags: list = []
    mask_idx: list = []
    # twin arrays stay in MASK order (row i of masks <-> tile_src[i])
    tile_src = (t_sb * BS).astype(np.int32)
    tile_dst = t_tb.astype(np.int32)

    pos = 0
    strips_of_tiles = t_strip[t_order]
    for s in range(n_strips):
        first_in_strip = True
        cur_win = -1
        while pos < len(t_order) and strips_of_tiles[pos] == s:
            oi = t_order[pos]
            wkey = int(t_sb[oi])
            win_first = 0
            if wkey != cur_win:
                cur_win = wkey
                win_src.append(wkey * BS)
                win_first = _F_WIN_FIRST
            w_ord.append(len(win_src) - 1)
            out_idx.append(s * SB)
            subs.append(int(t_tb[oi]) % SB)
            flags.append(
                (_F_STRIP_FIRST if first_in_strip else 0) | win_first
            )
            mask_idx.append(int(oi))
            first_in_strip = False
            pos += 1
        for j in range(SB):  # flush steps
            w_ord.append(max(len(win_src) - 1, 0))
            out_idx.append(s * SB + j)
            subs.append(j)
            flags.append(
                _F_FLUSH | (_F_STRIP_FIRST if (first_in_strip and j == 0) else 0)
            )
            mask_idx.append(0)
            first_in_strip = False

    win_src.append(0)  # prefetch pad for the last window's "+1"
    lay = StripLayout(
        n, n_pad, n_src_pad, masks,
        np.asarray(win_src, np.int32), np.asarray(w_ord, np.int32),
        np.asarray(out_idx, np.int32), np.asarray(subs, np.int32),
        np.asarray(flags, np.int32), np.asarray(mask_idx, np.int32),
        tile_src, tile_dst, straggler,
    )
    if cache_key:
        os.makedirs(os.path.dirname(cache_key) or ".", exist_ok=True)
        save = dict(
            n=n, n_pad=n_pad, n_src_pad=n_src_pad, masks=masks,
            win_src=lay.win_src, w_ord=lay.w_ord, out_idx=lay.out_idx,
            sub=lay.sub, flags=lay.flags, mask_idx=lay.mask_idx,
            tile_src=tile_src, tile_dst=tile_dst,
            min_edges=min_edges, strip_scheme=STRIP_SCHEME,
        )
        ell_save_npz(save, straggler)
        np.savez(cache_key + ".npz", **save)
    return lay


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------


def _strip_kernel(
    f: int,
    nw_ref, ws_ref, meta_ref, oi_ref, mi_ref,
    mask_ref, h_ref, out_ref, win, sems, acc,
):
    """``meta_ref[i] = w_ord*64 | flags*8 | sub`` — packed so the prefetch
    arrays fit SMEM (1 MB total; 5 separate i32 arrays overflow it above
    ~50K grid steps — hit at min_edges=128 on the bench graph)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    meta = meta_ref[i]
    sub = jax.lax.rem(meta, 8)
    fl = jax.lax.rem(meta // 8, 8)
    w = meta // 64

    def dma(wi):
        start = pl.multiple_of(ws_ref[wi], BS)
        slot = jax.lax.rem(wi, 2)
        return pltpu.make_async_copy(
            h_ref.at[pl.ds(start, BS), :], win.at[slot], sems.at[slot]
        )

    # warmup ONLY when a real window exists: a flush-only layout (empty
    # halo group at K=1) would otherwise start a DMA nothing ever waits,
    # leaving a stale semaphore signal for the next kernel invocation
    @pl.when(jnp.logical_and(i == 0, nw_ref[0] > 0))
    def _():
        dma(0).start()

    win_first = (fl & _F_WIN_FIRST) != 0

    # per-shard window count rides prefetch so shard-padded grids stop
    # prefetching at THEIR last real window (an unwaited DMA would leave a
    # stale semaphore signal and race the slot's next occupant)
    @pl.when(jnp.logical_and(win_first, w + 1 < nw_ref[0]))
    def _():
        dma(w + 1).start()

    @pl.when(win_first)
    def _():
        dma(w).wait()

    @pl.when((fl & _F_STRIP_FIRST) != 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    @pl.when((fl & _F_FLUSH) == 0)
    def _():
        words = mask_ref[0]  # [BD, WORDS] int16 halfwords
        rep = pltpu.repeat(words.astype(jnp.int32), 16, axis=1)
        bit = jax.lax.broadcasted_iota(jnp.int32, (BD, BS), 1) // WORDS
        a = ((rep >> bit) & 1).astype(jnp.float32).astype(jnp.bfloat16)
        off = pl.multiple_of(sub * BD, BD)
        acc[pl.ds(off, BD), :] += jnp.dot(
            a, win[jax.lax.rem(w, 2)].astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )

    @pl.when((fl & _F_FLUSH) != 0)
    def _():
        off = pl.multiple_of(sub * BD, BD)
        out_ref[:] = acc[pl.ds(off, BD), :].astype(out_ref.dtype)


def strip_vmem_bytes(f: int, esize: int) -> int:
    """Worst-case VMEM footprint of the Pallas strip kernel."""
    return (
        STRIP * f * 4            # f32 strip accumulator
        + 2 * BS * f * esize     # double-buffered windows
        + 2 * BD * f * esize     # out block (pipeline double buffer)
        + 2 * BD * WORDS * 2     # mask block
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def _run_strip_pallas(layout: StripDevice, h: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_src_pad, f = h.shape
    assert n_src_pad == layout.n_src_pad, (n_src_pad, layout.n_src_pad)
    t2 = layout.w_ord.shape[0]
    n_win = jnp.asarray([layout.win_src.shape[0] - 1], jnp.int32) \
        if layout.n_win is None else layout.n_win
    meta = layout.w_ord * 64 + layout.flags * 8 + layout.sub
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(t2,),
        in_specs=[
            pl.BlockSpec(
                (1, BD, WORDS),
                lambda i, nw, ws, meta, oi, mi: (mi[i], 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.ANY),  # h stays in HBM
        ],
        out_specs=pl.BlockSpec(
            (BD, f),
            lambda i, nw, ws, meta, oi, mi: (oi[i], 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, BS, f), h.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((STRIP, f), jnp.float32),  # strip accumulator
        ],
    )
    return pl.pallas_call(
        functools.partial(_strip_kernel, f),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((layout.n_pad, f), h.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES,
        ),
    )(
        n_win, layout.win_src, meta, layout.out_idx, layout.mask_idx,
        layout.masks, h,
    )


def _run_strip_jnp(layout: StripDevice, h: jnp.ndarray) -> jnp.ndarray:
    """Portable (CPU-testable) twin of the strip kernel semantics."""
    f = h.shape[1]
    assert h.shape[0] == layout.n_src_pad
    out = jnp.zeros((layout.n_pad, f), jnp.float32)
    t = layout.tile_src.shape[0]
    words = layout.masks.astype(jnp.int32) & 0xFFFF
    if words.shape[0] != t:  # layouts with zero dense tiles keep 1 pad mask
        words = words[:t]
    bits = (
        words[..., None] >> jnp.arange(16, dtype=jnp.int32)[None, None, None, :]
    ) & 1
    a = bits.transpose(0, 1, 3, 2).reshape(max(t, 1), BD, BS).astype(jnp.float32)
    for i in range(t):
        start = layout.tile_src[i]
        window = jax.lax.dynamic_slice_in_dim(h, start, BS, axis=0)
        tile_out = a[i] @ window.astype(jnp.float32)
        blk = layout.tile_dst[i] * BD
        out = jax.lax.dynamic_update_slice_in_dim(
            out,
            jax.lax.dynamic_slice_in_dim(out, blk, BD, 0) + tile_out,
            blk,
            axis=0,
        )
    return out.astype(h.dtype)


_strip_twin_warned = False


def _warn_strip_twin_once(f: int, esize: int):
    """A TPU caller that asked for the Pallas strip kernel but trips the
    lane/VMEM gate would otherwise silently trace the portable twin — a
    Python loop over tiles, hours at bench scale (round-3 VERDICT weak #4;
    same footgun class as the compact downgrade warning in dist_ops)."""
    global _strip_twin_warned
    if _strip_twin_warned:
        return
    _strip_twin_warned = True
    import logging

    logging.getLogger("adaqp_tpu").warning(
        "strip kernel downgraded to the portable twin (F=%d, %d-byte "
        "elements: %s) — orders of magnitude slower at scale; use "
        "spmm_impl=block or agg_dtype=bfloat16",
        f, esize,
        "F not a 128-lane multiple" if f % 128 else
        f"VMEM {strip_vmem_bytes(f, esize)} > {VMEM_LIMIT_BYTES} bytes",
    )


def run_strip(layout: StripDevice, h: jnp.ndarray, use_pallas: bool = True) -> jnp.ndarray:
    """out = A^T h with per-strip window reuse; falls back to the portable
    twin when F is not lane-aligned or the strip VMEM budget is exceeded
    (callers should keep the v1 block kernel for such configs at scale)."""
    if use_pallas and (
        h.shape[1] % 128
        or strip_vmem_bytes(h.shape[1], h.dtype.itemsize) > VMEM_LIMIT_BYTES
    ):
        from ..common.backend import tpu_path

        if tpu_path():
            _warn_strip_twin_once(h.shape[1], h.dtype.itemsize)
        use_pallas = False
    out = _run_strip_pallas(layout, h) if use_pallas else _run_strip_jnp(layout, h)
    if layout.straggler is not None:
        ell = _run_ell(layout.straggler, h, acc_dtype=jnp.float32)
        out = out + ell.astype(h.dtype)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def spmm_strip(layout_fwd: StripDevice, h: jnp.ndarray, reverse: StripDevice, use_pallas: bool = True):
    """A^T h with strip-ordered bitmask tiles; VJP runs the reverse layout."""
    return run_strip(layout_fwd, h, use_pallas)


def _fwd(layout_fwd, h, reverse, use_pallas):
    return run_strip(layout_fwd, h, use_pallas), (reverse, jnp.zeros((0,), h.dtype))


def _bwd(use_pallas, res, g):
    reverse, proto = res
    return None, run_strip(reverse, g.astype(proto.dtype), use_pallas).astype(proto.dtype), None


spmm_strip.defvjp(_fwd, _bwd)
