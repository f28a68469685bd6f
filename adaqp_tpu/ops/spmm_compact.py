"""Compact-column block-sparse SpMM — the v2 TPU aggregation kernel.

The round-1 bitmask kernel (``spmm_block``) pays a fixed ``BD x BS``
MXU+DMA cost per occupied tile, so sparse tiles waste >99% of their MACs
and the leftover edges ride a descriptor-bound XLA row gather (~17 ns/row,
EXPERIMENTS.md). Both costs are scale-invariant in the tile size, which
pins the unique-edge Reddit graph at ~240 ms per aggregation pass.

This kernel removes both bottlenecks with one structural change: work
items are ordered by (destination STRIP, source window) so each 2048-row
source window is DMA'd into VMEM once per strip that needs it, and sparse
regions become COMPACT subtiles — the region's occupied source columns
are gathered from the resident window with a single square
``take_along_axis`` (Mosaic ``tpu.dynamic_gather``; its lowering requires
x/idx/out to share one shape, so 8 subtiles' 8x256 columns share one
[2048, F] gather) followed by a narrow [256, 256] x [256, F] MXU matmul
per subtile. Dense regions keep the full-width bitmask matmul. Regions
too sparse for either path fall back to the ELLPACK HBM gather.

Item kinds (one Pallas grid step each, same mask format [BD, WORDS] i16):
  kind 0 (FULL):  expand bitmask -> [256, 2048] 0/1 bf16, one MXU matmul
                  against the window, accumulate at the region's strip row.
  kind 1 (GROUP): gather the group's 2048 virtual columns from the window,
                  expand the group bitmask (subtile s owns virtual columns
                  [256 s, 256 (s+1))), 8 narrow matmuls accumulated at each
                  subtile's own strip row offset.

Feature dim is processed in lane-aligned chunks (grid dim 0) so VMEM holds
window + accumulator + gather output at F up to 768.

Semantics match ``spmm_block``/the segment oracle: out = A^T h over
deduplicated edges (reference aggregation ``AdaQP/model/ops.py:17-67``);
backward runs the reverse-graph layout via ``jax.custom_vjp``
(``ops.py:83-95``).
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

BD = 256          # dst rows per block / subtile
BS = 2048         # src rows per window
WORDS = BS // 16  # int16 halfwords per mask row (minor dim = 128 lanes)
SB = 8            # dst blocks per strip (strip = 2048 rows)
STRIP = SB * BD
CSUB = 256        # columns per compact subtile
GROUP = BS // CSUB  # subtiles per group (8): one square window gather
CIDX_ROWS = BS // 128  # col_idx rides as [CIDX_ROWS, 128] i32 blocks
COMPACT_SCHEME = 1  # cache-format version

# tiering defaults (host-side; retune from scripts/microbench_gather.py)
ME_ELL = 64       # regions below this edge count go to the ELLPACK tail
FULL_COLS = 1024  # regions with more occupied columns stay full-bitmask

_GATHER_SUPPORT: Optional[bool] = None


def dynamic_gather_supported() -> bool:
    """Whether Mosaic lowers a cross-vreg sublane ``take_along_axis``
    (``tpu.dynamic_gather``) — the primitive this kernel's window
    permutation is built on.

    Measured on v5e (2026-08, ``scripts/microbench_gather.py`` +
    EXPERIMENTS.md): the gather unit only reindexes WITHIN one vreg —
    sublane gathers lower at depth <= 8 and lane gathers within 128
    lanes; every form the compact kernel needs (a [2048, F] window
    permutation) fails in Mosaic's infer-vector-layout. The probe
    compiles a [16, 128] sublane gather once per process (seconds over
    the remote-compile tunnel; cached by the persistent XLA compilation
    cache afterwards). ``ADAQP_DYNAMIC_GATHER=0|1`` skips the probe.
    """
    global _GATHER_SUPPORT
    if _GATHER_SUPPORT is not None:
        return _GATHER_SUPPORT
    env = os.environ.get("ADAQP_DYNAMIC_GATHER")
    if env:  # empty string counts as unset (fall through to the probe)
        _GATHER_SUPPORT = env not in ("0", "false", "False")
        return _GATHER_SUPPORT
    if jax.default_backend() != "tpu":
        # non-TPU backends take the portable jnp path anyway
        _GATHER_SUPPORT = False
        return False
    from jax.experimental import pallas as pl

    def kern(x_ref, i_ref, o_ref):
        o_ref[...] = jnp.take_along_axis(x_ref[...], i_ref[...], axis=0)

    try:
        # probe the kernel's REAL requirement: a [BS, 128] (2048-row,
        # cross-vreg) window permutation — a smaller sublane gather can
        # lower on backends that still reject the vreg-distance-2048 form
        x = jnp.zeros((BS, 128), jnp.float32)
        i = jnp.zeros((BS, 128), jnp.int32)
        fn = pl.pallas_call(kern, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype))
        jax.jit(fn).lower(x, i).compile()
        _GATHER_SUPPORT = True
    except Exception:
        _GATHER_SUPPORT = False
    return _GATHER_SUPPORT


@dataclass
class CompactLayout:
    """Host-side compact/full/ELL three-tier layout (see module doc)."""

    n: int
    n_pad: int        # out rows padded to a STRIP multiple
    n_src_pad: int    # h rows padded to a BS multiple
    kind: np.ndarray       # int32 [T] (0 full, 1 group)
    masks: np.ndarray      # int16 [T, BD, WORDS]
    col_idx: np.ndarray    # int32 [T, BS] window-local gather columns
    src_start: np.ndarray  # int32 [T] window start row
    strip_id: np.ndarray   # int32 [T]
    new_window: np.ndarray  # int32 [T] 1 = DMA the window for this item
    wslot: np.ndarray       # int32 [T] double-buffer slot parity
    strip_first: np.ndarray  # int32 [T] 1 = zero the strip accumulator
    strip_last: np.ndarray   # int32 [T] 1 = flush accumulator to out
    dst_off: np.ndarray    # int32 [T, GROUP] row offset in strip per subtile
    nsub: np.ndarray       # int32 [T] used subtile slots (kind-1 items)
    straggler: Optional[EllLayout]

    def to_device(self) -> "CompactDevice":
        return CompactDevice(
            self.n, self.n_pad, self.n_src_pad,
            jnp.asarray(self.kind), jnp.asarray(self.masks),
            jnp.asarray(self.col_idx), jnp.asarray(self.src_start),
            jnp.asarray(self.strip_id), jnp.asarray(self.new_window),
            jnp.asarray(self.wslot), jnp.asarray(self.strip_first),
            jnp.asarray(self.strip_last), jnp.asarray(self.dst_off),
            jnp.asarray(self.nsub),
            self.straggler.to_device() if self.straggler else None,
        )


@dataclass
class CompactDevice:
    n: int
    n_pad: int
    n_src_pad: int
    kind: jnp.ndarray
    masks: jnp.ndarray
    col_idx: jnp.ndarray
    src_start: jnp.ndarray
    strip_id: jnp.ndarray
    new_window: jnp.ndarray
    wslot: jnp.ndarray
    strip_first: jnp.ndarray
    strip_last: jnp.ndarray
    dst_off: jnp.ndarray
    nsub: jnp.ndarray
    straggler: Optional[EllDevice]


jax.tree_util.register_pytree_node(
    CompactDevice,
    lambda c: (
        (c.kind, c.masks, c.col_idx, c.src_start, c.strip_id, c.new_window,
         c.wslot, c.strip_first, c.strip_last, c.dst_off, c.nsub,
         c.straggler),
        (c.n, c.n_pad, c.n_src_pad),
    ),
    lambda aux, leaves: CompactDevice(*aux, *leaves),
)


def _dedup(src: np.ndarray, dst: np.ndarray, n: int):
    key = src.astype(np.int64) * n + dst
    uniq = np.unique(key)
    return (uniq // n).astype(np.int32), (uniq % n).astype(np.int32)


def nsub_from_masks(masks: np.ndarray) -> np.ndarray:
    """[T] count of USED subtile slots per item, derived from the group
    bitmask: slot s owns virtual columns [CSUB s, CSUB (s+1)), i.e. bit
    pairs (2s, 2s+1) across every halfword. Dummy-padded slots are always
    a zero tail (the group builder packs real subtiles first), so the
    kernel can skip matmuls for slots >= nsub. Full items derive GROUP
    (their kind-0 path ignores it)."""
    t = masks.shape[0]
    used = np.zeros((t, GROUP), bool)
    m = masks.view(np.uint16)
    for s in range(GROUP):
        used[:, s] = ((m >> (2 * s)) & 3).any(axis=(1, 2))
    # highest used slot + 1 (>= 1 so the kernel always runs one matmul)
    return np.maximum(
        GROUP - np.argmax(used[:, ::-1], axis=1) - (~used.any(axis=1)) * GROUP,
        1,
    ).astype(np.int32)


def _pack_bits(rows: np.ndarray, vcols: np.ndarray) -> np.ndarray:
    """[BD, WORDS] halfword mask with virtual column v at
    (halfword v % WORDS, bit v // WORDS) — the layout the kernel's
    ``pltpu.repeat`` expansion expects (same as spmm_block)."""
    m = np.zeros(BD * WORDS, np.uint16)
    np.bitwise_or.at(
        m,
        rows.astype(np.int64) * WORDS + vcols % WORDS,
        np.uint16(1) << (vcols // WORDS).astype(np.uint16),
    )
    return m.reshape(BD, WORDS)


def compact_layout(
    src: np.ndarray,
    dst: np.ndarray,
    n: int,
    n_src: Optional[int] = None,
    me_ell: int = ME_ELL,
    full_cols: int = FULL_COLS,
    cache_key: Optional[str] = None,
    dedup: bool = True,
) -> CompactLayout:
    """Build the three-tier layout for edges src -> dst (``n`` dst rows,
    ``n_src`` source rows; defaults to square)."""
    from .spmm_fast import ell_cache_ok, ell_load_npz, ell_save_npz

    if cache_key and os.path.exists(cache_key + ".npz"):
        z = np.load(cache_key + ".npz")
        # a cache hit must have been built with the SAME tiering parameters
        # and graph dims, or the caller silently measures a stale layout
        # (legacy caches lack the keys; their filenames mangle the params)
        ok = (
            int(z.get("compact_scheme", 0)) == COMPACT_SCHEME
            and ell_cache_ok(z)
            and int(z.get("me_ell", me_ell)) == me_ell
            and int(z.get("full_cols", full_cols)) == full_cols
            and int(z["n"]) == n
            and int(z.get("n_src", n if n_src is None else n_src))
            == (n if n_src is None else n_src)
        )
        if ok:
            straggler = ell_load_npz(z)
            nsub = z["nsub"] if "nsub" in z else nsub_from_masks(z["masks"])
            return CompactLayout(
                int(z["n"]), int(z["n_pad"]), int(z["n_src_pad"]),
                z["kind"], z["masks"], z["col_idx"], z["src_start"],
                z["strip_id"], z["new_window"], z["wslot"],
                z["strip_first"], z["strip_last"], z["dst_off"], nsub,
                straggler,
            )

    if n_src is None:
        n_src = n
    if dedup:
        nn = max(n, n_src)
        src, dst = _dedup(src, dst, nn)
    elif len(src) and len(np.unique(src.astype(np.int64) * n + dst)) != len(src):
        raise ValueError(
            "compact layout requires a simple graph (duplicate edges found); "
            "deduplicate upstream or pass dedup=True"
        )
    n_pad = -(-n // STRIP) * STRIP
    n_src_pad = -(-n_src // BS) * BS
    nw = n_src_pad // BS
    n_strips = n_pad // STRIP

    blk = dst.astype(np.int64) // BD
    win = src.astype(np.int64) // BS
    region = blk * nw + win
    order = np.argsort(region, kind="stable")
    region_s, src_s, dst_s = region[order], src[order], dst[order]
    uniq, ptr = np.unique(region_s, return_index=True)
    ptr = np.append(ptr, len(region_s))
    counts = np.diff(ptr)

    # per-item accumulators, keyed for final (strip, window) ordering
    it_key, it_kind, it_masks, it_cols, it_start, it_strip, it_doff = (
        [], [], [], [], [], [], []
    )
    # pending compact subtiles per (strip, window): list of
    # (dst_blk_local, cols_local[<=CSUB], rows, cols_pos)
    pending: dict = {}
    ell_src, ell_dst = [], []

    for ri in range(len(uniq)):
        r = int(uniq[ri])
        b, w = r // nw, r % nw
        sl = slice(ptr[ri], ptr[ri + 1])
        e = counts[ri]
        s_loc = (src_s[sl] - w * BS).astype(np.int64)
        d_loc = (dst_s[sl] - b * BD).astype(np.int64)
        if e < me_ell:
            ell_src.append(src_s[sl])
            ell_dst.append(dst_s[sl])
            continue
        cols = np.unique(s_loc)
        if len(cols) > full_cols:
            it_key.append((b // SB, w, 0))
            it_kind.append(0)
            it_masks.append(_pack_bits(d_loc, s_loc).view(np.int16))
            it_cols.append(np.zeros(BS, np.int32))
            it_start.append(w * BS)
            it_strip.append(b // SB)
            doff = np.zeros(GROUP, np.int32)
            doff[0] = (b % SB) * BD
            it_doff.append(doff)
            continue
        # compact: split occupied columns into CSUB-wide subtiles
        pos = np.searchsorted(cols, s_loc)  # edge -> occupied-col rank
        key = (int(b // SB), int(w))
        lst = pending.setdefault(key, [])
        for s0 in range(0, len(cols), CSUB):
            sel = (pos >= s0) & (pos < s0 + CSUB)
            lst.append(
                (int(b % SB), cols[s0 : s0 + CSUB].astype(np.int32),
                 d_loc[sel], (pos[sel] - s0).astype(np.int64))
            )

    # pack pending subtiles into groups of GROUP within each (strip, window)
    for (st, w), subs in pending.items():
        for g0 in range(0, len(subs), GROUP):
            chunk = subs[g0 : g0 + GROUP]
            mask = np.zeros((BD, WORDS), np.uint16)
            cols = np.zeros(BS, np.int32)
            doff = np.zeros(GROUP, np.int32)
            for s, (blk_loc, ccols, rows, cpos) in enumerate(chunk):
                cols[s * CSUB : s * CSUB + len(ccols)] = ccols
                doff[s] = blk_loc * BD
                mask |= _pack_bits(rows, cpos + s * CSUB)
            it_key.append((st, w, 1))
            it_kind.append(1)
            it_masks.append(mask.view(np.int16))
            it_cols.append(cols)
            it_start.append(w * BS)
            it_strip.append(st)
            it_doff.append(doff)

    # every strip needs >= 1 item (zero-init + flush of its out block)
    seen = set(it_strip)
    for st in range(n_strips):
        if st not in seen:
            it_key.append((st, 0, 0))
            it_kind.append(0)
            it_masks.append(np.zeros((BD, WORDS), np.int16))
            it_cols.append(np.zeros(BS, np.int32))
            it_start.append(0)
            it_strip.append(st)
            it_doff.append(np.zeros(GROUP, np.int32))
    if not it_kind:  # completely empty graph
        it_key.append((0, 0, 0))
        it_kind.append(0)
        it_masks.append(np.zeros((BD, WORDS), np.int16))
        it_cols.append(np.zeros(BS, np.int32))
        it_start.append(0)
        it_strip.append(0)
        it_doff.append(np.zeros(GROUP, np.int32))

    order = sorted(range(len(it_key)), key=lambda i: it_key[i])
    kind = np.asarray([it_kind[i] for i in order], np.int32)
    masks = np.stack([it_masks[i] for i in order])
    col_idx = np.stack([it_cols[i] for i in order])
    src_start = np.asarray([it_start[i] for i in order], np.int32)
    strip_id = np.asarray([it_strip[i] for i in order], np.int32)
    dst_off = np.stack([it_doff[i] for i in order]).astype(np.int32)

    new_window = np.ones(len(kind), np.int32)
    new_window[1:] = (src_start[1:] != src_start[:-1]).astype(np.int32)
    wslot = (np.cumsum(new_window) - 1) % 2
    strip_first = np.ones(len(kind), np.int32)
    strip_first[1:] = (strip_id[1:] != strip_id[:-1]).astype(np.int32)
    strip_last = np.ones(len(kind), np.int32)
    strip_last[:-1] = (strip_id[1:] != strip_id[:-1]).astype(np.int32)

    straggler = None
    if ell_src:
        straggler = ell_from_csr(
            np.concatenate(ell_src), np.concatenate(ell_dst), n_pad
        )

    lay = CompactLayout(
        n, n_pad, n_src_pad, kind, masks, col_idx, src_start, strip_id,
        new_window, wslot.astype(np.int32), strip_first, strip_last,
        dst_off, nsub_from_masks(masks), straggler,
    )
    if cache_key:
        os.makedirs(os.path.dirname(cache_key) or ".", exist_ok=True)
        save = dict(
            n=n, n_src=n_src, n_pad=n_pad, n_src_pad=n_src_pad, kind=kind,
            masks=masks, col_idx=col_idx, src_start=src_start,
            strip_id=strip_id, new_window=new_window, wslot=lay.wslot,
            strip_first=strip_first, strip_last=strip_last, dst_off=dst_off,
            nsub=lay.nsub, me_ell=me_ell, full_cols=full_cols,
            compact_scheme=COMPACT_SCHEME,
        )
        ell_save_npz(save, straggler)
        np.savez(cache_key + ".npz", **save)
    return lay


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------


def _f_chunk(f: int) -> int:
    """Largest lane-aligned chunk of ``f`` that keeps window + accumulator +
    gather output inside ~13 MB of VMEM (budget ~FC * 32 KB)."""
    for fc in (384, 256, 128):
        if f % fc == 0:
            return fc
    return 0  # not lane-aligned: caller falls back to the jnp path


def _compact_kernel(
    fc: int, ss_ref, kd_ref, nw_ref, ws_ref, sf_ref, sl_ref, sid_ref,
    doff_ref, nsub_ref, mask_ref, colidx_ref, h_ref, out_ref, win, sems, acc,
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    c = pl.program_id(0)
    i = pl.program_id(1)
    nt = pl.num_programs(1)

    def dma(item, slot):
        start = pl.multiple_of(ss_ref[item], BS)
        col0 = pl.multiple_of(c * fc, 128)
        return pltpu.make_async_copy(
            h_ref.at[pl.ds(start, BS), pl.ds(col0, fc)], win.at[slot],
            sems.at[slot],
        )

    @pl.when(i == 0)
    def _():
        dma(0, ws_ref[0]).start()

    @pl.when(jnp.logical_and(i + 1 < nt, nw_ref[jnp.minimum(i + 1, nt - 1)] == 1))
    def _():
        dma(i + 1, ws_ref[jnp.minimum(i + 1, nt - 1)]).start()

    @pl.when(nw_ref[i] == 1)
    def _():
        dma(i, ws_ref[i]).wait()

    # expand the halfword bitmask to a [BD, BS] 0/1 bf16 matrix (identical
    # packing/expansion to spmm_block: lane l -> halfword l % WORDS after the
    # tile-semantics repeat, bit l // WORDS; i32 sign-extension is harmless)
    words = mask_ref[0]
    rep = pltpu.repeat(words.astype(jnp.int32), 16, axis=1)
    bit = jax.lax.broadcasted_iota(jnp.int32, (BD, BS), 1) // WORDS
    a = ((rep >> bit) & 1).astype(jnp.float32).astype(jnp.bfloat16)

    slot = ws_ref[i]
    wv = win[slot].astype(jnp.bfloat16)  # [BS, fc]

    @pl.when(sf_ref[i] == 1)
    def _():
        acc[:] = jnp.zeros_like(acc)

    @pl.when(kd_ref[i] == 0)
    def _():
        contrib = jnp.dot(a, wv, preferred_element_type=jnp.float32)
        off = pl.multiple_of(doff_ref[i, 0], BD)
        acc[pl.ds(off, BD), :] += contrib

    @pl.when(jnp.logical_and(kd_ref[i] == 1, nsub_ref[i] > 0))
    def _():
        colv = colidx_ref[...]  # [CIDX_ROWS, 128] i32 (row-major flat [BS])
        idx = jnp.broadcast_to(colv.reshape(BS, 1), (BS, fc))
        g = jnp.take_along_axis(wv, idx, axis=0)  # [BS, fc]
        for s in range(GROUP):
            # dummy-padded slots are a zero tail: skip their matmuls
            # (group fill is ~0.74 at products scale)
            @pl.when(nsub_ref[i] > s)
            def _():
                contrib = jnp.dot(
                    a[:, s * CSUB : (s + 1) * CSUB],
                    g[s * CSUB : (s + 1) * CSUB, :],
                    preferred_element_type=jnp.float32,
                )
                off = pl.multiple_of(doff_ref[i, s], BD)
                acc[pl.ds(off, BD), :] += contrib

    @pl.when(sl_ref[i] == 1)
    def _():
        out_ref[:] = acc[:].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _run_compact_pallas(
    layout: CompactDevice, h: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_src_pad, f = h.shape
    assert n_src_pad == layout.n_src_pad, (n_src_pad, layout.n_src_pad)
    fc = _f_chunk(f)
    assert fc, f
    n_pad = layout.n_pad
    t = layout.masks.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=9,
        grid=(f // fc, t),
        in_specs=[
            pl.BlockSpec(
                (1, BD, WORDS),
                lambda c, i, *s: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            # col_idx rides as [16 T, 128] i32 (a free row-major reshape of
            # [T, BS]): (16, 128) blocks satisfy the Mosaic (8, 128)
            # trailing-dims rule with ZERO tile padding — the [T, 1, BS]
            # alternative pads its 1-sublane dim to 8 (8x col_idx HBM,
            # +1.2 GB at Reddit scale)
            pl.BlockSpec(
                (CIDX_ROWS, 128), lambda c, i, *s: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.ANY),  # h stays in HBM
        ],
        out_specs=pl.BlockSpec(
            (STRIP, fc), lambda c, i, *s: (s[6][i], c), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, BS, fc), h.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((STRIP, fc), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_compact_kernel, fc),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, f), h.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(14.5 * 1024 * 1024),
        ),
    )(
        layout.src_start, layout.kind, layout.new_window, layout.wslot,
        layout.strip_first, layout.strip_last, layout.strip_id,
        layout.dst_off, layout.nsub, layout.masks,
        layout.col_idx.reshape(t * CIDX_ROWS, 128), h,
    )
    return out


def _expand_mask_np(words: jnp.ndarray) -> jnp.ndarray:
    """[BD, WORDS] i16 -> [BD, BS] 0/1 f32 (portable reference)."""
    w = words.astype(jnp.int32) & 0xFFFF
    bits = (w[..., None] >> jnp.arange(16, dtype=jnp.int32)) & 1
    # virtual column v = bit * WORDS + halfword
    return bits.transpose(0, 2, 1).reshape(BD, BS).astype(jnp.float32)


def _run_compact_jnp(layout: CompactDevice, h: jnp.ndarray) -> jnp.ndarray:
    """Portable (CPU-testable, traced-safe) reference of the item
    semantics. O(items x GROUP) dynamic updates — for tests and small
    CPU runs only."""
    f = h.shape[1]
    assert h.shape[0] == layout.n_src_pad
    out = jnp.zeros((layout.n_pad, f), jnp.float32)
    t = layout.masks.shape[0]
    for i in range(t):
        a = _expand_mask_np(layout.masks[i])
        window = jax.lax.dynamic_slice_in_dim(
            h, layout.src_start[i], BS, 0
        ).astype(jnp.float32)
        g = jnp.take(window, layout.col_idx[i], axis=0)
        base = layout.strip_id[i] * STRIP
        full = a @ window
        is_grp = layout.kind[i] == 1
        for s in range(GROUP):
            grp = a[:, s * CSUB : (s + 1) * CSUB] @ g[
                s * CSUB : (s + 1) * CSUB
            ]
            alt = full if s == 0 else jnp.zeros_like(grp)
            contrib = jnp.where(is_grp, grp, alt)
            r0 = base + layout.dst_off[i, s]
            cur = jax.lax.dynamic_slice_in_dim(out, r0, BD, 0)
            out = jax.lax.dynamic_update_slice_in_dim(out, cur + contrib, r0, 0)
    return out.astype(h.dtype)


def run_compact(
    layout: CompactDevice, h: jnp.ndarray, use_pallas: bool = True
) -> jnp.ndarray:
    """out = A^T h over [n_pad, F] arrays (rows >= n are zero padding).

    Accumulation is f32; output follows ``h.dtype`` (bf16 halves the big
    aggregation residents under agg_dtype=bfloat16, same as spmm_block).
    The Pallas path needs F divisible by a lane-aligned chunk
    (``_f_chunk``); callers pad F accordingly.
    """
    if use_pallas and not _f_chunk(h.shape[1]):
        use_pallas = False
    if use_pallas and not dynamic_gather_supported():
        raise RuntimeError(
            "spmm_compact's Pallas path needs Mosaic tpu.dynamic_gather "
            "beyond one vreg, which this backend cannot lower (see "
            "dynamic_gather_supported); use spmm_impl='block' or "
            "use_pallas=False (portable jnp path — hours at bench scale)"
        )
    if use_pallas:
        out = _run_compact_pallas(layout, h)
    else:
        out = _run_compact_jnp(layout, h)
    if layout.straggler is not None:
        ell = _run_ell(layout.straggler, h, acc_dtype=jnp.float32)
        out = out + ell.astype(h.dtype)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def spmm_compact(
    layout_fwd: CompactDevice, h: jnp.ndarray, reverse: CompactDevice,
    use_pallas: bool = True,
):
    """A^T h with compact-column tiles; VJP runs the reverse layout
    (the reference's prebuilt bwd_graph aggregation, ops.py:83-95)."""
    return run_compact(layout_fwd, h, use_pallas)


def _fwd(layout_fwd, h, reverse, use_pallas):
    return run_compact(layout_fwd, h, use_pallas), (
        reverse, jnp.zeros((0,), h.dtype)
    )


def _bwd(use_pallas, res, g):
    reverse, proto = res
    return (
        None,
        run_compact(reverse, g.astype(proto.dtype), use_pallas).astype(proto.dtype),
        None,
    )


spmm_compact.defvjp(_fwd, _bwd)
