"""Exact-size wire layout for the ragged boundary exchange.

Lowers an :class:`~adaqp_tpu.assigner.assignment.Assignment` (per-message
bit-widths) to flat word-buffer layouts consumed by the ragged exchange
(``comm/exchange_ragged.py``): each shard's send buffer packs, per receiver,
one contiguous slice ``[2-bit rows | 4-bit rows | 8-bit rows | param words]``
with *exact* sizes — the TPU-native analog of the reference's per-pair packed
transfers (``AdaQP/communicator/comm.py:193-222``, ``buffer.py:181-217``).
Receivers derive the identical layout from the replicated assignment, so no
metadata exchange is needed (the reference all-gathers layouts,
``buffer.py:219-231``).

Units are 32-bit WORDS: per bit-width bucket, features on the wire are
rounded to ``32/bits`` columns (2-bit: 16, 4-bit: 8, 8-bit: 4, fp32: exact)
so every row's packed stream is word-aligned — a ~1% overhead at real
feature widths vs the reference's exact-F bytes, vs the K x worst-pair
inflation of the dense all_to_all (round-1 VERDICT missing #2).
Full-precision (Vanilla) exchanges use the same machinery with a single
32-bit "bucket" and no params.

Compute-side arrays (gather/scatter indices) are padded to maxima over
shards — required for SPMD — but padding there only costs FLOPs; the wire
itself carries ``send_sizes`` words per pair, which :func:`wire_bytes`
accounts exactly.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import List, Optional, Sequence, Tuple

import jax
import numpy as np

from ..common.types import BITS_SET, WIRE_BITS_SET
from ..graph.layout import ExchangePlan
from ..assigner.assignment import Assignment

_PAD = np.int32(2**30)  # offset sentinel: beyond any buffer -> dropped
WIRE_LANE = 128  # u32 words per wire lane row (one (8,128) TPU tile lane)


def wire_cols(f_true: int, bits: int) -> int:
    """Feature columns on the wire for one bit-width bucket: the true width
    rounded up so each row's packed stream is whole 32-bit words."""
    m = 32 // bits  # values per word
    return -(-f_true // m) * m


def words_per_row(f_true: int, bits: int) -> int:
    return wire_cols(f_true, bits) * bits // 32


def _round8(x: int) -> int:
    return -(-x // 8) * 8 if x else 0


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "q_rows", "q_off", "q_poff", "in_off", "send_sz", "out_off",
        "recv_sz", "d_off", "d_poff", "d_rows",
        "sgq_rows", "sgd_rows", "sg_base", "sg_rbase", "sg_pbase",
        "sg_rpbase", "sgd_inv", "sgd_sort", "sgd_rows_sorted",
    ],
    meta_fields=["bits", "wpr", "has_params", "fw", "sb_cap", "rb_cap",
                 "slice_cap", "has_seg", "sg_cap", "sg_start", "has_inv",
                 "has_sort"],
)
@dataclasses.dataclass
class WireDir:
    """One direction (fwd or bwd) of one layer's exchange.

    Arrays are stacked ``[K, ...]`` (shard-major; slice ``[0]`` inside
    shard_map via :meth:`local`). Per-bucket tuples align with ``bits``.
    """

    # quantize side: per bucket, [K, cap_q_b]
    q_rows: Tuple[np.ndarray, ...]  # gather index into the message source
    q_off: Tuple[np.ndarray, ...]  # word offset of the lane's data in sendbuf
    q_poff: Tuple[np.ndarray, ...]  # word offset of the lane's params (or ())
    # ragged a2a args, [K, K]
    in_off: np.ndarray
    send_sz: np.ndarray
    out_off: np.ndarray
    recv_sz: np.ndarray
    # dequantize side: per bucket, [K, cap_d_b]
    d_off: Tuple[np.ndarray, ...]  # word offset of the lane's data in recvbuf
    d_poff: Tuple[np.ndarray, ...]
    d_rows: Tuple[np.ndarray, ...]  # scatter index into the destination
    # capped-segment (DUS) pack metadata — EXACT wires only (has_seg):
    # per bucket, lanes laid out slot-major at STATIC per-slot caps
    # (max over shards), so pack/unpack move whole contiguous blocks with
    # dynamic_update_slice / dynamic_slice instead of one descriptor per
    # row (~20 ns/row gather-engine floor; measured 37.4 -> 13.0 ms at the
    # products boundary). Bases are REAL word offsets (traced, per shard);
    # writes go in ascending-base order so capped junk tails are healed by
    # the next block's write; empty slots write/read a slack region past
    # the shipped words.
    sgq_rows: Tuple[np.ndarray, ...]  # [K, S_b] capped gather rows (_PAD junk)
    sgd_rows: Tuple[np.ndarray, ...]  # [K, S_b] capped scatter rows (_PAD junk)
    sg_base: Tuple[np.ndarray, ...]   # [K, K-1] send data word base per slot
    sg_rbase: Tuple[np.ndarray, ...]  # [K, K-1] recv data word base per slot
    sg_pbase: Tuple[np.ndarray, ...]  # [K, K-1] send param word base per slot
    sg_rpbase: Tuple[np.ndarray, ...]  # [K, K-1] recv param word base per slot
    # fwd unpack gather map: dst slot -> position in the bucket-concatenated
    # seg-lane row array (dummy [K, 8] when has_inv is False — zero-size
    # leaves break shard_map sharding)
    sgd_inv: np.ndarray
    # bwd unpack sorted-scatter maps (duplicate destinations): permutation
    # of the concatenated lane rows by destination, and the destinations in
    # that order (dummy [K, 8] when has_sort is False)
    sgd_sort: np.ndarray
    sgd_rows_sorted: np.ndarray
    # static
    bits: Tuple[int, ...]
    wpr: Tuple[int, ...]
    has_params: bool
    fw: Tuple[int, ...]  # per-bucket wire columns (word-aligned true width)
    sb_cap: int  # send buffer words (max over shards)
    rb_cap: int  # recv buffer words
    slice_cap: int  # max single pair slice (CPU-emulation padding)
    has_seg: bool  # capped-segment metadata present (exact wires)
    sg_cap: Tuple[Tuple[int, ...], ...]  # per bucket: per-slot lane caps
    sg_start: Tuple[Tuple[int, ...], ...]  # per bucket: slot prefix starts
    has_inv: bool  # sgd_inv is a real inverse map (unique destinations)
    has_sort: bool  # sgd_sort/sgd_rows_sorted are real (duplicate dsts)

    def local(self) -> "WireDir":
        return jax.tree.map(lambda a: a[0], self)


def _build_dir(
    channels: dict,
    k: int,
    f_true: int,
    bits_set: Sequence[int],
    has_params: bool,
    static_shapes: bool = False,
) -> WireDir:
    """Build one direction's layout.

    ``channels[(ws, wr)] = (bits_per_lane, gather_idx, scatter_idx)`` for the
    wire-sender ``ws`` -> wire-receiver ``wr`` channel, lanes in the shared
    canonical order (plan lane order).

    ``static_shapes``: round every shape-determining capacity (per-bucket
    lane caps, buffer caps, slice cap) UP to the next power of two, so
    reassignments that keep each bucket within its bracket produce
    identically-shaped plans and the jitted step's cache hits instead of
    retracing. Offsets and ``send_sz`` stay EXACT per assignment (zero
    extra wire bytes); the cost is < 2x (mean ~1.4x) sentinel lanes in the
    pack/unpack compute.
    """
    nb = len(bits_set)
    wpr = [words_per_row(f_true, b) for b in bits_set]
    fw = [wire_cols(f_true, b) for b in bits_set]
    # Buffer offsets are ALIGNED so every bucket segment starts at a
    # multiple of its words-per-row: pack/unpack can then address the
    # buffers as [rows, wpr] with ONE scatter/gather descriptor per lane
    # instead of one per word (measured 205 ms -> 6 ms per direction at
    # Reddit-scale boundary sizes; EXPERIMENTS.md). Slice starts are
    # aligned to lcm(wpr, WIRE_LANE) — the gap words between slices are
    # NOT shipped (the a2a rounds each pair's size up to whole 128-word
    # lane rows, <= 508 B/pair); intra-slice inter-segment gaps (< wpr
    # words each) are. The WIRE_LANE factor lets the ragged all-to-all
    # ship [rows, 128] u32 lane rows: XLA:TPU tiles a 1-D collective
    # operand at ONE ELEMENT per (8,128) tile — a 512x HBM blowup that
    # made the K=8 products-scale compile demand 57 GiB for one wire
    # buffer (round 4, PRODUCTS8 artifact).
    align = int(np.lcm.reduce(np.asarray(wpr + [WIRE_LANE], np.int64)))

    def _align(x: int, m: int) -> int:
        return -(-x // m) * m

    # ---- per (ws, wr, b): lane partitions ----
    lanes = {}
    for (ws, wr), (bl, gi, si) in channels.items():
        for bi, b in enumerate(bits_set):
            sel = np.where(bl == b)[0]
            lanes[(ws, wr, bi)] = (gi[sel], si[sel])

    def pair_layout(ws, wr):
        """Relative in-slice layout: (per-bucket segment start, params
        start, slice words). Identical on sender and receiver — both bases
        are lcm-aligned, so absolute segment starts stay wpr-aligned."""
        w = 0
        seg = []
        n_lanes = 0
        for bi in range(nb):
            c = len(lanes.get((ws, wr, bi), ((), ()))[0])
            if c:
                w = _align(w, wpr[bi])
            seg.append(w)
            w += c * wpr[bi]
            n_lanes += c
        params_rel = w
        if has_params:
            w += n_lanes
        return seg, params_rel, w

    def _pow2(x: int) -> int:
        return 1 << (max(x, 1) - 1).bit_length()

    # ---- capped-segment slot caps (computed early: the send-buffer
    # allocation below spaces slices at CAPPED size) ----
    peers = {ws: [wr for wr in range(k) if wr != ws] for ws in range(k)}
    # per-slot lane caps: one static cap per (slot, bucket) must cover
    # BOTH mappings — sender ws's j-th peer (ws -> peers[ws][j]) and
    # receiver wr's j-th peer (peers[wr][j] -> wr) — across all shards
    cap_mat = []
    for bi in range(nb):
        caps = [
            max(
                max((len(lanes.get((ws, peers[ws][j], bi), ((), ()))[0])
                     for ws in range(k)), default=0),
                max((len(lanes.get((peers[wr][j], wr, bi), ((), ()))[0])
                     for wr in range(k)), default=0),
            )
            for j in range(k - 1)
        ]
        if static_shapes:
            caps = [_pow2(c) if c else 0 for c in caps]
        # lane-row rounding: cap * wpr a whole number of 128-word rows so
        # capped blocks can move as (8, 128) u32 tiles; deterministic in
        # the cap, so static_shapes cache stability is preserved
        lane_q = WIRE_LANE // int(np.gcd(wpr[bi], WIRE_LANE))
        caps = [-(-c // lane_q) * lane_q if c else 0 for c in caps]
        cap_mat.append(tuple(caps))

    def slice_alloc(ws, wr):
        """Send-buffer words to RESERVE for pair (ws, wr): the capped
        write extent. Capped-segment DUS writes whole per-slot capped
        blocks; with each slice allocated at capped size, a shard whose
        real count is below the cap spills junk into its OWN slack, never
        into the next slice — which frees the pack to group writes per
        bucket (one buffer view each) instead of interleaving data and
        params per slot (round 4's healing order cost a [*, wpr] <->
        flat relayout per slot, ~24 ms/exchange at the products
        boundary). Shipped bytes stay EXACT (send_sz). Cost: sb_cap is
        sum-of-caps (max over shards per slot) instead of max-shard
        exact — +15-18% HBM at the products LDG partition (measured; the
        v5e:2x4 products compile still fits at 11.8 GB temps of 16 GB);
        heavier partition skew pays proportionally more. Recv-side
        spacing stays exact (the a2a writes real sizes; capped unpack
        READS may spill into the next slice, which is junk-safe)."""
        j = peers[ws].index(wr)
        w = sum(cap_mat[bi][j] * wpr[bi] + (wpr[bi] - 1) for bi in range(nb))
        if has_params:
            w += sum(cap_mat[bi][j] for bi in range(nb))
        return w

    # ---- a2a offset/size tables ----
    in_off = np.zeros((k, k), np.int32)
    send_sz = np.zeros((k, k), np.int32)
    sb_tot = 1
    for ws in range(k):
        o = 0
        for wr in range(k):
            in_off[ws, wr] = o
            if wr != ws:
                send_sz[ws, wr] = pair_layout(ws, wr)[2]
                assert slice_alloc(ws, wr) >= int(send_sz[ws, wr])
                o += _align(slice_alloc(ws, wr), align)
        sb_tot = max(sb_tot, o)
    recv_sz = send_sz.T.copy()  # recv_sz[wr, ws]
    roff = np.zeros((k, k), np.int32)  # recvbuf offset of ws's slice at wr
    for wr in range(k):
        o = 0
        for ws in range(k):
            roff[wr, ws] = o
            o += _align(int(recv_sz[wr, ws]), align)
    out_off = roff.T.copy()  # out_off[ws, wr]

    sb_cap = _align(sb_tot, align)
    rb_cap = _align(max(int((roff + recv_sz).max()) if k > 1 else 0, 1), align)
    slice_cap = max(int(send_sz.max()), 1)
    if static_shapes:
        sb_cap = _align(_pow2(sb_cap), align)
        rb_cap = _align(_pow2(rb_cap), align)
        slice_cap = _pow2(slice_cap)

    # ---- per-bucket lane tables ----
    caps_q = [
        _round8(
            max(
                (
                    sum(len(lanes.get((ws, wr, bi), ((), ()))[0]) for wr in range(k))
                    for ws in range(k)
                ),
                default=0,
            )
        )
        for bi in range(nb)
    ]
    caps_d = [
        _round8(
            max(
                (
                    sum(len(lanes.get((ws, wr, bi), ((), ()))[0]) for ws in range(k))
                    for wr in range(k)
                ),
                default=0,
            )
        )
        for bi in range(nb)
    ]
    if static_shapes:
        caps_q = [_pow2(c) if c else 0 for c in caps_q]
        caps_d = [_pow2(c) if c else 0 for c in caps_d]

    # sentinel _PAD on every index array: gathers clamp (junk values) and
    # scatters drop, so padding lanes are inert end-to-end
    q_rows = [np.full((k, caps_q[bi]), _PAD, np.int32) for bi in range(nb)]
    q_off = [np.full((k, caps_q[bi]), _PAD, np.int32) for bi in range(nb)]
    q_poff = [np.full((k, caps_q[bi]), _PAD, np.int32) for bi in range(nb)]
    d_off = [np.full((k, caps_d[bi]), _PAD, np.int32) for bi in range(nb)]
    d_poff = [np.full((k, caps_d[bi]), _PAD, np.int32) for bi in range(nb)]
    # scatter sentinel: one past any valid destination row; the destination
    # array is sized so this drops (mode="drop")
    d_rows = [np.full((k, caps_d[bi]), _PAD, np.int32) for bi in range(nb)]

    # walk every pair slice in its canonical order, assigning word offsets
    for ws in range(k):
        fill_q = [0] * nb
        for wr in range(k):
            if wr == ws:
                continue
            base = int(in_off[ws, wr])
            seg, params_rel, size = pair_layout(ws, wr)
            assert size == send_sz[ws, wr]
            lane_cursor = 0  # lane position within the pair slice
            for bi in range(nb):
                gi, _ = lanes.get((ws, wr, bi), (np.zeros(0, np.int64),) * 2)
                c = len(gi)
                if c == 0:
                    continue
                assert (base + seg[bi]) % wpr[bi] == 0
                sl = slice(fill_q[bi], fill_q[bi] + c)
                q_rows[bi][ws, sl] = gi
                q_off[bi][ws, sl] = (
                    base + seg[bi] + np.arange(c, dtype=np.int32) * wpr[bi]
                )
                if has_params:
                    q_poff[bi][ws, sl] = (
                        base + params_rel + lane_cursor
                        + np.arange(c, dtype=np.int32)
                    )
                fill_q[bi] += c
                lane_cursor += c

    for wr in range(k):
        fill_d = [0] * nb
        for ws in range(k):
            if ws == wr:
                continue
            base = int(roff[wr, ws])
            seg, params_rel, _size = pair_layout(ws, wr)
            lane_cursor = 0
            for bi in range(nb):
                _, si = lanes.get((ws, wr, bi), (np.zeros(0, np.int64),) * 2)
                c = len(si)
                if c == 0:
                    continue
                assert (base + seg[bi]) % wpr[bi] == 0
                sl = slice(fill_d[bi], fill_d[bi] + c)
                d_rows[bi][wr, sl] = si
                d_off[bi][wr, sl] = (
                    base + seg[bi] + np.arange(c, dtype=np.int32) * wpr[bi]
                )
                if has_params:
                    d_poff[bi][wr, sl] = (
                        base + params_rel + lane_cursor
                        + np.arange(c, dtype=np.int32)
                    )
                fill_d[bi] += c
                lane_cursor += c

    # ---- capped-segment (DUS) pack metadata ----
    # exact wires: caps = max-over-shards counts. static_shapes wires:
    # per-slot caps rounded to pow2 so reassignments that keep each
    # slot-bucket inside its bracket produce identically-shaped metadata
    # (jit cache hit) — bases stay exact per assignment (traced data).
    has_seg = True
    has_inv = False
    has_sort = False
    sgd_inv = np.zeros((k, 8), np.int32)
    sgd_sort = np.zeros((k, 8), np.int32)
    sgd_rows_sorted = np.zeros((k, 8), np.int32)
    sgq_rows: Tuple = ()
    sgd_rows: Tuple = ()
    sg_base: Tuple = ()
    sg_rbase: Tuple = ()
    sg_pbase: Tuple = ()
    sg_rpbase: Tuple = ()
    sg_cap: Tuple = ()
    sg_start: Tuple = ()
    if has_seg:
        # cap_mat / peers computed above (the send allocation spaces
        # slices at capped size)
        sg_cap = tuple(cap_mat)
        sg_start = tuple(
            tuple(int(np.cumsum([0] + list(c))[j]) for j in range(k - 1))
            for c in cap_mat
        )
        # slack: one slot's worst-case capped write past its real data
        slot_words = [
            sum(cap_mat[bi][j] * wpr[bi] for bi in range(nb))
            + (sum(cap_mat[bi][j] for bi in range(nb)) if has_params else 0)
            for j in range(k - 1)
        ]
        slack = max(slot_words, default=0)
        slack_s, slack_r = sb_cap, rb_cap
        sb_cap = _align(sb_cap + slack + 1, align)
        rb_cap = _align(rb_cap + slack + 1, align)
        S = [int(sum(c)) for c in cap_mat]
        sgq_rows = [np.full((k, S[bi]), _PAD, np.int32) for bi in range(nb)]
        sgd_rows = [np.full((k, S[bi]), _PAD, np.int32) for bi in range(nb)]
        sg_base = [np.full((k, k - 1), slack_s, np.int32) for _ in range(nb)]
        sg_rbase = [np.full((k, k - 1), slack_r, np.int32) for _ in range(nb)]
        sg_pbase = [np.full((k, k - 1), slack_s, np.int32) for _ in range(nb)]
        sg_rpbase = [np.full((k, k - 1), slack_r, np.int32) for _ in range(nb)]
        for ws in range(k):
            for j, wr in enumerate(peers[ws]):
                base = int(in_off[ws, wr])
                seg, params_rel, _sz = pair_layout(ws, wr)
                cursor = 0
                for bi in range(nb):
                    gi, _ = lanes.get((ws, wr, bi), (np.zeros(0, np.int64),) * 2)
                    if len(gi):
                        sg_base[bi][ws, j] = base + seg[bi]
                        st = sg_start[bi][j]
                        sgq_rows[bi][ws, st:st + len(gi)] = gi
                        if has_params:
                            sg_pbase[bi][ws, j] = base + params_rel + cursor
                    cursor += len(gi)
        for wr in range(k):
            for j, ws in enumerate(peers[wr]):
                base = int(roff[wr, ws])
                seg, params_rel, _sz = pair_layout(ws, wr)
                cursor = 0
                for bi in range(nb):
                    _, si = lanes.get((ws, wr, bi), (np.zeros(0, np.int64),) * 2)
                    if len(si):
                        sg_rbase[bi][wr, j] = base + seg[bi]
                        st = sg_start[bi][j]
                        sgd_rows[bi][wr, st:st + len(si)] = si
                        if has_params:
                            sg_rpbase[bi][wr, j] = base + params_rel + cursor
                    cursor += len(si)
        # ---- inverse destination map (round 5) ----
        # When every destination slot receives AT MOST ONE lane (fwd
        # wires: each halo slot has exactly one sender), unpack can build
        # the output by GATHER — out[slot] = rows_cat[sgd_inv[slot]] —
        # instead of scatter.  On TPU a [rows, 128] f32 gather runs ~3x
        # faster than the equivalent scatter (8.8 vs 26.0 ms at the
        # products boundary, round-5 packsplit).  Slots that receive
        # nothing point at the appended zero row (index S_total).
        bucket_off = np.cumsum([0] + S)
        S_tot = int(bucket_off[-1])
        unique_ok = True
        per_sh = []
        dmax = -1
        for wr in range(k):
            dsts, poss = [], []
            for bi in range(nb):
                arr = sgd_rows[bi][wr]
                m = arr != _PAD
                dsts.append(arr[m].astype(np.int64))
                poss.append(
                    np.nonzero(m)[0].astype(np.int64) + bucket_off[bi]
                )
            d = np.concatenate(dsts) if dsts else np.zeros(0, np.int64)
            p = np.concatenate(poss) if poss else np.zeros(0, np.int64)
            if unique_ok and len(d) and len(np.unique(d)) != len(d):
                unique_ok = False  # bwd wires: duplicate dst -> scatter-add
            per_sh.append((d, p))
            if len(d):
                dmax = max(dmax, int(d.max()))
        if unique_ok and dmax >= 0:
            has_inv = True
            inv_len = _round8(dmax + 1)
            sgd_inv = np.full((k, inv_len), S_tot, np.int32)
            for wr, (d, p) in enumerate(per_sh):
                sgd_inv[wr, d] = p.astype(np.int32)
        elif dmax >= 0 and S_tot:
            # duplicate destinations (bwd wires): precompute a destination-
            # SORTED permutation of the concatenated lane rows so the
            # runtime scatter-ADD can pass indices_are_sorted (2x on TPU:
            # 14.5 vs 28.4 ms at the products boundary, probe_r5.py).
            # _PAD junk sorts to the end (it exceeds every real row) and
            # still drops.
            has_sort = True
            sgd_sort = np.zeros((k, S_tot), np.int32)
            sgd_rows_sorted = np.full((k, S_tot), _PAD, np.int32)
            for wr, (d, p) in enumerate(per_sh):
                cat = np.full((S_tot,), np.int64(_PAD))
                cat[p] = d
                order = np.argsort(cat, kind="stable").astype(np.int32)
                sgd_sort[wr] = order
                sgd_rows_sorted[wr] = cat[order].astype(np.int32)

        sgq_rows = tuple(sgq_rows)
        sgd_rows = tuple(sgd_rows)
        sg_base = tuple(sg_base)
        sg_rbase = tuple(sg_rbase)
        sg_pbase = tuple(sg_pbase) if has_params else ()
        sg_rpbase = tuple(sg_rpbase) if has_params else ()

    return WireDir(
        q_rows=tuple(q_rows),
        q_off=tuple(q_off),
        q_poff=tuple(q_poff) if has_params else (),
        in_off=in_off,
        send_sz=send_sz,
        out_off=out_off,
        recv_sz=recv_sz,
        d_off=tuple(d_off),
        d_poff=tuple(d_poff) if has_params else (),
        d_rows=tuple(d_rows),
        sgq_rows=sgq_rows,
        sgd_rows=sgd_rows,
        sg_base=sg_base,
        sg_rbase=sg_rbase,
        sg_pbase=sg_pbase,
        sg_rpbase=sg_rpbase,
        sgd_inv=sgd_inv,
        has_inv=has_inv,
        sgd_sort=sgd_sort,
        sgd_rows_sorted=sgd_rows_sorted,
        has_sort=has_sort,
        bits=tuple(int(b) for b in bits_set),
        wpr=tuple(wpr),
        has_params=has_params,
        fw=tuple(fw),
        sb_cap=sb_cap,
        rb_cap=rb_cap,
        slice_cap=slice_cap,
        has_seg=has_seg,
        sg_cap=sg_cap,
        sg_start=sg_start,
    )


def _fwd_channels(plan: ExchangePlan, fwd_bits: np.ndarray, k: int) -> dict:
    ch = {}
    for s in range(k):
        for r in range(k):
            cnt = int(plan.counts[s, r])
            if s == r or cnt == 0:
                continue
            ch[(s, r)] = (
                fwd_bits[s, r, :cnt],
                plan.send_idx[s, r, :cnt],
                plan.recv_slot[r, s, :cnt],
            )
    return ch


def _bwd_channels(plan: ExchangePlan, bwd_bits: np.ndarray, k: int) -> dict:
    """Backward: receiver r returns halo-slot gradients to owner s (wire
    sender = r). Gather from g_remote by slot; scatter-ADD into local rows."""
    ch = {}
    for r in range(k):
        offset = 0
        for s in range(k):
            if s == r:
                continue
            cnt = int(plan.counts[s, r])
            if cnt:
                slots = np.arange(offset, offset + cnt)
                ch[(r, s)] = (
                    bwd_bits[r, slots],
                    slots.astype(np.int64),
                    plan.send_idx[s, r, :cnt],
                )
            offset += cnt
    return ch


def wire_from_assignment(
    plan: ExchangePlan,
    assignment: Assignment,
    layer_dims: Sequence[int],
    static_shapes: bool = False,
    bits_set: Sequence[int] = BITS_SET,
) -> List[Tuple[WireDir, Optional[WireDir]]]:
    """Quantized wire plans per layer: ``(fwd, bwd)``; bwd is ``None`` for
    layer 0 (input features carry no gradient, reference
    ``assigner.py:275-285``). ``layer_dims``: TRUE message width per layer
    (features for layer 0, hidden beyond).

    ``static_shapes``: round allocation capacities to powers of two so
    typical reassignments produce identically-shaped plans (jit cache hit
    instead of a retrace); offsets and wire sizes stay exact.

    ``bits_set``: the bucket vocabulary — pass the assigner's
    ``bits_options`` (e.g. ``WIRE_BITS_SET`` with fp32 lanes enabled) so
    the plan shapes stay stable across reassignments; b=32 lanes ship raw
    f32 words (their reserved param words stay zero)."""
    k = plan.send_idx.shape[0]
    out = []
    for layer in range(assignment.num_layers):
        ft = int(layer_dims[layer])
        fwd = _build_dir(
            _fwd_channels(plan, assignment.fwd[layer], k), k, ft, bits_set,
            True, static_shapes=static_shapes,
        )
        bwd = None
        if layer > 0:
            bwd = _build_dir(
                _bwd_channels(plan, assignment.bwd[layer], k), k, ft,
                bits_set, True, static_shapes=static_shapes,
            )
        out.append((fwd, bwd))
    return out


def wire_fp(plan: ExchangePlan, layer_dims: Sequence[int], num_layers: int
            ) -> List[Tuple[WireDir, Optional[WireDir]]]:
    """Full-precision wire plans (Vanilla / AdaQP-p): single 32-bit bucket,
    no params — exact per-pair fp32 transfers."""
    k = plan.send_idx.shape[0]
    lm = np.arange(plan.send_idx.shape[2])[None, None, :] < plan.counts[:, :, None]
    fwd_bits = np.where(lm, 32, 0).astype(np.int32)
    slot = np.arange(plan.r_pad)[None, :]
    bwd_bits = np.where(slot < plan.num_remote[:, None], 32, 0).astype(np.int32)
    out = []
    for layer in range(num_layers):
        ft = int(layer_dims[layer])
        fwd = _build_dir(_fwd_channels(plan, fwd_bits, k), k, ft, (32,), False)
        bwd = None
        if layer > 0:
            bwd = _build_dir(_bwd_channels(plan, bwd_bits, k), k, ft, (32,), False)
        out.append((fwd, bwd))
    return out


def wire_bytes(dirs: Sequence[WireDir]) -> int:
    """Total wire bytes one training step moves for the given directions
    (sum of true per-pair slice sizes across all shards)."""
    return int(sum(int(d.send_sz.sum()) * 4 for d in dirs))


def exact_message_bytes(
    plan: ExchangePlan, assignment: Assignment, layer_dims: Sequence[int],
    param_bytes: int = 4,
) -> int:
    """Reference-exact packed byte count (``get_qsize`` math,
    ``buffer.py:181-186``): per message ``ceil(F_true * bits / 8)`` data
    bytes + params, at exact (unaligned) feature width."""
    k = plan.send_idx.shape[0]
    total = 0
    for layer in range(assignment.num_layers):
        ft = int(layer_dims[layer])
        fb = assignment.fwd[layer]
        for s in range(k):
            for r in range(k):
                cnt = int(plan.counts[s, r])
                if s == r or cnt == 0:
                    continue
                bl = fb[s, r, :cnt]
                for b in WIRE_BITS_SET:
                    c = int((bl == b).sum())
                    total += c * (-(-ft * b // 8) + param_bytes)
        if layer > 0:
            bb = assignment.bwd[layer]
            for r in range(k):
                valid = bb[r, : int(plan.num_remote[r])]
                for b in WIRE_BITS_SET:
                    c = int((valid == b).sum())
                    total += c * (-(-ft * b // 8) + param_bytes)
    return total
