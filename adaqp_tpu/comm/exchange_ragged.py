"""Boundary exchange over exact-size ragged wire buffers.

Device-side counterpart of ``comm/wire.py``: quantize boundary rows into a
flat uint32 send buffer (per-pair slices at exact sizes), move it with one
``ragged_all_to_all``, and dequantize/scatter at the receiver. Replaces the
dense per-bucket ``lax.all_to_all`` path (``comm/exchange.py``), whose wire
is padded to the worst channel capacity (round-1 VERDICT missing #2);
matches the reference's exact per-pair packed transfers
(``AdaQP/communicator/comm.py:193-222``).

Like ``exchange_quant``, this is a ``jax.custom_vjp`` whose backward is the
transpose of the forward routing: the receiver quantizes the cotangents of
its halo slots per the backward assignment and returns them over the
backward wire plan, where owners scatter-ADD them into local rows. The
``sink`` gradient tap surfaces per-slot backward variance traces; a ``None``
backward plan (layer 0) makes the whole backward a no-op.

Full precision rides the same machinery: a single 32-bit bucket, raw f32
words, no params (used by Vanilla/AdaQP-p so even the fp wire is exact).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import numpy as np
import jax.numpy as jnp
from jax import lax

from ..common.backend import tpu_path
from ..ops import quant
from .ragged import ragged_all_to_all
from .wire import WireDir


_FORCE_ROW_GRANULAR = None  # tests force the TPU pack form on CPU
_FORCE_SEG = None  # tests force the capped-segment pack on/off


def _row_granular() -> bool:
    """Row-granular buffer addressing (one scatter/gather descriptor per
    lane) — 33x faster on TPU, ~4x slower on XLA:CPU (EXPERIMENTS.md).
    The aligned wire layout supports both; results are identical."""
    if _FORCE_ROW_GRANULAR is not None:
        return _FORCE_ROW_GRANULAR
    return tpu_path()


def _seg_enabled(w: WireDir) -> bool:
    """Capped-segment (DUS) pack: whole contiguous per-slot blocks instead
    of one descriptor per row. Exact wires only (``w.has_seg``); even the
    row-granular scatter pays the ~20 ns/row-descriptor gather-engine
    floor (37.4 ms at the 1.86M-row products boundary vs 13.0 ms for the
    DUS form, round 4)."""
    if _FORCE_SEG is not None:
        return _FORCE_SEG and w.has_seg
    return w.has_seg


def _to_width(x: jnp.ndarray, width: int, fill=0.0) -> jnp.ndarray:
    """Slice or zero-pad the trailing axis to ``width``."""
    f = x.shape[-1]
    if f == width:
        return x
    if f > width:
        return x[..., :width]
    return jnp.pad(x, ((0, 0), (0, width - f)), constant_values=fill)


def _quant_to_words(rows, bits: int, key, f_true: int, f_wire: int):
    """rows [N, F] -> (data words u32 [N, wpr], param words u32 [N]).

    Words are in the word-interleaved format (``quant.pack_words``) on
    EVERY backend — the fused Pallas kernel and the portable jnp path
    produce the identical layout, so sender/receiver gate independently.
    """
    n = rows.shape[0]
    if tpu_path() and rows.shape[1] % 128 == 0 and f_wire <= rows.shape[1]:
        from ..ops import quant_pallas

        n_pad = -(-max(n, 1) // quant_pallas.ROW_BLOCK) * quant_pallas.ROW_BLOCK
        x = jnp.pad(rows, ((0, n_pad - n), (0, 0)))
        seed = jax.random.randint(key, (), 0, 2**31 - 1, dtype=jnp.int32)
        words, scale, rmin = quant_pallas.quantize_pack_rows_tpu(
            x, bits, seed, f_wire, f_true=f_true
        )
        words, scale, rmin = words[:n], scale[:n], rmin[:n]
    else:
        q, scale, rmin = quant.quantize_rows(rows, bits, key, f_true=f_true)
        words = quant.pack_words(_to_width(q, f_wire), bits)
    params = jnp.stack([scale, rmin], axis=-1).astype(jnp.bfloat16)
    pword = lax.bitcast_convert_type(params.reshape(n, 1, 2), jnp.uint32)[:, 0]
    return words, pword


def _words_to_rows(words, pwords, bits: int, f_true: int, f_wire: int, f_pad: int):
    """(data words [N, wpr], param words [N]) -> f32 rows [N, f_pad]."""
    n = words.shape[0]
    params = lax.bitcast_convert_type(
        pwords.reshape(n, 1), jnp.bfloat16
    ).reshape(n, 2)
    scale = params[:, 0].astype(jnp.float32)
    rmin = params[:, 1].astype(jnp.float32)
    if tpu_path() and f_pad % 128 == 0 and f_wire <= f_pad:
        from ..ops import quant_pallas

        rb = quant_pallas.ROW_BLOCK
        n_pad = -(-max(n, 1) // rb) * rb
        x = quant_pallas.unpack_dequantize_rows_tpu(
            jnp.pad(words, ((0, n_pad - n), (0, 0))),
            jnp.pad(scale, (0, n_pad - n), constant_values=1.0),
            jnp.pad(rmin, (0, n_pad - n)),
            bits, f_true, f_wire, f_pad,
        )
        return x[:n]
    q = quant.unpack_words(words, bits, f_wire)
    x = q.astype(jnp.float32) / scale[:, None] + rmin[:, None]
    if f_true < f_wire:
        x = jnp.where(jnp.arange(f_wire) < f_true, x, 0.0)
    return _to_width(x, f_pad)


def _bucket_words(w: WireDir, src, bi: int, b: int, key, f_true: int, rows_idx):
    """Gather one bucket's source rows per LANE (f32 ``[S, f_pad]``) and
    quantize each lane independently — reference semantics (per-peer
    independent draws, ``AdaQP/model/op_util.py:189-209``).

    Round 5 note: round 4 quantized each UNIQUE row once and gathered its
    wire WORDS per lane (fewer logical bytes), but ``scripts/packsplit.py``
    on the chip refuted it: a u32 ``[S, wpr]`` array with wpr not a
    multiple of 128 is lane-padded in HBM, and gathering it cost ~27 ms
    MORE per exchange at the products boundary than the f32 ``[S, 128]``
    row gather (8.8 ms) it replaced. Per-lane f32 gather + contiguous
    quantize is within ~2x of the HBM floor."""
    n = rows_idx.shape[0]
    if b != 32 and tpu_path():
        # pre-pad the INDEX to the kernel's row block: padding the gathered
        # f32 rows instead would copy the whole [S, 128] array again
        from ..ops import quant_pallas

        rbk = quant_pallas.ROW_BLOCK
        n_pad = -(-max(n, 1) // rbk) * rbk
        if n_pad != n:
            rows_idx = jnp.pad(rows_idx, (0, n_pad - n),
                               constant_values=2**30)
    rows = src[rows_idx]  # _PAD sentinels clamp-gather junk (dropped later)
    if b == 32:
        return lax.bitcast_convert_type(
            _to_width(rows.astype(jnp.float32), w.fw[bi]), jnp.uint32
        ), None
    words, pw = _quant_to_words(
        rows, b, jax.random.fold_in(key, bi), f_true, w.fw[bi]
    )
    return words[:n], pw[:n]


def _seg_pack_dir(w: WireDir, src: jnp.ndarray, key, f_true: int) -> jnp.ndarray:
    """Capped-segment pack: per (slot, bucket) one dynamic_update_slice of
    a contiguous block at its REAL word base. The send buffer reserves
    each pair slice at CAPPED size (``wire.py::slice_alloc``), so a capped
    block's junk tail — written past this shard's real count — always
    lands in its own slice's slack, never on a neighbour: write order is
    free, and writes group PER BUCKET (data on one ``[*, wpr]`` view per
    bucket, then all params on the flat view). Round 4 interleaved data
    and params per slot to heal junk by ascending-order overwrites, which
    forced a flat <-> ``[*, wpr]`` buffer relayout per slot (~24 ms per
    exchange at the 1.86M-row products boundary, round-5 packsplit)."""
    nb = len(w.bits)
    nslots = w.sg_base[0].shape[0] if nb else 0
    words = [None] * nb
    pwords = [None] * nb
    for bi, b in enumerate(w.bits):
        if w.sgq_rows[bi].shape[0] == 0:
            continue
        words[bi], pwords[bi] = _bucket_words(
            w, src, bi, b, key, f_true, w.sgq_rows[bi])
    sendbuf = jnp.zeros((w.sb_cap,), jnp.uint32)
    for bi in range(nb):
        if words[bi] is None:
            continue
        wpr = w.wpr[bi]
        buf2 = sendbuf.reshape(-1, wpr)
        for j in range(nslots):
            cap = w.sg_cap[bi][j]
            if cap == 0:
                continue
            blk = lax.dynamic_slice_in_dim(words[bi], w.sg_start[bi][j], cap, 0)
            buf2 = lax.dynamic_update_slice(buf2, blk, (w.sg_base[bi][j] // wpr, 0))
        sendbuf = buf2.reshape(-1)
    for bi in range(nb):
        if pwords[bi] is None:
            continue
        for j in range(nslots):
            cap = w.sg_cap[bi][j]
            if cap == 0:
                continue
            blkp = lax.dynamic_slice_in_dim(pwords[bi], w.sg_start[bi][j], cap, 0)
            sendbuf = lax.dynamic_update_slice_in_dim(
                sendbuf, blkp, w.sg_pbase[bi][j], 0
            )
    return sendbuf


def _seg_unpack_dir(
    w: WireDir,
    recvbuf: jnp.ndarray,
    out_len: int,
    scatter_add: bool,
    f_true: int,
    f_pad: int,
) -> jnp.ndarray:
    """Capped-segment unpack: per (slot, bucket) one dynamic_slice of a
    contiguous block (junk rows past the real count carry _PAD scatter
    rows and drop).

    Fwd direction (``.set``, unique destinations): the output is built by
    GATHER — ``rows_cat[w.sgd_inv]`` — instead of an f32 scatter; on TPU
    the [rows, 128] gather runs ~3x faster than the equivalent scatter
    (8.8 vs 26.0 ms at the 1.86M-row products boundary, round-5
    packsplit). Bwd (``.add``) keeps the scatter: duplicate destinations
    need the accumulation."""
    nb = len(w.bits)
    nslots = w.sg_rbase[0].shape[0] if nb else 0
    use_inv = (not scatter_add) and w.has_inv
    use_sort = scatter_add and w.has_sort
    rows_parts = []
    out = (None if (use_inv or use_sort)
           else jnp.zeros((out_len, f_pad), jnp.float32))
    for bi, b in enumerate(w.bits):
        if w.sgd_rows[bi].shape[0] == 0:
            continue
        wpr = w.wpr[bi]
        blocks = []
        pblocks = []
        for j in range(nslots):
            cap = w.sg_cap[bi][j]
            if cap == 0:
                continue
            blocks.append(lax.dynamic_slice(
                recvbuf.reshape(-1, wpr), (w.sg_rbase[bi][j] // wpr, 0),
                (cap, wpr),
            ))
            if b != 32:
                pblocks.append(lax.dynamic_slice_in_dim(
                    recvbuf, w.sg_rpbase[bi][j], cap, 0
                ))
        if not blocks:
            continue
        n_real = sum(b_.shape[0] for b_ in blocks)
        if b != 32 and tpu_path():
            # extend to the dequant kernel's row block HERE: one concat
            # covers the padding too (a jnp.pad on the concatenated [S,
            # wpr] words would copy the whole lane-padded array again)
            from ..ops import quant_pallas

            rbk = quant_pallas.ROW_BLOCK
            n_pad = -(-max(n_real, 1) // rbk) * rbk
            if n_pad != n_real:
                blocks.append(jnp.zeros((n_pad - n_real, wpr), jnp.uint32))
                # scale=1.0, rmin=0.0 as a packed bf16 pair: junk rows
                # decode finite (they are cropped before use)
                pblocks.append(jnp.full((n_pad - n_real,), 0x3F80,
                                        jnp.uint32))
        words = jnp.concatenate(blocks, axis=0)
        # lanes with zero-cap slots were never emitted: sgd_rows orders
        # lanes by slot prefix (sg_start), and zero-cap slots contribute
        # no lanes, so concatenation order matches
        if b == 32:
            rows = lax.bitcast_convert_type(words, jnp.float32)
            if f_true < w.fw[bi]:
                rows = jnp.where(jnp.arange(w.fw[bi]) < f_true, rows, 0.0)
            rows = _to_width(rows, f_pad)
        else:
            pw = jnp.concatenate(pblocks, axis=0)
            rows = _words_to_rows(words, pw, b, f_true, w.fw[bi], f_pad)
            rows = rows[:n_real]  # drop the row-block junk extension
        if use_inv or use_sort:
            rows_parts.append(rows)
        else:
            ref = out.at[w.sgd_rows[bi]]
            out = (ref.add(rows, mode="drop") if scatter_add
                   else ref.set(rows, mode="drop"))
    if use_inv:
        # concat order matches the builder's bucket_off (buckets with
        # S_b == 0 contribute nothing there too); never-received slots
        # carry the sentinel index S_tot -> clamp-gather + zero-select
        # (appending a zero row would copy the whole rows array)
        rows_cat = (rows_parts[0] if len(rows_parts) == 1
                    else jnp.concatenate(rows_parts, axis=0))
        inv = w.sgd_inv
        valid = inv < rows_cat.shape[0]
        out = jnp.where(
            valid[:, None],
            rows_cat[jnp.minimum(inv, rows_cat.shape[0] - 1)],
            0.0,
        )
        if out.shape[0] < out_len:
            out = jnp.pad(out, ((0, out_len - out.shape[0]), (0, 0)))
        elif out.shape[0] > out_len:
            out = out[:out_len]
    elif use_sort:
        # bwd: permute the concatenated rows into destination order, then
        # scatter-ADD with the sorted hint (2x the unsorted scatter on
        # TPU, probe_r5.py); junk lanes sort to the end and drop
        rows_cat = (rows_parts[0] if len(rows_parts) == 1
                    else jnp.concatenate(rows_parts, axis=0))
        out = jnp.zeros((out_len, f_pad), jnp.float32).at[
            w.sgd_rows_sorted
        ].add(
            rows_cat[w.sgd_sort], mode="drop",
            indices_are_sorted=True, unique_indices=False,
        )
    return out


def pack_dir(w: WireDir, src: jnp.ndarray, key, f_true: int) -> jnp.ndarray:
    """Quantize+pack this shard's ``src`` rows into the exact-layout send
    buffer (uint32 [sb_cap]) — the half of the exchange before the wire."""
    if _seg_enabled(w):
        return _seg_pack_dir(w, src, key, f_true)
    sendbuf = jnp.zeros((w.sb_cap,), jnp.uint32)
    for bi, b in enumerate(w.bits):
        cap = w.q_rows[bi].shape[0]
        if cap == 0:
            continue
        wpr = w.wpr[bi]
        words, pword = _bucket_words(
            w, src, bi, b, key, f_true, w.q_rows[bi])
        # segment offsets are wpr-aligned (wire.py builder); sentinel _PAD
        # offsets stay out of range after the // -> dropped
        if _row_granular():
            sendbuf = (
                sendbuf.reshape(-1, wpr)
                .at[w.q_off[bi] // wpr]
                .set(words, mode="drop")
                .reshape(-1)
            )
        else:
            idx = w.q_off[bi][:, None] + jnp.arange(wpr, dtype=jnp.int32)
            sendbuf = sendbuf.at[idx.reshape(-1)].set(
                words.reshape(-1), mode="drop"
            )
        if pword is not None:
            sendbuf = sendbuf.at[w.q_poff[bi]].set(pword, mode="drop")
    return sendbuf


def unpack_dir(
    w: WireDir,
    recvbuf: jnp.ndarray,
    out_len: int,
    scatter_add: bool,
    f_true: int,
    f_pad: int,
) -> jnp.ndarray:
    """Dequantize+scatter a received wire buffer into a fresh
    ``[out_len, f_pad]`` destination — the half after the wire."""
    if _seg_enabled(w):
        return _seg_unpack_dir(w, recvbuf, out_len, scatter_add, f_true, f_pad)
    out = jnp.zeros((out_len, f_pad), jnp.float32)
    for bi, b in enumerate(w.bits):
        cap = w.d_rows[bi].shape[0]
        if cap == 0:
            continue
        wpr = w.wpr[bi]
        if _row_granular():
            # row-granular gather (aligned layout); sentinel -> junk,
            # dropped by the scatter below
            row_idx = jnp.minimum(w.d_off[bi] // wpr, w.rb_cap // wpr - 1)
            words = recvbuf.reshape(-1, wpr)[row_idx]
        else:
            idx = w.d_off[bi][:, None] + jnp.arange(wpr, dtype=jnp.int32)
            words = recvbuf[jnp.minimum(idx, w.rb_cap - 1)]
        if b == 32:
            rows = lax.bitcast_convert_type(words, jnp.float32)
            if f_true < w.fw[bi]:
                rows = jnp.where(jnp.arange(w.fw[bi]) < f_true, rows, 0.0)
            rows = _to_width(rows, f_pad)
        else:
            pw = recvbuf[jnp.minimum(w.d_poff[bi], w.rb_cap - 1)]
            rows = _words_to_rows(words, pw, b, f_true, w.fw[bi], f_pad)
        ref = out.at[w.d_rows[bi]]
        out = ref.add(rows, mode="drop") if scatter_add else ref.set(rows, mode="drop")
    return out


def _run_dir(
    w: WireDir,
    src: jnp.ndarray,
    out_len: int,
    scatter_add: bool,
    key,
    f_true: int,
    f_pad: int,
    axis: str,
) -> jnp.ndarray:
    """One direction of the exchange for this shard: quantize ``src`` rows
    into the send buffer, ragged-all-to-all, dequantize into a fresh
    ``[out_len, f_pad]`` destination (``.set`` fwd / ``.add`` bwd)."""
    sendbuf = pack_dir(w, src, key, f_true)
    recvbuf = ragged_all_to_all(
        sendbuf,
        jnp.zeros((w.rb_cap,), jnp.uint32),
        w.in_off,
        w.send_sz,
        w.out_off,
        w.recv_sz,
        axis,
        w.slice_cap,
    )
    return unpack_dir(w, recvbuf, out_len, scatter_add, f_true, f_pad)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def exchange_ragged(
    h,
    keys,
    sink,
    wfwd: WireDir,
    wbwd: Optional[WireDir],
    r_pad: int,
    f_pad: int,
    axis: str,
    f_true: int,
):
    """Exact-wire boundary exchange. ``h`` [L, F=f_pad] local rows; ``keys``
    stacked (fwd, bwd) PRNG keys; ``sink`` [r_pad] gradient tap (cotangent =
    per-halo-slot backward variance trace); ``wfwd``/``wbwd``: this layer's
    :class:`WireDir` plans (``wbwd=None`` => backward no-op). Returns remote
    [r_pad, f_pad]."""
    remote, _ = _exchange_ragged_fwd(
        h, keys, sink, wfwd, wbwd, r_pad, f_pad, axis, f_true
    )
    return remote


def _exchange_ragged_fwd(h, keys, sink, wfwd, wbwd, r_pad, f_pad, axis, f_true):
    assert h.shape[1] == f_pad
    remote = _run_dir(
        wfwd, h, r_pad, False, None if keys is None else keys[0],
        f_true, f_pad, axis,
    )
    # zero-size proto carries h's dtype (residuals must be JAX types)
    return remote, (h.shape, jnp.zeros((0,), h.dtype), keys, wfwd, wbwd)


def _exchange_ragged_bwd(r_pad, f_pad, axis, f_true, res, g_remote):
    (l, f), proto, keys, wfwd, wbwd = res
    if wbwd is None:
        return (
            jnp.zeros((l, f), proto.dtype), None,
            jnp.zeros((r_pad,), jnp.float32), None, None,
        )
    # gradient rows carry the full message width (hidden layers only)
    ct = _run_dir(
        wbwd, g_remote, l, True, None if keys is None else keys[1],
        f_true, f_pad, axis,
    ).astype(proto.dtype)
    # backward variance trace keyed by halo slot (= this shard's wire-send
    # lanes; reference @trace_input on the gradient exchange, op_util.py:91-99)
    bwd_trace = jnp.zeros((r_pad,), jnp.float32)
    from .exchange import variance_proxy

    for bi in range(len(wbwd.bits)):
        if wbwd.q_rows[bi].shape[0] == 0:
            continue
        slots = wbwd.q_rows[bi]
        rows = g_remote[slots]
        bwd_trace = bwd_trace.at[slots].set(
            variance_proxy(rows, f_true), mode="drop"
        )
    return ct, None, bwd_trace, None, None


exchange_ragged.defvjp(_exchange_ragged_fwd, _exchange_ragged_bwd)
