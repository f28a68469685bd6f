"""Distributed GNN aggregation — the TPU-native analog of the reference's
autograd ops layer (``AdaQP/model/ops.py``).

One function, :func:`dist_aggregate`, covers the reference's four run modes
(``trainer.py:14-20``):

- exchange precision: fp32 (`Vanilla`/`AdaQP-p`) vs quantized
  (`AdaQP`/`AdaQP-q`), chosen by ``cfg.mode`` and ``train`` (evaluation
  always runs full precision, as in ``op_util.py:150-151``);
- overlap: the aggregation is decomposed by EDGE SOURCE into a local-src
  segment sum (independent of the exchange) and a halo-src segment sum
  (consumes exchanged rows). In overlapped modes XLA's async collectives
  hide the all-to-all behind the local aggregation; in non-overlapped modes
  an ``optimization_barrier`` forces the reference's serial schedule
  (exchange, then aggregate — ``ops.py:132-154``).

Backward passes come from JAX AD: the exchange carries a custom VJP that
transposes the routing (see ``comm/exchange.py``), and segment-sum
transposes reproduce the reference's reverse-graph aggregation
(``ops.py:17-67``) exactly for bidirected graphs and correctly for directed
ones.

Aggregation math (reference ``ops.py:17-67``, global degrees clamped >= 1):

- GCN      : out = D_in^-1/2 * A^T * (D_out^-1/2 * h)
- SAGE mean: out = (A^T h) / d_in
- SAGE gcn : out = (A^T h + h) / (d_in + 1)
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..comm.exchange import exchange_fp, exchange_quant, variance_proxy
from ..common.backend import tpu_path
from ..common.types import AggregatorType, GNNType
from ..graph.device import ShardArrays, ShardStatic
from .spmm import segment_spmm, spmm_csr


_compact_downgrade_warned = False


def _warn_compact_downgrade_once():
    """Direct dist_aggregate callers with compact shards on a TPU whose
    Mosaic gather probe fails would otherwise silently route into the
    portable jnp path (HOURS at bench scale); mirror the Trainer's
    redirect warning exactly once per process."""
    global _compact_downgrade_warned
    if not _compact_downgrade_warned:
        _compact_downgrade_warned = True
        import logging

        logging.getLogger("trainer").warning(
            "compact shards on a TPU without cross-vreg Mosaic gather: "
            "falling back to the portable jnp compact path (orders of "
            "magnitude slower at scale; use spmm_impl=block)"
        )


def pick_block_kernel(dev):
    """Tile-kernel dispatch by device-layout type (block/compact/strip)."""
    from .spmm_block import spmm_block
    from .spmm_compact import CompactDevice, spmm_compact
    from .spmm_strip import StripDevice, spmm_strip

    if isinstance(dev, CompactDevice):
        return spmm_compact
    if isinstance(dev, StripDevice):
        return spmm_strip
    return spmm_block


def _seg(src, dst, h, num_out, chunk):
    if chunk is None:
        return segment_spmm(src, dst, None, h, num_out)
    return spmm_csr(src, dst, None, h, num_out, chunk)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def pair_seg_spmm(l_max: int, r_pad: int, chunk, hl, hr, edges):
    """Local + halo segment-sum aggregation with a gather-form backward.

    ``edges = (fl_src, fl_dst, fh_src, fh_dst, bl_src, bl_dst, bh_src,
    bh_dst)``: forward lists and their prebuilt dst-sorted transposes
    (``graph/layout.py``). AD's transpose of the forward would be an
    UNSORTED scatter-add (~70 GB/s on TPU vs ~105-125 GB/s gathers,
    docs/DESIGN.md); the custom backward instead runs the same sorted
    gather+segment-sum on the transposed lists — the TPU-native analog of
    the reference aggregating gradients on its prebuilt ``bwd_graph``
    (``AdaQP/model/ops.py:83-95``).
    """
    fl_s, fl_d, fh_s, fh_d = edges[:4]
    return _seg(fl_s, fl_d, hl, l_max, chunk) + _seg(fh_s, fh_d, hr, l_max, chunk)


def _pair_seg_fwd(l_max, r_pad, chunk, hl, hr, edges):
    # zero-size dtype prototypes: cotangents must come back in the PRIMAL
    # dtypes (bf16 inputs under agg_dtype=bfloat16 get f32 cotangents from
    # the f32-accumulating backward otherwise — custom_vjp type error)
    protos = (jnp.zeros((0,), hl.dtype), jnp.zeros((0,), hr.dtype))
    return pair_seg_spmm(l_max, r_pad, chunk, hl, hr, edges), (edges, protos)


def _pair_seg_bwd(l_max, r_pad, chunk, res, g):
    edges, (pl, pr) = res
    bl_s, bl_d, bh_s, bh_d = edges[4:]
    g_l = _seg(bl_s, bl_d, g, l_max, chunk)
    g_r = _seg(bh_s, bh_d, g, r_pad, chunk)
    return g_l.astype(pl.dtype), g_r.astype(pr.dtype), None


pair_seg_spmm.defvjp(_pair_seg_fwd, _pair_seg_bwd)


def dist_aggregate(
    h: jnp.ndarray,
    sh: ShardArrays,
    cfg: ShardStatic,
    sink: jnp.ndarray,
    keys: Optional[jnp.ndarray],
    train: bool,
    quant_buckets=None,
    blocks=None,
    f_true: Optional[int] = None,
    bwd_live: bool = True,
    wire_plans=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Aggregate features/embeddings across the partitioned graph.

    ``h`` [L, F] per-shard local rows (called inside shard_map); ``sink``
    [r_pad] gradient tap (backward variance trace); ``keys`` stacked
    (fwd, bwd) PRNG keys for quantized mode; ``quant_buckets``
    (bucket_bits, bucket_arrays) from the assigner (dense padded wire) or
    None; ``wire_plans`` (wfwd, wbwd) :class:`~adaqp_tpu.comm.wire.WireDir`
    pair for the exact-size ragged wire (takes precedence; carries fp or
    quantized layouts).

    Returns ``(out [L, F], fwd_trace [K, S])`` where fwd_trace is the
    per-sent-lane variance proxy (reference ``@trace_input``,
    ``op_util.py:91-99``).
    """
    quantized = cfg.mode.quantized and train and (
        quant_buckets is not None or wire_plans is not None
    )
    ft = h.shape[1] if f_true is None else f_true
    fwd_trace = variance_proxy(h[sh.send_idx], ft)

    if cfg.k == 1:
        # single partition: no cross-partition messages exist
        remote = jnp.zeros((cfg.r_pad, h.shape[1]), jnp.float32)
    elif wire_plans is not None:
        from ..comm.exchange_ragged import exchange_ragged

        wfwd, wbwd = wire_plans
        remote = exchange_ragged(
            h, keys, sink, wfwd, wbwd if bwd_live else None,
            cfg.r_pad, h.shape[1], cfg.axis, ft,
        )
    elif quantized:
        bucket_bits, bucket_arrays = quant_buckets
        remote = exchange_quant(
            h, keys, sink, bucket_arrays, bucket_bits, cfg.r_pad, h.shape[1],
            cfg.axis, ft, bwd_live,
        )
    else:
        remote = exchange_fp(
            h, sh.send_idx, sh.recv_slot, sink, cfg.r_pad, cfg.axis, bwd_live
        )

    if not cfg.mode.overlapped:
        # serialize: local aggregation must wait for the exchange (Vanilla /
        # AdaQP-q schedule, reference ops.py:132-154)
        h, remote = jax.lax.optimization_barrier((h, remote))

    l = cfg.l_max
    if blocks is not None:
        # bitmask-MXU kernels (Pallas on TPU, jnp fallback elsewhere):
        # v1 full-bitmask (BlockShards), v2 compact-column (CompactShards),
        # or v3 strip window-reuse (StripShards)
        from .spmm_compact import CompactDevice, spmm_compact

        fl, bl, fh, bh = blocks.devices()
        kernel = pick_block_kernel(fl)
        dt = jnp.dtype(cfg.agg_dtype)
        use_pallas = tpu_path() and h.shape[1] % 128 == 0
        if kernel is spmm_compact and use_pallas:
            # hardware gate: the compact kernel's window permutation needs a
            # cross-vreg Mosaic gather (spmm_compact.dynamic_gather_supported);
            # fall back to the portable path (Trainer redirects compact->block
            # at scale before this point)
            from .spmm_compact import dynamic_gather_supported

            use_pallas = dynamic_gather_supported()
            if not use_pallas:
                _warn_compact_downgrade_once()

        def pair(hl, hr):
            # kernels emit dt (f32 accumulation inside); keeping the sum in
            # dt halves the [l_max, F] residents under agg_dtype=bfloat16 —
            # the downstream normalization/transform casts fuse
            a = kernel(fl, hl.astype(dt), bl, use_pallas)
            b = kernel(fh, hr.astype(dt), bh, use_pallas)
            return a + b

    else:
        edges = (
            sh.fl_src, sh.fl_dst, sh.fh_src, sh.fh_dst,
            sh.bl_src, sh.bl_dst, sh.bh_src, sh.bh_dst,
        )

        def pair(hl, hr):
            return pair_seg_spmm(l, cfg.r_pad, cfg.edge_chunk, hl, hr, edges)

    if cfg.model is GNNType.GCN:
        hs_local = h * jax.lax.rsqrt(sh.deg_out[:l])[:, None]
        hs_remote = remote * jax.lax.rsqrt(sh.deg_out[l:])[:, None]
        out = pair(hs_local, hs_remote) * jax.lax.rsqrt(sh.deg_in[:l])[:, None]
    elif cfg.model is GNNType.SAGE:
        agg = pair(h, remote)
        if cfg.agg_type is AggregatorType.MEAN:
            out = agg / sh.deg_in[:l, None]
        else:  # 'gcn' aggregator (reference ops.py:41-46)
            out = (agg + h) / (sh.deg_in[:l, None] + 1.0)
    else:
        raise ValueError(f"unknown model {cfg.model}")
    return out, fwd_trace
