"""Sparse neighbor aggregation (SpMM) for GNN message passing.

The reference delegates SpMM to DGL's ``update_all(copy_src, sum)``
(``AdaQP/model/ops.py:17-32``). Here aggregation is expressed TPU-natively:

- :func:`segment_spmm` — one-shot gather + ``segment_sum`` over the edge
  list. Materializes an [E, F] intermediate; right for small/medium graphs
  and the CPU test mesh.
- :func:`spmm_csr` — edge-chunked ``lax.scan`` (gather chunk, scatter-add
  chunk) with a bounded [chunk, F] working set, so HBM footprint stays
  O(chunk * F) regardless of edge count. Edges must be padded to a multiple
  of the chunk size with ``dst == num_nodes`` (out-of-range dsts drop).

Both paths assume edges pre-sorted by ``dst`` (CSR order) — produced by the
graph preprocessing layer — which lets XLA use sorted-scatter fast paths.

A fused Pallas CSR kernel is the planned next step for the hot path; these
jnp forms are the semantic reference it must match.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("num_nodes",))
def segment_spmm(
    src: jnp.ndarray,
    dst: jnp.ndarray,
    w: Optional[jnp.ndarray],
    h: jnp.ndarray,
    num_nodes: int,
) -> jnp.ndarray:
    """out[v] = sum over edges (u -> v) of w_e * h[u].

    ``src``/``dst`` int32 [E] (dst-sorted), ``w`` f32 [E] or None (= 1),
    ``h`` [N_in, F]. Returns [num_nodes, F] in ``h.dtype``.
    """
    msg = h[src]
    if w is not None:
        msg = msg * w[:, None].astype(msg.dtype)
    return jax.ops.segment_sum(
        msg, dst, num_segments=num_nodes, indices_are_sorted=True
    )


@partial(jax.jit, static_argnames=("num_nodes", "chunk"))
def spmm_csr(
    src: jnp.ndarray,
    dst: jnp.ndarray,
    w: Optional[jnp.ndarray],
    h: jnp.ndarray,
    num_nodes: int,
    chunk: int = 1 << 16,
) -> jnp.ndarray:
    """Memory-bounded SpMM: scan over edge chunks of size ``chunk``.

    Requires ``E % chunk == 0`` (pad edges with ``dst = num_nodes``; such
    scatters drop). Semantically identical to :func:`segment_spmm`.
    """
    e = src.shape[0]
    if e % chunk:
        raise ValueError(f"edge count {e} must be padded to a multiple of chunk={chunk}")
    n_chunks = e // chunk
    src_c = src.reshape(n_chunks, chunk)
    dst_c = dst.reshape(n_chunks, chunk)
    w_c = None if w is None else w.reshape(n_chunks, chunk)

    out0 = jnp.zeros((num_nodes, h.shape[1]), dtype=h.dtype)

    def body(out, inputs):
        if w_c is None:
            s, d = inputs
            msg = h[s]
        else:
            s, d, ww = inputs
            msg = h[s] * ww[:, None].astype(h.dtype)
        out = out.at[d].add(msg, mode="drop", indices_are_sorted=True)
        return out, None

    xs = (src_c, dst_c) if w_c is None else (src_c, dst_c, w_c)
    out, _ = jax.lax.scan(body, out0, xs)
    return out


def pad_edges(
    src, dst, w, num_nodes: int, multiple: int
):
    """Pad edge arrays to a multiple of ``multiple`` with dropped sentinels
    (``dst = num_nodes``). Host-side (numpy in, numpy out)."""
    import numpy as np

    e = len(src)
    e_pad = -(-e // multiple) * multiple
    if e_pad == e:
        return src, dst, w
    pad = e_pad - e
    src = np.concatenate([src, np.zeros(pad, dtype=src.dtype)])
    dst = np.concatenate([dst, np.full(pad, num_nodes, dtype=dst.dtype)])
    if w is not None:
        w = np.concatenate([w, np.zeros(pad, dtype=w.dtype)])
    return src, dst, w
