"""Gather-only ELLPACK SpMM — the performance aggregation path.

Why: XLA's scatter-add on TPU runs at ~70 GB/s effective while gathers are
markedly faster; and AD's transpose of a gather is a scatter. So:

- the graph is lowered host-side to degree-bucketed ELLPACK *segments*:
  each dst row's (dst-sorted CSR) edge list is split into segments of at
  most ``WMAX`` sources, each segment placed in the bucket of the smallest
  power-of-two width >= its length. The forward pass is then pure
  gather + dense reduction per bucket, plus one mostly-unique scatter-add
  of segment sums into output rows (segments-per-node ~= 1).
- the backward pass is NOT the AD transpose (a giant scatter): a
  ``jax.custom_vjp`` runs the same gather-form SpMM on the pre-built
  REVERSE-graph ELLPACK (the analog of the reference aggregating on
  ``bwd_graph``, ``AdaQP/model/ops.py:83-95``).

This is the jnp/XLA form; a Pallas kernel can replace `_run_ell` per-bucket
without changing the layout contract.

Reference analog: DGL's ``update_all(copy_src, sum)`` SpMM
(``AdaQP/model/ops.py:17-32``) — rebuilt TPU-first.
"""
from __future__ import annotations

import os
from dataclasses import dataclass
from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

WMAX = 512
ROW_CHUNK = 2048  # bucket rows processed per scan step (bounds VMEM/HBM use)

# Bucket widths with ~1.5x steps: each gathered lane costs the same whether
# masked or real (~17-20 ns/row descriptor-bound), so the mean masked-lane
# waste matters — pow2 buckets waste ~33% (mean fill 0.75), these ~17%
# (mean fill ~0.85). Scan-program count grows from 10 to 17; dispatch
# overhead is noise next to the gathers.
_WIDTHS = np.array(
    [1, 2, 3, 4, 6, 8, 12, 16, 24, 32, 48, 64, 96, 128, 192, 256, 384, 512],
    np.int64,
)
ELL_SCHEME = 2  # cache-format version (bump when _WIDTHS changes)


def _width_bucket(x: np.ndarray) -> np.ndarray:
    """Smallest bucket width >= x."""
    return _WIDTHS[np.searchsorted(_WIDTHS, np.maximum(x, 1))]


@dataclass
class EllLayout:
    """Host-side ELLPACK segments. ``buckets[i] = (width, rows, idx, lens)``:
    rows int32 [Nb] output row per segment; idx int32 [Nb, width] source
    rows (junk on padding lanes); lens int32 [Nb] valid lane count.
    ``row_chunk`` is baked in at build time (Nb is padded to it)."""

    n: int
    buckets: List[Tuple[int, np.ndarray, np.ndarray, np.ndarray]]
    row_chunk: int = ROW_CHUNK

    def to_device(self) -> "EllDevice":
        return EllDevice(
            self.n,
            tuple(
                (w, jnp.asarray(rows), jnp.asarray(idx), jnp.asarray(lens))
                for w, rows, idx, lens in self.buckets
            ),
            self.row_chunk,
        )


@dataclass
class EllDevice:
    n: int
    buckets: Tuple[Tuple[int, jnp.ndarray, jnp.ndarray, jnp.ndarray], ...]
    row_chunk: int = ROW_CHUNK


jax.tree_util.register_pytree_node(
    EllDevice,
    lambda e: (
        tuple(x for b in e.buckets for x in b[1:]),
        (e.n, tuple(b[0] for b in e.buckets), e.row_chunk),
    ),
    lambda aux, leaves: EllDevice(
        aux[0],
        tuple(
            (w, leaves[3 * i], leaves[3 * i + 1], leaves[3 * i + 2])
            for i, w in enumerate(aux[1])
        ),
        aux[2],
    ),
)


def ell_cache_ok(z) -> bool:
    """True when a layout npz's embedded ELL straggler (if any) matches the
    current ELL_SCHEME (callers bump their own scheme keys separately)."""
    return not (int(z["has_straggler"]) and int(z.get("ell_scheme", 1)) != ELL_SCHEME)


def ell_save_npz(save: dict, straggler) -> None:
    """Serialize an optional EllLayout into a layout npz dict (shared by
    the block and compact layout caches — one key schema, one writer)."""
    save["has_straggler"] = int(straggler is not None)
    save["ell_scheme"] = ELL_SCHEME
    if straggler is not None:
        save["ell_num_buckets"] = len(straggler.buckets)
        save["ell_row_chunk"] = straggler.row_chunk
        for i, (w, rows, idx, lens) in enumerate(straggler.buckets):
            save[f"ell_w{i}"] = w
            save[f"ell_rows{i}"] = rows
            save[f"ell_idx{i}"] = idx
            save[f"ell_lens{i}"] = lens


def ell_load_npz(z):
    """Inverse of ell_save_npz: optional EllLayout from a layout npz."""
    if not int(z["has_straggler"]):
        return None
    nbk = int(z["ell_num_buckets"])
    buckets = [
        (int(z[f"ell_w{i}"]), z[f"ell_rows{i}"], z[f"ell_idx{i}"],
         z[f"ell_lens{i}"])
        for i in range(nbk)
    ]
    return EllLayout(int(z["n_pad"]), buckets, int(z["ell_row_chunk"]))


def ell_from_csr(
    src: np.ndarray,
    dst: np.ndarray,
    n: int,
    wmax: int = WMAX,
    row_chunk: int = ROW_CHUNK,
    cache_key: Optional[str] = None,
) -> EllLayout:
    """Build the ELLPACK-segment layout from an edge list (any order).

    ``cache_key``: path prefix; caches the built arrays as ``<key>.npz``.
    """
    if cache_key and os.path.exists(cache_key + ".npz"):
        z = np.load(cache_key + ".npz")
        if (
            int(z.get("row_chunk", ROW_CHUNK)) == row_chunk
            and int(z.get("ell_scheme", 1)) == ELL_SCHEME
        ):
            nb = int(z["num_buckets"])
            buckets = [
                (int(z[f"w{i}"]), z[f"rows{i}"], z[f"idx{i}"], z[f"lens{i}"])
                for i in range(nb)
            ]
            return EllLayout(n, buckets, row_chunk)

    order = np.argsort(dst, kind="stable")
    src_s = src[order]
    indptr = np.zeros(n + 1, np.int64)
    np.add.at(indptr, dst + 1, 1)
    np.cumsum(indptr, out=indptr)
    deg = np.diff(indptr)

    nseg = -(-deg // wmax)  # zero-degree rows contribute no segments
    seg_node = np.repeat(np.arange(n, dtype=np.int64), nseg)
    within = (
        np.concatenate([np.arange(k) for k in nseg if k])
        if nseg.sum()
        else np.empty(0, np.int64)
    )
    seg_start = indptr[seg_node] + within * wmax
    seg_len = np.minimum(wmax, deg[seg_node] - within * wmax).astype(np.int64)
    assert (seg_len > 0).all()
    width = _width_bucket(seg_len)

    buckets = []
    e_total = len(src_s)
    for w in sorted(set(width.tolist())):
        m = width == w
        rows = seg_node[m].astype(np.int32)
        starts = seg_start[m]
        lens = seg_len[m].astype(np.int32)
        nb = len(rows)
        nb_pad = -(-nb // row_chunk) * row_chunk
        gather = starts[:, None] + np.arange(w)[None, :]
        np.clip(gather, 0, e_total - 1, out=gather)
        idx = src_s[gather].astype(np.int32)
        if nb_pad != nb:
            # padding segments scatter to the drop sentinel row `n`
            rows = np.concatenate([rows, np.full(nb_pad - nb, n, np.int32)])
            idx = np.concatenate([idx, np.zeros((nb_pad - nb, w), np.int32)])
            lens = np.concatenate([lens, np.ones(nb_pad - nb, np.int32)])
        buckets.append((int(w), rows, idx, lens))

    lay = EllLayout(n, buckets, row_chunk)
    if cache_key:
        os.makedirs(os.path.dirname(cache_key) or ".", exist_ok=True)
        save = {
            "num_buckets": len(buckets), "row_chunk": row_chunk,
            "ell_scheme": ELL_SCHEME,
        }
        for i, (w, rows, idx, lens) in enumerate(buckets):
            save[f"w{i}"] = w
            save[f"rows{i}"] = rows
            save[f"idx{i}"] = idx
            save[f"lens{i}"] = lens
        np.savez(cache_key + ".npz", **save)
    return lay


def _run_ell(ell: EllDevice, h: jnp.ndarray, acc_dtype=None) -> jnp.ndarray:
    """out[v] = sum over ELL lanes of h[idx] (masked) — gather-only SpMM.

    ``acc_dtype`` sets the accumulation/output dtype (default: ``h.dtype``);
    rows are always gathered in ``h.dtype`` — passing bf16 ``h`` with f32
    accumulation halves the gather's HBM traffic without changing the math
    (the gathered values carry bf16 precision either way)."""
    f = h.shape[1]
    acc_dtype = h.dtype if acc_dtype is None else acc_dtype
    row_chunk = ell.row_chunk
    out = jnp.zeros((ell.n, f), acc_dtype)
    for w, rows, idx, lens in ell.buckets:
        nb = idx.shape[0]
        nc = nb // row_chunk
        idx_c = idx.reshape(nc, row_chunk, w)
        lens_c = lens.reshape(nc, row_chunk)

        def body(_, operand, w=w):
            ic, lc = operand
            # lane 0 always valid (segments are non-empty)
            acc = h[ic[:, 0]].astype(acc_dtype)
            if w <= 16:  # unroll small widths
                lane_valid = (
                    jax.lax.broadcasted_iota(jnp.int32, (row_chunk, w), 1)
                    < lc[:, None]
                )
                for j in range(1, w):
                    acc = acc + jnp.where(
                        lane_valid[:, j : j + 1], h[ic[:, j]], 0
                    ).astype(acc_dtype)
            else:  # rolled loop keeps the program small for wide buckets
                def lane(j, acc):
                    col = jax.lax.dynamic_slice_in_dim(ic, j, 1, axis=1)[:, 0]
                    return acc + jnp.where((j < lc)[:, None], h[col], 0).astype(
                        acc_dtype
                    )

                acc = jax.lax.fori_loop(1, w, lane, acc)
            return None, acc

        _, sums = jax.lax.scan(body, None, (idx_c, lens_c))
        out = out.at[rows].add(sums.reshape(nb, f), mode="drop")
    return out


@partial(jax.custom_vjp, nondiff_argnums=())
def spmm_ell(ell_fwd: EllDevice, h: jnp.ndarray, reverse: EllDevice) -> jnp.ndarray:
    """A^T h via forward ELLPACK; VJP runs the reverse ELLPACK (gradients
    aggregate along reversed edges, never through an AD scatter-transpose)."""
    return _run_ell(ell_fwd, h)


def _spmm_fwd(ell_fwd, h, reverse):
    return _run_ell(ell_fwd, h), reverse


def _spmm_bwd(reverse, g):
    return None, _run_ell(reverse, g), None


spmm_ell.defvjp(_spmm_fwd, _spmm_bwd)
