"""Per-shard bitmask-MXU SpMM layouts for the distributed path.

Lowers a :class:`PartitionLayout`'s per-partition edge lists (local-src and
halo-src, forward + reverse) to stacked block-sparse bitmask layouts
(``ops/spmm_block.py``) so every shard runs the same Pallas grid under
``shard_map``:

- tile counts are padded to the max across shards with inert tiles
  (zero mask, ``is_first = 0``) appended AFTER the dst-sorted real tiles —
  they re-visit dst block 0 and add zero;
- ``min_edges = 1``: every nonempty tile is a bitmask (no straggler path,
  which would need shard-heterogeneous ELL shapes);
- requires ``l_max`` and ``r_pad`` padded to BS (=2048) multiples — build
  the PartitionLayout with ``pad_multiple=2048`` (see
  ``Trainer``/``static_from_layout`` plumbing).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.spmm_block import BD, WORDS, BlockDevice, block_layout
from .layout import PartitionLayout

Quad = Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["fwd_local", "bwd_local", "fwd_halo", "bwd_halo"],
    meta_fields=["l_max", "r_pad"],
)
@dataclasses.dataclass
class BlockShards:
    """Stacked [K, ...] quads (masks, src_start, dst_blk, is_first) for the
    four per-shard layouts."""

    fwd_local: Quad
    bwd_local: Quad
    fwd_halo: Quad
    bwd_halo: Quad
    l_max: int
    r_pad: int

    def local(self) -> "BlockShards":
        sl = lambda q: tuple(a[0] for a in q)
        return BlockShards(
            sl(self.fwd_local), sl(self.bwd_local), sl(self.fwd_halo),
            sl(self.bwd_halo), self.l_max, self.r_pad,
        )

    def devices(self):
        """Per-shard (inside shard_map, after .local()) BlockDevice objects:
        (fwd_local, bwd_local, fwd_halo, bwd_halo)."""

        def dev(quad, n_pad, n_src_pad):
            m, ss, db, fi = quad
            return BlockDevice(n_pad, n_pad, m, ss, db, fi, None, n_src_pad)

        return (
            dev(self.fwd_local, self.l_max, self.l_max),
            dev(self.bwd_local, self.l_max, self.l_max),
            dev(self.fwd_halo, self.l_max, self.r_pad),
            dev(self.bwd_halo, self.r_pad, self.l_max),
        )


def _pad_tiles(lays, t_max):
    """Stack per-shard BlockLayouts, padding tile counts with inert tiles."""
    masks, ss, db, fi = [], [], [], []
    for lay in lays:
        t = lay.masks.shape[0]
        pad = t_max - t
        masks.append(
            np.concatenate([lay.masks, np.zeros((pad, BD, WORDS), np.int32)])
        )
        ss.append(np.concatenate([lay.src_start, np.zeros(pad, np.int32)]))
        db.append(np.concatenate([lay.dst_blk, np.zeros(pad, np.int32)]))
        fi.append(np.concatenate([lay.is_first, np.zeros(pad, np.int32)]))
    return (
        jnp.asarray(np.stack(masks)),
        jnp.asarray(np.stack(ss)),
        jnp.asarray(np.stack(db)),
        jnp.asarray(np.stack(fi)),
    )


def build_block_shards(layout: PartitionLayout) -> BlockShards:
    l_max = layout.l_max
    r_pad = layout.plan_fwd.r_pad
    if l_max % 2048 or r_pad % 2048:
        raise ValueError(
            f"block shards need l_max/r_pad padded to 2048 (got {l_max}, "
            f"{r_pad}); build the layout with pad_multiple=2048"
        )
    k = layout.k
    groups = {"fwd_local": [], "bwd_local": [], "fwd_halo": [], "bwd_halo": []}
    for p in range(k):
        ls, ld = layout.fwd_local[0][p], layout.fwd_local[1][p]
        valid = ld < l_max
        ls, ld = ls[valid], ld[valid]
        hs, hd = layout.fwd_halo[0][p], layout.fwd_halo[1][p]
        validh = hd < l_max
        hs, hd = hs[validh] - l_max, hd[validh]  # halo srcs stored Lmax+slot
        mk = lambda s, d, n, n_src: block_layout(
            s.astype(np.int32), d.astype(np.int32), n,
            min_edges=1, dedup=False, n_src=n_src,
        )
        groups["fwd_local"].append(mk(ls, ld, l_max, l_max))
        groups["bwd_local"].append(mk(ld, ls, l_max, l_max))
        groups["fwd_halo"].append(mk(hs, hd, l_max, r_pad))
        groups["bwd_halo"].append(mk(hd, hs, r_pad, l_max))
    quads = {}
    for name, lays in groups.items():
        t_max = max(l.masks.shape[0] for l in lays)
        quads[name] = _pad_tiles(lays, t_max)
    return BlockShards(
        quads["fwd_local"], quads["bwd_local"], quads["fwd_halo"],
        quads["bwd_halo"], l_max, r_pad,
    )
