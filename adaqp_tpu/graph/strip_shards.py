"""Per-shard strip-ordered (window reuse) SpMM layouts — v3 distributed.

The strip analog of :mod:`block_shards`: lowers a PartitionLayout's four
per-partition edge groups to stacked :class:`StripLayout` grids so every
shard runs the same Pallas strip kernel under ``shard_map``. Shard
uniformity paddings:

- masks padded to the shard max PLUS one guaranteed-zero row; inert grid
  steps point at it;
- grid arrays padded with INERT steps (flags=0 regular steps whose zero
  mask accumulates nothing and whose out index re-targets the shard's
  last written block — the revisit writes back the block's own content);
- ``win_src`` padded to the shard max; each shard's REAL window count
  rides the ``n_win`` prefetch scalar so the window prefetch stops at the
  shard's last real window (an unwaited DMA would leave a stale
  semaphore signal for the slot's next occupant).

ELL straggler stacking is shared with block_shards (same format).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.spmm_block import BD, MIN_EDGES, WORDS
from ..ops.spmm_fast import ROW_CHUNK, EllDevice
from ..ops.spmm_strip import STRIP, StripDevice, strip_layout
from .block_shards import _stack_ells
from .layout import PartitionLayout

_GROUPS = ("fwd_local", "bwd_local", "fwd_halo", "bwd_halo")

# stacked per-group arrays: (masks, win_src, w_ord, out_idx, sub, flags,
# mask_idx, tile_src, tile_dst, n_win)
Group = Tuple[jnp.ndarray, ...]


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["fwd_local", "bwd_local", "fwd_halo", "bwd_halo", "ells"],
    meta_fields=["l_max", "r_pad", "ell_widths"],
)
@dataclasses.dataclass
class StripShards:
    """Stacked [K, ...] strip-layout groups + shard-uniform ELL buckets."""

    fwd_local: Group
    bwd_local: Optional[Group]  # None when bidirected (aliases fwd_local)
    fwd_halo: Group
    bwd_halo: Group
    ells: Tuple[Tuple, Tuple, Tuple, Tuple]
    l_max: int
    r_pad: int
    ell_widths: Tuple[Tuple[int, ...], ...]

    def local(self) -> "StripShards":
        return jax.tree.map(lambda a: a[0], self)

    def devices(self):
        """Per-shard (inside shard_map, after .local()) StripDevice objects:
        (fwd_local, bwd_local, fwd_halo, bwd_halo)."""

        def dev(i, grp, n_pad, n_src_pad):
            m, ws, wo, oi, sub, fl, mi, ts, td, nw = grp
            straggler = None
            if self.ell_widths[i]:
                buckets = tuple(
                    (w, rows, idx, lens)
                    for w, (rows, idx, lens) in zip(self.ell_widths[i], self.ells[i])
                )
                straggler = EllDevice(n_pad, buckets, ROW_CHUNK)
            return StripDevice(
                n_pad, n_pad, n_src_pad, m, ws, wo, oi, sub, fl, mi, ts, td,
                straggler, nw,
            )

        if self.bwd_local is None:
            bwd_dev = dev(0, self.fwd_local, self.l_max, self.l_max)
        else:
            bwd_dev = dev(1, self.bwd_local, self.l_max, self.l_max)
        return (
            dev(0, self.fwd_local, self.l_max, self.l_max),
            bwd_dev,
            dev(2, self.fwd_halo, self.l_max, self.r_pad),
            dev(3, self.bwd_halo, self.r_pad, self.l_max),
        )


def _pad_group(lays) -> Group:
    """Stack per-shard StripLayouts with inert-step/zero-mask padding."""
    t_max = max(lay.masks.shape[0] for lay in lays)
    t2_max = max(lay.w_ord.shape[0] for lay in lays)
    w_max = max(lay.win_src.shape[0] for lay in lays)
    tt_max = max(lay.tile_src.shape[0] for lay in lays)

    masks, ws_s, wo_s, oi_s, sub_s, fl_s, mi_s, ts_s, td_s, nw_s = (
        [], [], [], [], [], [], [], [], [], []
    )
    for lay in lays:
        t = lay.masks.shape[0]
        # +1 guaranteed-zero mask row for inert steps
        masks.append(np.concatenate(
            [lay.masks, np.zeros((t_max + 1 - t, BD, WORDS), np.int16)]
        ))
        ws_s.append(np.concatenate(
            [lay.win_src, np.zeros(w_max - lay.win_src.shape[0], np.int32)]
        ))
        pad = t2_max - lay.w_ord.shape[0]
        last_w = lay.w_ord[-1] if lay.w_ord.shape[0] else 0
        last_o = lay.out_idx[-1] if lay.out_idx.shape[0] else 0
        wo_s.append(np.concatenate(
            [lay.w_ord, np.full(pad, last_w, np.int32)]
        ))
        oi_s.append(np.concatenate(
            [lay.out_idx, np.full(pad, last_o, np.int32)]
        ))
        sub_s.append(np.concatenate([lay.sub, np.zeros(pad, np.int32)]))
        fl_s.append(np.concatenate([lay.flags, np.zeros(pad, np.int32)]))
        mi_s.append(np.concatenate(
            [lay.mask_idx, np.full(pad, t_max, np.int32)]  # the zero row
        ))
        ts_s.append(np.concatenate(
            [lay.tile_src, np.zeros(tt_max - lay.tile_src.shape[0], np.int32)]
        ))
        td_s.append(np.concatenate(
            [lay.tile_dst, np.zeros(tt_max - lay.tile_dst.shape[0], np.int32)]
        ))
        nw_s.append(np.asarray([lay.win_src.shape[0] - 1], np.int32))
    return tuple(
        jnp.asarray(np.stack(x))
        for x in (masks, ws_s, wo_s, oi_s, sub_s, fl_s, mi_s, ts_s, td_s, nw_s)
    )


def build_strip_shards(
    layout: PartitionLayout, min_edges: int = MIN_EDGES,
    cache_prefix: Optional[str] = None,
) -> StripShards:
    """Strip analog of :func:`block_shards.build_block_shards`."""
    l_max = layout.l_max
    r_pad = layout.plan_fwd.r_pad
    if l_max % STRIP or r_pad % STRIP:
        raise ValueError(
            f"strip shards need l_max/r_pad padded to {STRIP} (got {l_max}, "
            f"{r_pad}); build the layout with pad_multiple={STRIP}"
        )
    k = layout.k
    groups = {name: [] for name in _GROUPS}
    for p in range(k):
        ls, ld = layout.fwd_local[0][p], layout.fwd_local[1][p]
        valid = ld < l_max
        ls, ld = ls[valid], ld[valid]
        hs, hd = layout.fwd_halo[0][p], layout.fwd_halo[1][p]
        validh = hd < l_max
        hs, hd = hs[validh] - l_max, hd[validh]
        mk = lambda s, d, n, n_src, name: strip_layout(
            s.astype(np.int32), d.astype(np.int32), n,
            min_edges=min_edges, dedup=False, n_src=n_src,
            cache_key=(
                f"{cache_prefix}_me{min_edges}_p{p}_{name}"
                if cache_prefix else None
            ),
        )
        groups["fwd_local"].append(mk(ls, ld, l_max, l_max, "fl"))
        if not layout.is_bidirected:
            groups["bwd_local"].append(mk(ld, ls, l_max, l_max, "bl"))
        groups["fwd_halo"].append(mk(hs, hd, l_max, r_pad, "fh"))
        groups["bwd_halo"].append(mk(hd, hs, r_pad, l_max, "bh"))

    out = {}
    widths_all = []
    ells_all = []
    n_out = {"fwd_local": l_max, "bwd_local": l_max, "fwd_halo": l_max,
             "bwd_halo": r_pad}
    for name in _GROUPS:
        if name == "bwd_local" and layout.is_bidirected:
            out[name] = None
            widths_all.append(())
            ells_all.append(())
            continue
        lays = groups[name]
        out[name] = _pad_group(lays)
        widths, stacks = _stack_ells([l.straggler for l in lays], n_out[name])
        widths_all.append(widths)
        ells_all.append(stacks)
    return StripShards(
        out["fwd_local"], out["bwd_local"], out["fwd_halo"], out["bwd_halo"],
        tuple(ells_all), l_max, r_pad, tuple(widths_all),
    )
