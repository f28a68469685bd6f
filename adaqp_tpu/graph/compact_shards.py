"""Per-shard compact-column SpMM layouts for the distributed path.

Lowers a :class:`PartitionLayout`'s per-partition edge lists (local-src and
halo-src, forward + transposed) to stacked compact strip layouts
(``ops/spmm_compact.py``) so every shard runs the same Pallas grid under
``shard_map`` — the v2 analog of :mod:`block_shards`:

- item counts are padded to the max across shards with INERT items (zero
  mask, ``new_window = strip_first = strip_last = 0``, strip/src/slot
  repeated from the shard's last real item): they re-read the resident
  window, multiply an all-zero bitmask, and write nothing;
- the ELL tail reuses block_shards' shard-uniform bucket stacking;
- bidirected graphs alias ``bwd_local = fwd_local`` in-trace (same HBM
  halving as the block path; reference graphEngine.py:135-147);
- requires ``l_max``/``r_pad`` padded to 2048 (= STRIP = BS) multiples.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.spmm_compact import (
    BD,
    BS,
    FULL_COLS,
    ME_ELL,
    STRIP,
    WORDS,
    CompactDevice,
    compact_layout,
)
from ..ops.spmm_fast import ROW_CHUNK, EllDevice
from .block_shards import _stack_ells
from .layout import PartitionLayout

# stacked item arrays, in CompactDevice leaf order:
# (kind, masks, col_idx, src_start, strip_id, new_window, wslot,
#  strip_first, strip_last, dst_off, nsub), each [K, T, ...]
Item10 = Tuple[
    jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray,
    jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray,
    jnp.ndarray,
]

_GROUPS = ("fwd_local", "bwd_local", "fwd_halo", "bwd_halo")
_FIELDS = (
    "kind", "masks", "col_idx", "src_start", "strip_id", "new_window",
    "wslot", "strip_first", "strip_last", "dst_off", "nsub",
)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["fwd_local", "bwd_local", "fwd_halo", "bwd_halo", "ells"],
    meta_fields=["l_max", "r_pad", "ell_widths"],
)
@dataclasses.dataclass
class CompactShards:
    """Stacked [K, ...] item arrays for the four per-shard layouts, plus
    shard-uniform ELL straggler buckets (see block_shards.EllStack)."""

    fwd_local: Item10
    bwd_local: Optional[Item10]  # None for bidirected graphs (aliased)
    fwd_halo: Item10
    bwd_halo: Item10
    ells: Tuple[tuple, tuple, tuple, tuple]
    l_max: int
    r_pad: int
    ell_widths: Tuple[Tuple[int, ...], ...]

    def local(self) -> "CompactShards":
        return jax.tree.map(lambda a: a[0], self)

    def devices(self):
        """Per-shard (inside shard_map, after .local()) CompactDevice
        objects: (fwd_local, bwd_local, fwd_halo, bwd_halo)."""

        def dev(i, item, n_pad, n_src_pad):
            straggler = None
            if self.ell_widths[i]:
                buckets = tuple(
                    (w, rows, idx, lens)
                    for w, (rows, idx, lens) in zip(
                        self.ell_widths[i], self.ells[i]
                    )
                )
                straggler = EllDevice(n_pad, buckets, ROW_CHUNK)
            return CompactDevice(n_pad, n_pad, n_src_pad, *item, straggler)

        if self.bwd_local is None:  # bidirected: backward IS forward
            bwd_dev = dev(0, self.fwd_local, self.l_max, self.l_max)
        else:
            bwd_dev = dev(1, self.bwd_local, self.l_max, self.l_max)
        return (
            dev(0, self.fwd_local, self.l_max, self.l_max),
            bwd_dev,
            dev(2, self.fwd_halo, self.l_max, self.r_pad),
            dev(3, self.bwd_halo, self.r_pad, self.l_max),
        )


def _pad_items(lays, t_max) -> Item10:
    """Stack per-shard CompactLayouts, padding item counts with inert
    items that keep the pipeline state (window slot, strip id) frozen."""
    cols = {f: [] for f in _FIELDS}
    for lay in lays:
        t = lay.masks.shape[0]
        pad = t_max - t
        ext = {
            # kind-1 + nsub=0 pads: the kernel's nsub guard skips the
            # window gather AND every slot matmul, so a padded step costs
            # one zero-mask expand — a kind-0 pad would burn a full-width
            # MXU matmul of zeros per feature chunk
            "kind": np.ones(pad, np.int32),
            "masks": np.zeros((pad, BD, WORDS), np.int16),
            "col_idx": np.zeros((pad, BS), np.int32),
            # repeat the last real values: no DMA, no acc zero/flush, out
            # block index unchanged -> the padded steps are near no-ops
            "src_start": np.full(pad, lay.src_start[-1], np.int32),
            "strip_id": np.full(pad, lay.strip_id[-1], np.int32),
            "new_window": np.zeros(pad, np.int32),
            "wslot": np.full(pad, lay.wslot[-1], np.int32),
            "strip_first": np.zeros(pad, np.int32),
            "strip_last": np.zeros(pad, np.int32),
            "dst_off": np.zeros((pad, lay.dst_off.shape[1]), np.int32),
            "nsub": np.zeros(pad, np.int32),
        }
        for f in _FIELDS:
            cols[f].append(np.concatenate([getattr(lay, f), ext[f]]))
    return tuple(jnp.asarray(np.stack(cols[f])) for f in _FIELDS)


def build_compact_shards(
    layout: PartitionLayout,
    me_ell: int = ME_ELL,
    full_cols: int = FULL_COLS,
    cache_prefix: Optional[str] = None,
) -> CompactShards:
    """``cache_prefix`` enables the per-(shard, group) ``compact_layout``
    npz cache (host packing at 100M-edge scale is minutes per start)."""
    l_max = layout.l_max
    r_pad = layout.plan_fwd.r_pad
    if l_max % STRIP or r_pad % STRIP:
        raise ValueError(
            f"compact shards need l_max/r_pad padded to {STRIP} (got "
            f"{l_max}, {r_pad}); build the layout with pad_multiple=2048"
        )
    k = layout.k
    groups = {name: [] for name in _GROUPS}
    for p in range(k):
        ls, ld = layout.fwd_local[0][p], layout.fwd_local[1][p]
        valid = ld < l_max
        ls, ld = ls[valid], ld[valid]
        hs, hd = layout.fwd_halo[0][p], layout.fwd_halo[1][p]
        validh = hd < l_max
        hs, hd = hs[validh] - l_max, hd[validh]  # halo srcs stored Lmax+slot
        mk = lambda s, d, n, n_src, name: compact_layout(
            s.astype(np.int32), d.astype(np.int32), n, n_src=n_src,
            me_ell=me_ell, full_cols=full_cols, dedup=False,
            cache_key=(
                f"{cache_prefix}_me{me_ell}_fc{full_cols}_p{p}_{name}"
                if cache_prefix else None
            ),
        )
        groups["fwd_local"].append(mk(ls, ld, l_max, l_max, "fl"))
        if not layout.is_bidirected:
            groups["bwd_local"].append(mk(ld, ls, l_max, l_max, "bl"))
        groups["fwd_halo"].append(mk(hs, hd, l_max, r_pad, "fh"))
        groups["bwd_halo"].append(mk(hd, hs, r_pad, l_max, "bh"))
    items = {}
    widths_all = []
    ells_all = []
    n_out = {"fwd_local": l_max, "bwd_local": l_max, "fwd_halo": l_max,
             "bwd_halo": r_pad}
    for name in _GROUPS:
        if name == "bwd_local" and layout.is_bidirected:
            items[name] = None  # devices() substitutes fwd_local in-trace
            widths_all.append(())
            ells_all.append(())
            continue
        lays = groups[name]
        t_max = max(l.masks.shape[0] for l in lays)
        items[name] = _pad_items(lays, t_max)
        widths, stacks = _stack_ells([l.straggler for l in lays], n_out[name])
        widths_all.append(widths)
        ells_all.append(stacks)
    return CompactShards(
        items["fwd_local"], items["bwd_local"], items["fwd_halo"],
        items["bwd_halo"], tuple(ells_all), l_max, r_pad, tuple(widths_all),
    )
