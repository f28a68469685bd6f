"""Directed (non-bidirected) graph correctness.

The reference's backward is only correct for bidirected graphs (it reverses
the local partition graph, ``graphEngine.py:135-147``; SURVEY.md §7.4). Our
backward is the AD transpose of the forward routing, which is correct for
arbitrary directed graphs — this test locks that in against the full-graph
oracle.
"""
import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import PartitionSpec as P

from adaqp_tpu.common.types import GNNType, Mode
from adaqp_tpu.graph import build_layout, partition_graph
from adaqp_tpu.graph.device import (
    make_mesh,
    shard_arrays_from_layout,
    static_from_layout,
)
from adaqp_tpu.helper.dataset import GraphData, normalize_self_loops
from adaqp_tpu.model import apply_gnn, init_params
from adaqp_tpu.model.loss import masked_loss_sum
from tests.reference_gnn import full_forward

K = 4


def _directed_graph(rng, n=240, e=2000, f=10, classes=4):
    src = rng.integers(0, n, e).astype(np.int32)
    dst = rng.integers(0, n, e).astype(np.int32)
    # deliberately asymmetric: keep only edges with src < dst + a few others
    keep = (src < dst) | (rng.random(e) < 0.1)
    src, dst = src[keep], dst[keep]
    src, dst = normalize_self_loops(src, dst, n)
    feats = rng.normal(size=(n, f)).astype(np.float32)
    labels = rng.integers(0, classes, n).astype(np.int32)
    masks = [np.zeros(n, bool) for _ in range(3)]
    order = rng.permutation(n)
    masks[0][order[: n // 2]] = True
    masks[1][order[n // 2 : 3 * n // 4]] = True
    masks[2][order[3 * n // 4 :]] = True
    g = GraphData(n, src, dst, feats, labels, *masks, classes, False, "directed")
    assert not g.is_bidirected
    return g


def test_directed_forward_backward_matches_oracle(rng):
    g = _directed_graph(rng)
    part = partition_graph(g, K, method="random")
    lay = build_layout(g, part, GNNType.GCN)
    # directed: transposed local edges differ from the forward lists
    assert lay.bwd_local[0] is not lay.fwd_local[0]
    sh = shard_arrays_from_layout(lay)
    cfg = static_from_layout(
        lay, model=GNNType.GCN, mode=Mode.VANILLA, num_layers=2, hidden=12,
        dropout=0.0,
    )
    mesh = make_mesh(K)
    params = init_params(jax.random.PRNGKey(2), cfg)
    train_count = float(g.train_mask.sum())
    sinks = jnp.zeros((K, cfg.num_layers, cfg.r_pad))

    def dist_loss(params):
        def body(params, sh_st, sinks):
            s = sh_st.local()
            logits, _ = apply_gnn(params, s, cfg, sinks[0], True,
                                  dropout_key=jax.random.PRNGKey(0))
            return masked_loss_sum(logits, s.labels, s.train_mask, False)[None]

        parts = shard_map(
            body, mesh=mesh, in_specs=(P(), P("part"), P("part")),
            out_specs=P("part"),
        )(params, sh, sinks)
        return parts.sum() / train_count

    dloss, dgrads = jax.value_and_grad(dist_loss)(params)

    labels = jnp.asarray(g.labels)
    mask = jnp.asarray(g.train_mask)

    def ref_loss(params):
        logits = full_forward(params, g, cfg)
        return masked_loss_sum(logits, labels, mask, False) / train_count

    rloss, rgrads = jax.value_and_grad(ref_loss)(params)
    np.testing.assert_allclose(float(dloss), float(rloss), rtol=1e-4)
    for a, b in zip(jax.tree.leaves(dgrads), jax.tree.leaves(rgrads)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=3e-3, atol=1e-5)
