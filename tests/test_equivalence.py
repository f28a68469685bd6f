"""THE correctness oracle (SURVEY.md §4b): K-partition distributed
forward/backward (fp32) must match the single-device full-graph reference.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import PartitionSpec as P

from adaqp_tpu.common.types import AggregatorType, GNNType, Mode
from adaqp_tpu.graph import build_layout, partition_graph
from adaqp_tpu.graph.device import (
    make_mesh,
    shard_arrays_from_layout,
    static_from_layout,
)
from adaqp_tpu.helper import sbm_graph
from adaqp_tpu.model import apply_gnn, init_params
from adaqp_tpu.model.loss import masked_loss_sum
from tests.reference_gnn import full_forward

K = 4


def _setup(model, agg=AggregatorType.MEAN, mode=Mode.VANILLA, seed=0):
    g = sbm_graph(n=260, blocks=4, num_feats=12, seed=seed)
    part = partition_graph(g, K, method="ldg")
    lay = build_layout(g, part, model)
    sh = shard_arrays_from_layout(lay)
    cfg = static_from_layout(
        lay, model=model, agg_type=agg, mode=mode, num_layers=3, hidden=16,
        dropout=0.0, use_norm=True,
    )
    mesh = make_mesh(K)
    params = init_params(jax.random.PRNGKey(1), cfg)
    return g, lay, sh, cfg, mesh, params


def _dist_forward(params, sh, cfg, mesh, train):
    sinks = jnp.zeros((K, cfg.num_layers, cfg.r_pad))

    def body(params, sh_stacked, sinks):
        logits, traces = apply_gnn(
            params, sh_stacked.local(), cfg, sinks[0], train,
            dropout_key=jax.random.PRNGKey(0),
        )
        return logits[None], traces[None]

    fn = shard_map(
        body, mesh=mesh, in_specs=(P(), P("part"), P("part")),
        out_specs=(P("part"), P("part")),
    )
    return fn(params, sh, sinks)


def _scatter_back(lay, per_part):
    """[K, Lmax, C] -> global [N, C] via local_ids."""
    n = lay.part_id.shape[0]
    out = np.zeros((n,) + per_part.shape[2:], per_part.dtype)
    for p in range(lay.k):
        c = int(lay.num_local[p])
        out[lay.local_ids[p, :c]] = per_part[p, :c]
    return out


@pytest.mark.parametrize(
    "model,agg",
    [
        (GNNType.GCN, AggregatorType.MEAN),
        (GNNType.SAGE, AggregatorType.MEAN),
        (GNNType.SAGE, AggregatorType.GCN),
    ],
)
def test_forward_matches_full_graph(model, agg):
    g, lay, sh, cfg, mesh, params = _setup(model, agg)
    logits, _ = _dist_forward(params, sh, cfg, mesh, train=False)
    got = _scatter_back(lay, np.asarray(logits))
    ref = np.asarray(full_forward(params, g, cfg))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("mode", [Mode.VANILLA, Mode.ADAQP_P])
def test_backward_matches_full_graph(mode):
    g, lay, sh, cfg, mesh, params = _setup(GNNType.GCN, mode=mode)
    train_count = float(g.train_mask.sum())
    sinks = jnp.zeros((K, cfg.num_layers, cfg.r_pad))

    def dist_loss(params, sinks):
        def body(params, sh_stacked, sinks):
            s = sh_stacked.local()
            logits, _ = apply_gnn(
                params, s, cfg, sinks[0], True, dropout_key=jax.random.PRNGKey(0)
            )
            loss = masked_loss_sum(logits, s.labels, s.train_mask, cfg.multilabel)
            return loss[None]

        parts = shard_map(
            body, mesh=mesh, in_specs=(P(), P("part"), P("part")),
            out_specs=P("part"),
        )(params, sh, sinks)
        return parts.sum() / train_count

    (dloss, dgrads) = jax.value_and_grad(dist_loss)(params, sinks)

    labels = jnp.asarray(g.labels)
    mask = jnp.asarray(g.train_mask)

    def ref_loss(params):
        logits = full_forward(params, g, cfg)
        return masked_loss_sum(logits, labels, mask, cfg.multilabel) / train_count

    rloss, rgrads = jax.value_and_grad(ref_loss)(params)

    np.testing.assert_allclose(float(dloss), float(rloss), rtol=1e-4)
    flat_d, _ = jax.tree.flatten(dgrads)
    flat_r, _ = jax.tree.flatten(rgrads)
    for a, b in zip(flat_d, flat_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=3e-3, atol=1e-5)


def test_overlap_equals_serial():
    """AdaQP-p (overlapped) and Vanilla must be numerically identical —
    overlap is pure scheduling (SURVEY.md §5 race-detection note)."""
    g, lay, sh, cfg, mesh, params = _setup(GNNType.GCN, mode=Mode.VANILLA)
    cfg_p = dataclasses.replace(cfg, mode=Mode.ADAQP_P)
    lv, _ = _dist_forward(params, sh, cfg, mesh, train=False)
    lp, _ = _dist_forward(params, sh, cfg_p, mesh, train=False)
    np.testing.assert_allclose(np.asarray(lv), np.asarray(lp), rtol=1e-6, atol=1e-6)


def test_fwd_traces_shapes_and_positivity():
    g, lay, sh, cfg, mesh, params = _setup(GNNType.GCN)
    _, traces = _dist_forward(params, sh, cfg, mesh, train=True)
    traces = np.asarray(traces)  # [K, layers, K, S]
    assert traces.shape == (K, cfg.num_layers, K, cfg.s_pad)
    plan = lay.plan_fwd
    for s in range(K):
        for r in range(K):
            c = int(plan.counts[s, r])
            if c:
                assert (traces[s, :, r, :c] >= 0).all()
