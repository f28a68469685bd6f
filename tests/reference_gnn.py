"""Single-device full-graph GNN oracle for equivalence tests.

Implements exactly the aggregation/model math of SURVEY.md §3.3 /
``AdaQP/model/ops.py:17-67`` on the whole (unpartitioned) graph, in plain
jnp — the correctness oracle the reference lacks (SURVEY.md §4b).
"""
import jax
import jax.numpy as jnp

from adaqp_tpu.common.types import AggregatorType, GNNType


def full_aggregate(g, h, model, agg_type=AggregatorType.MEAN):
    src = jnp.asarray(g.src)
    dst = jnp.asarray(g.dst)
    din = jnp.maximum(jnp.asarray(g.in_degrees, jnp.float32), 1.0)
    dout = jnp.maximum(jnp.asarray(g.out_degrees, jnp.float32), 1.0)
    n = g.num_nodes
    if model is GNNType.GCN:
        hs = h * jax.lax.rsqrt(dout)[:, None]
        agg = jax.ops.segment_sum(hs[src], dst, num_segments=n)
        return agg * jax.lax.rsqrt(din)[:, None]
    agg = jax.ops.segment_sum(h[src], dst, num_segments=n)
    if agg_type is AggregatorType.MEAN:
        return agg / din[:, None]
    return (agg + h) / (din[:, None] + 1.0)


def full_forward(params, g, cfg, feats=None):
    """Mirror of model/gnn.py apply (no dropout) on the full graph."""
    h = jnp.asarray(g.feats) if feats is None else feats
    # layouts zero-pad features for wire packing; match (exact: padded
    # columns hit zero-initialized weight rows times zero inputs)
    if h.shape[1] < cfg.f_pad:
        h = jnp.pad(h, ((0, 0), (0, cfg.f_pad - h.shape[1])))
    for i, layer in enumerate(params):
        agg = full_aggregate(g, h, cfg.model, cfg.agg_type)
        if cfg.model is GNNType.GCN:
            out = agg @ layer["w"] + layer["b"]
        else:
            out = agg @ layer["w_neigh"] + layer["b"]
            if "w_self" in layer:
                out = out + h @ layer["w_self"]
        if i < cfg.num_layers - 1:
            if cfg.use_norm:
                mu = out.mean(-1, keepdims=True)
                var = ((out - mu) ** 2).mean(-1, keepdims=True)
                out = (out - mu) * jax.lax.rsqrt(var + 1e-5) * layer["ln_scale"] + layer["ln_bias"]
            out = jax.nn.relu(out)
        h = out
    return h
