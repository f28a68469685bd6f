"""Distributed GCN / GraphSAGE models (functional, pytree params).

Mirrors the reference model layer (``AdaQP/model/distGCN.py`` /
``distSAGE.py``): L conv layers; between layers (not after the last):
dropout -> LayerNorm (optional) -> ReLU, in exactly that order
(``distGCN.py:79-84``). Weights Xavier-uniform (ReLU gain for SAGE linear
layers, ``distSAGE.py:38-44``), biases zero.

- GCN layer  : ``out = aggregate(h) @ W + b``   (aggregate-then-transform,
  ``distGCN.py:40-50``)
- SAGE mean  : ``out = h @ W_self + aggregate(h) @ W_neigh + b``
  (``distSAGE.py:46-60``)
- SAGE 'gcn' : ``out = aggregate(h) @ W_neigh + b``

Everything runs per-shard inside shard_map; parameters are replicated.
"""
from __future__ import annotations

import math
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from ..common.types import AggregatorType, GNNType
from ..graph.device import ShardArrays, ShardStatic
from ..ops.dist_ops import dist_aggregate


def _xavier(key, shape, gain=1.0):
    fan_in, fan_out = shape
    a = gain * math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, jnp.float32, -a, a)


def _layer_dims(cfg: ShardStatic) -> List[Tuple[int, int]]:
    dims = [(cfg.f_pad, cfg.hidden)]
    dims += [(cfg.hidden, cfg.hidden)] * (cfg.num_layers - 2)
    dims += [(cfg.hidden, cfg.num_classes)]
    return dims


def init_params(key: jax.Array, cfg: ShardStatic) -> List[Dict[str, jnp.ndarray]]:
    params = []
    relu_gain = math.sqrt(2.0)
    for i, (din, dout) in enumerate(_layer_dims(cfg)):
        key, k1, k2 = jax.random.split(key, 3)
        layer: Dict[str, jnp.ndarray] = {"b": jnp.zeros((dout,))}
        if cfg.model is GNNType.GCN:
            layer["w"] = _xavier(k1, (din, dout))
        else:
            layer["w_neigh"] = _xavier(k1, (din, dout), relu_gain)
            if cfg.agg_type is not AggregatorType.GCN:
                layer["w_self"] = _xavier(k2, (din, dout), relu_gain)
        if cfg.use_norm and i < cfg.num_layers - 1:
            layer["ln_scale"] = jnp.ones((dout,))
            layer["ln_bias"] = jnp.zeros((dout,))
        params.append(layer)
    return params


def _layernorm(x, scale, bias, eps=1e-5):
    mu = x.mean(axis=-1, keepdims=True)
    var = ((x - mu) ** 2).mean(axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * scale + bias


def apply_gnn(
    params: List[Dict[str, jnp.ndarray]],
    sh: ShardArrays,
    cfg: ShardStatic,
    sinks: jnp.ndarray,
    train: bool,
    dropout_key: Optional[jax.Array] = None,
    quant_keys: Optional[jnp.ndarray] = None,
    quant_buckets_per_layer=None,
    blocks=None,
    wire_per_layer=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Forward pass for one shard (inside shard_map).

    ``sinks`` f32 [num_layers, r_pad] gradient taps (one per layer exchange);
    ``quant_keys`` stacked keys [num_layers, 2]; ``quant_buckets_per_layer``
    list of (bucket_bits, bucket_arrays) per layer or None;
    ``wire_per_layer`` list of (wfwd, wbwd) WireDir pairs for the exact-size
    ragged wire (fp or quantized), or None.

    Returns (logits [L, classes], fwd_traces [num_layers, K, S]).
    """
    h = sh.feats
    traces = []
    n_layers = cfg.num_layers
    for i, layer in enumerate(params):
        keys_i = None if quant_keys is None else quant_keys[i]
        buckets_i = (
            None if quant_buckets_per_layer is None else quant_buckets_per_layer[i]
        )
        # layer 0 consumes zero-padded input features; deeper layers run at
        # exact hidden width (quantization range must ignore pad columns)
        ft = cfg.f_true if (i == 0 and cfg.f_true) else h.shape[1]
        wire_i = None if wire_per_layer is None else wire_per_layer[i]

        def layer_fn(h, layer, sink_i, i=i, keys_i=keys_i, buckets_i=buckets_i,
                     ft=ft, wire_i=wire_i):
            agg, tr = dist_aggregate(
                h, sh, cfg, sink_i, keys_i, train, buckets_i, blocks,
                f_true=ft,
                bwd_live=(i > 0),  # layer-0 input features carry no gradient
                wire_plans=wire_i,
            )
            # the configured aggregation dtype also drives the dense
            # transform (MXU-native) and inter-layer activation storage —
            # at products scale the f32 [n, hidden] activations are what
            # overflow HBM; logits return in f32 for the loss
            dt = jnp.bfloat16 if cfg.agg_dtype == "bfloat16" else None
            if dt is not None:
                agg = agg.astype(dt)

            def w(name):
                m = layer[name]
                return m.astype(dt) if dt is not None else m

            if cfg.model is GNNType.GCN:
                out = agg @ w("w") + w("b")
            else:
                out = agg @ w("w_neigh") + w("b")
                if "w_self" in layer:
                    out = out + h.astype(agg.dtype) @ w("w_self")
            if i < n_layers - 1:
                if train and cfg.dropout > 0.0:
                    dk = jax.random.fold_in(dropout_key, i)
                    keep = jax.random.bernoulli(dk, 1.0 - cfg.dropout, out.shape)
                    out = jnp.where(keep, out / (1.0 - cfg.dropout), 0.0)
                if cfg.use_norm:
                    # normalization statistics in f32 regardless of dt
                    out = _layernorm(
                        out.astype(jnp.float32), layer["ln_scale"],
                        layer["ln_bias"],
                    ).astype(agg.dtype)
                out = jax.nn.relu(out)
            else:
                out = out.astype(jnp.float32)
            return out, tr

        if cfg.remat and train:
            # recompute this layer's [n, hidden] intermediates in backward
            # instead of storing them (ShardStatic.remat)
            layer_fn = jax.checkpoint(layer_fn)
        h, tr = layer_fn(h, layer, sinks[i])
        traces.append(tr)
    return h, jnp.stack(traces)
