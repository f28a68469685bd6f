"""Gradient correctness through the mixed-bit quantized exchange, and the
memory-bounded edge-chunk SpMM path in the trainer."""
import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import PartitionSpec as P

from adaqp_tpu.assigner import buckets_from_assignment, random_assignment
from adaqp_tpu.comm import exchange_fp, exchange_quant
from adaqp_tpu.common.types import GNNType
from adaqp_tpu.graph import build_layout, partition_graph
from adaqp_tpu.graph.device import make_mesh
from adaqp_tpu.helper import sbm_graph
from adaqp_tpu.trainer import RunConfig, Trainer

K = 4


def test_mixed_bit_grad_close_to_fp(rng):
    g = sbm_graph(n=240, blocks=4, num_feats=16, seed=8)
    lay = build_layout(g, partition_graph(g, K, "ldg"), GNNType.GCN)
    plan = lay.plan_fwd
    asg = random_assignment(plan, 1, seed=5)
    bits_tuple, arrays = buckets_from_assignment(plan, asg, lay.l_max)[0]
    mesh = make_mesh(K)
    h = jnp.asarray(lay.feats)
    sink = jnp.zeros((K, plan.r_pad))
    send_idx = jnp.asarray(plan.send_idx)
    recv_slot = jnp.asarray(plan.recv_slot)
    dev_arrays = tuple(tuple(jnp.asarray(a) for a in quad) for quad in arrays)
    flat = [a for quad in dev_arrays for a in quad]
    gw = jnp.asarray(rng.normal(size=(K, plan.r_pad, 16)).astype(np.float32))

    def loss_q(h, keys, *flat):
        def body(h, gww, sk, *fl):
            quads = tuple(
                tuple(x[0] for x in fl[i * 4 : (i + 1) * 4])
                for i in range(len(arrays))
            )
            rem = exchange_quant(
                h[0], keys, sk[0], quads, bits_tuple, plan.r_pad, 16, "part"
            )
            return (rem * gww[0]).sum()[None]

        parts = shard_map(
            body, mesh=mesh, in_specs=(P("part"),) * (3 + len(flat)),
            out_specs=P("part"),
        )(h, gw, sink, *flat)
        return parts.sum()

    def loss_fp(h):
        def body(h, gww, sk, si, rs):
            rem = exchange_fp(h[0], si[0], rs[0], sk[0], plan.r_pad, "part")
            return (rem * gww[0]).sum()[None]

        parts = shard_map(
            body, mesh=mesh, in_specs=(P("part"),) * 5, out_specs=P("part")
        )(h, gw, sink, send_idx, recv_slot)
        return parts.sum()

    g_fp = np.asarray(jax.grad(loss_fp)(h))
    # quantized grads are UNBIASED estimates of fp grads (2-bit lanes are
    # individually noisy): the mean over repeated stochastic draws converges
    grad_q = jax.jit(jax.grad(loss_q))
    reps = 24
    acc = np.zeros_like(g_fp)
    g_q = None
    for r in range(reps):
        keys = jax.random.split(jax.random.PRNGKey(100 + r), 2)
        g_q = np.asarray(grad_q(h, keys, *flat))
        acc += g_q
    mean_rel = np.abs(acc / reps - g_fp).mean() / (np.abs(g_fp).mean() + 1e-9)
    single_rel = np.abs(g_q - g_fp).mean() / (np.abs(g_fp).mean() + 1e-9)
    assert mean_rel < 0.3 * single_rel + 0.02, (mean_rel, single_rel)
    # nonzero where fp nonzero (routing identical)
    assert ((np.abs(g_q) > 1e-12) == (np.abs(g_fp) > 1e-12)).mean() > 0.99


def test_trainer_edge_chunk_path(tmp_path):
    cfg = RunConfig.from_yaml(
        "sbm",
        {
            "num_parts": 4, "num_epochs": 12, "hidden_dim": 16,
            "mode": "Vanilla", "edge_chunk": 64, "log_steps": 100,
            "partition_dir": str(tmp_path / "p"), "exp_path": str(tmp_path / "e"),
            "synth_kwargs": {"n": 300, "blocks": 4, "num_feats": 12, "seed": 6},
        },
    )
    t = Trainer(cfg)
    rec = t.train()
    assert rec["best"][2] > 0.85
