"""Distributed path with the compact-column SpMM: matches the segment path.

Mirrors tests/test_block_dist.py for the v2 kernel (CompactShards under
shard_map, inert-item padding, bidirected aliasing, directed transposes).
"""
import jax
import numpy as np

from adaqp_tpu.trainer import RunConfig, Trainer

# 384 features: the compact impl pads features to its 384-lane F-chunk, so
# equal dims keep init/params comparable across impls (segment pads to 4,
# 384 is already a multiple)
SYNTH = {"n": 400, "blocks": 4, "num_feats": 384, "seed": 2}


def _run(tmp_path, impl, epochs=8, **extra):
    cfg = RunConfig.from_yaml(
        "sbm",
        {
            "num_parts": 4, "num_epochs": epochs, "hidden_dim": 16,
            "mode": "Vanilla", "dropout_rate": 0.0, "log_steps": 100,
            "partition_dir": str(tmp_path / f"p_{impl}"),
            "exp_path": str(tmp_path / f"e_{impl}"),
            "spmm_impl": impl, "synth_kwargs": SYNTH, **extra,
        },
    )
    t = Trainer(cfg)
    rec = t.train()
    return t, rec


def test_compact_matches_segment_loss_curve(tmp_path):
    t1, r1 = _run(tmp_path, "segment")
    # low tier thresholds force all three tiers to coexist on a tiny graph
    t2, r2 = _run(tmp_path, "compact", compact_me_ell=8, compact_full_cols=64)
    np.testing.assert_allclose(r1["val_curve"], r2["val_curve"], atol=1e-4)
    for a, b in zip(jax.tree.leaves(t1.params), jax.tree.leaves(t2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4)


def test_compact_matches_segment_directed(tmp_path):
    # directed graphs take the NON-aliased bwd_local branch
    from tests.test_block_dist import _directed_graph

    g = _directed_graph(f=384)  # equal dims across impls (see SYNTH note)

    def run(impl):
        cfg = RunConfig.from_yaml(
            "sbm",
            {
                "num_parts": 4, "num_epochs": 6, "hidden_dim": 16,
                "mode": "Vanilla", "dropout_rate": 0.0, "log_steps": 100,
                "partition_dir": str(tmp_path / f"pd_{impl}"),
                "exp_path": str(tmp_path / f"ed_{impl}"),
                "spmm_impl": impl,
            },
        )
        t = Trainer(cfg, graph=g)
        return t, t.train()

    t1, r1 = run("segment")
    t2, r2 = run("compact")
    assert t2.blocks.bwd_local is not None  # the branch under test
    np.testing.assert_allclose(r1["val_curve"], r2["val_curve"], atol=1e-4)
    for a, b in zip(jax.tree.leaves(t1.params), jax.tree.leaves(t2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4)


def test_compact_shards_padding_is_inert(tmp_path):
    # shards with unequal item counts get inert padding: aggregation under
    # shard_map must equal the per-partition segment sums exactly
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from adaqp_tpu.common.types import GNNType
    from adaqp_tpu.graph import build_layout, partition_graph
    from adaqp_tpu.graph.compact_shards import build_compact_shards
    from adaqp_tpu.graph.device import make_mesh
    from adaqp_tpu.helper.dataset import rmat_graph
    from adaqp_tpu.ops.spmm import segment_spmm
    from adaqp_tpu.ops.spmm_compact import run_compact

    g = rmat_graph(n=6000, avg_degree=16, num_feats=8, seed=4)
    lay = build_layout(
        g, partition_graph(g, 4, "ldg"), GNNType.GCN, pad_multiple=2048,
        feat_pad_multiple=128,
    )
    shards = build_compact_shards(lay, me_ell=16, full_cols=128)
    # rmat spread should populate multiple tiers somewhere
    assert any(w for w in shards.ell_widths), "no ELL stragglers split off"
    t_counts = {
        int(np.asarray(q[0]).shape[1])
        for q in (shards.fwd_local, shards.fwd_halo, shards.bwd_halo)
    }
    assert t_counts, "no stacked items"

    mesh = make_mesh(4)
    f = lay.num_feats
    h = jnp.asarray(
        np.random.default_rng(0).normal(size=(4, lay.l_max, f)).astype(np.float32)
    )

    def body(h, shards):
        fl, _, _, _ = shards.local().devices()
        return run_compact(fl, h[0], use_pallas=False)[None]

    got = shard_map(
        body, mesh=mesh, in_specs=(P("part"), P("part")), out_specs=P("part")
    )(h, jax.tree.map(jnp.asarray, shards))

    for p in range(4):
        src, dst = lay.fwd_local[0][p], lay.fwd_local[1][p]
        valid = dst < lay.l_max
        want = segment_spmm(
            jnp.asarray(src[valid]), jnp.asarray(dst[valid]), None, h[p],
            lay.l_max,
        )
        np.testing.assert_allclose(
            np.asarray(got[p]), np.asarray(want), rtol=1e-4, atol=1e-4
        )
