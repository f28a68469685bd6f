"""Distributed path with the strip (window reuse) SpMM: matches segment."""
import jax
import numpy as np

from adaqp_tpu.trainer import RunConfig, Trainer

SYNTH = {"n": 400, "blocks": 4, "num_feats": 128, "seed": 2}


def _run(tmp_path, impl, epochs=8, **over):
    cfg = RunConfig.from_yaml(
        "sbm",
        {
            "num_parts": 4, "num_epochs": epochs, "hidden_dim": 16,
            "mode": "Vanilla", "dropout_rate": 0.0, "log_steps": 100,
            "partition_dir": str(tmp_path / f"p_{impl}"),
            "exp_path": str(tmp_path / f"e_{impl}"),
            "spmm_impl": impl, "synth_kwargs": SYNTH,
            **over,
        },
    )
    t = Trainer(cfg)
    rec = t.train()
    return t, rec


def test_strip_matches_segment_loss_curve(tmp_path):
    t1, r1 = _run(tmp_path, "segment")
    t2, r2 = _run(tmp_path, "strip")
    from adaqp_tpu.graph.strip_shards import StripShards

    assert isinstance(t2.blocks, StripShards)
    np.testing.assert_allclose(r1["val_curve"], r2["val_curve"], atol=1e-4)
    for a, b in zip(jax.tree.leaves(t1.params), jax.tree.leaves(t2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4)


def test_strip_matches_block_directed(tmp_path):
    # directed graphs exercise the non-aliased bwd_local group
    from tests.test_block_dist import _directed_graph

    g = _directed_graph()

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
    t2, r2 = run("strip")
    assert t2.blocks.bwd_local is not None
    np.testing.assert_allclose(r1["val_curve"], r2["val_curve"], atol=1e-4)
    for a, b in zip(jax.tree.leaves(t1.params), jax.tree.leaves(t2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4)


def test_strip_quantized_mode(tmp_path):
    # the quantized exchange rides the same strip aggregation
    t, rec = _run(
        tmp_path, "strip", mode="AdaQP-q", assign_scheme="uniform",
        num_epochs=10, dropout_rate=0.5,
    )
    assert rec["best"][2] > 0.85
