"""Distributed path with the bitmask-MXU SpMM: matches the segment path."""
import jax
import numpy as np

from adaqp_tpu.trainer import RunConfig, Trainer

# 128 features: the block impl pads features to the 128-lane grid, so equal
# dims keep init/params comparable across impls
SYNTH = {"n": 400, "blocks": 4, "num_feats": 128, "seed": 2}


def _run(tmp_path, impl, epochs=8):
    cfg = RunConfig.from_yaml(
        "sbm",
        {
            "num_parts": 4, "num_epochs": epochs, "hidden_dim": 16,
            "mode": "Vanilla", "dropout_rate": 0.0, "log_steps": 100,
            "partition_dir": str(tmp_path / f"p_{impl}"),
            "exp_path": str(tmp_path / f"e_{impl}"),
            "spmm_impl": impl, "synth_kwargs": SYNTH,
        },
    )
    t = Trainer(cfg)
    rec = t.train()
    return t, rec


def test_block_matches_segment_loss_curve(tmp_path):
    t1, r1 = _run(tmp_path, "segment")
    t2, r2 = _run(tmp_path, "block")
    # identical math (fp32 on CPU): same accuracy trajectory
    np.testing.assert_allclose(r1["val_curve"], r2["val_curve"], atol=1e-4)
    # and same final params up to fp noise
    for a, b in zip(jax.tree.leaves(t1.params), jax.tree.leaves(t2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4)
