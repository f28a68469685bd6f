"""Checkpoint/resume round-trip (capability absent in the reference)."""
import numpy as np

from adaqp_tpu.trainer import RunConfig, Trainer

SYNTH = {"n": 300, "blocks": 4, "num_feats": 12, "seed": 5}


def _cfg(tmp_path, **over):
    return RunConfig.from_yaml(
        "sbm",
        {
            "num_parts": 4, "hidden_dim": 16, "log_steps": 100,
            "mode": "AdaQP", "assign_scheme": "uniform",
            "partition_dir": str(tmp_path / "parts"),
            "exp_path": str(tmp_path / "exp"),
            "ckpt_dir": str(tmp_path / "ckpt"),
            "synth_kwargs": SYNTH,
            **over,
        },
    )


def test_resume_continues_training(tmp_path):
    t1 = Trainer(_cfg(tmp_path, num_epochs=6, ckpt_every=3))
    t1.train()

    # resume from epoch 6 and run to 10
    t2 = Trainer(_cfg(tmp_path, num_epochs=10, ckpt_every=3, resume=True))
    rec = t2.train()
    assert t2.recorder.num_recorded == 10
    # resumed params differ from a fresh init (training actually continued)
    fresh = Trainer(_cfg(tmp_path, num_epochs=1))
    import jax

    diffs = [
        float(np.abs(np.asarray(a) - np.asarray(b)).max())
        for a, b in zip(jax.tree.leaves(t2.params), jax.tree.leaves(fresh.params))
    ]
    assert max(diffs) > 1e-3
    # recorder's early epochs survived the round trip
    assert (t2.recorder.metrics[:6] == t1.recorder.metrics[:6]).all()


def test_resume_without_checkpoint_is_fresh(tmp_path):
    t = Trainer(_cfg(tmp_path, num_epochs=2, resume=True))
    rec = t.train()
    assert t.recorder.num_recorded == 2
