"""Hardware test: end-to-end quantized training with the Pallas kernels
(block-MXU SpMM + quantize) on the real chip."""
import jax
import pytest

if jax.default_backend() not in ("tpu",):
    pytest.skip("requires a TPU backend", allow_module_level=True)

from adaqp_tpu.trainer import RunConfig, Trainer  # noqa: E402


def test_train_block_pallas_on_chip(tmp_path):
    cfg = RunConfig.from_yaml(
        "sbm",
        {
            "num_parts": 1, "num_epochs": 6, "hidden_dim": 128,
            "mode": "AdaQP-q", "assign_scheme": "uniform",
            "spmm_impl": "block", "agg_dtype": "bfloat16",
            "partition_dir": str(tmp_path / "p"), "exp_path": str(tmp_path / "e"),
            "log_steps": 100,
            "synth_kwargs": {"n": 3000, "blocks": 5, "num_feats": 128, "seed": 4},
        },
    )
    t = Trainer(cfg)
    rec = t.train()
    _, tr, va, te = rec["best"]
    assert va > 0.9
