"""Worker process for the 2-process multihost test (not a pytest module).

Each process gets 4 virtual CPU devices; jax.distributed joins them into an
8-device cluster — the JAX analog of the reference's torchrun multi-node
launch (``AdaQP/README.md:88-122``). Trains SBM end-to-end through the full
Trainer (global sharded arrays via make_array_from_callback, replicated
params, rank-0 artifact writes) and prints the final val accuracy.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from adaqp_tpu.comm.distributed import maybe_initialize_distributed  # noqa: E402

assert maybe_initialize_distributed(), "rendezvous env not set"
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, jax.devices()

from adaqp_tpu.trainer import RunConfig, Trainer  # noqa: E402


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "Vanilla"
    workdir = sys.argv[2]
    cfg = RunConfig.from_yaml(
        "sbm",
        {
            "num_parts": 8,
            "num_epochs": 16,
            "hidden_dim": 16,
            "num_layers": 2,
            "mode": mode,
            "assign_scheme": "uniform",
            "log_steps": 1000,
            "measure_breakdown": False,
            "partition_dir": os.path.join(workdir, "parts"),
            "exp_path": os.path.join(workdir, "exp"),
            "synth_kwargs": {"n": 640, "blocks": 4, "num_feats": 16, "seed": 1},
        },
    )
    t = Trainer(cfg)
    rec = t.train()
    t.save(rec)
    _, tr, va, te = rec["best"]
    print(f"MULTIHOST_RESULT process={jax.process_index()} val={va:.4f}", flush=True)


if __name__ == "__main__":
    main()
