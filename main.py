"""Training entry point (reference: ``main.py``).

    python main.py --dataset reddit --num_parts 4 --model_name gcn \
        --mode AdaQP --assign_scheme adaptive

Synthetic datasets (no download): --dataset sbm | rmat.
Device selection: runs on however many devices JAX exposes; for CPU-mesh
testing set JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=N.
"""
import argparse
import os

import jax

# Honor JAX_PLATFORMS even when a TPU plugin registered itself eagerly at
# interpreter start (it may override the env var during registration).
if os.environ.get("JAX_PLATFORMS"):
    try:
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    except Exception:
        pass

from adaqp_tpu.comm.distributed import maybe_initialize_distributed  # noqa: E402
from adaqp_tpu.utils.compilation_cache import enable_compilation_cache  # noqa: E402

maybe_initialize_distributed()
enable_compilation_cache()

from adaqp_tpu.trainer import RunConfig, Trainer  # noqa: E402


def parse_args():
    p = argparse.ArgumentParser(description="adaqp_tpu trainer")
    p.add_argument("--dataset", type=str, default="sbm")
    p.add_argument("--num_parts", type=int, default=None)
    p.add_argument("--partition_method", type=str, default=None, choices=["ldg", "metis", "random"])
    p.add_argument("--model_name", type=str, default=None, choices=["gcn", "sage"])
    p.add_argument("--mode", type=str, default=None,
                   choices=["Vanilla", "AdaQP", "AdaQP-q", "AdaQP-p"])
    p.add_argument("--assign_scheme", type=str, default=None,
                   choices=["uniform", "random", "adaptive"])
    p.add_argument("--assign_bits", type=int, default=None, choices=[2, 4, 8])
    p.add_argument("--num_epochs", type=int, default=None)
    p.add_argument("--hidden_dim", type=int, default=None)
    p.add_argument("--num_layers", type=int, default=None)
    p.add_argument("--learning_rate", type=float, default=None)
    p.add_argument("--logger_level", type=str, default=None)
    p.add_argument("--exp_path", type=str, default=None)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--spmm_impl", type=str, default=None,
                   choices=["auto", "segment", "block", "compact", "strip"])
    p.add_argument("--agg_dtype", type=str, default=None, choices=["float32", "bfloat16"])
    p.add_argument("--block_min_edges", type=int, default=None,
                   help="tile/ELL split threshold for --spmm_impl block")
    p.add_argument("--compact_me_ell", type=int, default=None,
                   help="compact impl: regions below this edge count ride "
                        "the ELL tail")
    p.add_argument("--compact_full_cols", type=int, default=None,
                   help="compact impl: regions above this occupied-column "
                        "count stay full-bitmask")
    p.add_argument("--static_wire", type=int, default=None, choices=[0, 1],
                   help="pow2 wire capacities (reassignment reuses the "
                        "compiled step); default: on for TPU")
    p.add_argument("--remat", type=int, default=None, choices=[0, 1],
                   help="rematerialize GNN layers in backward (fits "
                        "larger graphs/widths per chip at ~1 extra "
                        "aggregation pass)")
    p.add_argument("--log_hbm", action="store_true", default=None,
                   help="log the compiled train step's device-memory "
                        "footprint before the first step")
    p.add_argument("--fp32_lanes", action="store_true", default=None,
                   help="let the adaptive MILP assign raw fp32 (b=32, no "
                        "quantize/pack) per channel group — for mixed "
                        "fabrics where fast (ICI) pairs lose from "
                        "quantization (ragged wire only)")
    p.add_argument("--profile_mode", type=str, default=None,
                   choices=["auto", "offset", "pair"],
                   help="cost-model probe resolution: per ordered pair "
                        "(exact, K^2 compiles), per ring-offset link class "
                        "(K-1 collectives, misattributes on mixed offsets), "
                        "or auto (pair for K<=8)")
    p.add_argument("--normal_mode", type=str, default=None,
                   choices=["nadir_utopia", "magnitude"],
                   help="bi-objective normalization for the bit assigner "
                        "(reference assigner.py:312-361)")
    p.add_argument("--ckpt_every", type=int, default=None)
    p.add_argument("--resume", action="store_true", default=None)
    return p.parse_args()


def main():
    args = parse_args()
    overrides = {k: v for k, v in vars(args).items() if k != "dataset"}
    if overrides.get("static_wire") is not None:
        overrides["static_wire"] = bool(overrides["static_wire"])
    if overrides.get("remat") is not None:
        overrides["remat"] = bool(overrides["remat"])
    cfg = RunConfig.from_yaml(args.dataset, overrides)
    trainer = Trainer(cfg)
    records = trainer.train()
    trainer.save(records)


if __name__ == "__main__":
    main()
