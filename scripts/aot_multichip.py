"""Produce the committed AOT multi-chip compile artifact.

Compiles the full quantized AdaQP train step for abstract multi-chip v5e
topologies with the real TPU compiler and writes AOT_TOPOLOGY_r04.json.
Round-4 coverage (round-3 VERDICT missing #1/#2):

- the PRODUCTION strip kernel (shard-padded grids, inert steps, ``n_win``
  prefetch gate) at K=4 and K=8, not just the block impl;
- GraphSAGE as well as GCN;
- async-collective + latency-hiding compiler options, with the schedule
  parsed for comp-comm overlap evidence: every ragged exchange window must
  carry the local (central) SpMM custom-call — the reference's bi-level
  parallelization (``/root/reference/AdaQP/model/ops.py:156-193``) as a
  static scheduling property.

Run: python scripts/aot_multichip.py  (any backend; hosts the trainer on a
virtual CPU mesh in-process).
"""
import json
import os
import sys
import time

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from adaqp_tpu.trainer import RunConfig, Trainer  # noqa: E402
from adaqp_tpu.utils.aot import aot_compile_train_step  # noqa: E402


def build_trainer(k: int, impl: str, model: str, **extra) -> Trainer:
    cfg = RunConfig.from_yaml(
        "sbm",
        {
            "num_parts": k, "num_epochs": 2, "hidden_dim": 128,
            "num_layers": 3, "mode": "AdaQP", "assign_scheme": "adaptive",
            "profile_data_length": 2, "measure_breakdown": False,
            "assign_cycle": 50, "log_steps": 1000, "spmm_impl": impl,
            "model_name": model,
            "partition_dir": f"/tmp/aot_parts{k}", "exp_path": f"/tmp/aot_exp{k}",
            "synth_kwargs": {"n": 128 * k, "blocks": 4, "num_feats": 96,
                             "seed": 0},
            **extra,
        },
    )
    return Trainer(cfg)


CASES = (
    ("v5e:2x2", 4, "strip", "gcn", {}),
    ("v5e:2x4", 8, "strip", "gcn", {}),
    ("v5e:2x2", 4, "strip", "sage", {}),
    ("v5e:2x2", 4, "block", "gcn", {}),
    ("v5e:2x4", 8, "block", "gcn", {}),
    # mixed-width wire: 2/4/8/32 buckets incl. raw-fp32 lanes (round 4)
    ("v5e:2x2", 4, "strip", "gcn", {"fp32_lanes": True}),
)


def main():
    out = {"reports": []}
    for topo, k, impl, model, extra in CASES:
        t0 = time.perf_counter()
        try:
            rep = aot_compile_train_step(
                build_trainer(k, impl, model, **extra), topo
            )
        except Exception as e:
            rep = {"ok": False, "topology": topo, "err": repr(e)[:500]}
        rep["impl"] = impl
        rep["model"] = model
        rep.update(extra)
        rep["compile_s"] = round(time.perf_counter() - t0, 1)
        out["reports"].append(rep)
        print(json.dumps(rep))
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "AOT_TOPOLOGY_r04.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
