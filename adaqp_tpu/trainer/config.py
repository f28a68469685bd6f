"""Two-level configuration: per-dataset YAML overridden by CLI flags
(reference: ``AdaQP/trainer/trainer.py:33-39``, flags ``main.py:6-15``).

YAML sections mirror the reference (``AdaQP/config/*.yaml``):
``data`` / ``model`` / ``runtime`` / ``assignment``.
"""
from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Any, Dict, Optional

import yaml

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "config")


@dataclass
class RunConfig:
    # data
    dataset: str = "sbm"
    raw_dir: str = "data/dataset"
    partition_dir: str = "data/part_data"
    num_feats: int = 0  # 0 -> from data
    num_classes: int = 0
    is_multilabel: bool = False
    # model
    model_name: str = "gcn"  # gcn | sage
    num_layers: int = 3
    hidden_dim: int = 256
    dropout_rate: float = 0.5
    use_norm: bool = True
    aggregator_type: str = "mean"
    # runtime
    num_parts: int = 4
    partition_method: str = "ldg"
    learning_rate: float = 0.01
    weight_decay: float = 0.0
    num_epochs: int = 100
    mode: str = "AdaQP"
    assign_scheme: str = "adaptive"
    exp_path: str = "exp"
    logger_level: str = "INFO"
    log_steps: int = 10
    seed: int = 42
    edge_chunk: Optional[int] = None
    # time comm/quant/central/marginal probes (the reference always records
    # these buckets, AdaQP/util/timer.py:29-51; the probe costs seconds once)
    measure_breakdown: bool = True
    # "auto" (default: strip/block on TPU when their gates pass, segment
    # elsewhere — trainer.resolve_spmm_impl) | "segment" | "block" (v1
    # bitmask-MXU) | "strip" (v3 window-reuse) | "compact" (v2, chip-gated)
    spmm_impl: str = "auto"
    # tile-vs-ELL split for the block impl: in-situ tile ~3.3us vs ELL
    # gather ~17 ns/edge puts breakeven near 190 edges/tile (EXPERIMENTS.md
    # r2 sweep: 512 -> 192 cut the Reddit-scale epoch 0.575 -> 0.464 s);
    # raise it when HBM is tight (bitmask bytes scale with tile count)
    block_min_edges: int = 192
    # compact-impl tiering (see spmm_compact module doc / DESIGN.md §1a)
    compact_me_ell: int = 64
    compact_full_cols: int = 1024
    # boundary-exchange wire: "ragged" = exact per-pair sizes via
    # ragged_all_to_all (reference-parity byte volume); "padded" = dense
    # all_to_all at worst-channel capacity (legacy round-1 path)
    wire_impl: str = "ragged"
    # pow2-bracket wire capacities so reassignments reuse the compiled step
    # (wire bytes stay exact; pack work gains <2x sentinel lanes). None =
    # auto: on for TPU (a retrace costs ~35s there vs ~10ms/epoch of pack),
    # off for the CPU mesh (pack dominates its epoch; retraces are rarer
    # than epochs). Only affects schemes that reassign (adaptive/random).
    static_wire: Optional[bool] = None
    agg_dtype: str = "float32"  # aggregation compute dtype
    # rematerialize GNN layers in backward (memory for recompute; lets
    # products-scale hidden 256 train under the full runtime on one chip)
    remat: bool = False
    # log the compiled train step's device-memory footprint (temps/args)
    # before the first step — sizing aid for large graphs
    log_hbm: bool = False
    # checkpoint / resume (capability absent in the reference, SURVEY.md §5)
    ckpt_every: int = 0  # epochs between checkpoints; 0 = off
    ckpt_dir: str = "checkpoints"
    resume: bool = False
    # assignment
    assign_cycle: int = 50
    profile_data_length: int = 8  # #payload sizes for cost-model profiling
    # channel resolution of the alpha-beta probes: "pair" = K*(K-1)
    # singleton probes (exact ordered pairs, reference profile.py:46-83);
    # "offset" = K-1 ppermute rotations (one curve per ring offset — fast
    # channels inherit a slow co-member's alpha on mixed ICI+DCN offsets);
    # "auto" = pair for K<=8, offset above
    profile_mode: str = "auto"
    group_size: int = 100
    coe_lambda: float = 0.5
    assign_bits: int = 8
    # bi-objective normalization: "nadir_utopia" (reference effective
    # default, AdaQP/assigner/assigner.py:312) or "magnitude"
    normal_mode: str = "nadir_utopia"
    # let the adaptive MILP assign raw fp32 (no quantize/pack) per channel
    # group — on fast fabrics (ICI) quantization is a net loss
    # (PRODUCTS8_r04.json: q8 = 0.75x Vanilla on ICI) and the per-channel
    # cost model can tell fast pairs from slow ones. Ragged wire only.
    fp32_lanes: bool = False
    # synthetic dataset knobs
    synth_kwargs: Dict[str, Any] = field(default_factory=dict)

    @staticmethod
    def from_yaml(dataset: str, overrides: Optional[Dict[str, Any]] = None) -> "RunConfig":
        cfg = RunConfig(dataset=dataset)
        path = os.path.join(CONFIG_DIR, f"{dataset}.yaml")
        if os.path.exists(path):
            with open(path) as f:
                doc = yaml.safe_load(f) or {}
            flat: Dict[str, Any] = {}
            for section in ("data", "model", "runtime", "assignment"):
                flat.update(doc.get(section) or {})
            _KEYMAP = {
                "name": "dataset",
                "dataset_path": "raw_dir",
                "partition_path": "partition_dir",
                "num_epoches": "num_epochs",
            }
            for k, v in flat.items():
                k = _KEYMAP.get(k, k)
                if hasattr(cfg, k):
                    setattr(cfg, k, v)
        for k, v in (overrides or {}).items():
            if v is None:
                continue
            if not hasattr(cfg, k):
                raise ValueError(f"unknown config key {k!r}")
            setattr(cfg, k, v)
        return cfg
