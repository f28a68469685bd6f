"""adaqp_tpu — TPU-native distributed full-graph GNN training with adaptive
message quantization.

A ground-up JAX/XLA/Pallas re-design of the capabilities of AdaQP
(MLSys 2023, reference: raywan-110/AdaQP):

- full-graph GCN / GraphSAGE training over K graph partitions, one partition
  per TPU chip on a 1-D ``('part',)`` device mesh under ``shard_map``;
- per-layer boundary-node embedding/gradient exchange as padded all-to-all
  collectives over ICI/DCN (reference: hand-rolled gloo ring,
  ``AdaQP/communicator/comm.py:166-222``);
- stochastic 2/4/8-bit message quantization as Pallas TPU kernels
  (reference: ``quant_cuda`` CUDA extension, ``src/quantization_cuda_kernel.cu``);
- adaptive bit-width assignment via a variance-vs-communication-time MILP
  (scipy/HiGHS; reference: PuLP/Gurobi, ``AdaQP/assigner/assigner.py``);
- bi-level computation-communication overlap via central/marginal subgraph
  decomposition (reference: ``AdaQP/manager/conversion.py:114-172``), relying
  on XLA async-collective scheduling instead of CUDA streams/events.

No singletons: all state lives in explicit dataclasses threaded functionally
(contrast reference's ``Communicator.ctx`` / ``GraphEngine.ctx`` /
``Assigner.ctx`` globals, ``AdaQP/communicator/comm.py:22``).
"""

__version__ = "0.1.0"

from . import common  # noqa: F401
