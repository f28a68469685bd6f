"""Multi-host initialization (ICI within a slice, DCN across slices).

Reference analog: torchrun rendezvous + gloo process group
(``AdaQP/communicator/comm.py:28-35``, ``README.md:88-122``). On TPU pods:
``jax.distributed.initialize`` connects the per-host processes; afterwards
``jax.devices()`` spans the whole slice and the ``('part',)`` mesh (and its
all_to_all / psum collectives) rides ICI within a slice and DCN across
slices — no application code changes.

Rendezvous configuration comes from the standard env vars
(``COORDINATOR_ADDRESS``, ``JAX_PROCESS_ID``/``PROCESS_COUNT``) or cloud
auto-detection; call :func:`maybe_initialize_distributed` before any other
JAX API (``main.py`` does).
"""
from __future__ import annotations

import logging
import os

logger = logging.getLogger("adaqp_tpu")


def maybe_initialize_distributed() -> bool:
    """Initialize jax.distributed when a multi-host rendezvous is configured;
    no-op (returns False) for single-process runs."""
    coord = os.environ.get("COORDINATOR_ADDRESS")
    nproc = os.environ.get("JAX_PROCESS_COUNT") or os.environ.get("NPROC")
    if not coord and not nproc:
        return False
    import jax

    kwargs = {}
    if coord:
        kwargs["coordinator_address"] = coord
    if nproc:
        kwargs["num_processes"] = int(nproc)
    pid = os.environ.get("JAX_PROCESS_ID")
    if pid is not None:
        kwargs["process_id"] = int(pid)
    jax.distributed.initialize(**kwargs)
    logger.info(
        "jax.distributed initialized: process %d/%d, %d global devices",
        jax.process_index(), jax.process_count(), len(jax.devices()),
    )
    return True
