"""Network cost-model profiling (reference: ``AdaQP/assigner/profile.py``).

The reference times warmed-up blocking gloo p2p sends per ordered pair and
fits a per-channel linear alpha-beta model (``profile.py:46-106``). On TPU
the exchange is a single ``all_to_all`` over ICI/DCN, so we time the real
collective the trainer issues — uint8 payloads of increasing per-pair size
over the live mesh — and fit one alpha-beta model (ms per MB, ms) for the
collective's makespan as a function of the largest per-pair chunk. The ILP
then uses it per channel: ``t_c = alpha * MB_c + beta`` (SURVEY.md §7.3,
"ILP round-structure coupling").
"""
from __future__ import annotations

import time
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import PartitionSpec as P


def profile_cost_model(
    mesh: jax.sharding.Mesh,
    max_bytes_per_pair: int,
    num_sizes: int = 8,
    reps: int = 5,
) -> Tuple[np.ndarray, np.ndarray]:
    """Time all_to_all at ``num_sizes`` payload sizes; returns
    (sizes_mb [S], times_ms [S]).
    """
    k = mesh.devices.size
    sizes = np.linspace(
        max(1024, max_bytes_per_pair // num_sizes), max(2048, max_bytes_per_pair), num_sizes
    ).astype(np.int64)
    # round to 128 lanes for clean layouts
    sizes = (sizes // 128 + 1) * 128
    times = []

    for sz in sizes:
        x = jnp.zeros((k, k, int(sz)), jnp.uint8)
        spec = jax.sharding.NamedSharding(mesh, P("part"))
        x = jax.device_put(x, spec)

        @jax.jit
        def a2a(x):
            def body(x):
                return jax.lax.all_to_all(
                    x[0], "part", split_axis=0, concat_axis=0, tiled=True
                )[None]

            return shard_map(body, mesh=mesh, in_specs=P("part"), out_specs=P("part"))(x)

        a2a(x).block_until_ready()  # compile + warm
        t0 = time.perf_counter()
        for _ in range(reps):
            out = a2a(x)
        out.block_until_ready()
        times.append((time.perf_counter() - t0) / reps * 1e3)
    return sizes / 1e6, np.asarray(times)


def fit_cost_model(sizes_mb: np.ndarray, times_ms: np.ndarray) -> Tuple[float, float]:
    """Least-squares linear fit -> (alpha ms/MB, beta ms) (reference:
    ``np.polyfit(size, time, 1)``, ``profile.py:97-106``)."""
    alpha, beta = np.polyfit(sizes_mb, times_ms, 1)
    return float(max(alpha, 1e-6)), float(max(beta, 0.0))
