"""Why does the v5p:2x2x2 products schedule hoist ZERO local-SpMM calls
into its async ragged-all-to-all windows (round-4 PRODUCTS8 artifact,
windows_with_local_spmm: 0), while v5e:2x4 hoists 8/8?

Minimal reproducer: shard_map(ragged_all_to_all + independent dot) AOT-
compiled per topology, schedule analyzed with the same window parser the
artifact uses (utils/aot.py::analyze_overlap). Tries XLA scheduler flag
variants on the failing topology.

Host-side only (PJRT topology compile, no chips).
"""
import os
import sys
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402
from jax.experimental.shard_map import shard_map  # noqa: E402

from adaqp_tpu.utils.aot import (  # noqa: E402
    OVERLAP_COMPILER_OPTIONS, analyze_overlap, get_tpu_topology,
)

ROWS, F = 65536, 256  # per-shard wire rows / width proxy
MM = 4096  # independent local matmul (the hideable compute)


def log(*a):
    print(*a, flush=True)


def build(k: int):
    cap = ROWS * F // 2

    def body(buf, h, w):
        # exchange: exact-size ragged a2a of a flat u32 wire buffer
        sizes = jnp.full((k,), cap // k, jnp.int32)
        offs = jnp.arange(k, dtype=jnp.int32) * (cap // k)
        out = jax.lax.ragged_all_to_all(
            buf, jnp.zeros((cap,), jnp.uint32), offs, sizes, offs, sizes,
            axis_name="part",
        )
        # independent local compute (the SpMM stand-in): no data dep on out
        acc = h
        for _ in range(4):
            acc = jnp.tanh(acc @ w)
        return (out[:8].astype(jnp.float32).sum() + acc.sum()).reshape(1)

    def step(bufs, hs, ws):
        return shard_map(
            body, mesh=mesh, in_specs=(P("part"), P("part"), P("part")),
            out_specs=P("part"),
        )(bufs, hs, ws)

    return step, cap


def compile_for(topo_name: str, extra_opts=None):
    topo = get_tpu_topology(topo_name)
    k = len(topo.devices)
    global mesh
    mesh = Mesh(np.array(topo.devices).reshape(k), ("part",))
    step, cap = build(k)
    bufs = jax.ShapeDtypeStruct((k * cap,), jnp.uint32)
    hs = jax.ShapeDtypeStruct((k * MM, MM // 64), jnp.float32)
    ws = jax.ShapeDtypeStruct((k * (MM // 64), MM // 64), jnp.float32)
    sh = NamedSharding(mesh, P("part"))
    opts = dict(OVERLAP_COMPILER_OPTIONS)
    if extra_opts:
        opts.update(extra_opts)
    lowered = jax.jit(step, in_shardings=(sh, sh, sh)).lower(bufs, hs, ws)
    return lowered.compile(opts)


def main():
    variants = [
        ("default-overlap-opts", None),
        ("sched-mem-limit-90", {
            "xla_tpu_scheduler_percent_shared_memory_limit": 90}),
        ("no-latency-hiding", {
            "xla_tpu_enable_latency_hiding_scheduler": False}),
    ]
    for name in ("v5e:2x2", "v5p:2x2x1", "v5p:2x2x2"):
        for vn, extra in variants:
            try:
                compiled = compile_for(name, extra)
            except Exception as e:
                log(f"{name} [{vn}]: compile failed: {repr(e)[:200]}")
                continue
            txt = compiled.as_text()
            ov = analyze_overlap(txt)
            n_fus = sum(w["fusions"] for w in ov["windows"])
            n_ins = sum(w["instrs"] for w in ov["windows"])
            log(f"{name} [{vn}]: windows={ov['async_windows']} "
                f"instrs_in_windows={n_ins} fusions={n_fus}")
            if vn == "default-overlap-opts":
                lines = txt.splitlines()
                for i, l in enumerate(lines):
                    if "all-to-all-start" in l:
                        log(f"  [{name}] schedule excerpt:")
                        for j in range(max(0, i - 1), min(len(lines), i + 6)):
                            log("   |", lines[j][:150])
                        break


if __name__ == "__main__":
    main()
