"""Overlap verification (SURVEY.md §7.3, round-1 VERDICT weak #2).

Two complementary checks on the real ``dist_aggregate`` paths:

1. **HLO dependence**: in overlapped modes (AdaQP / AdaQP-p) the local
   aggregation must NOT transitively depend on the all-to-all — XLA is free
   to run them concurrently; in serialized modes (Vanilla / AdaQP-q) the
   ``optimization_barrier`` must order the exchange before the local work.
   Checked by parsing the optimized HLO's operand graph.

2. **Execution overlap**: on the multi-threaded XLA:CPU thunk executor
   (which runs dependence-free thunks concurrently, like the TPU's async
   collective scheduler), the overlapped schedule must be measurably faster
   than the serialized one on a comm-heavy shape — evidence overlap
   actually happens at runtime, not just that it is permitted.
"""
import os
import re
import time

import jax
import pytest
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import PartitionSpec as P

from adaqp_tpu.common.types import GNNType, Mode
from adaqp_tpu.graph import build_layout, partition_graph
from adaqp_tpu.graph.device import (
    make_mesh,
    shard_arrays_from_layout,
    static_from_layout,
)
from adaqp_tpu.helper import sbm_graph
from adaqp_tpu.ops.dist_ops import dist_aggregate

K = 4


def _agg_fn(sh, cfg, mesh):
    def body(h, sh_st, sink):
        out, _ = dist_aggregate(h[0], sh_st.local(), cfg, sink[0], None, False)
        return out[None]

    def f(h, sh_stacked, sinks):
        return shard_map(
            body, mesh=mesh, in_specs=(P("part"),) * 3, out_specs=P("part")
        )(h, sh_stacked, sinks)

    return f


def _lowered(sh, cfg, mesh, f_dim):
    fn = _agg_fn(sh, cfg, mesh)
    h = jnp.zeros((K, cfg.l_max, f_dim))
    sinks = jnp.zeros((K, cfg.r_pad))
    return jax.jit(fn).lower(h, sh, sinks)


def _operand_graph(hlo: str):
    """name -> operand names, from the entry (non-fusion) computations."""
    deps = {}
    for line in hlo.splitlines():
        m = re.match(r"\s*(?:ROOT )?%([\w.\-]+) = .*?\((.*)$", line)
        if not m:
            continue
        name = m.group(1)
        ops = re.findall(r"%([\w.\-]+)", m.group(2))
        deps[name] = ops
    return deps


def _reaches(deps, frm_pred, to):
    """Does any op matching frm_pred transitively feed op `to`?"""
    seen = set()
    stack = [to]
    while stack:
        cur = stack.pop()
        if cur in seen:
            continue
        seen.add(cur)
        for op in deps.get(cur, ()):
            if frm_pred(op):
                return True
            stack.append(op)
    return False


@pytest.mark.parametrize(
    "mode,expect_serialized",
    [(Mode.ADAQP_P, False), (Mode.VANILLA, True)],
)
def test_hlo_local_agg_dependence(mode, expect_serialized):
    g = sbm_graph(n=260, blocks=4, num_feats=12, seed=0)
    lay = build_layout(g, partition_graph(g, K, "ldg"), GNNType.GCN)
    sh = shard_arrays_from_layout(lay)
    cfg = static_from_layout(lay, model=GNNType.GCN, mode=mode, dropout=0.0)
    mesh = make_mesh(K)
    low = _lowered(sh, cfg, mesh, lay.num_feats)

    # pre-optimization IR: the serialized modes emit an optimization_barrier
    # tying (h, remote); the overlapped modes must not constrain the schedule
    stable = low.as_text()
    n_barriers = stable.count("optimization_barrier")
    if expect_serialized:
        assert n_barriers >= 1, "serialized mode lost its optimization_barrier"
    else:
        assert n_barriers == 0, "overlapped mode must not emit a barrier"

    # post-optimization HLO: in overlapped mode, substantial compute exists
    # that does NOT transitively depend on the all-to-all -> the backend's
    # scheduler (async collectives on TPU, concurrent thunks on CPU) is free
    # to overlap exchange and local aggregation
    hlo = low.compile().as_text()
    deps = _operand_graph(hlo)
    a2a = [n for n in deps if "all-to-all" in n]
    assert a2a, "no all-to-all in compiled module"
    is_a2a = lambda n: "all-to-all" in n
    if not expect_serialized:
        compute = [
            n for n in deps
            if ("fusion" in n or "scatter" in n or "reduce" in n)
            and not _reaches(deps, is_a2a, n)
        ]
        assert compute, "every compute op depends on the all-to-all"


def test_exchange_overlap_wallclock(tmp_path):
    """Wrapper: the executor-timing measurement below is reliable in a
    fresh interpreter but sensitive to in-process suite state (allocator /
    thread-pool residue after ~90 tests shrinks the overlap win below any
    honest margin) — so measure it in a subprocess, standalone-style."""
    import subprocess
    import sys

    here = os.path.abspath(__file__)
    r = subprocess.run(
        [sys.executable, "-m", "pytest", "-q",
         f"{here}::test_exchange_overlaps_with_independent_compute"],
        env={**os.environ, "ADAQP_OVERLAP_INNER": "1"},
        capture_output=True, text=True,
        cwd=os.path.dirname(os.path.dirname(here)),
        timeout=900,
    )
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-1000:]


@pytest.mark.skipif(
    not os.environ.get("ADAQP_OVERLAP_INNER"),
    reason="run via the subprocess wrapper above",
)
def test_exchange_overlaps_with_independent_compute():
    """The boundary exchange and dependence-free local compute really run
    CONCURRENTLY on the executor (not merely "may"): timed with matmul-shaped
    local work, the overlapped schedule beats the barrier-serialized one.

    (With scatter-shaped local work XLA:CPU shows no gain — scatter thunks
    monopolize the thread pool — so this pins the overlap capability with the
    MXU-shaped work the TPU actually runs; see docs/DESIGN.md §2.)
    """
    from adaqp_tpu.comm.exchange import exchange_fp

    g = sbm_graph(n=4000, blocks=4, num_feats=512, seed=1)
    lay = build_layout(g, partition_graph(g, K, "random"), GNNType.GCN)
    sh = shard_arrays_from_layout(lay)
    mesh = make_mesh(K)
    plan = lay.plan_fwd
    f_dim = lay.num_feats
    rng = np.random.default_rng(0)
    h = jnp.asarray(rng.normal(size=(K, lay.l_max, f_dim)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(f_dim, 2048)).astype(np.float32))
    sinks = jnp.zeros((K, plan.r_pad))

    def make(overlap):
        def body(h, sh_st, sink, w):
            s = sh_st.local()
            remote = exchange_fp(
                h[0], s.send_idx, s.recv_slot, sink[0], plan.r_pad, "part"
            )
            hh = h[0]
            if not overlap:
                hh, remote = jax.lax.optimization_barrier((hh, remote))
            local = jnp.tanh(hh @ w) @ w.T  # dependence-free heavy compute
            return (local + remote.sum(axis=0)[None, :])[None]

        return jax.jit(
            shard_map(
                body, mesh=mesh, in_specs=(P("part"),) * 3 + (P(),),
                out_specs=P("part"),
            )
        )

    def run(fn, reps=7):
        out = fn(h, sh, sinks, w)
        out.block_until_ready()
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(h, sh, sinks, w)
            out.block_until_ready()
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    # Wall-clock comparison on a shared host is noisy; the overlap win is
    # ~10-12% so a loaded machine can flip a single measurement. Require a
    # real MARGIN (5%) in some round — plain `o < s` would also pass ~50%
    # of the time if overlap silently broke (t_overlap == t_serial +
    # noise), hiding the regression. If the serial BASELINE itself is
    # unstable across rounds, the host is too loaded for any timing
    # assertion — skip instead of flaking either way.
    results = []
    for _ in range(5):
        t_serial = run(make(False))
        t_overlap = run(make(True))
        results.append((t_overlap, t_serial))
        if t_overlap < 0.95 * t_serial:
            break
    else:
        serials = [s for _, s in results]
        if max(serials) > 1.3 * min(serials):
            pytest.skip(f"host too loaded for timing assertions: {results}")
    assert any(o < 0.95 * s for o, s in results), results
