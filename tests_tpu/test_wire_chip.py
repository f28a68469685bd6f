"""Hardware test: the quantized WIRE chain at trainer shapes on the chip.

Round-2 weak #2: every on-chip "quantized training" run was K=1, where
`dist_aggregate` skips the exchange entirely — the quantize -> pack ->
wire buffer -> unpack -> dequantize chain never executed on hardware
inside a step. This drives exactly that chain through
``exchange_ragged``'s pack/unpack halves in ONE jit on the real chip,
with the wire itself loop-backed on-device from the plans' exact
offsets/sizes (the collective hop is covered by the AOT topology compile,
tests/test_aot_topology.py). Asserts (a) the compiled module executes the
Pallas quantization kernel (tpu_custom_call present) and (b) every
received slot reconstructs within its assigned bit-width's error bound.

Reference analog: ``AdaQP/model/op_util.py:173-187`` (qt transfer =
quantize -> exchange -> dequantize) exercised on its real fabric.
"""
import jax
import numpy as np
import pytest

if jax.default_backend() not in ("tpu",):
    pytest.skip("requires a TPU backend", allow_module_level=True)

import jax.numpy as jnp  # noqa: E402

from adaqp_tpu.assigner import random_assignment  # noqa: E402
from adaqp_tpu.comm.exchange_ragged import pack_dir, unpack_dir  # noqa: E402
from adaqp_tpu.comm.wire import wire_from_assignment  # noqa: E402
from adaqp_tpu.common.types import GNNType  # noqa: E402
from adaqp_tpu.graph import build_layout, partition_graph  # noqa: E402
from adaqp_tpu.helper import sbm_graph  # noqa: E402

K = 2


def test_quant_wire_chain_on_chip():
    g = sbm_graph(n=4000, blocks=4, num_feats=200, seed=3)
    lay = build_layout(
        g, partition_graph(g, K, "ldg"), GNNType.GCN,
        pad_multiple=8, feat_pad_multiple=128,
    )
    plan = lay.plan_fwd
    f_true, f_pad = lay.f_true, lay.feats.shape[-1]
    assert f_pad % 128 == 0  # the Pallas quant path's lane condition
    asg = random_assignment(plan, 2, seed=1)  # mixed 2/4/8 buckets
    wfwd, _ = wire_from_assignment(plan, asg, [f_true, f_true])[0]
    w = [jax.tree.map(lambda a, i=i: a[i], wfwd) for i in range(K)]
    feats = np.zeros((K, lay.l_max, f_pad), np.float32)
    for i in range(K):
        feats[i] = lay.feats[i]
    feats = jnp.asarray(feats)
    keys = jax.random.split(jax.random.PRNGKey(0), K)

    def chain(feats, keys):
        sbufs = [pack_dir(w[i], feats[i], keys[i], f_true) for i in range(K)]
        outs = []
        for r in range(K):
            recv = jnp.zeros((w[r].rb_cap,), jnp.uint32)
            for s in range(K):
                if s == r:
                    continue
                n = int(wfwd.send_sz[s][r])
                if n:
                    io, oo = int(wfwd.in_off[s][r]), int(wfwd.out_off[s][r])
                    recv = recv.at[oo : oo + n].set(sbufs[s][io : io + n])
            outs.append(
                unpack_dir(w[r], recv, plan.r_pad, False, f_true, f_pad)
            )
        return jnp.stack(outs)

    jfn = jax.jit(chain)
    txt = jfn.lower(feats, keys).compile().as_text() or ""
    assert "tpu_custom_call" in txt, (
        "Pallas quant kernel absent from the compiled wire chain"
    )
    remote = np.asarray(jfn(feats, keys))

    for r in range(K):
        n_rem = int(plan.num_remote[r])
        rows = g.feats[plan.remote_global[r][:n_rem]]
        got = remote[r][:n_rem, :f_true]
        slot_bits = np.zeros(n_rem, np.int64)
        offset = 0
        for s in range(K):
            if s == r:
                continue
            cnt = int(plan.counts[s, r])
            slot_bits[offset : offset + cnt] = asg.fwd[0][s, r, :cnt]
            offset += cnt
        rng_rows = rows.max(1) - rows.min(1)
        step = rng_rows / (2.0 ** slot_bits.astype(np.float64) - 1)
        err = np.abs(got - rows).max(1)
        assert (err <= 2.2 * step + 1e-6).all(), (r, float((err / step).max()))
