"""Exact-size ragged wire: emulation semantics, layout invariants, byte
accounting, and exchange equivalence vs the dense padded path (round-1
VERDICT missing #2 "done" criteria)."""
import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import PartitionSpec as P

from adaqp_tpu.assigner import buckets_from_assignment, random_assignment
from adaqp_tpu.comm import exchange_fp, exchange_quant
from adaqp_tpu.comm.exchange_ragged import exchange_ragged
from adaqp_tpu.comm.ragged import _emulate
from adaqp_tpu.comm.wire import (
    exact_message_bytes,
    wire_bytes,
    wire_cols,
    wire_fp,
    wire_from_assignment,
)
from adaqp_tpu.common.types import GNNType
from adaqp_tpu.graph import build_layout, partition_graph
from adaqp_tpu.graph.device import make_mesh
from adaqp_tpu.helper import sbm_graph

K = 4


def test_ragged_emulation_matches_lax_docstring():
    # the 2-device worked example from lax.ragged_all_to_all's docstring
    import numpy as _np

    mesh = make_mesh(2)
    operands = jnp.asarray([[1.0, 2, 2], [3, 4, 0]])
    outputs = jnp.zeros((2, 4))
    in_off = jnp.asarray([[0, 1], [0, 1]], jnp.int32)
    send_sz = jnp.asarray([[1, 2], [1, 1]], jnp.int32)
    out_off = jnp.asarray([[0, 0], [1, 2]], jnp.int32)
    recv_sz = jnp.asarray([[1, 1], [2, 1]], jnp.int32)

    def body(op, out, io, ss, oo, rs):
        return _emulate(op[0], out[0], io[0], ss[0], oo[0], rs[0], "part", 3)[None]

    res = shard_map(
        body, mesh=mesh, in_specs=(P("part"),) * 6, out_specs=P("part")
    )(operands, outputs, in_off, send_sz, out_off, recv_sz)
    _np.testing.assert_array_equal(
        np.asarray(res), [[1.0, 3, 0, 0], [2, 2, 4, 0]]
    )


def _layout_and_plans(f=16, num_layers=2, seed=5):
    g = sbm_graph(n=240, blocks=4, num_feats=f, seed=8)
    lay = build_layout(g, partition_graph(g, K, "ldg"), GNNType.GCN)
    asg = random_assignment(lay.plan_fwd, num_layers, seed=seed)
    dims = [lay.f_true] + [f] * (num_layers - 1)
    plans = wire_from_assignment(lay.plan_fwd, asg, dims)
    return g, lay, asg, dims, plans


def test_wire_layout_invariants():
    _, lay, asg, dims, plans = _layout_and_plans()
    plan = lay.plan_fwd
    for fwd, bwd in plans:
        for w in (fwd, bwd):
            if w is None:
                continue
            k = w.in_off.shape[0]
            # sizes symmetric: recv_sz[r, s] == send_sz[s, r]
            np.testing.assert_array_equal(w.recv_sz, w.send_sz.T)
            np.testing.assert_array_equal(np.diag(w.send_sz), 0)
            # slice starts align to lcm(wpr, WIRE_LANE): the a2a ships
            # whole 128-word lane rows (1-D TPU collective operands tile
            # at one element per (8,128) tile — 512x HBM)
            from adaqp_tpu.comm.wire import WIRE_LANE

            align = int(np.lcm.reduce(np.asarray(list(w.wpr) + [WIRE_LANE],
                                                 np.int64)))
            for s in range(k):
                # send slices are non-overlapping, in order, lcm-aligned
                total = 0
                for r in range(k):
                    assert w.in_off[s, r] >= total
                    assert w.in_off[s, r] % align == 0
                    total = w.in_off[s, r] + w.send_sz[s, r]
                assert total <= w.sb_cap
                assert w.sb_cap % align == 0  # [rows, wpr] reshape works
                # every data/param word offset lands inside its pair slice,
                # each word at most once; data offsets are wpr-aligned (the
                # row-granular pack contract); gaps only from alignment
                used = np.zeros(total, bool)
                n_words = 0
                for bi, wpr in enumerate(w.wpr):
                    offs = w.q_off[bi][s]
                    valid = offs < total
                    assert (offs[valid] % wpr == 0).all()
                    for o in offs[valid]:
                        assert not used[o : o + wpr].any()
                        used[o : o + wpr] = True
                    n_words += int(valid.sum()) * wpr
                    if w.has_params:
                        poffs = w.q_poff[bi][s][valid]
                        assert not used[poffs].any()
                        used[poffs] = True
                        n_words += int(valid.sum())
                # slices are spaced at CAPPED allocation (round 5: junk
                # from capped DUS writes stays in the owning slice) — the
                # total footprint is bounded by the sg_cap-derived
                # allocation, and the unshipped gap inside each slice is
                # alloc - exact size
                nb = len(w.wpr)
                alloc_total = 0
                for j in range(k - 1):
                    a = sum(w.sg_cap[bi][j] * w.wpr[bi] + (w.wpr[bi] - 1)
                            for bi in range(nb))
                    if w.has_params:
                        a += sum(w.sg_cap[bi][j] for bi in range(nb))
                    alloc_total += -(-a // align) * align
                assert used.sum() == n_words
                assert total <= alloc_total, (total, alloc_total)


def test_byte_accounting_skewed_partition():
    # skewed partition: random partitioning of an SBM graph yields uneven
    # pair loads; the ragged wire must carry within 15% of the reference's
    # exact packed bytes (VERDICT r1 next-round #1 done-criterion (a))
    g = sbm_graph(n=300, blocks=3, num_feats=130, seed=3)
    part = partition_graph(g, K, "random")
    lay = build_layout(g, part, GNNType.GCN)
    asg = random_assignment(lay.plan_fwd, 2, seed=1)
    dims = [lay.f_true, 64]
    plans = wire_from_assignment(lay.plan_fwd, asg, dims)
    dirs = [d for pair in plans for d in pair if d is not None]
    got = wire_bytes(dirs)
    exact = exact_message_bytes(lay.plan_fwd, asg, dims)
    assert exact > 0
    assert got >= exact  # word alignment can only add
    assert got <= 1.15 * exact, (got, exact)
    # and the dense padded path is demonstrably worse on this skew
    from adaqp_tpu.ops.quant import bytes_per_row, pad_features

    padded = 0
    for layer, (bits_t, arrays) in enumerate(
        buckets_from_assignment(lay.plan_fwd, asg, lay.l_max)
    ):
        fw = pad_features(dims[layer])
        for bits, (si, _, gs, _) in zip(bits_t, arrays):
            k, _, cap = si.shape
            lanes = k * (k - 1) * cap
            padded += lanes * (bytes_per_row(fw, bits) + 4) * 2  # fwd + bwd
    assert padded > 1.3 * got, (padded, got)


def test_exchange_ragged_fp_matches_dense(rng):
    g, lay, _, _, _ = _layout_and_plans()
    plan = lay.plan_fwd
    # layer-1-style plan: carries a backward wire (layer 0's bwd is None by
    # design -- input features have no gradient)
    wfwd, wbwd = wire_fp(plan, [lay.num_feats, lay.num_feats], 2)[1]
    mesh = make_mesh(K)
    h = jnp.asarray(lay.feats)
    f = lay.num_feats
    sink = jnp.zeros((K, plan.r_pad))
    gw = jnp.asarray(rng.normal(size=(K, plan.r_pad, f)).astype(np.float32))
    send_idx = jnp.asarray(plan.send_idx)
    recv_slot = jnp.asarray(plan.recv_slot)
    wdev = jax.tree.map(jnp.asarray, (wfwd, wbwd))

    def run_ragged(h, sk, w, gww):
        def body(h, sk, w, gww):
            wf, wb = w
            rem = exchange_ragged(
                h[0], None, sk[0], wf.local(), wb.local(), plan.r_pad, f,
                "part", lay.f_true,
            )
            return rem[None], (rem * gww[0]).sum()[None]

        return shard_map(
            body, mesh=mesh, in_specs=(P("part"),) * 4,
            out_specs=(P("part"), P("part")),
        )(h, sk, w, gww)

    def run_fp(h, sk, gww):
        def body(h, sk, si, rs, gww):
            rem = exchange_fp(h[0], si[0], rs[0], sk[0], plan.r_pad, "part")
            return rem[None], (rem * gww[0]).sum()[None]

        return shard_map(
            body, mesh=mesh, in_specs=(P("part"),) * 5,
            out_specs=(P("part"), P("part")),
        )(h, sk, send_idx, recv_slot, gww)

    rem_r, _ = run_ragged(h, sink, wdev, gw)
    rem_d, _ = run_fp(h, sink, gw)
    np.testing.assert_allclose(np.asarray(rem_r), np.asarray(rem_d), atol=1e-6)

    # fp gradients must match exactly (same routing, no quantization)
    g_r = jax.grad(lambda h: run_ragged(h, sink, wdev, gw)[1].sum())(h)
    g_d = jax.grad(lambda h: run_fp(h, sink, gw)[1].sum())(h)
    np.testing.assert_allclose(np.asarray(g_r), np.asarray(g_d), atol=1e-5)


def test_static_shapes_stable_and_exact(rng):
    # static_shapes: reassignments that keep every bucket inside its pow2
    # capacity bracket must yield identically SHAPED plans (no jit retrace)
    # while send_sz stays the exact per-assignment wire size. A lane->bits
    # permutation within each channel preserves all bucket counts exactly —
    # the canonical "assignment drifted, volume similar" case.
    _, lay, _, dims, _ = _layout_and_plans()
    plan = lay.plan_fwd
    asg_a = random_assignment(plan, 2, seed=11)
    perm = np.random.default_rng(0)
    k = plan.send_idx.shape[0]
    fwd_p = [a.copy() for a in asg_a.fwd]
    for lm in fwd_p:
        for s in range(k):
            for r in range(k):
                cnt = int(plan.counts[s, r])
                lm[s, r, :cnt] = perm.permutation(lm[s, r, :cnt])
    asg_b = type(asg_a)(fwd=fwd_p, bwd=[a.copy() for a in asg_a.bwd])
    pa = wire_from_assignment(plan, asg_a, dims, static_shapes=True)
    pb = wire_from_assignment(plan, asg_b, dims, static_shapes=True)
    assert jax.tree.structure(pa) == jax.tree.structure(pb)
    for la, lb in zip(jax.tree.leaves(pa), jax.tree.leaves(pb)):
        assert np.asarray(la).shape == np.asarray(lb).shape
    # wire bytes remain the exact per-assignment sizes
    for asg, plans in ((asg_a, pa), (asg_b, pb)):
        exact_plans = wire_from_assignment(plan, asg, dims)
        for (fs, bs), (fe, be) in zip(plans, exact_plans):
            np.testing.assert_array_equal(fs.send_sz, fe.send_sz)
            if bs is not None:
                np.testing.assert_array_equal(bs.send_sz, be.send_sz)


def test_static_shapes_exchange_matches_exact(rng, monkeypatch):
    # the bounded-allocation plans must produce identical exchange results.
    # Both forms are pinned to the row-granular pack: exact wires default
    # to the capped-segment pack, whose PRNG positions differ by layout,
    # so cross-form bit-equality only holds form-for-form.
    from adaqp_tpu.comm import exchange_ragged as xr

    monkeypatch.setattr(xr, "_FORCE_SEG", False)
    g, lay, asg, dims, plans = _layout_and_plans(num_layers=2)
    plan = lay.plan_fwd
    f = lay.num_feats
    mesh = make_mesh(K)
    h = jnp.asarray(lay.feats)
    sink = jnp.zeros((K, plan.r_pad))
    keys = jax.random.split(jax.random.PRNGKey(7), 2)
    static_plans = wire_from_assignment(plan, asg, dims, static_shapes=True)

    def run(wf, wb, ft):
        def body(h, sk, args):
            wf, wb = args
            rem = exchange_ragged(
                h[0], keys, sk[0], wf.local(),
                None if wb is None else wb.local(), plan.r_pad, f, "part", ft,
            )
            return rem[None]

        return np.asarray(
            shard_map(
                body, mesh=mesh, in_specs=(P("part"),) * 3,
                out_specs=P("part"),
            )(h, sink, (jax.tree.map(jnp.asarray, wf),
                        None if wb is None else jax.tree.map(jnp.asarray, wb)))
        )

    for layer in range(2):
        we_f, we_b = plans[layer]
        ws_f, ws_b = static_plans[layer]
        np.testing.assert_array_equal(
            run(ws_f, ws_b, dims[layer]), run(we_f, we_b, dims[layer])
        )


def test_row_granular_pack_matches_word_form(rng, monkeypatch):
    # the TPU pack form (one descriptor per lane over the [rows, wpr] view)
    # must move exactly the same words as the CPU word form — forced on CPU
    # here since a single-chip TPU has no cross-partition pairs to exchange
    from adaqp_tpu.comm import exchange_ragged as xr

    g, lay, asg, dims, plans = _layout_and_plans(num_layers=2)
    plan = lay.plan_fwd
    f = lay.num_feats
    mesh = make_mesh(K)
    h = jnp.asarray(lay.feats)
    sink = jnp.zeros((K, plan.r_pad))
    gw = jnp.asarray(rng.normal(size=(K, plan.r_pad, f)).astype(np.float32))
    keys = jax.random.split(jax.random.PRNGKey(3), 2)
    w1f = jax.tree.map(jnp.asarray, plans[1][0])
    w1b = jax.tree.map(jnp.asarray, plans[1][1])
    wfp = jax.tree.map(jnp.asarray, wire_fp(plan, [f, f], 2)[1])

    def run(wf, wb, ft, use_keys):
        def body(h, sk, args):
            wf, wb, gww = args
            rem = xr.exchange_ragged(
                h[0], keys if use_keys else None, sk[0], wf.local(),
                None if wb is None else wb.local(), plan.r_pad, f, "part", ft,
            )
            return rem[None], (rem * gww[0]).sum()[None]

        fn = shard_map(
            body, mesh=mesh, in_specs=(P("part"),) * 3,
            out_specs=(P("part"), P("part")),
        )
        rem, _ = fn(h, sink, (wf, wb, gw))
        grad = jax.grad(lambda h: fn(h, sink, (wf, wb, gw))[1].sum())(h)
        return np.asarray(rem), np.asarray(grad)

    monkeypatch.setattr(xr, "_FORCE_SEG", False)  # compare row vs word
    for wf, wb, ft in ((w1f, w1b, dims[1]), (wfp[0], wfp[1], lay.f_true)):
        use_keys = wf is not wfp[0]
        monkeypatch.setattr(xr, "_FORCE_ROW_GRANULAR", False)
        rem_w, g_w = run(wf, wb, ft, use_keys)
        monkeypatch.setattr(xr, "_FORCE_ROW_GRANULAR", True)
        rem_r, g_r = run(wf, wb, ft, use_keys)
        np.testing.assert_array_equal(rem_r, rem_w)
        np.testing.assert_array_equal(g_r, g_w)
    # the capped-SEGMENT pack (the default for these exact wires) must be
    # bit-identical on the fp32 wire, where no stochastic rounding is
    # drawn (quantized buckets draw per-layout PRNG positions, so their
    # seg-vs-row equivalence is the roundtrip-tolerance test's job)
    monkeypatch.setattr(xr, "_FORCE_SEG", None)
    rem_s, g_s = run(wfp[0], wfp[1], lay.f_true, False)
    monkeypatch.setattr(xr, "_FORCE_SEG", False)
    monkeypatch.setattr(xr, "_FORCE_ROW_GRANULAR", None)
    rem_w, g_w = run(wfp[0], wfp[1], lay.f_true, False)
    np.testing.assert_array_equal(rem_s, rem_w)
    np.testing.assert_array_equal(g_s, g_w)


def test_fp32_lanes_mixed_wire(rng):
    # WIRE_BITS_SET wire: b=32 lanes ship raw f32 words (no quantization,
    # reserved param words unused) alongside 8-bit lanes in one exchange;
    # fp32 slots must arrive bit-exact (round 4: the MILP can assign 32 to
    # fast-fabric channels where quantize+pack is a net loss)
    from adaqp_tpu.common.types import WIRE_BITS_SET

    g, lay, _, _, _ = _layout_and_plans()
    plan = lay.plan_fwd
    f = lay.num_feats
    asg = random_assignment(plan, 1, seed=4, bits_set=(8, 32))
    wfwd = wire_from_assignment(
        plan, asg, [lay.f_true], bits_set=WIRE_BITS_SET
    )[0][0]
    mesh = make_mesh(K)
    h = jnp.asarray(lay.feats)
    sink = jnp.zeros((K, plan.r_pad))
    wdev = jax.tree.map(jnp.asarray, wfwd)
    keys = jax.random.split(jax.random.PRNGKey(0), 2)

    def run(h, sk, wf):
        def body(h, sk, wf):
            rem = exchange_ragged(
                h[0], keys, sk[0], wf.local(), None, plan.r_pad, f, "part",
                lay.f_true,
            )
            return rem[None]

        return shard_map(
            body, mesh=mesh, in_specs=(P("part"),) * 3, out_specs=P("part")
        )(h, sk, wf)

    rem = np.asarray(run(h, sink, wdev))
    ft = lay.f_true
    feats_g = np.zeros((g.num_nodes, f), np.float32)
    for p in range(K):
        c = int(lay.num_local[p])
        feats_g[lay.local_ids[p, :c]] = lay.feats[p, :c]
    n32 = 0
    for r in range(K):
        rg = plan.remote_global[r]
        for s in range(K):
            cnt = int(plan.counts[s, r])
            for i in range(cnt):
                slot = int(plan.recv_slot[r, s, i])
                b = int(asg.fwd[0][s, r, i])
                true_row = feats_g[rg[slot], :ft]
                err = np.abs(rem[r, slot, :ft] - true_row).max()
                if b == 32:
                    assert err == 0.0, (r, slot, err)
                    n32 += 1
                else:
                    # one 8-bit step + bf16 (scale, rmin) slack; precise
                    # quant tolerances live in the roundtrip test above
                    width = true_row.max() - true_row.min()
                    tol = (width / 127.0
                           + np.abs(true_row).max() * 2**-7 + 1e-6)
                    assert err <= tol, (r, slot, err, tol)
    assert n32 > 10  # the random mix actually exercised fp32 lanes


def test_exchange_ragged_quant_roundtrip_and_grad(rng):
    g, lay, asg, dims, plans = _layout_and_plans(num_layers=2)
    plan = lay.plan_fwd
    f = lay.num_feats
    mesh = make_mesh(K)
    h = jnp.asarray(lay.feats)
    sink = jnp.zeros((K, plan.r_pad))
    gw = jnp.asarray(rng.normal(size=(K, plan.r_pad, f)).astype(np.float32))
    # layer 1 (has a backward plan); message width = dims[1] <= f here? use
    # layer 0 fwd for the roundtrip and layer 1 for the gradient test
    w0 = jax.tree.map(jnp.asarray, plans[0][0])
    w1f = jax.tree.map(jnp.asarray, plans[1][0])
    w1b = jax.tree.map(jnp.asarray, plans[1][1])

    def run(h, keys, sk, wf, wb, gww, ft):
        def body(h, sk, wf_wb_gww):
            wf, wb, gww = wf_wb_gww
            rem = exchange_ragged(
                h[0], keys, sk[0],
                wf.local(), None if wb is None else wb.local(),
                plan.r_pad, f, "part", ft,
            )
            return rem[None], (rem * gww[0]).sum()[None]

        return shard_map(
            body, mesh=mesh, in_specs=(P("part"),) * 3,
            out_specs=(P("part"), P("part")),
        )(h, sk, (wf, wb, gww))

    keys = jax.random.split(jax.random.PRNGKey(0), 2)
    rem, _ = run(h, keys, sink, w0, None, gw, lay.f_true)
    rem = np.asarray(rem)
    # every valid remote slot is within one quantization step of the true row
    feats_g = np.zeros((g.num_nodes, f), np.float32)
    for p in range(K):
        c = int(lay.num_local[p])
        feats_g[lay.local_ids[p, :c]] = lay.feats[p, :c]
    ft = lay.f_true
    for r in range(K):
        rg = plan.remote_global[r]
        for slot in range(int(plan.num_remote[r])):
            node = rg[slot]
            true_row = feats_g[node, :ft]
            # recover this slot's bits from the assignment
            err = np.abs(rem[r, slot, :ft] - true_row).max()
            rng_width = true_row.max() - true_row.min()
            step = rng_width / 3.0 + 1e-6  # worst case: 2-bit
            bf16_slack = np.abs(true_row).max() * 2**-7 + 1e-6
            assert err <= step + bf16_slack, (r, slot, err, step)
        # pad slots untouched
        np.testing.assert_array_equal(rem[r, int(plan.num_remote[r]) :], 0.0)

    # gradient through the layer-1 plan: unbiased estimate of fp routing grad
    def loss_q(h, keys):
        return run(h, keys, sink, w1f, w1b, gw, f)[1].sum()

    fp_plans = wire_fp(plan, [f, f], 2)
    wf_fp = jax.tree.map(jnp.asarray, fp_plans[1][0])
    wb_fp = jax.tree.map(jnp.asarray, fp_plans[1][1])

    def loss_fp(h):
        return run(h, None, sink, wf_fp, wb_fp, gw, f)[1].sum()

    g_fp = np.asarray(jax.grad(loss_fp)(h))
    grad_q = jax.jit(jax.grad(loss_q))
    reps = 24
    acc = np.zeros_like(g_fp)
    g_q = None
    for r in range(reps):
        ks = jax.random.split(jax.random.PRNGKey(100 + r), 2)
        g_q = np.asarray(grad_q(h, ks))
        acc += g_q
    mean_rel = np.abs(acc / reps - g_fp).mean() / (np.abs(g_fp).mean() + 1e-9)
    single_rel = np.abs(g_q - g_fp).mean() / (np.abs(g_fp).mean() + 1e-9)
    assert mean_rel < 0.3 * single_rel + 0.02, (mean_rel, single_rel)
    assert ((np.abs(g_q) > 1e-12) == (np.abs(g_fp) > 1e-12)).mean() > 0.99


def test_per_peer_independent_draws(rng, monkeypatch):
    # Reference semantics (AdaQP/model/op_util.py:189-209): a boundary row
    # sent to several peers is quantized INDEPENDENTLY per peer — each lane
    # draws its own stochastic rounding.  (Round 4 briefly shared one draw
    # per unique row to gather wire WORDS instead of f32 rows; round-5
    # on-chip packsplit refuted that layout — lane-padded u32 [S, wpr]
    # gathers are ~3x slower than the f32 [S, 128] row gather — so the
    # per-lane path is both the fast one and the reference-faithful one.)
    from adaqp_tpu.assigner import uniform_assignment
    from adaqp_tpu.comm import exchange_ragged as xr

    g, lay, _, _, _ = _layout_and_plans()
    plan = lay.plan_fwd
    f = lay.num_feats
    asg = uniform_assignment(plan, 1, 4)  # coarse steps: draws visible
    wfwd = wire_from_assignment(plan, asg, [lay.f_true])[0][0]
    mesh = make_mesh(K)
    h = jnp.asarray(lay.feats)
    sink = jnp.zeros((K, plan.r_pad))
    wdev = jax.tree.map(jnp.asarray, wfwd)
    keys = jax.random.split(jax.random.PRNGKey(0), 2)

    def run():
        def body(h, sk, wf):
            rem = exchange_ragged(
                h[0], keys, sk[0], wf.local(), None, plan.r_pad, f, "part",
                lay.f_true,
            )
            return rem[None]

        return np.asarray(shard_map(
            body, mesh=mesh, in_specs=(P("part"),) * 3, out_specs=P("part")
        )(h, sink, wdev))

    rem = run()
    # collect every (receiver, slot) of each (sender, node) lane group
    per_node = {}
    for r in range(K):
        rg = plan.remote_global[r]
        for s in range(K):
            for i in range(int(plan.counts[s, r])):
                slot = int(plan.recv_slot[r, s, i])
                per_node.setdefault((s, int(rg[slot])), []).append((r, slot))
    feats = np.asarray(lay.feats)  # [K, l_max, f]
    send_idx = np.asarray(plan.send_idx)
    # (1) every received row is ON THE SENDER'S 4-bit GRID: within one
    # quantization step of the true row, grid-aligned given (rmin, scale)
    n_checked = 0
    for r in range(K):
        rg = plan.remote_global[r]
        for s in range(K):
            for i in range(min(int(plan.counts[s, r]), 8)):
                slot = int(plan.recv_slot[r, s, i])
                x = feats[s, int(send_idx[s, r, i])][: lay.f_true]
                got = rem[r, slot][: lay.f_true]
                rmin, rmax = x.min(), x.max()
                step = max(rmax - rmin, 1e-10) / 15.0
                # wire params (scale, rmin) travel as bfloat16: allow ~1%
                # slop on the one-step quantization bound
                amax = max(abs(rmin), abs(rmax))
                np.testing.assert_array_less(
                    np.abs(got - x), 1.02 * step + 0.01 * amax + 1e-6)
                n_checked += 1
    assert n_checked > 20
    # (2) duplicate lanes of one node DIFFER somewhere w.h.p. — draws are
    # independent per lane (16 levels, f features: collision of the whole
    # row across two independent draws is overwhelmingly unlikely)
    n_dup = n_diff = 0
    for (_s, _node), sites in per_node.items():
        if len(sites) < 2:
            continue
        n_dup += 1
        r0, s0 = sites[0]
        if any(not np.array_equal(rem[r0, s0], rem[r1, s1])
               for r1, s1 in sites[1:]):
            n_diff += 1
    assert n_dup > 5  # the SBM boundary actually has replicated rows
    assert n_diff >= 0.5 * n_dup, (n_diff, n_dup)
    # (3) the row-granular form quantizes the same lanes to the same grid
    # (draws may differ — lane order differs — but the zero-mask and grid
    # structure must agree)
    monkeypatch.setattr(xr, "_FORCE_SEG", False)
    monkeypatch.setattr(xr, "_FORCE_ROW_GRANULAR", True)
    rem_row = run()
    monkeypatch.setattr(xr, "_FORCE_SEG", None)
    monkeypatch.setattr(xr, "_FORCE_ROW_GRANULAR", None)
    assert rem_row.shape == rem.shape
    np.testing.assert_array_equal(
        np.abs(rem_row) > 1e-12, np.abs(rem) > 1e-12)
    np.testing.assert_array_less(np.abs(rem_row - rem).max(axis=-1).ravel(),
                                 np.inf)  # finite everywhere


def test_wire_cols_alignment():
    # per-bucket word alignment: 32/bits columns per word
    assert wire_cols(602, 2) == 608
    assert wire_cols(602, 4) == 608
    assert wire_cols(602, 8) == 604
    assert wire_cols(602, 32) == 602
    assert wire_cols(16, 2) == 16
    for f in (1, 17, 130, 602):
        for b in (2, 4, 8, 32):
            assert (wire_cols(f, b) * b) % 32 == 0
            assert wire_cols(f, b) >= f
