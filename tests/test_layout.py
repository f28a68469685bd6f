"""Partition layout invariants (SURVEY.md §4a: reorder/decomposition
invariants, send/recv idx symmetry)."""
import numpy as np
import pytest

from adaqp_tpu.common.types import GNNType
from adaqp_tpu.graph.layout import build_layout
from adaqp_tpu.graph.partition import partition_graph, partition_random
from adaqp_tpu.helper.dataset import sbm_graph


@pytest.fixture(scope="module")
def graph():
    return sbm_graph(n=300, blocks=4, num_feats=12, seed=1)


@pytest.mark.parametrize("method", ["random", "ldg"])
@pytest.mark.parametrize("k", [2, 4])
def test_layout_invariants(graph, method, k):
    part = partition_graph(graph, k, method=method, seed=3)
    lay = build_layout(graph, part, GNNType.GCN)

    # every node appears exactly once across partitions
    ids = lay.local_ids[lay.local_ids >= 0]
    assert sorted(ids.tolist()) == list(range(graph.num_nodes))
    # central + marginal == local (reference invariant graphEngine.py:66)
    np.testing.assert_array_equal(lay.num_central + lay.num_marginal, lay.num_local)
    # edge conservation: all global edges appear exactly once across parts
    total_edges = 0
    for p in range(k):
        for (ss, dd) in (lay.fwd_local, lay.fwd_halo):
            total_edges += int((dd[p] < lay.l_max).sum())
    assert total_edges == graph.num_edges

    plan = lay.plan_fwd
    # send/recv symmetry: what s sends to r covers exactly r's halo from s
    for r in range(k):
        rg = plan.remote_global[r]
        n_remote = int(plan.num_remote[r])
        assert (rg[:n_remote] >= 0).all() and (rg[n_remote:] == -1).all()
        # owners of remote nodes are not r
        assert (lay.part_id[rg[:n_remote]] != r).all()
        for s in range(k):
            if s == r:
                continue
            c = int(plan.counts[s, r])
            sent_global = lay.local_ids[s][plan.send_idx[s, r, :c]]
            slots = plan.recv_slot[r, s, :c]
            np.testing.assert_array_equal(rg[slots], sent_global)
            # padding lanes point at the drop sentinel
            assert (plan.recv_slot[r, s, c:] == plan.r_pad).all()

    # marginal definition: every halo edge's dst is a marginal node
    for p in range(k):
        hs, hd = lay.fwd_halo[0][p], lay.fwd_halo[1][p]
        valid = hd < lay.l_max
        assert (hs[valid] >= lay.l_max).all()
        assert (hd[valid] >= lay.num_central[p]).all()
        assert (hd[valid] < lay.num_local[p]).all()


def test_degrees_match_global(graph):
    part = partition_random(graph.num_nodes, 3, seed=0)
    lay = build_layout(graph, part, GNNType.GCN)
    din = np.maximum(graph.in_degrees, 1)
    for p in range(3):
        c = int(lay.num_local[p])
        np.testing.assert_array_equal(
            lay.deg_in_fwd[p, :c], din[lay.local_ids[p, :c]].astype(np.float32)
        )
        # padding degrees are 1 (clamp identity)
        assert (lay.deg_in_fwd[p, c : lay.l_max] == 1).all()


def test_scores_nonnegative_and_present(graph):
    part = partition_random(graph.num_nodes, 4, seed=1)
    for mt in (GNNType.GCN, GNNType.SAGE):
        lay = build_layout(graph, part, mt)
        plan = lay.plan_fwd
        for s in range(4):
            for r in range(4):
                if s == r:
                    continue
                c = int(plan.counts[s, r])
                # every sent node has at least one crossing edge -> positive fp score
                assert (plan.scores_fp[s, r, :c] > 0).all()
                assert (plan.scores_fp[s, r, c:] == 0).all()


def test_partition_balance(graph):
    for method in ("random", "ldg"):
        part = partition_graph(graph, 4, method=method)
        sizes = np.bincount(part, minlength=4)
        assert sizes.max() <= 1.3 * graph.num_nodes / 4


def test_transposed_edge_lists(graph):
    # bwd_local / bwd_halo are the exact transpose of the forward lists
    # (grad flow v -> u along every forward edge u -> v), dst-sorted
    lay = build_layout(graph, partition_graph(graph, 4, "ldg"), GNNType.GCN)
    l_max = lay.l_max
    r_pad = lay.plan_fwd.r_pad
    for p in range(4):
        fs, fd = lay.fwd_local[0][p], lay.fwd_local[1][p]
        bs, bd = lay.bwd_local[0][p], lay.bwd_local[1][p]
        fv, bv = fd < l_max, bd < l_max
        fwd_set = set(zip(fs[fv].tolist(), fd[fv].tolist()))
        bwd_set = set(zip(bd[bv].tolist(), bs[bv].tolist()))
        assert fwd_set == bwd_set
        assert (np.diff(bd[bv]) >= 0).all()  # dst-sorted

        hs, hd = lay.fwd_halo[0][p], lay.fwd_halo[1][p]
        ts, td = lay.bwd_halo[0][p], lay.bwd_halo[1][p]
        hv, tv = hd < l_max, td < r_pad
        halo_set = set(zip((hs[hv] - l_max).tolist(), hd[hv].tolist()))
        t_set = set(zip(td[tv].tolist(), ts[tv].tolist()))
        assert halo_set == t_set
        assert (np.diff(td[tv]) >= 0).all()
    # bidirected graphs alias the local transpose (no extra cache freight)
    if graph.is_bidirected:
        assert lay.bwd_local[0] is lay.fwd_local[0]
