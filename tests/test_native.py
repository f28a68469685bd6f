"""Native preprocessing library tests (C++ via ctypes)."""
import numpy as np
import pytest

native = pytest.importorskip("adaqp_tpu.native")


def test_build_csr_matches_numpy(rng):
    n, e = 500, 4000
    src = rng.integers(0, n, e).astype(np.int32)
    dst = rng.integers(0, n, e).astype(np.int32)
    indptr, indices = native.build_csr(src, dst, n)
    # reference: stable numpy grouping
    order = np.argsort(src, kind="stable")
    ref_ptr = np.zeros(n + 1, np.int64)
    np.add.at(ref_ptr, src + 1, 1)
    np.cumsum(ref_ptr, out=ref_ptr)
    np.testing.assert_array_equal(indptr, ref_ptr)
    # per-row dst multisets match
    for v in range(0, n, 37):
        got = np.sort(indices[indptr[v] : indptr[v + 1]])
        ref = np.sort(dst[order][ref_ptr[v] : ref_ptr[v + 1]])
        np.testing.assert_array_equal(got, ref)


def test_native_ldg_quality(rng):
    n, e, k = 5000, 60000, 4
    src = rng.integers(0, n, e).astype(np.int32)
    delta = np.minimum(rng.zipf(1.5, e), n // 2)
    dst = ((src.astype(np.int64) + delta) % n).astype(np.int32)
    part = native.ldg_partition(
        np.concatenate([src, dst]), np.concatenate([dst, src]), n, k
    )
    sizes = np.bincount(part, minlength=k)
    assert sizes.max() <= 1.15 * n / k
    cut = (part[src] != part[dst]).mean()
    rand = rng.integers(0, k, n)
    rand_cut = (rand[src] != rand[dst]).mean()
    assert cut < 0.8 * rand_cut  # clearly better than random


def test_partition_graph_uses_native(rng):
    from adaqp_tpu.graph.partition import partition_graph
    from adaqp_tpu.helper import sbm_graph

    g = sbm_graph(n=400, blocks=4, num_feats=8, seed=0)
    part = partition_graph(g, 4, method="ldg")
    assert part.shape == (400,)
    assert set(np.unique(part)) <= {0, 1, 2, 3}
