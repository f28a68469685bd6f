"""ELLPACK gather-SpMM tests: forward/backward vs dense reference,
heavy-row segmentation, cache round-trip."""
import jax
import jax.numpy as jnp
import numpy as np

from adaqp_tpu.ops.spmm_fast import _run_ell, ell_from_csr, spmm_ell


def _dense(src, dst, h, n):
    out = np.zeros((n, h.shape[1]), np.float32)
    np.add.at(out, dst, h[src])
    return out


def test_fwd_bwd_match_dense(rng):
    n, e, f = 257, 5000, 24
    src = rng.integers(0, n, e).astype(np.int32)
    dst = rng.integers(0, n, e).astype(np.int32)
    h = rng.normal(size=(n, f)).astype(np.float32)
    ell_f = ell_from_csr(src, dst, n, row_chunk=64).to_device()
    ell_b = ell_from_csr(dst, src, n, row_chunk=64).to_device()
    got = np.asarray(_run_ell(ell_f, jnp.asarray(h)))
    np.testing.assert_allclose(got, _dense(src, dst, h, n), rtol=1e-4, atol=1e-4)
    g = rng.normal(size=(n, f)).astype(np.float32)

    def loss(h):
        return (spmm_ell(ell_f, h, ell_b) * jnp.asarray(g)).sum()

    gh = np.asarray(jax.grad(loss)(jnp.asarray(h)))
    np.testing.assert_allclose(gh, _dense(dst, src, g, n), rtol=1e-4, atol=1e-4)


def test_heavy_rows_split_and_isolated_nodes(rng):
    n, f = 100, 8
    # node 7 gets degree 5n (> WMAX when wmax=64 below); node 99 isolated
    src = np.concatenate([np.tile(np.arange(n - 1, dtype=np.int32), 5),
                          rng.integers(0, n - 1, 300).astype(np.int32)])
    dst = np.concatenate([np.full(5 * (n - 1), 7, np.int32),
                          rng.integers(0, n - 1, 300).astype(np.int32)])
    h = rng.normal(size=(n, f)).astype(np.float32)
    ell = ell_from_csr(src, dst, n, wmax=64, row_chunk=8).to_device()
    got = np.asarray(_run_ell(ell, jnp.asarray(h)))
    ref = _dense(src, dst, h, n)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)
    assert np.abs(got[99]).max() == 0  # isolated node stays zero


def test_bf16_gather_f32_accumulate(rng):
    # acc_dtype=f32 with bf16 h must equal gathering an f32-upcast of h:
    # the gathered values carry bf16 precision either way, only the HBM
    # traffic differs (spmm_block.py routes its straggler path this way).
    n, e, f = 300, 4000, 16
    src = rng.integers(0, n, e).astype(np.int32)
    dst = rng.integers(0, n, e).astype(np.int32)
    h = rng.normal(size=(n, f)).astype(np.float32)
    h_bf = jnp.asarray(h).astype(jnp.bfloat16)
    ell = ell_from_csr(src, dst, n, row_chunk=64).to_device()
    got = _run_ell(ell, h_bf, acc_dtype=jnp.float32)
    assert got.dtype == jnp.float32
    want = _run_ell(ell, h_bf.astype(jnp.float32))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_cache_roundtrip(tmp_path, rng):
    n, e = 64, 500
    src = rng.integers(0, n, e).astype(np.int32)
    dst = rng.integers(0, n, e).astype(np.int32)
    key = str(tmp_path / "ell")
    a = ell_from_csr(src, dst, n, row_chunk=16, cache_key=key)
    b = ell_from_csr(src, dst, n, row_chunk=16, cache_key=key)
    assert len(a.buckets) == len(b.buckets)
    for (w1, r1, i1, l1), (w2, r2, i2, l2) in zip(a.buckets, b.buckets):
        assert w1 == w2
        np.testing.assert_array_equal(r1, r2)
        np.testing.assert_array_equal(i1, i2)
        np.testing.assert_array_equal(l1, l2)
