"""SpMM aggregation tests: segment and chunked paths vs dense reference."""
import jax.numpy as jnp
import numpy as np
import pytest

from adaqp_tpu.ops.spmm import segment_spmm, spmm_csr, pad_edges


def _random_graph(rng, n, e):
    src = rng.integers(0, n, size=e).astype(np.int32)
    dst = np.sort(rng.integers(0, n, size=e).astype(np.int32))
    w = rng.normal(size=e).astype(np.float32)
    return src, dst, w


def _dense_ref(src, dst, w, h, n):
    out = np.zeros((n, h.shape[1]), dtype=np.float64)
    ww = np.ones(len(src)) if w is None else w
    for s, d, x in zip(src, dst, ww):
        out[d] += x * h[s]
    return out.astype(np.float32)


@pytest.mark.parametrize("weighted", [True, False])
def test_segment_spmm_matches_dense(rng, weighted):
    n, e, f = 50, 300, 8
    src, dst, w = _random_graph(rng, n, e)
    if not weighted:
        w = None
    h = rng.normal(size=(n, f)).astype(np.float32)
    out = segment_spmm(jnp.asarray(src), jnp.asarray(dst), None if w is None else jnp.asarray(w), jnp.asarray(h), n)
    np.testing.assert_allclose(np.asarray(out), _dense_ref(src, dst, w, h, n), rtol=1e-4, atol=1e-4)


def test_spmm_csr_matches_segment(rng):
    n, e, f = 40, 250, 16
    src, dst, w = _random_graph(rng, n, e)
    h = rng.normal(size=(n, f)).astype(np.float32)
    ref = segment_spmm(jnp.asarray(src), jnp.asarray(dst), jnp.asarray(w), jnp.asarray(h), n)
    ps, pd, pw = pad_edges(src, dst, w, n, 64)
    out = spmm_csr(jnp.asarray(ps), jnp.asarray(pd), jnp.asarray(pw), jnp.asarray(h), n, chunk=64)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_spmm_csr_requires_padding(rng):
    n = 10
    src = np.zeros(10, np.int32)
    dst = np.zeros(10, np.int32)
    with pytest.raises(ValueError):
        spmm_csr(jnp.asarray(src), jnp.asarray(dst), None, jnp.zeros((n, 4)), n, chunk=64)
