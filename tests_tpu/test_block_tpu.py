"""Hardware test: bitmask-MXU block SpMM Pallas kernel vs dense reference."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

if jax.default_backend() not in ("tpu",):
    pytest.skip("requires a TPU backend", allow_module_level=True)

from adaqp_tpu.ops.spmm_block import block_layout, run_block, spmm_block  # noqa: E402


def _ref(src, dst, h, n_pad, n):
    key = np.unique(src.astype(np.int64) * n + dst)
    us, ud = (key // n).astype(int), (key % n).astype(int)
    out = np.zeros((n_pad, h.shape[1]), np.float64)
    np.add.at(out, ud, h[us].astype(np.float64))
    return out


def test_pallas_block_kernel_matches():
    rng = np.random.default_rng(0)
    n, e, f = 3000, 60000, 128
    src = rng.integers(0, n, e).astype(np.int32)
    dst = np.where(
        rng.random(e) < 0.5,
        (src + rng.integers(-300, 300, e)) % n,
        rng.integers(0, n, e),
    ).astype(np.int32)
    lay = block_layout(src, dst, n, min_edges=32)
    h = np.zeros((lay.n_pad, f), np.float32)
    h[:n] = rng.normal(size=(n, f)).astype(np.float32)
    got = np.asarray(run_block(lay.to_device(), jnp.asarray(h), use_pallas=True))
    ref = _ref(src, dst, h, lay.n_pad, n)
    # bf16 matmul inputs: relative tolerance ~1e-2
    scale = np.abs(ref).max()
    assert np.abs(got - ref).max() <= 2e-2 * scale


def test_pallas_block_grad():
    rng = np.random.default_rng(1)
    n, e, f = 2000, 30000, 128
    src = rng.integers(0, n, e).astype(np.int32)
    dst = rng.integers(0, n, e).astype(np.int32)
    fwd = block_layout(src, dst, n, min_edges=16).to_device()
    bwd = block_layout(dst, src, n, min_edges=16).to_device()
    h = np.zeros((fwd.n_pad, f), np.float32)
    h[:n] = rng.normal(size=(n, f)).astype(np.float32)
    g = rng.normal(size=(fwd.n_pad, f)).astype(np.float32)

    def loss(hj):
        return (spmm_block(fwd, hj, bwd, True) * jnp.asarray(g)).sum()

    gh = np.asarray(jax.grad(loss)(jnp.asarray(h)))
    ref = _ref(dst, src, g, fwd.n_pad, n)
    scale = np.abs(ref).max()
    assert np.abs(gh - ref).max() <= 2e-2 * scale
