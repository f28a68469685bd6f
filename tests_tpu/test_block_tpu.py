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


def test_block_with_ell_stragglers_bf16():
    # force a REAL tile/ELL mix (high min_edges sends sparse tiles to the
    # gather path) and bf16 activations — the straggler gather runs in
    # bf16 with f32 accumulation (spmm_block.py straggler route)
    rng = np.random.default_rng(2)
    n, f = 3000, 128
    # dense band (survives as tiles) + sparse uniform tail (goes to ELL)
    band_src = rng.integers(0, n, 40000).astype(np.int32)
    band_dst = ((band_src + rng.integers(-100, 100, 40000)) % n).astype(np.int32)
    tail_src = rng.integers(0, n, 3000).astype(np.int32)
    tail_dst = rng.integers(0, n, 3000).astype(np.int32)
    src = np.concatenate([band_src, tail_src])
    dst = np.concatenate([band_dst, tail_dst])
    lay = block_layout(src, dst, n, min_edges=400)
    assert lay.straggler is not None, "test graph produced no ELL stragglers"
    assert lay.masks.shape[0] > 0, "test graph produced no dense tiles"
    h = np.zeros((lay.n_pad, f), np.float32)
    h[:n] = rng.normal(size=(n, f)).astype(np.float32)
    h_bf = jnp.asarray(h).astype(jnp.bfloat16)
    got = np.asarray(run_block(lay.to_device(), h_bf, use_pallas=True))
    # reference over bf16-precision inputs (what the chip actually sums)
    ref = _ref(src, dst, np.asarray(h_bf, np.float64), lay.n_pad, n)
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
