"""Block-sparse bitmask SpMM tests (jnp fallback semantics on CPU; the
Pallas path is covered by tests_tpu/test_pallas_tpu.py on hardware)."""
import jax
import jax.numpy as jnp
import numpy as np

from adaqp_tpu.ops.spmm_block import BD, BS, block_layout, run_block, spmm_block


def _ref(src, dst, h, n_pad, n):
    key = np.unique(src.astype(np.int64) * n + dst)
    us, ud = (key // n).astype(int), (key % n).astype(int)
    out = np.zeros((n_pad, h.shape[1]), np.float32)
    np.add.at(out, ud, h[us])
    return out


def _case(rng, n, e, f, min_edges):
    src = rng.integers(0, n, e).astype(np.int32)
    dst = np.where(
        rng.random(e) < 0.5,
        (src + rng.integers(-300, 300, e)) % n,
        rng.integers(0, n, e),
    ).astype(np.int32)
    lay = block_layout(src, dst, n, min_edges=min_edges)
    h = np.zeros((lay.n_pad, f), np.float32)
    h[:n] = rng.normal(size=(n, f)).astype(np.float32)
    return src, dst, lay, h


def test_dense_only_matches(rng):
    src, dst, lay, h = _case(rng, 3000, 50000, 32, min_edges=1)
    assert lay.straggler is None
    got = np.asarray(run_block(lay.to_device(), jnp.asarray(h), use_pallas=False))
    np.testing.assert_allclose(got, _ref(src, dst, h, lay.n_pad, 3000), atol=1e-3)


def test_straggler_split_matches(rng):
    src, dst, lay, h = _case(rng, 3000, 20000, 32, min_edges=400)
    assert lay.straggler is not None  # random edges fall below threshold
    got = np.asarray(run_block(lay.to_device(), jnp.asarray(h), use_pallas=False))
    np.testing.assert_allclose(got, _ref(src, dst, h, lay.n_pad, 3000), atol=1e-3)


def test_custom_vjp_uses_reverse_layout(rng):
    n, e, f = 2000, 15000, 16
    src = rng.integers(0, n, e).astype(np.int32)
    dst = rng.integers(0, n, e).astype(np.int32)
    fwd = block_layout(src, dst, n, min_edges=8).to_device()
    bwd = block_layout(dst, src, n, min_edges=8).to_device()
    h = np.zeros((fwd.n_pad, f), np.float32)
    h[:n] = rng.normal(size=(n, f)).astype(np.float32)
    g = rng.normal(size=(fwd.n_pad, f)).astype(np.float32)

    def loss(hj):
        return (spmm_block(fwd, hj, bwd, False) * jnp.asarray(g)).sum()

    gh = np.asarray(jax.grad(loss)(jnp.asarray(h)))
    ref = _ref(dst, src, g, fwd.n_pad, n)
    np.testing.assert_allclose(gh, ref, atol=1e-3)


def test_every_dst_block_covered(rng):
    # graph leaving some dst blocks with no dense tile still zero-inits them
    n = 3 * BD
    src = np.zeros(10, np.int32)
    dst = np.arange(10, dtype=np.int32)  # only block 0 touched
    lay = block_layout(src, dst, n, min_edges=1)
    blocks = set(lay.dst_blk.tolist())
    assert blocks == set(range(lay.n_pad // BD))
    h = np.ones((lay.n_pad, 8), np.float32)
    got = np.asarray(run_block(lay.to_device(), jnp.asarray(h), use_pallas=False))
    assert np.abs(got[BD:]).max() == 0


def test_mask_layout_is_lane_aligned(rng):
    # masks must keep a 128-element minor dim (int16 halfwords): an s32
    # [.., 256, 64] form gets lane-padded 64->128 by XLA's T(8,128) tiling
    # — 2x mask HBM (1.3 GB wasted at products scale; docs/DESIGN.md §1)
    _, _, lay, _ = _case(rng, 3000, 50000, 8, min_edges=1)
    assert lay.masks.dtype == np.int16
    assert lay.masks.shape[1:] == (BD, 128)
    assert BS == 128 * 16  # halfword = j % 128, bit = j // 128


def test_bf16_input_keeps_dtype_and_f32_accumulation(rng):
    # output dtype follows h.dtype; accumulation stays f32 (a bf16-stepped
    # running sum over many tiles would drift far beyond one output round)
    src, dst, lay, h = _case(rng, 3000, 50000, 32, min_edges=1)
    hb = jnp.asarray(h).astype(jnp.bfloat16)
    got = run_block(lay.to_device(), hb, use_pallas=False)
    assert got.dtype == jnp.bfloat16
    ref = _ref(src, dst, np.asarray(hb, np.float32), lay.n_pad, 3000)
    err = np.abs(np.asarray(got, np.float32) - ref)
    # one bf16 rounding of the f32-exact result: |err| <= 2^-8 * |ref|
    assert (err <= np.abs(ref) * 2.0**-8 + 1e-6).all()


def test_cache_roundtrip(tmp_path, rng):
    src, dst, lay, h = _case(rng, 1500, 8000, 8, min_edges=100)
    key = str(tmp_path / "blk")
    a = block_layout(src, dst, 1500, min_edges=100, cache_key=key)
    b = block_layout(src, dst, 1500, min_edges=100, cache_key=key)
    np.testing.assert_array_equal(a.masks, b.masks)
    np.testing.assert_array_equal(a.src_start, b.src_start)
    assert (a.straggler is None) == (b.straggler is None)
