"""Hardware test: strip (window reuse) kernel vs block kernel on the chip.

The strip kernel's grid machinery (window ring DMA, strip accumulator,
flush steps, shard n_win prefetch) must produce BIT-identical output to
the v1 block kernel on the same graph — both expand masks and matmul in
bf16 with f32 accumulation, so equality is exact."""
import jax
import numpy as np
import pytest

if jax.default_backend() not in ("tpu",):
    pytest.skip("requires a TPU backend", allow_module_level=True)

import jax.numpy as jnp  # noqa: E402

from adaqp_tpu.ops.spmm_block import block_layout, run_block  # noqa: E402
from adaqp_tpu.ops.spmm_strip import strip_layout, run_strip  # noqa: E402


def test_empty_layout_then_real_layout_no_stale_semaphore():
    # a flush-only layout (zero real windows — the K=1 empty-halo case)
    # must not leave an unwaited warmup DMA behind; the next kernel
    # invocation would consume its stale semaphore signal and crash
    rng = np.random.default_rng(1)
    n = 4096
    empty = strip_layout(
        np.zeros(0, np.int32), np.zeros(0, np.int32), n, min_edges=16
    )
    assert empty.win_src.shape[0] - 1 == 0
    h = jnp.asarray(rng.normal(size=(empty.n_src_pad, 128)).astype(np.float32))
    out = np.asarray(run_strip(empty.to_device(), h))
    assert np.abs(out).max() == 0.0
    src = rng.integers(0, n, 100_000).astype(np.int32)
    dst = rng.integers(0, n, 100_000).astype(np.int32)
    real = strip_layout(src, dst, n, min_edges=16)
    out2 = np.asarray(run_strip(real.to_device(), h).astype(jnp.float32))
    blk = block_layout(src, dst, n, min_edges=16)
    want = np.asarray(run_block(blk.to_device(), h).astype(jnp.float32))
    np.testing.assert_array_equal(out2[: want.shape[0]], want)


@pytest.mark.parametrize("f", [128, 256])
def test_strip_matches_block_on_chip(f):
    rng = np.random.default_rng(0)
    n, e = 9000, 300_000
    src = rng.integers(0, n, e).astype(np.int32)
    dst = np.where(
        rng.random(e) < 0.6,
        (src + rng.integers(-400, 400, e)) % n,
        rng.integers(0, n, e),
    ).astype(np.int32)
    blk = block_layout(src, dst, n, min_edges=32)
    stp = strip_layout(src, dst, n, min_edges=32)
    assert stp.win_src.shape[0] - 1 < stp.tile_src.shape[0]  # real reuse
    h = jnp.asarray(rng.normal(size=(blk.n_src_pad, f)).astype(np.float32))
    h = h.astype(jnp.bfloat16)
    hs = h if stp.n_src_pad == blk.n_src_pad else jnp.pad(
        h, ((0, stp.n_src_pad - blk.n_src_pad), (0, 0)))
    ob = np.asarray(run_block(blk.to_device(), h).astype(jnp.float32))
    os_ = np.asarray(run_strip(stp.to_device(), hs).astype(jnp.float32))
    lim = min(ob.shape[0], os_.shape[0])
    np.testing.assert_array_equal(ob[:lim], os_[:lim])
