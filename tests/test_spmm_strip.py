"""Strip-ordered (window reuse) bitmask SpMM tests — portable twin and
interpret-mode Pallas semantics on CPU; hardware perf/parity is covered by
tests_tpu/test_strip_tpu.py."""
import jax
import jax.numpy as jnp
import numpy as np

from adaqp_tpu.ops.spmm_strip import (
    STRIP,
    _run_strip_pallas,
    run_strip,
    spmm_strip,
    strip_layout,
)


def _ref(src, dst, h, n_pad, n):
    key = np.unique(src.astype(np.int64) * n + dst)
    us, ud = (key // n).astype(int), (key % n).astype(int)
    out = np.zeros((n_pad, h.shape[1]), np.float32)
    np.add.at(out, ud, h[us])
    return out


def _case(rng, n, e, f, min_edges, n_src=None):
    ns = n if n_src is None else n_src
    src = rng.integers(0, ns, e).astype(np.int32)
    dst = np.where(
        rng.random(e) < 0.5,
        (src + rng.integers(-300, 300, e)) % n,
        rng.integers(0, n, e),
    ).astype(np.int32)
    lay = strip_layout(src, dst, n, min_edges=min_edges, n_src=n_src)
    h = np.zeros((lay.n_src_pad, f), np.float32)
    h[:ns] = rng.normal(size=(ns, f)).astype(np.float32)
    return src, dst, lay, h


def test_dense_only_matches(rng):
    src, dst, lay, h = _case(rng, 3000, 50000, 32, min_edges=1)
    assert lay.straggler is None
    got = np.asarray(run_strip(lay.to_device(), jnp.asarray(h), use_pallas=False))
    ref = _ref(src, dst, h, lay.n_pad, 3000)
    np.testing.assert_allclose(got, ref, atol=1e-3)


def test_straggler_split_matches(rng):
    src, dst, lay, h = _case(rng, 3000, 20000, 32, min_edges=400)
    assert lay.straggler is not None
    got = np.asarray(run_strip(lay.to_device(), jnp.asarray(h), use_pallas=False))
    np.testing.assert_allclose(got, _ref(src, dst, h, lay.n_pad, 3000), atol=1e-3)


def test_rectangular_halo_shape(rng):
    # halo aggregation is rectangular (r_pad src rows -> l_max dst rows)
    src, dst, lay, h = _case(rng, 2100, 30000, 16, min_edges=8, n_src=5000)
    got = np.asarray(run_strip(lay.to_device(), jnp.asarray(h), use_pallas=False))
    assert lay.n_pad % STRIP == 0
    np.testing.assert_allclose(
        got, _ref(src, dst, h, lay.n_pad, max(2100, 5000))[: lay.n_pad],
        atol=1e-3,
    )


def test_interpret_pallas_matches_twin(rng):
    # the real kernel (grid arrays, flush steps, window ring) in interpreter
    # mode must agree with the portable twin — this validates the strip
    # machinery itself, not just the math
    src, dst, lay, h = _case(rng, 5000, 60000, 128, min_edges=4)
    dev = lay.to_device()
    hj = jnp.asarray(h)
    twin = run_strip(dev, hj, use_pallas=False)
    got = _run_strip_pallas(dev, hj, interpret=True)
    if lay.straggler is not None:
        from adaqp_tpu.ops.spmm_fast import _run_ell

        got = got + _run_ell(
            lay.straggler.to_device(), hj, acc_dtype=jnp.float32
        ).astype(hj.dtype)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(twin), atol=0.05, rtol=0.01
    )  # kernel matmuls in bf16


def test_empty_strips_zero_filled(rng):
    # a graph touching only the first strip: later strips' output blocks
    # must come back zero through the flush path
    n = 3 * STRIP
    e = 20000
    src = rng.integers(0, STRIP, e).astype(np.int32)
    dst = rng.integers(0, STRIP, e).astype(np.int32)
    lay = strip_layout(src, dst, n, min_edges=1)
    h = rng.normal(size=(lay.n_src_pad, 16)).astype(np.float32)
    got = np.asarray(run_strip(lay.to_device(), jnp.asarray(h), use_pallas=False))
    assert np.abs(got[STRIP:]).max() == 0.0
    np.testing.assert_allclose(
        got[:STRIP], _ref(src, dst, h, lay.n_pad, n)[:STRIP], atol=1e-3
    )


def test_custom_vjp_uses_reverse_layout(rng):
    n, e, f = 2100, 15000, 16
    src = rng.integers(0, n, e).astype(np.int32)
    dst = rng.integers(0, n, e).astype(np.int32)
    fwd = strip_layout(src, dst, n, min_edges=8).to_device()
    bwd = strip_layout(dst, src, n, min_edges=8).to_device()
    h = np.zeros((fwd.n_src_pad, f), np.float32)
    h[:n] = rng.normal(size=(n, f)).astype(np.float32)
    g = rng.normal(size=(fwd.n_pad, f)).astype(np.float32)

    def loss(hj):
        return (spmm_strip(fwd, hj, bwd, False)[:, :] * jnp.asarray(g)).sum()

    gh = np.asarray(jax.grad(loss)(jnp.asarray(h)))
    ref = _ref(dst, src, g, fwd.n_src_pad, n)
    np.testing.assert_allclose(gh, ref, atol=1e-3)


def test_cache_roundtrip(rng, tmp_path):
    src = rng.integers(0, 3000, 20000).astype(np.int32)
    dst = rng.integers(0, 3000, 20000).astype(np.int32)
    key = str(tmp_path / "strip")
    a = strip_layout(src, dst, 3000, min_edges=16, cache_key=key)
    b = strip_layout(src, dst, 3000, min_edges=16, cache_key=key)
    for name in ("masks", "win_src", "w_ord", "out_idx", "sub", "flags",
                 "mask_idx", "tile_src", "tile_dst"):
        np.testing.assert_array_equal(getattr(a, name), getattr(b, name))
