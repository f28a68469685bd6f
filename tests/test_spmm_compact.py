"""Compact-column SpMM tests: host layout invariants, jnp reference vs the
segment oracle, Pallas kernel in interpret mode, VJP routing, caching.

The on-chip performance path (Mosaic dynamic_gather) is exercised by
tests_tpu/ on hardware; everything here runs on CPU.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adaqp_tpu.ops.spmm_compact import (
    BD,
    BS,
    CSUB,
    GROUP,
    STRIP,
    _run_compact_jnp,
    _run_compact_pallas,
    compact_layout,
    run_compact,
    spmm_compact,
)


def _ref(src, dst, h, n_pad, n_key):
    key = np.unique(src.astype(np.int64) * n_key + dst)
    us, ud = (key // n_key).astype(int), (key % n_key).astype(int)
    out = np.zeros((n_pad, h.shape[1]), np.float32)
    np.add.at(out, ud, h[us].astype(np.float32))
    return out


def _banded(rng, n, e, spread=300):
    """Banded + random mix — produces all three tiers at default params."""
    src = rng.integers(0, n, e).astype(np.int32)
    dst = np.where(
        rng.random(e) < 0.7,
        (src + rng.integers(-spread, spread, e)) % n,
        rng.integers(0, n, e),
    ).astype(np.int32)
    return src, dst


def test_all_tiers_present_and_match(rng):
    n, e, f = 12000, 60000, 32
    src, dst = _banded(rng, n, e)
    lay = compact_layout(src, dst, n, me_ell=64, full_cols=256)
    kinds = set(lay.kind.tolist())
    assert kinds == {0, 1}, "expected both full and group items"
    assert lay.straggler is not None, "expected an ELL tail"
    h = np.zeros((lay.n_src_pad, f), np.float32)
    h[:n] = rng.normal(size=(n, f)).astype(np.float32)
    got = np.asarray(run_compact(lay.to_device(), jnp.asarray(h), use_pallas=False))
    np.testing.assert_allclose(got, _ref(src, dst, h, lay.n_pad, n), atol=1e-3)


def test_compact_only_matches(rng):
    # low full_cols + me_ell=1 forces everything through compact groups
    n, e, f = 3000, 25000, 16
    src, dst = _banded(rng, n, e, spread=80)
    lay = compact_layout(src, dst, n, me_ell=1, full_cols=BS)
    assert lay.straggler is None
    h = np.zeros((lay.n_src_pad, f), np.float32)
    h[:n] = rng.normal(size=(n, f)).astype(np.float32)
    got = np.asarray(run_compact(lay.to_device(), jnp.asarray(h), use_pallas=False))
    np.testing.assert_allclose(got, _ref(src, dst, h, lay.n_pad, n), atol=1e-3)


def test_rectangular_halo_case(rng):
    # dst rows != src rows (halo aggregation shape): remote slots -> local
    n_dst, n_src, e, f = 2000, 7000, 30000, 16
    src = rng.integers(0, n_src, e).astype(np.int32)
    dst = rng.integers(0, n_dst, e).astype(np.int32)
    lay = compact_layout(src, dst, n_dst, n_src=n_src, me_ell=8, full_cols=512)
    assert lay.n_src_pad >= n_src and lay.n_pad >= n_dst
    h = np.zeros((lay.n_src_pad, f), np.float32)
    h[:n_src] = rng.normal(size=(n_src, f)).astype(np.float32)
    got = np.asarray(run_compact(lay.to_device(), jnp.asarray(h), use_pallas=False))
    np.testing.assert_allclose(
        got, _ref(src, dst, h, lay.n_pad, max(n_dst, n_src)), atol=1e-3
    )


def test_layout_invariants(rng):
    n, e = 5000, 80000
    src, dst = _banded(rng, n, e)
    lay = compact_layout(src, dst, n, me_ell=16, full_cols=512)
    t = len(lay.kind)
    assert lay.masks.shape == (t, BD, BS // 16) and lay.masks.dtype == np.int16
    assert lay.col_idx.shape == (t, BS)
    # items sorted by (strip, window); window DMA flags consistent
    key = list(zip(lay.strip_id.tolist(), lay.src_start.tolist()))
    assert all(
        key[i][0] < key[i + 1][0]
        or (key[i][0] == key[i + 1][0] and key[i][1] <= key[i + 1][1])
        for i in range(t - 1)
    )
    nw = lay.new_window
    assert nw[0] == 1
    for i in range(1, t):
        assert nw[i] == int(lay.src_start[i] != lay.src_start[i - 1])
    # slot parity alternates exactly on window changes
    np.testing.assert_array_equal(lay.wslot, (np.cumsum(nw) - 1) % 2)
    # every strip flushed exactly once, zeroed exactly once
    n_strips = lay.n_pad // STRIP
    assert lay.strip_first.sum() == n_strips == lay.strip_last.sum()
    assert set(lay.strip_id.tolist()) == set(range(n_strips))
    # dst offsets stay inside the strip and are block-aligned
    assert ((lay.dst_off >= 0) & (lay.dst_off < STRIP)).all()
    assert (lay.dst_off % BD == 0).all()


def test_pallas_interpret_matches_jnp(rng):
    # small-integer features are exact in bf16 and their 0/1-mask sums are
    # exact in the f32 accumulator, so the kernel (which matmuls in bf16 by
    # design) must agree with the f32 jnp reference EXACTLY
    n, e, f = 4000, 60000, 128
    src, dst = _banded(rng, n, e)
    lay = compact_layout(src, dst, n, me_ell=16, full_cols=512)
    h = np.zeros((lay.n_src_pad, f), np.float32)
    h[:n] = rng.integers(-4, 5, size=(n, f)).astype(np.float32)
    dev = lay.to_device()
    ref = np.asarray(_run_compact_jnp(dev, jnp.asarray(h)))
    got = np.asarray(_run_compact_pallas(dev, jnp.asarray(h), interpret=True))
    np.testing.assert_array_equal(got, ref)


def test_pallas_interpret_multi_fchunk(rng):
    # F=256 -> one chunk; F=768 -> two 384 chunks: same result
    n, e = 3 * STRIP, 40000
    src, dst = _banded(rng, n, e, spread=150)
    lay = compact_layout(src, dst, n, me_ell=8, full_cols=512)
    dev = lay.to_device()
    for f in (256, 768):
        h = np.zeros((lay.n_src_pad, f), np.float32)
        h[:n] = rng.integers(-4, 5, size=(n, f)).astype(np.float32)
        ref = np.asarray(_run_compact_jnp(dev, jnp.asarray(h)))
        got = np.asarray(_run_compact_pallas(dev, jnp.asarray(h), interpret=True))
        np.testing.assert_array_equal(got, ref)


def test_tpu_export_lowering(rng):
    # cross-platform export runs the Pallas->Mosaic PYTHON lowering without
    # a TPU device: it enforces the (8, 128) block-tiling rules and the
    # gather pattern-match (take_along_axis -> tpu.dynamic_gather) that
    # interpret mode does NOT check (this caught a (1, BS) col_idx
    # blockspec violation the CPU suite was blind to)
    import functools

    n, e = 6000, 40000
    src, dst = _banded(rng, n, e)
    lay = compact_layout(src, dst, n, me_ell=32, full_cols=512).to_device()
    fn = jax.jit(functools.partial(_run_compact_pallas, interpret=False))
    for f, dt in ((256, jnp.bfloat16), (768, jnp.float32)):
        h = jnp.zeros((lay.n_src_pad, f), dt)
        exp = jax.export.export(fn, platforms=["tpu"])(lay, h)
        assert len(exp.mlir_module_serialized) > 0


def test_custom_vjp_uses_reverse_layout(rng):
    n, e, f = 2000, 15000, 16
    src = rng.integers(0, n, e).astype(np.int32)
    dst = rng.integers(0, n, e).astype(np.int32)
    fwd = compact_layout(src, dst, n, me_ell=8, full_cols=512).to_device()
    bwd = compact_layout(dst, src, n, me_ell=8, full_cols=512).to_device()
    h = np.zeros((fwd.n_src_pad, f), np.float32)
    h[:n] = rng.normal(size=(n, f)).astype(np.float32)
    g = rng.normal(size=(fwd.n_pad, f)).astype(np.float32)

    def loss(hj):
        return (spmm_compact(fwd, hj, bwd, False) * jnp.asarray(g)).sum()

    gh = np.asarray(jax.grad(loss)(jnp.asarray(h)))
    ref = _ref(dst, src, g, fwd.n_pad, n)
    np.testing.assert_allclose(gh[: ref.shape[0]], ref, atol=1e-3)


def test_bf16_keeps_dtype_f32_accumulation(rng):
    n, e, f = 4000, 60000, 32
    src, dst = _banded(rng, n, e)
    lay = compact_layout(src, dst, n, me_ell=16, full_cols=512)
    h = np.zeros((lay.n_src_pad, f), np.float32)
    h[:n] = rng.normal(size=(n, f)).astype(np.float32)
    hb = jnp.asarray(h).astype(jnp.bfloat16)
    got = run_compact(lay.to_device(), hb, use_pallas=False)
    assert got.dtype == jnp.bfloat16
    ref = _ref(src, dst, np.asarray(hb, np.float32), lay.n_pad, n)
    err = np.abs(np.asarray(got, np.float32) - ref)
    assert (err <= np.abs(ref) * 2.0**-8 + 1e-6).all()


def test_multigraph_rejected(rng):
    src = np.asarray([1, 1, 5], np.int32)
    dst = np.asarray([2, 2, 6], np.int32)
    with pytest.raises(ValueError, match="simple graph"):
        compact_layout(src, dst, 10, dedup=False)
    lay = compact_layout(src, dst, 10, dedup=True)  # dedup path works
    h = np.zeros((lay.n_src_pad, 8), np.float32)
    h[:10] = 1.0
    got = np.asarray(run_compact(lay.to_device(), jnp.asarray(h), use_pallas=False))
    assert got[2, 0] == 1.0 and got[6, 0] == 1.0


def test_cache_rejects_mismatched_params(tmp_path, rng):
    # same cache_key, different tiering -> rebuild, not a silent stale hit
    n, e = 3000, 30000
    src, dst = _banded(rng, n, e)
    key = str(tmp_path / "cmp_p")
    a = compact_layout(src, dst, n, me_ell=16, full_cols=512, cache_key=key)
    b = compact_layout(src, dst, n, me_ell=192, full_cols=256, cache_key=key)
    assert (a.kind == 0).sum() != (b.kind == 0).sum() or len(a.kind) != len(
        b.kind
    ), "different tiering params must produce a different layout"


def test_cache_roundtrip(tmp_path, rng):
    n, e = 3000, 30000
    src, dst = _banded(rng, n, e)
    key = str(tmp_path / "cmp")
    a = compact_layout(src, dst, n, me_ell=16, full_cols=512, cache_key=key)
    b = compact_layout(src, dst, n, me_ell=16, full_cols=512, cache_key=key)
    for fld in ("kind", "masks", "col_idx", "src_start", "strip_id",
                "new_window", "wslot", "strip_first", "strip_last", "dst_off"):
        np.testing.assert_array_equal(getattr(a, fld), getattr(b, fld))
    assert (a.straggler is None) == (b.straggler is None)
    h = np.zeros((a.n_src_pad, 8), np.float32)
    h[:n] = 1.0
    ga = np.asarray(run_compact(a.to_device(), jnp.asarray(h), use_pallas=False))
    gb = np.asarray(run_compact(b.to_device(), jnp.asarray(h), use_pallas=False))
    np.testing.assert_array_equal(ga, gb)
