"""Hardware test: compact-column SpMM Pallas kernel (Mosaic dynamic_gather
window permutation) vs dense reference — the v2 aggregation kernel's
on-chip correctness gate (CPU logic is covered in tests/test_spmm_compact).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

if jax.default_backend() not in ("tpu",):
    pytest.skip("requires a TPU backend", allow_module_level=True)

from adaqp_tpu.ops.spmm_compact import (  # noqa: E402
    compact_layout,
    dynamic_gather_supported,
    run_compact,
    spmm_compact,
)

if not dynamic_gather_supported():
    pytest.skip(
        "Mosaic dynamic_gather only reindexes within one vreg on this "
        "backend (sublane depth <= 8); the compact kernel's [2048, F] "
        "window permutation cannot lower — see EXPERIMENTS.md",
        allow_module_level=True,
    )


def _ref(src, dst, h, n_pad, n):
    key = np.unique(src.astype(np.int64) * n + dst)
    us, ud = (key // n).astype(int), (key % n).astype(int)
    out = np.zeros((n_pad, h.shape[1]), np.float64)
    np.add.at(out, ud, h[us].astype(np.float64))
    return out


def _banded(rng, n, e, spread=300):
    src = rng.integers(0, n, e).astype(np.int32)
    dst = np.where(
        rng.random(e) < 0.7,
        (src + rng.integers(-spread, spread, e)) % n,
        rng.integers(0, n, e),
    ).astype(np.int32)
    return src, dst


def test_pallas_compact_all_tiers():
    rng = np.random.default_rng(0)
    n, e, f = 12000, 60000, 256
    src, dst = _banded(rng, n, e)
    lay = compact_layout(src, dst, n, me_ell=64, full_cols=256)
    assert set(lay.kind.tolist()) == {0, 1} and lay.straggler is not None
    h = np.zeros((lay.n_src_pad, f), np.float32)
    h[:n] = rng.normal(size=(n, f)).astype(np.float32)
    got = np.asarray(run_compact(lay.to_device(), jnp.asarray(h), use_pallas=True))
    ref = _ref(src, dst, h, lay.n_pad, n)
    scale = np.abs(ref).max()
    assert np.abs(got - ref).max() <= 2e-2 * scale


def test_pallas_compact_multi_fchunk_bf16():
    # F=768 -> two 384-lane chunks; bf16 activations
    rng = np.random.default_rng(1)
    n, e, f = 8000, 50000, 768
    src, dst = _banded(rng, n, e, spread=150)
    lay = compact_layout(src, dst, n, me_ell=32, full_cols=512)
    h = np.zeros((lay.n_src_pad, f), np.float32)
    h[:n] = rng.normal(size=(n, f)).astype(np.float32)
    h_bf = jnp.asarray(h).astype(jnp.bfloat16)
    got = np.asarray(run_compact(lay.to_device(), h_bf, use_pallas=True))
    ref = _ref(src, dst, np.asarray(h_bf, np.float64), lay.n_pad, n)
    scale = np.abs(ref).max()
    assert np.abs(got - ref).max() <= 2e-2 * scale


def test_pallas_compact_grad():
    rng = np.random.default_rng(2)
    n, e, f = 6000, 40000, 256
    src, dst = _banded(rng, n, e)
    fwd = compact_layout(src, dst, n, me_ell=32, full_cols=512).to_device()
    bwd = compact_layout(dst, src, n, me_ell=32, full_cols=512).to_device()
    h = np.zeros((fwd.n_src_pad, f), np.float32)
    h[:n] = rng.normal(size=(n, f)).astype(np.float32)
    g = rng.normal(size=(fwd.n_pad, f)).astype(np.float32)

    def loss(hj):
        return (spmm_compact(fwd, hj, bwd, True) * jnp.asarray(g)).sum()

    gh = np.asarray(jax.grad(loss)(jnp.asarray(h)))
    ref = _ref(dst, src, g, fwd.n_pad, n)
    scale = np.abs(ref).max()
    assert np.abs(gh[: ref.shape[0]] - ref).max() <= 2e-2 * scale
