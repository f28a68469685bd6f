"""Hardware tests for the Pallas TPU kernels — run on a real chip:

    python -m pytest tests_tpu -q

(kept out of tests/ because tests/conftest.py forces the 8-device CPU mesh;
these require the TPU hardware PRNG.)
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

if jax.default_backend() not in ("tpu",):
    pytest.skip("requires a TPU backend", allow_module_level=True)

from adaqp_tpu.ops import quant, quant_pallas  # noqa: E402


@pytest.mark.parametrize("bits", [2, 4, 8])
def test_quant_kernel_semantics(bits):
    rng = np.random.default_rng(0)
    n, f = 512, 128
    x = jnp.asarray(rng.normal(size=(n, f)), dtype=jnp.float32)
    q, scale, rmin = quant_pallas.quantize_rows_tpu(x, bits, 7)
    _, scale_ref, rmin_ref = quant.quantize_rows(x, bits, jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(scale), np.asarray(scale_ref), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(rmin), np.asarray(rmin_ref), rtol=1e-6)
    qn = np.asarray(q, dtype=np.int32)
    assert qn.min() >= 0 and qn.max() <= 2**bits - 1
    y = (np.asarray(x) - np.asarray(rmin)[:, None]) * np.asarray(scale)[:, None]
    assert (np.abs(qn - y) <= 1.0 + 1e-5).all()
    xh = quant_pallas.dequantize_rows_tpu(q, scale, rmin)
    step = 1.0 / np.asarray(scale)
    assert (np.abs(np.asarray(xh - x)) <= step[:, None] * (1 + 1e-5)).all()


def test_quant_kernel_unbiased():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(-1, 1, size=(256, 128)), jnp.float32)
    reps = 200
    acc = np.zeros(x.shape, np.float64)
    scale = None
    for r in range(reps):
        q, scale, rmin = quant_pallas.quantize_rows_tpu(x, 2, (r * 2654435761) % 2**31)
        acc += np.asarray(quant_pallas.dequantize_rows_tpu(q, scale, rmin))
    bias = acc / reps - np.asarray(x)
    sigma = (1.0 / np.asarray(scale))[:, None] / np.sqrt(6.0 * reps)
    assert np.abs(bias / sigma).max() < 7.0


@pytest.mark.parametrize("bits", [2, 4, 8])
def test_quant_pack_kernel_matches_unfused(bits):
    # the fused quantize+word-pack kernel must agree with the unfused
    # quantize_rows_tpu + portable pack_words for the SAME PRNG stream
    # (same seed words, same grid), and its roundtrip through the fused
    # unpack+dequant kernel must obey the one-step error bound
    from adaqp_tpu.comm.wire import wire_cols

    rng = np.random.default_rng(2)
    n, f, f_true = 512, 128, 100
    fw = wire_cols(f_true, bits)
    x = jnp.asarray(rng.normal(size=(n, f)), dtype=jnp.float32)
    w, scale, rmin = quant_pallas.quantize_pack_rows_tpu(x, bits, 7, fw, f_true=f_true)
    q_ref, scale_ref, rmin_ref = quant_pallas.quantize_rows_tpu(x, bits, 7, f_true=f_true)
    np.testing.assert_array_equal(np.asarray(scale), np.asarray(scale_ref))
    np.testing.assert_array_equal(np.asarray(rmin), np.asarray(rmin_ref))
    w_ref = quant.pack_words(q_ref[:, :fw], bits)
    np.testing.assert_array_equal(np.asarray(w), np.asarray(w_ref))
    xh = quant_pallas.unpack_dequantize_rows_tpu(w, scale, rmin, bits, f_true, fw, f)
    step = 1.0 / np.asarray(scale)
    err = np.abs(np.asarray(xh)[:, :f_true] - np.asarray(x)[:, :f_true])
    assert (err <= step[:, None] * (1 + 1e-5)).all()
    assert (np.asarray(xh)[:, f_true:] == 0).all()
    # and the fused unpack must match the portable word-decode + dequant
    # to float rounding (same q/scale+rmin f32 arithmetic)
    qd = quant.unpack_words(w, bits, fw).astype(jnp.float32)
    ref = qd / scale[:, None] + rmin[:, None]
    ref = jnp.where(jnp.arange(fw) < f_true, ref, 0.0)
    np.testing.assert_allclose(
        np.asarray(xh)[:, :fw], np.asarray(ref), rtol=1e-6, atol=1e-6
    )
