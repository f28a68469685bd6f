"""Component split of the capped-segment wire pack/unpack cost at the
8-partition products boundary (~1.86M rows/chip) — which term pays the
108/134 ms `--phase packbench` measures (PRODUCTS8_r04.json)?

Uses a SYNTHETIC ExchangePlan with the artifact's boundary shape (K=8,
~265K lanes/pair, ~321K local rows) so the probe needs no 447 s layout
build; every timed term (gather, kernels, DUS, scatter) depends only on
these sizes, not on the real graph.

Times, on the real chip, for the K=8 uniform-q8 wire (shard 0):

  gather        src[sgq_rows]                (f32 row gather)
  quantpack     fused quantize+pack kernel   (contiguous rows -> words)
  quantpack_al  same with f_wire=f_pad       (lane-aligned wpr control)
  dus           the slot-loop DUS writes     (words -> sendbuf)
  pack          full exchange_ragged.pack_dir
  slices        per-slot dynamic_slice+concat (recvbuf -> words)
  dequant       fused unpack+dequant kernel  (words -> f32 rows)
  scatter       out.at[sgd_rows].set(rows)
  unpack        full exchange_ragged.unpack_dir

Run: python scripts/packsplit.py  (needs the chip).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from adaqp_tpu.utils.compilation_cache import enable_compilation_cache

enable_compilation_cache()

from adaqp_tpu.assigner.assignment import uniform_assignment  # noqa: E402
from adaqp_tpu.comm import exchange_ragged as xr  # noqa: E402
from adaqp_tpu.comm.wire import wire_from_assignment  # noqa: E402
from adaqp_tpu.graph.layout import ExchangePlan  # noqa: E402
from adaqp_tpu.ops import quant_pallas  # noqa: E402

K = 8
CNT = 265_254  # lanes per (sender, receiver) pair: 7*CNT ~ 1.857M rows/chip
N_LOCAL = 321_436  # local rows per chip (gather source)
F, HIDDEN, LAYERS = 100, 256, 3
REPS = 6


def log(*a):
    print(*a, flush=True)


def synth_plan(rng) -> ExchangePlan:
    s_pad = -(-CNT // 8) * 8
    send_idx = np.zeros((K, K, s_pad), np.int32)
    recv_slot = np.zeros((K, K, s_pad), np.int32)
    counts = np.zeros((K, K), np.int64)
    r_pad = -(-(K - 1) * CNT // 8) * 8
    for s in range(K):
        for r in range(K):
            if s == r:
                # sentinel pads (dropped): out-of-range scatter slots
                send_idx[s, r] = 0
                recv_slot[r, s] = r_pad
                continue
            counts[s, r] = CNT
            send_idx[s, r, :CNT] = rng.integers(0, N_LOCAL, CNT)
            send_idx[s, r, CNT:] = 0
            pos = sum(1 for t in range(K) if t != r and t < s)
            recv_slot[r, s, :CNT] = pos * CNT + np.arange(CNT)
            recv_slot[r, s, CNT:] = r_pad
    num_remote = np.full((K,), (K - 1) * CNT, np.int64)
    scores = np.ones((K, K, s_pad), np.float32)
    remote_global = np.full((K, r_pad), -1, np.int64)
    return ExchangePlan(
        send_idx=send_idx, recv_slot=recv_slot, counts=counts,
        num_remote=num_remote, scores_fp=scores, scores_bp=scores,
        remote_global=remote_global, s_pad=s_pad, r_pad=r_pad,
    )


def timeit(body, *args):
    """Time ``body(i, *args) -> array`` per call: jitted fori_loop with a
    scalar-sum carry + scalar readback (block_until_ready does not block
    over the axon tunnel), two loop lengths to cancel dispatch/sync cost.
    ``body`` must make its work depend on ``i`` (or LICM hoists it)."""
    import functools

    @functools.partial(jax.jit, static_argnums=0)
    def loop(iters, *a):
        def f(i, c):
            return c + body(i, *a).sum(dtype=jnp.float32)
        return jax.lax.fori_loop(0, iters, f, jnp.zeros((), jnp.float32))

    def run(iters):
        ts = []
        _ = float(loop(iters, *args))
        for _ in range(REPS):
            t0 = time.perf_counter()
            _ = float(loop(iters, *args))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t2, t10 = run(2), run(10)
    return (t10 - t2) / 8 * 1e3


def main():
    assert jax.devices()[0].platform == "tpu", "needs the chip"
    rng = np.random.default_rng(0)
    plan = synth_plan(rng)
    dims = [F] + [HIDDEN] * (LAYERS - 1)
    wires = wire_from_assignment(
        plan, uniform_assignment(plan, LAYERS, 8), dims
    )
    for label, (w, _) in (("F100", wires[0]), ("F256", wires[1])):
        wl = jax.tree.map(lambda a: np.asarray(a)[0], w)
        f_pad = 128 if label == "F100" else 256
        f_true = F if label == "F100" else HIDDEN
        bi = wl.bits.index(8)
        bits, fw, wpr = wl.bits[bi], wl.fw[bi], wl.wpr[bi]
        s_rows = int(wl.sgq_rows[bi].shape[0])
        log(f"\n== {label}: bits={bits} fw={fw} wpr={wpr} rows={s_rows} "
            f"sb_cap={int(wl.sb_cap)} rb_cap={int(wl.rb_cap)} ==")
        src = jnp.asarray(rng.normal(size=(N_LOCAL, f_pad)).astype(np.float32))
        recv = jnp.asarray(rng.integers(
            0, 2**10, int(wl.rb_cap), dtype=np.int64).astype(np.uint32))
        wdev = jax.tree.map(jnp.asarray, wl)
        key = jax.random.PRNGKey(0)

        xr._FORCE_SEG = True

        gat = lambda i, s, ix: s[(ix + i) % N_LOCAL]
        t = timeit(gat, src, wdev.sgq_rows[bi])
        log(f"gather        {t:8.2f} ms")

        rb = quant_pallas.ROW_BLOCK
        n_pad = -(-s_rows // rb) * rb
        contig = jnp.asarray(
            rng.normal(size=(n_pad, f_pad)).astype(np.float32))

        qp = lambda i, x: quant_pallas.quantize_pack_rows_tpu(
            x, int(bits), jnp.int32(7) + i, int(fw), f_true=f_true)[0]
        t = timeit(qp, contig)
        log(f"quantpack     {t:8.2f} ms   (fw={fw}, wpr={wpr})")

        qp128 = lambda i, x: quant_pallas.quantize_pack_rows_tpu(
            x, int(bits), jnp.int32(7) + i, f_pad, f_true=f_true)[0]
        t = timeit(qp128, contig)
        log(f"quantpack_al  {t:8.2f} ms   (fw={f_pad}, "
            f"wpr={f_pad * int(bits) // 32})")

        words0, scale0, rmin0 = jax.jit(
            lambda x: quant_pallas.quantize_pack_rows_tpu(
                x, int(bits), jnp.int32(7), int(fw), f_true=f_true))(contig)
        words0 = words0[:s_rows]
        params = jnp.stack([scale0[:s_rows], rmin0[:s_rows]],
                           axis=-1).astype(jnp.bfloat16)
        pwords0 = jax.lax.bitcast_convert_type(
            params.reshape(s_rows, 1, 2), jnp.uint32)[:, 0]
        pwords0 = jax.block_until_ready(pwords0)

        def dus_only(i, words, pwords, wd):
            words = words ^ i.astype(jnp.uint32)
            nslots = wd.sg_base[bi].shape[0]
            sendbuf = jnp.zeros((int(wl.sb_cap),), jnp.uint32)
            for j in range(nslots):
                cap = wl.sg_cap[bi][j]
                if cap == 0:
                    continue
                blk = jax.lax.dynamic_slice_in_dim(
                    words, wl.sg_start[bi][j], cap, 0)
                buf2 = sendbuf.reshape(-1, int(wpr))
                buf2 = jax.lax.dynamic_update_slice(
                    buf2, blk, (wd.sg_base[bi][j] // int(wpr), 0))
                sendbuf = buf2.reshape(-1)
            for j in range(nslots):
                cap = wl.sg_cap[bi][j]
                if cap == 0:
                    continue
                blkp = jax.lax.dynamic_slice_in_dim(
                    pwords, wl.sg_start[bi][j], cap, 0)
                sendbuf = jax.lax.dynamic_update_slice_in_dim(
                    sendbuf, blkp, wd.sg_pbase[bi][j], 0)
            return sendbuf

        t = timeit(dus_only, words0, pwords0, wdev)
        log(f"dus           {t:8.2f} ms")

        pack = lambda i, s, wd, k: xr.pack_dir(
            wd, s, jax.random.fold_in(k, i), f_true)
        t = timeit(pack, src, wdev, key)
        log(f"pack(full)    {t:8.2f} ms")

        def slices_only(i, recvbuf, wd):
            recvbuf = recvbuf ^ i.astype(jnp.uint32)
            nslots = wd.sg_rbase[bi].shape[0]
            blocks = []
            for j in range(nslots):
                cap = wl.sg_cap[bi][j]
                if cap == 0:
                    continue
                blocks.append(jax.lax.dynamic_slice(
                    recvbuf.reshape(-1, int(wpr)),
                    (wd.sg_rbase[bi][j] // int(wpr), 0),
                    (cap, int(wpr))))
            return jnp.concatenate(blocks, axis=0)

        t = timeit(slices_only, recv, wdev)
        log(f"slices        {t:8.2f} ms")

        wpad = jnp.pad(words0, ((0, n_pad - s_rows), (0, 0)))
        spad = jnp.pad(scale0[:s_rows], (0, n_pad - s_rows),
                       constant_values=1.0)
        rpad = jnp.pad(rmin0[:s_rows], (0, n_pad - s_rows))
        dq = lambda i, w_, s_, r_: quant_pallas.unpack_dequantize_rows_tpu(
            w_, s_ + i.astype(jnp.float32) * 1e-30, r_, int(bits), f_true,
            int(fw), f_pad)
        t = timeit(dq, wpad, spad, rpad)
        log(f"dequant       {t:8.2f} ms")

        rows_f = jax.jit(
            lambda w_, s_, r_: quant_pallas.unpack_dequantize_rows_tpu(
                w_, s_, r_, int(bits), f_true, int(fw), f_pad))(
                    wpad, spad, rpad)[:s_rows]
        sca = lambda i, r, ix: jnp.zeros(
            (int(plan.r_pad), f_pad), jnp.float32
        ).at[ix].set(r + i.astype(jnp.float32) * 1e-30, mode="drop")
        t = timeit(sca, rows_f, wdev.sgd_rows[bi])
        log(f"scatter       {t:8.2f} ms")

        unp = lambda i, rb_, wd: xr.unpack_dir(
            wd, rb_ ^ i.astype(jnp.uint32), int(plan.r_pad), False, f_true,
            f_pad)
        t = timeit(unp, recv, wdev)
        log(f"unpack(full)  {t:8.2f} ms")

        xr._FORCE_SEG = None


if __name__ == "__main__":
    main()
