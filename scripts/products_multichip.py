"""8-partition ogbn-products-scale multi-chip story (round-3 VERDICT
missing #3: the north star names exactly this workload —
``/root/reference/scripts/products_all.sh:4-6`` trains it on 2 servers x
1-4 GPUs; ``BASELINE.json`` asks >=2x Vanilla on 8 partitions, TPU v5p).

Phases (independent; each updates ``PRODUCTS8_r04.json``):

  --phase layout   (CPU host)  products-scale edges -> LDG 8-partition ->
                   K=8 PartitionLayout + strip shards, all cached; reports
                   the LDG vs random edge cut.
  --phase aot      (CPU host)  full-scale Trainer (strip impl, quantized
                   AdaQP step) AOT-compiled for v5e:2x4 AND v5p:2x2x2 with
                   the overlap schedule options; reports per-chip arg/temp
                   bytes vs HBM and the ragged-window overlap evidence.
  --phase pass     (TPU chip)  measures the one-chip strip pass (F=128 and
                   F=256) on the K=1 products layout, and the quantize+
                   pack cost at the K=8 plan's true boundary sizes.
  --phase project  (any)       per-link-class projected K=8 epoch:
                   Vanilla vs AdaQP-q8 vs overlap-credited q8+p, from the
                   EXACT wire plans + the measured pass/quant numbers.

Run layout+aot on the CPU host, pass on the chip, then project.
"""
import argparse
import json
import os
import sys
import time

if "--xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    )

import jax  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from adaqp_tpu.utils.compilation_cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

N, E_TARGET, F, C = 2_449_029, 123_718_280, 100, 47
HIDDEN, LAYERS, K = 256, 3, 8
CACHE = "data/bench_cache"
ARTIFACT = "PRODUCTS8_r05.json"
HBM = {"v5e:2x4": 16 * 2**30, "v5p:2x2x2": 95 * 2**30}
# measured one-chip full-graph epoch, strip impl, hidden 256 (EXPERIMENTS
# round 3, scripts/bench_products.py on the corrected 123.7M-edge graph)
ONE_CHIP_EPOCH_S = 1.898
LINKS = {"ICI 45 GB/s": 45e9, "DCN 12.5 GB/s": 12.5e9, "25GbE 3 GB/s": 3e9}


def log(*a):
    print(*a, flush=True)


def update_artifact(section, payload):
    data = {}
    if os.path.exists(ARTIFACT):
        with open(ARTIFACT) as f:
            data = json.load(f)
    data[section] = payload
    with open(ARTIFACT, "w") as f:
        json.dump(data, f, indent=1)
    log(f"[{section}] -> {ARTIFACT}")


def products_edges():
    """The corrected 123.7M-unique-edge products-scale graph (cache shared
    with scripts/bench_products.py)."""
    key = f"{CACHE}/prod_u_{N}"
    if os.path.exists(key + "_edges.npz"):
        z = np.load(key + "_edges.npz")
        return z["src"], z["dst"]
    from bench import unique_banded_keys

    rng = np.random.default_rng(0)
    half = (E_TARGET - N) // 2
    keys = unique_banded_keys(N, 2 * half, rng, log)
    s0, d0 = keys // N, keys % N
    canon = np.unique(np.minimum(s0, d0) * N + np.maximum(s0, d0))
    while len(canon) < half:
        extra = unique_banded_keys(N, 2 * (half - len(canon)), rng, log)
        es, ed = extra // N, extra % N
        canon = np.unique(
            np.concatenate([canon, np.minimum(es, ed) * N + np.maximum(es, ed)])
        )
    canon = canon[np.sort(rng.permutation(len(canon))[:half])]
    s0, d0 = canon // N, canon % N
    loop = np.arange(N, dtype=np.int64)
    src = np.concatenate([s0, d0, loop]).astype(np.int32)
    dst = np.concatenate([d0, s0, loop]).astype(np.int32)
    os.makedirs(CACHE, exist_ok=True)
    np.savez(key + "_edges.npz", src=src, dst=dst)
    return src, dst


def products_graph():
    from adaqp_tpu.helper.dataset import GraphData

    src, dst = products_edges()
    rng = np.random.default_rng(1)
    feats = rng.normal(size=(N, F)).astype(np.float32)
    labels = rng.integers(0, C, N).astype(np.int32)
    train = rng.random(N) < 0.1
    rest = ~train
    val = rest & (rng.random(N) < 0.3)
    test = rest & ~val
    return GraphData(N, src, dst, feats, labels, train, val, test, C, False,
                     f"prodsynth{N}u")


def build_trainer():
    """Full products-scale Trainer: 8 LDG partitions, strip kernel,
    quantized AdaQP step — every cacheable stage lands under CACHE."""
    from adaqp_tpu.trainer import RunConfig, Trainer

    g = products_graph()
    cfg = RunConfig(
        dataset=g.name,
        num_parts=K,
        partition_method="ldg",
        num_epochs=2,
        hidden_dim=HIDDEN,
        num_layers=LAYERS,
        mode="AdaQP",
        assign_scheme="uniform",
        log_steps=1000,
        measure_breakdown=False,
        spmm_impl="strip",
        agg_dtype="bfloat16",
        remat=True,  # what a 16 GB v5e needs at hidden 256 (bench_products)
        partition_dir=f"{CACHE}/trainer_parts",
        exp_path=f"{CACHE}/trainer_exp",
    )
    return Trainer(cfg, graph=g)


def phase_layout():
    from adaqp_tpu.graph.partition import partition_random

    t0 = time.perf_counter()
    trainer = build_trainer()
    lay = trainer.layout
    g = trainer.graph
    pid = lay.part_id
    nonloop = g.src != g.dst
    cut_ldg = int((pid[g.src] != pid[g.dst])[nonloop].sum())
    rnd = partition_random(N, K, 0)
    cut_rnd = int((rnd[g.src] != rnd[g.dst])[nonloop].sum())
    e_total = int(nonloop.sum())
    sent = lay.l_max
    local_e = (np.asarray(lay.fwd_local[1]) != sent).sum(axis=1)
    halo_e = (np.asarray(lay.fwd_halo[1]) != sent).sum(axis=1)
    payload = {
        "n": N, "edges_directed": int(len(g.src)), "k": K,
        "partition": "ldg (native streaming)",
        "edge_cut_ldg": cut_ldg, "edge_cut_random": cut_rnd,
        "cut_frac_ldg": round(cut_ldg / e_total, 4),
        "cut_frac_random": round(cut_rnd / e_total, 4),
        "boundary_rows_sent": int(lay.plan_fwd.counts.sum()),
        "per_chip_local_edges": local_e.tolist(),
        "per_chip_halo_edges": halo_e.tolist(),
        "num_local": lay.num_local.tolist(),
        "build_s": round(time.perf_counter() - t0, 1),
    }
    update_artifact("layout", payload)
    log(json.dumps(payload, indent=1))


def phase_aot(topos=("v5e:2x4", "v5p:2x2x2")):
    from adaqp_tpu.utils.aot import aot_compile_train_step

    trainer = build_trainer()
    reports = []
    for topo in topos:
        t0 = time.perf_counter()
        try:
            rep = aot_compile_train_step(trainer, topo, want_text=True)
            total = rep.get("arg_bytes", 0) + rep.get("temp_bytes", 0)
            rep["hbm_bytes"] = HBM.get(topo)
            rep["fits_hbm"] = bool(total <= HBM.get(topo, 0))
            text = rep.pop("_text", "")
            if text:
                # keep the scheduled entry around for overlap forensics
                # (round-4 weak #3: v5p windows carried no local SpMM)
                path = f"{CACHE}/aot_{topo.replace(':', '_')}_sched.txt"
                with open(path, "w") as f:
                    f.write(text)
                rep["sched_dump"] = path
        except Exception as e:
            rep = {"ok": False, "topology": topo, "err": repr(e)[:800]}
        rep["compile_s"] = round(time.perf_counter() - t0, 1)
        reports.append(rep)
        log(json.dumps({k: v for k, v in rep.items() if k != "window_kernels"}))
    update_artifact("aot", reports)


def phase_pass(iters=5):
    """On-chip: one-chip strip pass at the products widths + quant/pack
    cost at the K=8 plan's max boundary size (mirrors
    scripts/ici_projection.py's measured-quant block)."""
    import jax.numpy as jnp

    from adaqp_tpu.ops.spmm_strip import run_strip, strip_layout

    assert jax.devices()[0].platform == "tpu", "--phase pass needs the chip"
    src, dst = products_edges()
    lay = strip_layout(src, dst, N, min_edges=192,
                       cache_key=f"{CACHE}/prod_u_{N}_stp_me192")
    dev = lay.to_device()
    rng = np.random.default_rng(0)
    pass_ms = {}
    for f in (128, 256):
        h = jnp.asarray(rng.normal(size=(lay.n_src_pad, f)).astype(np.float32)
                        ).astype(jnp.bfloat16)

        @jax.jit
        def loop(dev, h):
            def body(k, hh):  # chained: loop-invariant bodies get hoisted
                return hh + run_strip(dev, hh).astype(hh.dtype) * 1e-6

            return jax.lax.fori_loop(0, iters, body, h)[:8, :8]

        out = loop(dev, h)
        _ = float(jnp.asarray(out).astype(jnp.float32).sum())
        t0 = time.perf_counter()
        out = loop(dev, h)
        _ = float(jnp.asarray(out).astype(jnp.float32).sum())
        pass_ms[f] = (time.perf_counter() - t0) / iters * 1e3
        log(f"strip pass F={f}: {pass_ms[f]:.1f} ms")

    # quant + wire pack cost at the K=8 boundary (per-exchange, 8-bit)
    from adaqp_tpu.comm.wire import words_per_row
    from adaqp_tpu.graph.layout import load_layout
    from adaqp_tpu.ops.quant_pallas import dequantize_rows_tpu, quantize_rows_tpu

    lay8 = load_layout(_layout_cache_key())
    assert lay8 is not None, "run --phase layout first"
    s_rows = int(lay8.plan_fwd.counts.sum(axis=1).max())
    s_pad = -(-s_rows // 1024) * 1024
    reps = 10
    quant_s = 0.0
    quant_detail = {}
    for f_pad, f_true, n_ex in ((128, F, 1), (256, HIDDEN, 2 * LAYERS - 2)):
        x0 = jnp.asarray(rng.normal(size=(s_pad, f_pad)).astype(np.float32))

        @jax.jit
        def qloop(x, f_true=f_true):
            def body(i, x):
                q, sc, rm = quantize_rows_tpu(x, 8, i, f_true=f_true)
                return dequantize_rows_tpu(q, sc, rm)

            return jax.lax.fori_loop(0, reps, body, x)

        out = qloop(x0)
        _ = float(out.reshape(-1)[0])
        t0 = time.perf_counter()
        out = qloop(x0)
        _ = float(out.reshape(-1)[0])
        dt = (time.perf_counter() - t0) / reps

        wpr = words_per_row(f_true, 8)
        words = jnp.asarray(
            rng.integers(0, 2**31, (s_pad, wpr), dtype=np.int64).astype(np.uint32)
        )
        off = np.arange(s_pad, dtype=np.int32)
        np.random.default_rng(2).shuffle(off)
        off = jnp.asarray(off)

        @jax.jit
        def ploop(words, off):
            def body(i, carry):
                buf = (jnp.zeros((s_pad, wpr), jnp.uint32)
                       .at[off].set(words, mode="drop"))
                return carry + buf[off].sum(dtype=jnp.uint32)

            return jax.lax.fori_loop(0, reps, body,
                                     jnp.zeros((), jnp.uint32)).reshape(1)

        out = ploop(words, off)
        _ = float(out[0])
        t0 = time.perf_counter()
        out = ploop(words, off)
        _ = float(out[0])
        dp = (time.perf_counter() - t0) / reps
        quant_detail[f"{s_pad}x{f_pad}"] = {
            "quant_dequant_ms": round(dt * 1e3, 2),
            "pack_unpack_ms": round(dp * 1e3, 2),
            "exchanges": n_ex,
        }
        quant_s += (dt + dp) * n_ex
        log(f"[{s_pad}x{f_pad}] quant+dequant {dt*1e3:.2f} ms + pack "
            f"{dp*1e3:.2f} ms (x{n_ex})")
    payload = {
        "device": jax.devices()[0].device_kind,
        "strip_pass_ms": {str(k): round(v, 1) for k, v in pass_ms.items()},
        "quant_total_s": round(quant_s, 4),
        "quant_detail": quant_detail,
        "boundary_rows_max": s_rows,
    }
    update_artifact("pass", payload)


def _layout_cache_key():
    # must mirror Trainer.__init__'s layout cache naming
    return (f"{CACHE}/trainer_parts/prodsynth{N}u_{K}part_ldg_gcn_"
            f"pm2048_fm128_layout")


def phase_project():
    from adaqp_tpu.assigner.assignment import uniform_assignment
    from adaqp_tpu.comm.wire import wire_fp, wire_from_assignment
    from adaqp_tpu.graph.layout import load_layout

    with open(ARTIFACT) as f:
        art = json.load(f)
    pas = art.get("pass")
    assert pas, "run --phase pass on the chip first"
    pass_ms = {int(k): v for k, v in pas["strip_pass_ms"].items()}
    pb = art.get("packbench")

    lay = load_layout(_layout_cache_key())
    assert lay is not None, "run --phase layout first"
    plan = lay.plan_fwd
    dims = [F] + [HIDDEN] * (LAYERS - 1)
    fp = wire_fp(plan, dims, LAYERS)
    q8 = wire_from_assignment(plan, uniform_assignment(plan, LAYERS, 8), dims)

    def overhead_s(kind):
        """Per-step serial wire-compute overhead (quantize+pack+unpack,
        measured on the REAL pack path at this boundary — packbench seg
        form): 1 feature-width fwd exchange + L-1 hidden-width fwd ones +
        L-1 hidden-width BWD ones (scatter-add unpack — measured
        separately since round 5's fwd gather shortcut doesn't apply).
        The pack halves are charged to EVERY mode — fp rows ride the same
        machinery (round-4 fairness fix)."""
        if pb is None:
            return pas["quant_total_s"] if kind == "q8" else 0.0
        pre = "" if kind == "q8" else "fp_"
        bwd_ms = pb.get(f"{pre}F256bwd_seg_ms", pb[f"{pre}F256_seg_ms"])
        return (pb[f"{pre}F100_seg_ms"]
                + (LAYERS - 1) * pb[f"{pre}F256_seg_ms"]
                + (LAYERS - 1) * bwd_ms) / 1e3

    fp_ov = overhead_s("fp")
    q8_ov = overhead_s("q8")

    def chip_bytes(plans):
        out = []
        for fwd, bwd in plans:
            for d in (fwd, bwd):
                if d is not None:
                    out.append(np.asarray(d.send_sz).sum(axis=1) * 4.0)
        return out

    # hideable central (local-src) strip pass per chip per exchange —
    # grounded in the AOT schedule (every ragged window carries the local
    # SpMM custom-call; see this artifact's "aot" section)
    sent = lay.l_max
    local_e = (np.asarray(lay.fwd_local[1]) != sent).sum(axis=1).astype(float)
    halo_e = (np.asarray(lay.fwd_halo[1]) != sent).sum(axis=1).astype(float)
    frac = local_e / float(local_e.sum() + halo_e.sum())
    width = lambda f: 128 if f <= 128 else 256
    ws = [width(d) for d in dims] + [width(HIDDEN)] * (LAYERS - 1)
    central = np.stack([pass_ms[w] * frac for w in ws])  # [n_ex, K] ms

    comp = ONE_CHIP_EPOCH_S / K
    rows = []
    print(f"\nprojected K={K} products epoch (compute {comp*1e3:.0f} ms = "
          f"{ONE_CHIP_EPOCH_S}s / {K}, ideal):")
    print(f"{'link':14s} {'Vanilla':>9s} {'AdaQP-q8':>9s} {'AdaQP-p':>9s} "
          f"{'q8+p':>9s} {'q8':>7s} {'p':>7s} {'q8+p':>7s}")
    fp_b, q8_b = chip_bytes(fp), chip_bytes(q8)

    def unhidden(bufs, bw):
        return sum(
            float(np.max(np.maximum(0.0, b / bw - central[e] / 1e3)))
            for e, b in enumerate(bufs)
        )

    for link, bw in LINKS.items():
        t_v = comp + fp_ov + sum(float(b.max()) for b in fp_b) / bw
        t_q = comp + q8_ov + sum(float(b.max()) for b in q8_b) / bw
        t_p = comp + fp_ov + unhidden(fp_b, bw)
        t_qp = comp + q8_ov + unhidden(q8_b, bw)
        rows.append({
            "link": link, "vanilla_ms": round(t_v * 1e3),
            "adaqp_q8_ms": round(t_q * 1e3), "adaqp_p_ms": round(t_p * 1e3),
            "adaqp_q8p_ms": round(t_qp * 1e3),
            "speedup_q8": round(t_v / t_q, 2),
            "speedup_p": round(t_v / t_p, 2),
            "speedup_q8p": round(t_v / t_qp, 2),
        })
        print(f"{link:14s} {t_v*1e3:8.0f}ms {t_q*1e3:8.0f}ms "
              f"{t_p*1e3:8.0f}ms {t_qp*1e3:8.0f}ms "
              f"{t_v/t_q:6.2f}x {t_v/t_p:6.2f}x {t_v/t_qp:6.2f}x")
    egress = {
        "fp32_total_mb_step": round(sum(b.sum() for b in fp_b) / 1e6, 1),
        "q8_total_mb_step": round(sum(b.sum() for b in q8_b) / 1e6, 1),
    }
    update_artifact("projection", {
        "one_chip_epoch_s": ONE_CHIP_EPOCH_S, "egress": egress, "table": rows,
    })


def phase_packbench(iters=10):
    """On-chip: the REAL pack_dir/unpack_dir at products-scale boundary
    shapes, capped-segment (DUS) form vs row-granular form (round 4).
    Single-chip: times the compute halves only (the collective needs a
    mesh); shard 0 of the K=8 uniform-q8 exact wire."""
    import jax.numpy as jnp

    from adaqp_tpu.assigner.assignment import uniform_assignment
    from adaqp_tpu.comm import exchange_ragged as xr
    from adaqp_tpu.comm.wire import wire_from_assignment
    from adaqp_tpu.graph.layout import load_layout

    assert jax.devices()[0].platform == "tpu", "--phase packbench needs the chip"
    from adaqp_tpu.comm.wire import wire_fp

    lay = load_layout(_layout_cache_key())
    assert lay is not None, "run --phase layout first"
    plan = lay.plan_fwd
    dims = [F] + [HIDDEN] * (LAYERS - 1)
    wires = wire_from_assignment(
        plan, uniform_assignment(plan, LAYERS, 8), dims
    )
    fpw = wire_fp(plan, dims, LAYERS)
    report = {}
    # fwd wires (unpack = gather into fresh halo, unique destinations) and
    # the layer-1 BWD wire (unpack = scatter-ADD of returned cotangents
    # into local rows — duplicate destinations, the gather shortcut does
    # not apply; bwd exchanges are hidden-width only, layer 0 has no bwd)
    cases = [("F100", wires[0][0], False), ("F256", wires[1][0], False),
             ("F256bwd", wires[1][1], True),
             ("fp_F100", fpw[0][0], False), ("fp_F256", fpw[1][0], False),
             ("fp_F256bwd", fpw[1][1], True)]
    for label, w, is_bwd in cases:
        wl = jax.tree.map(lambda a: np.asarray(a)[0], w)
        rng = np.random.default_rng(0)
        f_pad = 128 if "F100" in label else 256
        f_true = F if "F100" in label else HIDDEN
        # bwd direction: source rows are halo slots, dst are local rows
        n_src = int(plan.r_pad if is_bwd else lay.l_max)
        out_len = int(lay.l_max if is_bwd else plan.r_pad)
        src = jnp.asarray(rng.normal(size=(n_src, f_pad)).astype(np.float32))
        recv = jnp.asarray(
            rng.integers(0, 2**10, int(wl.rb_cap), dtype=np.int64
                         ).astype(np.uint32)
        )
        key = jax.random.PRNGKey(0)
        wdev = jax.tree.map(jnp.asarray, wl)
        forms = (("seg", True),) if is_bwd else (("seg", True), ("row", False))
        for form, seg in forms:
            xr._FORCE_SEG = seg
            xr._FORCE_ROW_GRANULAR = None if seg else True

            @jax.jit
            def loop(src, recv, wdev):
                def body(i, carry):
                    buf = xr.pack_dir(wdev, src, jax.random.fold_in(key, i),
                                      f_true)
                    out = xr.unpack_dir(
                        wdev, recv + buf[0], out_len, is_bwd, f_true, f_pad,
                    )
                    return carry + out.sum(dtype=jnp.float32)

                return jax.lax.fori_loop(0, iters, body, jnp.zeros(()))

            out = loop(src, recv, wdev)
            _ = float(out)
            t0 = time.perf_counter()
            out = loop(src, recv, wdev)
            _ = float(out)
            dt = (time.perf_counter() - t0) / iters * 1e3
            report[f"{label}_{form}_ms"] = round(dt, 2)
            log(f"pack+unpack {label} {form}: {dt:.2f} ms")
        xr._FORCE_SEG = None
        xr._FORCE_ROW_GRANULAR = None
    update_artifact("packbench", report)


def phase_mixed():
    """The fp32-lanes capstone: on a realistic 2-host x 4-chip fabric
    (ICI within a host, one shared DCN NIC per host) run the ACTUAL
    adaptive MILP with bits_options=WIRE_BITS_SET and project the epoch of
    its mixed assignment against all-fp32 (Vanilla) and all-q8.

    Cost accounting is mode-fair here: every mode pays the wire pack
    (descriptor-bound, measured 32-40 ms/exchange — fp rows ride the same
    row-granular scatter), quantize+dequantize is charged by the fraction
    of lanes the assignment actually quantizes, and overlap credit applies
    to every mode (the schedule hides wire behind the local SpMM
    regardless of precision)."""
    from adaqp_tpu.assigner import Assigner, AssignerConfig
    from adaqp_tpu.comm.wire import wire_from_assignment
    from adaqp_tpu.common.types import WIRE_BITS_SET
    from adaqp_tpu.graph.layout import load_layout

    with open(ARTIFACT) as f:
        art = json.load(f)
    pas = art.get("pass")
    assert pas, "run --phase pass on the chip first"
    pass_ms = {int(k): v for k, v in pas["strip_pass_ms"].items()}
    pb = art.get("packbench")
    assert pb, "run --phase packbench on the chip first"
    # per-exchange wire-compute cost (ms), REAL pack path (seg form),
    # measured per wire precision AND direction (bwd unpack scatter-adds;
    # round 5's fwd gather shortcut doesn't apply there); a mixed
    # assignment interpolates by its quantized-lane fraction
    ov_q = {(128, False): pb["F100_seg_ms"], (256, False): pb["F256_seg_ms"],
            (256, True): pb.get("F256bwd_seg_ms", pb["F256_seg_ms"])}
    ov_fp = {(128, False): pb["fp_F100_seg_ms"],
             (256, False): pb["fp_F256_seg_ms"],
             (256, True): pb.get("fp_F256bwd_seg_ms", pb["fp_F256_seg_ms"])}

    lay = load_layout(_layout_cache_key())
    assert lay is not None, "run --phase layout first"
    plan = lay.plan_fwd
    dims = [F] + [HIDDEN] * (LAYERS - 1)

    # ---- fabric: chips 0-3 host A, 4-7 host B ----
    ici_bw, dcn_bw = 45e9, 12.5e9
    host = np.arange(K) // 4
    same = host[:, None] == host[None, :]
    alpha = np.where(same, 1.0 / 45.0, 1.0 / 12.5)  # ms per MB
    np.fill_diagonal(alpha, 0.0)
    beta = np.full((K, K), 0.01)
    np.fill_diagonal(beta, 0.0)

    # ---- the real MILP on REAL variance traces (round-4 VERDICT weak
    # #4: rng.uniform noise demoed nothing about the adaptive scheme).
    # scripts/accuracy_parity.py --scale (ADAQP_DUMP_TRACES=...) exports
    # the per-lane fwd/bwd variance accumulators of an actual adaptive
    # training on the 131K-node homophily R-MAT; the products-plan lanes
    # are BOOTSTRAP-RESAMPLED per layer from those empirical
    # distributions (the products graph itself is synthetic, so per-lane
    # identity is meaningless — the distributionally-real heavy tails and
    # per-layer scales are what the MILP actually ranks on).
    rng = np.random.default_rng(0)
    trace_src = "rng.uniform (fallback: no trace export found)"
    tr_path = "data/traces_scaled_r5.npz"
    if os.path.exists(tr_path):
        z = np.load(tr_path)
        tf, tb = z["tf"], z["tb"]  # [L,K,K,S], [L,K,R]
        cts, nrm = z["counts"], z["num_remote"]
        ks = tf.shape[1]
        fwd_tr = np.empty((LAYERS,) + plan.send_idx.shape, np.float32)
        bwd_tr = np.empty((LAYERS, K, plan.r_pad), np.float32)
        all_f = np.concatenate([
            tf[l_, s, r, : cts[s, r]] for l_ in range(tf.shape[0])
            for s in range(ks) for r in range(ks) if cts[s, r]])
        all_b = np.concatenate([
            tb[l_, s, : nrm[s]] for l_ in range(tb.shape[0])
            for s in range(ks)])
        all_f, all_b = all_f[all_f > 0], all_b[all_b > 0]
        for l in range(LAYERS):
            lsrc = min(l, tf.shape[0] - 1)
            pool_f = np.concatenate([
                tf[lsrc, s, r, : cts[s, r]]
                for s in range(ks) for r in range(ks) if cts[s, r]
            ])
            pool_b = np.concatenate(
                [tb[lsrc, s, : nrm[s]] for s in range(ks)])
            pool_f = pool_f[pool_f > 0]
            pool_b = pool_b[pool_b > 0]
            # layer 0 has no bwd wire, so its bwd trace is all-zero:
            # fall back to the union pool
            if len(pool_f) == 0:
                pool_f = all_f
            if len(pool_b) == 0:
                pool_b = all_b
            fwd_tr[l] = rng.choice(pool_f, size=plan.send_idx.shape)
            bwd_tr[l] = rng.choice(pool_b, size=(K, plan.r_pad))
        trace_src = (f"bootstrap-resampled from {tr_path} "
                     f"(real adaptive run, union pools "
                     f"{len(all_f)}/{len(all_b)})")
        log(f"traces: {trace_src}")
    else:
        fwd_tr = rng.uniform(
            0.1, 1.0, (LAYERS,) + plan.send_idx.shape).astype(np.float32)
        bwd_tr = rng.uniform(
            0.1, 1.0, (LAYERS, K, plan.r_pad)).astype(np.float32)
        log("traces: UNIFORM FALLBACK (run accuracy_parity.py --scale "
            "with ADAQP_DUMP_TRACES first)")
    acfg = AssignerConfig(group_size=2000, coe_lambda=0.5, wire_feats=F,
                          bits_options=WIRE_BITS_SET)
    t0 = time.perf_counter()
    asg = Assigner(plan, LAYERS, acfg, cost_model=(alpha, beta)).assign(
        fwd_tr, bwd_tr
    )
    solve_s = time.perf_counter() - t0

    def lane_stats(a_fwd):
        ici_bits, dcn_bits, n_q, n_tot = [], [], 0, 0
        for layer in range(LAYERS):
            for s in range(K):
                for r in range(K):
                    cnt = int(plan.counts[s, r])
                    if s == r or cnt == 0:
                        continue
                    v = a_fwd[layer][s, r, :cnt].astype(np.float64)
                    (ici_bits if same[s, r] else dcn_bits).append(v.mean())
                    n_q += int((v < 32).sum())
                    n_tot += cnt
        return np.mean(ici_bits), np.mean(dcn_bits), n_q / n_tot

    mean_ici, mean_dcn, q_frac = lane_stats(asg.fwd)
    log(f"MILP ({solve_s:.1f}s): mean bits ICI={mean_ici:.1f} "
        f"DCN={mean_dcn:.1f}, quantized lane fraction {q_frac:.2f}")

    # ---- wires for the three policies ----
    from adaqp_tpu.assigner.assignment import uniform_assignment

    wires = {
        "Vanilla fp32": wire_from_assignment(
            plan, uniform_assignment(plan, LAYERS, 32), dims,
            bits_set=WIRE_BITS_SET),
        "all-q8": wire_from_assignment(
            plan, uniform_assignment(plan, LAYERS, 8), dims,
            bits_set=WIRE_BITS_SET),
        "MILP mixed": wire_from_assignment(plan, asg, dims,
                                           bits_set=WIRE_BITS_SET),
    }
    qfracs = {"Vanilla fp32": 0.0, "all-q8": 1.0, "MILP mixed": q_frac}

    # hideable local SpMM per chip per exchange (as in phase_project)
    sent = lay.l_max
    local_e = (np.asarray(lay.fwd_local[1]) != sent).sum(axis=1).astype(float)
    halo_e = (np.asarray(lay.fwd_halo[1]) != sent).sum(axis=1).astype(float)
    frac = local_e / float(local_e.sum() + halo_e.sum())
    width = lambda f: 128 if f <= 128 else 256
    ws = [width(d) for d in dims] + [width(HIDDEN)] * (LAYERS - 1)
    central = np.stack([pass_ms[w] * frac for w in ws])  # [n_ex, K] ms

    comp = ONE_CHIP_EPOCH_S / K
    rows = []
    print(f"\nmixed-fabric (2 hosts x 4 chips; ICI {ici_bw/1e9:.0f} GB/s "
          f"intra, shared {dcn_bw/1e9:.1f} GB/s DCN NIC/host) projected "
          f"epoch; compute {comp*1e3:.0f} ms; pack charged to every mode:")
    for name, plans in wires.items():
        qf = qfracs[name]
        # per-exchange pair-byte matrices
        t_wire = 0.0
        ex = 0
        extra = 0.0
        for fwd, bwd in plans:
            for d, is_bwd in ((fwd, False), (bwd, True)):
                if d is None:
                    continue
                b = np.asarray(d.send_sz, np.float64) * 4.0
                ici_t = (b * same).sum(axis=1) / ici_bw        # [K] s
                dcn_per_host = np.array([
                    b[host == h][:, host != h].sum() for h in range(2)
                ]) / dcn_bw
                # exchange wall-clock per chip = its ICI egress + its
                # host's shared-NIC DCN time; overlap hides up to the
                # chip's local-SpMM time
                per_chip = ici_t + dcn_per_host[host]
                t_wire += float(np.max(np.maximum(
                    0.0, per_chip - central[ex] / 1e3)))
                w_e = 128 if ex == 0 else 256
                key_e = (w_e, is_bwd)
                extra += (qf * ov_q[key_e] + (1 - qf) * ov_fp[key_e]) / 1e3
                ex += 1
        t = comp + extra + t_wire
        rows.append({"policy": name, "epoch_ms": round(t * 1e3),
                     "overhead_ms": round(extra * 1e3)})
        print(f"  {name:14s} {t*1e3:7.0f} ms (quant+pack {extra*1e3:.0f} ms)")
    base = rows[0]["epoch_ms"]
    for r in rows:
        r["speedup_vs_vanilla"] = round(base / r["epoch_ms"], 2)
    print("speedups vs Vanilla:",
          {r["policy"]: r["speedup_vs_vanilla"] for r in rows[1:]})
    update_artifact("mixed_fabric", {
        "fabric": "2 hosts x 4 chips; ICI 45 GB/s; shared 12.5 GB/s DCN NIC",
        "traces": trace_src,
        "milp_solve_s": round(solve_s, 1),
        "mean_bits_ici": round(float(mean_ici), 2),
        "mean_bits_dcn": round(float(mean_dcn), 2),
        "quantized_lane_frac": round(float(q_frac), 3),
        "table": rows,
    })


def phase_reassign():
    """Round-4 VERDICT weak #6: the 'near-free reassignment' claim was
    proven at 60K-node scale only. Times the FULL host-side reassignment
    pipeline at the K=8 products boundary (what the trainer pays each
    assign_cycle): MILP solve + wire lowering (``wire_from_assignment``
    over every layer/direction) with static_shapes off AND on, plus the
    host->device upload size. The reference re-all-gathers layouts and
    rebuilds torch buffers each cycle instead
    (``AdaQP/communicator/buffer.py:176-248``)."""
    from adaqp_tpu.assigner import Assigner, AssignerConfig
    from adaqp_tpu.assigner.assignment import uniform_assignment
    from adaqp_tpu.comm.wire import wire_from_assignment
    from adaqp_tpu.graph.layout import load_layout

    lay = load_layout(_layout_cache_key())
    assert lay is not None, "run --phase layout first"
    plan = lay.plan_fwd
    dims = [F] + [HIDDEN] * (LAYERS - 1)
    rng = np.random.default_rng(0)
    fwd_tr = rng.uniform(0.1, 1.0, (LAYERS,) + plan.send_idx.shape).astype(np.float32)
    bwd_tr = rng.uniform(0.1, 1.0, (LAYERS, K, plan.r_pad)).astype(np.float32)
    acfg = AssignerConfig(group_size=2000, coe_lambda=0.5, wire_feats=F)
    t0 = time.perf_counter()
    asg = Assigner(plan, LAYERS, acfg).assign(fwd_tr, bwd_tr)
    solve_s = time.perf_counter() - t0
    log(f"MILP solve: {solve_s:.1f}s")
    payload = {"milp_solve_s": round(solve_s, 1)}
    for label, a in (("uniform_q8", uniform_assignment(plan, LAYERS, 8)),
                     ("milp_mixed", asg)):
        for ss in (False, True):
            t0 = time.perf_counter()
            wires = wire_from_assignment(plan, a, dims, static_shapes=ss)
            dt = time.perf_counter() - t0
            nbytes = sum(
                arr.nbytes for fwd, bwd in wires for d in (fwd, bwd)
                if d is not None
                for arr in jax.tree.leaves(d) if hasattr(arr, "nbytes")
            )
            key = f"lower_{label}_{'static' if ss else 'exact'}"
            payload[key + "_s"] = round(dt, 1)
            payload[key + "_mb"] = round(nbytes / 1e6, 1)
            log(f"wire lowering {label} static={ss}: {dt:.1f}s, "
                f"{nbytes / 1e6:.0f} MB metadata")
            if jax.devices()[0].platform == "tpu" and not ss:
                t0 = time.perf_counter()
                dev = jax.device_put(jax.tree.leaves(wires[0][0]))
                jax.block_until_ready(dev)
                payload[f"upload_{label}_layer0_s"] = round(
                    time.perf_counter() - t0, 2)
    update_artifact("reassign", payload)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", required=True,
                    choices=["layout", "aot", "pass", "project", "mixed",
                             "packbench", "reassign"])
    args = ap.parse_args()
    if args.phase not in ("pass", "packbench", "reassign"):
        # layout/aot/project/mixed are host-side; never touch the tunnel
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
    {"layout": phase_layout, "aot": phase_aot, "pass": phase_pass,
     "project": phase_project, "mixed": phase_mixed,
     "packbench": phase_packbench, "reassign": phase_reassign}[args.phase]()


if __name__ == "__main__":
    main()
