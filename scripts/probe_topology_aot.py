"""Probe: can this environment AOT-compile for a multi-chip TPU topology?

VERDICT r2 missing #1: the K>1 exchange path (lax.ragged_all_to_all under
shard_map) has zero TPU-backend lowering coverage. If the PJRT topology API
works through the axon plugin, we can compile the full quantized train step
for a 4-chip v5e mesh without owning 4 chips.

Tries, in order:
  1. jax.experimental.topologies.get_topology_desc for a v5e 2x2 slice
  2. compiling a trivial shard_map(psum) for that topology
  3. compiling a lax.ragged_all_to_all for that topology
Prints PROBE_RESULT <json> on the last line.
"""
import json
import traceback

result = {"topology": None, "psum_compile": None, "ragged_compile": None}


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    topo = None
    # --- 1: topology descriptor ---
    for name in ("v5e:2x2", "v5litepod-4", "v5e-4"):
        try:
            from jax.experimental import topologies as jtop
            topo = jtop.get_topology_desc(
                platform="tpu", topology_name=name
            )
            result["topology"] = {"ok": True, "name": name,
                                  "ndev": len(topo.devices)}
            break
        except Exception as e:  # noqa
            result["topology"] = {"ok": False, "name": name,
                                  "err": repr(e)[:500]}
    if topo is None:
        # Some plugins expose make_pjrt_topology via the backend itself.
        try:
            import jax._src.xla_bridge as xb
            client = xb.get_backend()
            result["backend_attrs"] = [a for a in dir(client) if "topo" in a.lower()]
        except Exception:
            pass
        return

    devices = topo.devices
    from jax.sharding import Mesh, PartitionSpec as P
    from jax.experimental.shard_map import shard_map
    mesh = Mesh(np.array(devices), ("part",))

    # --- 2: trivial psum compile ---
    try:
        def f(x):
            return jax.lax.psum(x, "part")

        sf = shard_map(f, mesh=mesh, in_specs=P("part"), out_specs=P())
        lowered = jax.jit(sf).lower(
            jax.ShapeDtypeStruct((4, 128), jnp.float32))
        compiled = lowered.compile()
        result["psum_compile"] = {"ok": True}
    except Exception as e:
        result["psum_compile"] = {"ok": False, "err": repr(e)[:800],
                                  "tb": traceback.format_exc()[-1000:]}
        return

    # --- 3: ragged_all_to_all compile ---
    try:
        K = len(devices)

        def g(x, out, in_off, out_off, sizes, rsizes):
            return jax.lax.ragged_all_to_all(
                x[0], out[0], in_off[0], sizes[0], out_off[0], rsizes[0],
                axis_name="part")[None]

        sg = shard_map(
            g, mesh=mesh,
            in_specs=(P("part"), P("part"), P("part"), P("part"),
                      P("part"), P("part")),
            out_specs=P("part"))
        args = (
            jax.ShapeDtypeStruct((K, 64, 128), jnp.float32),
            jax.ShapeDtypeStruct((K, 64, 128), jnp.float32),
            jax.ShapeDtypeStruct((K, K), jnp.int32),
            jax.ShapeDtypeStruct((K, K), jnp.int32),
            jax.ShapeDtypeStruct((K, K), jnp.int32),
            jax.ShapeDtypeStruct((K, K), jnp.int32),
        )
        lowered = jax.jit(sg).lower(*args)
        compiled = lowered.compile()
        txt = compiled.as_text() or ""
        result["ragged_compile"] = {
            "ok": True,
            "has_ragged": "ragged-all-to-all" in txt,
        }
    except Exception as e:
        result["ragged_compile"] = {"ok": False, "err": repr(e)[:800],
                                    "tb": traceback.format_exc()[-1500:]}


if __name__ == "__main__":
    try:
        main()
    except Exception:
        result["fatal"] = traceback.format_exc()[-1500:]
    print("PROBE_RESULT " + json.dumps(result))
