"""Persistent-cache policy: never persist XLA:CPU executables.

Replaying a serialized XLA:CPU executable emits cpu_aot_loader.cc's
false-positive machine-feature error ("+prefer-no-gather is not supported
on the host machine ... SIGILL") on the SAME host that compiled it — XLA
embeds LLVM tuning pseudo-features the runtime host check never reports —
and buys no suite time (round-3 VERDICT weak #6; measurements in the
module doc of ``adaqp_tpu/utils/compilation_cache.py``).
"""
import jax

from adaqp_tpu.utils import compilation_cache as cc


def test_cpu_only_detection():
    # parsing, not backend state: declared-platform strings decide
    assert cc._cpu_only("cpu")
    assert cc._cpu_only("CPU")
    assert not cc._cpu_only("axon")
    assert not cc._cpu_only("tpu")
    assert not cc._cpu_only("cpu,axon")
    assert not cc._cpu_only("")  # auto-detect may pick a TPU


def test_suite_process_has_no_cache_dir():
    # conftest declares jax_platforms=cpu then calls
    # enable_compilation_cache(): it must have stayed a no-op, so no
    # XLA:CPU executable of this suite ever hits the on-disk cache
    assert cc._cpu_only()
    assert jax.config.jax_compilation_cache_dir in (None, "")


def test_forced_cache_partitions_per_host(tmp_path, monkeypatch):
    # ADAQP_JAX_CACHE is an explicit opt-in that overrides the CPU-only
    # policy and still partitions by host CPU feature set
    monkeypatch.setenv("ADAQP_JAX_CACHE", str(tmp_path))
    try:
        cc.enable_compilation_cache()
        got = jax.config.jax_compilation_cache_dir
        assert got and got.startswith(str(tmp_path))
        assert got.endswith(f"host-{cc._host_key()}")
    finally:
        jax.config.update("jax_compilation_cache_dir", None)


def test_off_disables_everywhere(tmp_path, monkeypatch):
    monkeypatch.setenv("ADAQP_JAX_CACHE", "off")
    cc.enable_compilation_cache(str(tmp_path))
    assert jax.config.jax_compilation_cache_dir in (None, "")
