"""Two-process jax.distributed test: the multi-host (DCN) stand-in.

The reference never crosses a process boundary (bellman's parallelism is
an in-process thread pool — SURVEY.md §2.4/§2.5); the TPU-native design
shards over a global mesh where some axis hops hosts. This test runs the
distributed NTT + MSM (parallel/{ntt,msm}.py) over a mesh spanning TWO
OS processes (4 virtual CPU devices each), so every ppermute crosses the
process boundary through jax.distributed's cross-process transport — the
same code path a real (hosts x chips) DCN mesh exercises.

Opt-in (spawns processes + cold XLA compiles):
    FAWKES_MULTIPROC=1 python -m pytest tests/test_multiprocess.py -x -q
"""

import json
import os
import socket
import subprocess
import sys

import pytest

multiproc = pytest.mark.skipif(
    os.environ.get("FAWKES_MULTIPROC", "") in ("", "0"),
    reason="set FAWKES_MULTIPROC=1 to run the 2-process DCN-standin test",
)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@multiproc
def test_two_process_ntt_and_msm(tmp_path):
    coord = f"localhost:{_free_port()}"
    out = str(tmp_path / "rank0.json")
    worker = os.path.join(os.path.dirname(__file__), "multiproc_worker.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    procs = [
        subprocess.Popen(
            [sys.executable, worker, coord, "2", str(pid), out], env=env)
        for pid in range(2)
    ]
    rcs = [p.wait(timeout=3600) for p in procs]
    assert rcs == [0, 0], f"worker exit codes {rcs}"
    with open(out) as f:
        results = json.load(f)
    assert results == {
        "ntt_roundtrip": True,
        "ntt_matches_single": True,
        "msm_matches_host": True,
    }, results
