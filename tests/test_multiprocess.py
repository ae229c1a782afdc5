"""Multi-process (multi-controller) distributed FFT test.

The reference offers no prior art here (SURVEY §4: "multi-host tests will
additionally need a fake/multi-process JAX mesh"); this spawns two
separate Python processes, each owning 2 virtual CPU devices, joined via
``jax.distributed.initialize`` with Gloo cross-process collectives — so
the all_to_all transposes of the distributed four-step actually cross a
process boundary, like they cross hosts on a real multi-host TPU pod.
"""

import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.multidevice
def test_two_process_distributed_fft():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "tests", "mp_worker.py")
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, coord, str(p), "2"],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for p in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]
        assert "OK" in out
