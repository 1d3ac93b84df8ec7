"""Multi-host simulation test (SURVEY §4: multi-host tests runnable on
CPU via --xla_force_host_platform_device_count + jax.distributed).

Spawns 2 worker processes, each owning 2 virtual CPU devices; they form
a 4-device global mesh, run one sharded batched RTI solve, and psum the
failure count across hosts. Asserts both workers see the same replicated
global count and that it equals the sum of their local counts."""

import os
import re
import socket
import subprocess
import sys

WORKER = os.path.join(os.path.dirname(__file__), "_multihost_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_sharded_solve():
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen([sys.executable, WORKER, str(i), coord],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         env=env, text=True)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-3000:]}"

    results = {}
    for out in outs:
        m = re.search(r"RESULT proc=(\d+) local=(\d+) global=(\d+)", out)
        assert m, f"no RESULT line in:\n{out[-2000:]}"
        results[int(m.group(1))] = (int(m.group(2)), int(m.group(3)))
    assert set(results) == {0, 1}
    g0, g1 = results[0][1], results[1][1]
    assert g0 == g1, "replicated global count differs across hosts"
    assert g0 == results[0][0] + results[1][0], \
        "psum'd global count != sum of local counts"
