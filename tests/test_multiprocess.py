"""Real 2-process jax.distributed test over localhost (VERDICT r1 item 5)
— the virtual 8-device mesh cannot exercise cross-process code paths
(process_count stays 1), so this launches two actual processes."""

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


@pytest.mark.timeout(700)
def test_two_process_distributed():
    worker = os.path.join(os.path.dirname(__file__), "two_proc_worker.py")
    coord = f"127.0.0.1:{_free_port()}"
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    procs = [
        subprocess.Popen([sys.executable, worker, str(i), coord],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         cwd=os.path.dirname(os.path.dirname(worker)),
                         env=env, text=True)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            # Cold-cache compile of two concurrent workers takes ~180 s
            # ALONE on a 1-core host; any contention (parallel pytest,
            # a chip bench) pushed a 240 s limit into flaky territory.
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-4000:]}"
        assert f"proc {i}: OK" in out, out[-4000:]
