"""Two-process jax.distributed smoke test (CPU, localhost coordinator).

Covers the multi-host bootstrap path (runtime.init_distributed + CLI
--coordinator/--num-hosts/--host-id plumbing) that round-1 VERDICT item 9
flagged as zero-coverage: two OS processes, one CPU device each, form a
global 2-device mesh and run the sharded sumcheck round with a
cross-process psum, checked against host arithmetic in the worker.
"""

import os
import socket
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_psum_round():
    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["OTTI_ISOLATED_CHILD"] = "1"
    procs = [
        subprocess.Popen(
            [
                sys.executable,
                os.path.join(HERE, "distributed_worker.py"),
                str(i),
                str(port),
            ],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out, err))
    for i, (rc, out, err) in enumerate(outs):
        assert rc == 0, (
            f"worker {i} rc={rc}\n--- stdout ---\n{out[-3000:]}"
            f"\n--- stderr ---\n{err[-2000:]}"
        )
        assert "DISTOK" in out
