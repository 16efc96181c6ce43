"""Two-process multi-host test: spawns 2 worker processes that form one
8-device global CPU mesh via ``jax.distributed.initialize`` and run
cross-process reductions (``tests/mh_worker.py``).

This exercises the path ``dfq_tpu/parallel/multihost.py`` wraps —
coordinator handshake, ``make_array_from_process_local_data`` with
non-addressable devices, GSPMD cross-process psum — which the
single-process tests (``test_parallel.py``) cannot reach.  The reference
has no multi-node anything (SURVEY.md §2.9); this is the new
capability's integration test.
"""

import os
import socket
import subprocess
import sys


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_global_reduction():
    nproc = 2
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "mh_worker.py")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own 4-device split
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(rank), str(nproc), str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            env=env,
        )
        for rank in range(nproc)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(out)

    # every worker observed the same GLOBAL reduction over both hosts'
    # shards: sum = (1+2) * 4 rows * 3 cols = 36; correct = 8 - 2 planted
    # wrong rows = 6 of 8
    for rank, out in enumerate(outs):
        line = [l for l in out.splitlines() if l.startswith("RESULT")][-1]
        _, r, total, correct, n = line.split()
        assert int(r) == rank
        assert float(total) == 36.0, line
        assert int(correct) == 6 and int(n) == 8, line
