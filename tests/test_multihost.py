"""2-process multi-host integration: `init_distributed` + prediction gather.

The reference's distributed-eval contract is `comm.synchronize();
comm.gather(predictions, dst=0)` over torch.distributed
(`evaluation/arti_evaluation.py:193-200`).  This spawns two REAL processes
joined by `jax.distributed.initialize` over a localhost coordinator (DCN
analog) and checks `gather_predictions` merges both hosts' lists.
"""

import os
import socket
import subprocess
import sys

_WORKER = r"""
import os, sys
sys.path.insert(0, {repo!r})
from articulation3d_tpu.parallel import (gather_predictions, init_distributed,
                                         is_main_process, process_count)

init_distributed()  # picks up JAX_COORDINATOR_ADDRESS / _NUM_PROCESSES / _ID
import jax
rank = jax.process_index()
assert process_count() == 2, process_count()
assert is_main_process() == (rank == 0)

mine = [{{"rank": rank, "items": list(range(rank * 3, rank * 3 + 3))}}]
merged = gather_predictions(mine)
assert [m["rank"] for m in merged] == [0, 1], merged
assert merged[0]["items"] == [0, 1, 2] and merged[1]["items"] == [3, 4, 5]
print(f"worker {{rank}}: ok", flush=True)
"""


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_gather(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    port = _free_port()
    procs = []
    for rank in range(2):
        env = dict(os.environ)
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env["JAX_PLATFORMS"] = "cpu"
        env["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
        env["JAX_NUM_PROCESSES"] = "2"
        env["JAX_PROCESS_ID"] = str(rank)
        # fresh single-device CPU processes; drop the 8-virtual-device flag
        env["XLA_FLAGS"] = ""
        procs.append(subprocess.Popen(
            [sys.executable, "-c", _WORKER.format(repo=repo)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, cwd=str(tmp_path)))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=180)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {rank} failed:\n{out}"
        assert f"worker {rank}: ok" in out, out
