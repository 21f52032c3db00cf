"""Multi-host helpers: prediction gather + main-process gating.

The reference gathers per-rank predictions with torch.distributed
(`comm.synchronize(); comm.gather(..., dst=0)` —
`evaluation/arti_evaluation.py:193-200`).  The JAX equivalent uses
`jax.experimental.multihost_utils`; on a single process these are no-ops so
the evaluators work unchanged in tests and single-host runs.
"""

from __future__ import annotations

import itertools
import os
import pickle
from typing import List, Optional

import jax
import numpy as np


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Multi-host (DCN) runtime init — the launch-contract analog of the
    reference's d2 ``launch(main, num_gpus, num_machines, machine_rank,
    dist_url)`` (`tools/train_net.py:107-117`), minus the process fork: one
    process per host, devices per host discovered by the backend.

    Arguments fall back to the standard env vars
    (``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` /
    ``JAX_PROCESS_ID``); with no explicit args and no env vars set this is a
    no-op (single-host run).  Call before any other jax API touches the
    backend.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if coordinator_address is None:
        return                                   # single-host: nothing to do
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def is_main_process() -> bool:
    return jax.process_index() == 0


def process_count() -> int:
    return jax.process_count()


def gather_predictions(predictions: List) -> List:
    """All-gather arbitrary picklable per-host prediction lists to host 0."""
    if jax.process_count() == 1:
        return list(predictions)
    from jax.experimental import multihost_utils

    payload = np.frombuffer(pickle.dumps(predictions), dtype=np.uint8)
    sizes = multihost_utils.process_allgather(np.array([payload.size]))
    max_size = int(sizes.max())
    padded = np.zeros(max_size, np.uint8)
    padded[:payload.size] = payload
    gathered = multihost_utils.process_allgather(padded)
    out = []
    for row, size in zip(gathered, sizes[:, 0]):
        out.append(pickle.loads(row[:int(size)].tobytes()))
    return list(itertools.chain(*out))
