"""Multi-host helpers: prediction gather + main-process gating.

The reference gathers per-rank predictions with torch.distributed
(`comm.synchronize(); comm.gather(..., dst=0)` —
`evaluation/arti_evaluation.py:193-200`).  The JAX equivalent uses
`jax.experimental.multihost_utils`; on a single process these are no-ops so
the evaluators work unchanged in tests and single-host runs.
"""

from __future__ import annotations

import itertools
import pickle
from typing import List

import jax
import numpy as np


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
