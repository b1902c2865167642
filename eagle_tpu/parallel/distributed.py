"""Multi-host runtime — jax.distributed replaces torch.distributed/NCCL.

The reference's multi-process story is accelerate/DeepSpeed launchers +
NCCL for training and ray RPC for eval sharding (SURVEY.md §2.4). The
TPU-native equivalent: every host calls `initialize()` once; a single
global Mesh spans the pod slice; all communication is XLA collectives over
ICI/DCN emitted from sharding constraints. Helpers here cover process
bootstrap, global-mesh construction with DCN×ICI axis split, and per-host
data sharding for eval/training input pipelines.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Bootstrap the multi-host runtime (idempotent, no-op single-host).

    On Cloud TPU pods the arguments are auto-detected from the metadata
    server; explicit values support arbitrary clusters (mirrors
    deepspeed/accelerate env-var launch, train/ds_config.json usage).
    """
    if num_processes is None:
        num_processes = int(os.environ.get("EAGLE_TPU_NUM_PROCESSES", "1"))
    if num_processes <= 1 and coordinator_address is None:
        return  # single host
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_mesh(ici_model: Optional[int] = None,
                dcn_data: Optional[int] = None) -> Mesh:
    """Mesh over all hosts: "model" (TP) inside a slice over ICI, "data"
    (DP) across slices over DCN — collectives ride the fast fabric
    (SURVEY.md §2.4 layout).
    """
    devices = jax.devices()
    n_local = jax.local_device_count()
    n_hosts = max(1, len(devices) // n_local)
    if ici_model is None:
        ici_model = n_local
    if dcn_data is None:
        dcn_data = len(devices) // ici_model
    assert dcn_data * ici_model == len(devices)
    arr = np.asarray(devices).reshape(dcn_data, ici_model)
    del n_hosts
    return Mesh(arr, ("data", "model"))


def process_shard(items: Sequence, process_id: Optional[int] = None,
                  num_processes: Optional[int] = None) -> list:
    """Shard a work list across hosts (the ray question-sharding analog,
    evaluation/gen_ea_answer_llama3chat.py:56-86)."""
    pid = jax.process_index() if process_id is None else process_id
    n = jax.process_count() if num_processes is None else num_processes
    return list(items)[pid::n]
