"""Multi-host initialization: pods over DCN, chips over ICI.

The reference is strictly single-process (SURVEY.md section 2.4: its only
"communication" is shared-memory atomics); multi-host is this framework's
extension.  The pattern is standard jax.distributed: every host calls
`initialize()`, builds ONE global mesh over jax.devices() (all hosts'
chips), and runs the same shard_map program -- row shards land on local
chips, the psums for ray counts and parameter gradients ride ICI within a
slice and DCN across slices.

Host-local data handling: render_frame_sharded returns a globally-sharded
image; use `host_local_slice` to get this host's rows, or
jax.experimental.multihost_utils.process_allgather for a full copy.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np

from .mesh import ROWS_AXIS, make_mesh


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Initialize jax.distributed (no-op on single process).

    On TPU pods the arguments are auto-detected from the environment;
    pass them explicitly only for manual CPU/GPU clusters
    (reference point for the driver: jax.distributed.initialize docs)."""
    if num_processes is not None and num_processes <= 1:
        return
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def make_global_mesh(axis: str = ROWS_AXIS):
    """1-D mesh over every chip of every host (call after initialize())."""
    return make_mesh(jax.devices(), axis)


def host_local_slice(global_image) -> np.ndarray:
    """Rows of a row-sharded global image that live on THIS host's chips,
    concatenated in row order (for host-local display/IO)."""
    shards = [
        (s.index[0].start or 0, np.asarray(s.data))
        for s in global_image.addressable_shards
    ]
    shards.sort(key=lambda t: t[0])
    return np.concatenate([d for _, d in shards], axis=0)
