"""Device-mesh helpers.

The framework's parallel axes for this workload are:
  * "data" — independent tracks (the library-scan axis; pure DP, no
    communication beyond the final gather of per-track scalars)
  * "seq"  — the time axis *within* a track (for very long files), with
    exact filter-state handoff across shards (the CP/SP analog; see
    parallel/seqshard.py)

There is no tensor/pipeline/expert parallelism because the workload has
no weight matrices, layers, or experts to shard — the reference is an
audio analyzer (see SURVEY.md §2 checklist).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, seq: int = 1,
              devices=None) -> Mesh:
    """Mesh over (data, seq). `seq` divides n_devices; data = n / seq."""
    if devices is None:
        devices = jax.devices()[: n_devices or len(jax.devices())]
    n = len(devices)
    if n % seq != 0:
        raise ValueError(f"seq={seq} must divide device count {n}")
    arr = np.asarray(devices).reshape(n // seq, seq)
    return Mesh(arr, ("data", "seq"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard a (B, C, N) track batch over the data axis."""
    return NamedSharding(mesh, P("data", None, None))


def seq_sharding(mesh: Mesh) -> NamedSharding:
    """Shard a (B, C, N) track batch over both data and time axes."""
    return NamedSharding(mesh, P("data", None, "seq"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# --- multi-host (DCN) --------------------------------------------------------
#
# The one workload axis that spans hosts is the library-scan batch: tracks
# are independent, so the data axis rides DCN with zero inter-track
# communication, while the seq axis (which carries the IIR state handoff
# and gating collectives, parallel/seqshard.py) stays inside a host on ICI.

def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Join (or start) a multi-host run. With no arguments, defers to the
    cluster environment (TPU pod metadata / env vars), which is the normal
    production path; explicit args serve tests and bare-metal setups."""
    if coordinator is None:
        jax.distributed.initialize()
    else:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )


def make_multihost_mesh(seq: int = 1) -> Mesh:
    """Mesh over every process's devices: (data, seq) with the seq axis
    confined to one process — jax.devices() orders devices by process, so
    slicing consecutive groups of `seq` keeps the state-handoff
    collectives on ICI and only the embarrassingly-parallel data axis on
    DCN. Requires seq to divide the per-process device count."""
    devices = jax.devices()
    local = jax.local_device_count()
    if seq > local or local % seq != 0:
        raise ValueError(
            f"seq={seq} must divide the per-process device count {local}"
        )
    arr = np.asarray(devices).reshape(len(devices) // seq, seq)
    return Mesh(arr, ("data", "seq"))


def global_batch(mesh: Mesh, local_tracks: np.ndarray,
                 local_n_valid: np.ndarray):
    """Assemble the global (B, C, N) batch from each process's local
    tracks. Every process passes ITS OWN tracks; the result is a global
    jax.Array usable under jit with this mesh's shardings."""
    import jax.numpy as jnp  # noqa: F401

    xs = jax.make_array_from_process_local_data(
        seq_sharding(mesh), np.ascontiguousarray(local_tracks, np.float32)
    )
    nv = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data")),
        np.ascontiguousarray(local_n_valid, np.int32),
    )
    return xs, nv
