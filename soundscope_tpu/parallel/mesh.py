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
