"""Meter-state checkpoint/resume.

The reference has no checkpointing (its meter is reset on play/seek —
SURVEY.md §5); the TPU-native engine's carried state IS an explicit
pytree (core/state.py), so checkpoint/resume falls out naturally: save
the pytree, restore it, keep streaming. Uses orbax when available, with
a plain .npz fallback (both formats round-trip bit-exactly).
"""

from __future__ import annotations

import dataclasses
import json
import os

import jax
import numpy as np

from soundscope_tpu.core.config import MeterConfig
from soundscope_tpu.core.state import MeterState


def save_meter(path: str, cfg: MeterConfig, state: MeterState) -> None:
    """Write config + state. `path` is a .npz file (created atomically)."""
    flat, _ = jax.tree_util.tree_flatten(state)
    names = [f"leaf_{i}" for i in range(len(flat))]
    arrays = {n: np.asarray(v) for n, v in zip(names, flat)}
    meta = json.dumps(dataclasses.asdict(cfg))
    tmp = path + ".tmp.npz"  # savez appends .npz unless present
    np.savez(tmp, __config__=np.frombuffer(meta.encode(), np.uint8), **arrays)
    os.replace(tmp, path)


def load_meter(path: str) -> tuple[MeterConfig, MeterState]:
    data = np.load(path)
    meta = json.loads(bytes(data["__config__"]).decode())
    cfg = MeterConfig(**meta)
    from soundscope_tpu.core.state import init_meter_state

    template = init_meter_state(cfg)
    flat, treedef = jax.tree_util.tree_flatten(template)
    leaves = [data[f"leaf_{i}"] for i in range(len(flat))]
    for got, want in zip(leaves, flat):
        if got.shape != want.shape:
            raise ValueError(
                f"checkpoint shape mismatch: {got.shape} vs {want.shape} "
                "(was the config changed?)"
            )
    import jax.numpy as jnp

    return cfg, jax.tree_util.tree_unflatten(
        treedef, [jnp.asarray(v) for v in leaves]
    )


def save_live(path: str, cfg: MeterConfig, state, seconds: int) -> None:
    """Checkpoint a live-pipeline state (models/live.LiveState: meter +
    device ring + cursor) so mic sessions resume bit-exactly."""
    flat, _ = jax.tree_util.tree_flatten(state)
    arrays = {f"leaf_{i}": np.asarray(v) for i, v in enumerate(flat)}
    meta = json.dumps({"config": dataclasses.asdict(cfg), "seconds": seconds})
    tmp = path + ".tmp.npz"
    np.savez(tmp, __live__=np.frombuffer(meta.encode(), np.uint8), **arrays)
    os.replace(tmp, path)


def load_live(path: str):
    """-> (cfg, seconds, LiveState)."""
    import jax.numpy as jnp

    from soundscope_tpu.models.live import init_live_state

    data = np.load(path)
    meta = json.loads(bytes(data["__live__"]).decode())
    cfg = MeterConfig(**meta["config"])
    seconds = int(meta["seconds"])
    template = init_live_state(cfg, seconds)
    flat, treedef = jax.tree_util.tree_flatten(template)
    leaves = [data[f"leaf_{i}"] for i in range(len(flat))]
    for got, want in zip(leaves, flat):
        if got.shape != np.shape(want):
            raise ValueError(
                f"checkpoint shape mismatch: {got.shape} vs {np.shape(want)} "
                "(was the config changed?)"
            )
    state = jax.tree_util.tree_unflatten(treedef, [jnp.asarray(v) for v in leaves])
    return cfg, seconds, state


def save_meter_orbax(path: str, cfg: MeterConfig, state: MeterState) -> None:
    """Orbax-backed save (directory checkpoint) — multi-host friendly."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), state, force=True)
    with open(os.path.join(path, "meter_config.json"), "w") as f:
        json.dump(dataclasses.asdict(cfg), f)


def load_meter_orbax(path: str) -> tuple[MeterConfig, MeterState]:
    import orbax.checkpoint as ocp

    with open(os.path.join(path, "meter_config.json")) as f:
        cfg = MeterConfig(**json.load(f))
    from soundscope_tpu.core.state import init_meter_state

    ckptr = ocp.StandardCheckpointer()
    state = ckptr.restore(os.path.abspath(path), init_meter_state(cfg))
    return cfg, state
