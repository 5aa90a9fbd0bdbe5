"""Channel layout helpers: de-interleave and mid/side decomposition.

Reference behavior: src/audio_player.rs:400-419 (`get_mid_and_side_samples`):
mid = (l + r) / 2, side = (l - r) / 2 over interleaved stereo.
"""

from __future__ import annotations

import jax.numpy as jnp


def deinterleave(samples: jnp.ndarray, channels: int) -> jnp.ndarray:
    """(..., frames*channels) interleaved -> (..., channels, frames)."""
    *batch, n = samples.shape
    frames = n // channels
    x = samples[..., : frames * channels].reshape(*batch, frames, channels)
    return jnp.moveaxis(x, -1, -2)


def interleave(planar: jnp.ndarray) -> jnp.ndarray:
    """(..., channels, frames) -> (..., frames*channels) interleaved."""
    *batch, ch, frames = planar.shape
    return jnp.moveaxis(planar, -2, -1).reshape(*batch, frames * ch)


def mid_side_split(samples: jnp.ndarray):
    """Interleaved stereo (..., 2*frames) -> (mid (..., frames), side).

    Non-stereo handling matches the reference (assumes 2 channels).
    """
    planar = deinterleave(samples, 2)
    left = planar[..., 0, :]
    right = planar[..., 1, :]
    return (left + right) * 0.5, (left - right) * 0.5


def mid_side_from_planar(planar: jnp.ndarray):
    """(..., 2, frames) -> (mid, side)."""
    left = planar[..., 0, :]
    right = planar[..., 1, :]
    return (left + right) * 0.5, (left - right) * 0.5
