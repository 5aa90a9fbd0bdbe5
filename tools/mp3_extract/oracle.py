"""Black-box decode oracle: crafted frames -> PCM via the libav bridge."""

from __future__ import annotations

import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def decode_frames(frames: list[bytes]) -> np.ndarray:
    """Concatenate frames into a bare .mp3 and decode; returns mono f32."""
    from soundscope_tpu.native import decoder

    blob = b"".join(frames)
    fd, path = tempfile.mkstemp(suffix=".mp3")
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(blob)
        d = decoder.decode_any(path)
    finally:
        os.unlink(path)
    x = np.asarray(d.samples)
    assert x.shape[0] == 1, x.shape
    return x[0]
