"""True end-to-end TUI drive: the real curses host in a pty.

Launches `python -m soundscope_tpu.apps.cli tui FILE` under a
pseudo-terminal, sends real keystrokes, and greps the ANSI-stripped
screen for pane titles and state — the whole stack (CLI -> curses ->
App -> player thread -> analyzer) exactly as a user runs it."""

import os
import pty
import re
import select
import struct
import sys
import time

import numpy as np
import pytest

from soundscope_tpu.utils.io import write_wav
from soundscope_tpu.utils.synth import sine, stereo

_ANSI = re.compile(rb"\x1b\[[0-9;?]*[a-zA-Z]|\x1b[()][0-9A-B]|\x1b[=>]")


def _spawn_tui(path, cols=100, rows=30):
    pid, fd = pty.fork()
    if pid == 0:  # child
        os.environ["TERM"] = "xterm-256color"
        os.environ["COLUMNS"], os.environ["LINES"] = str(cols), str(rows)
        try:
            sys.argv = ["soundscope-tpu", "tui", path]
            import jax

            jax.config.update("jax_platforms", "cpu")
            from soundscope_tpu.apps.cli import main

            os._exit(main(["tui", path]))
        except BaseException:
            os._exit(3)
    # set the window size so curses sees a sane geometry
    import fcntl
    import termios

    fcntl.ioctl(fd, termios.TIOCSWINSZ, struct.pack("HHHH", rows, cols, 0, 0))
    return pid, fd


def _drain(fd, seconds):
    out = b""
    end = time.monotonic() + seconds
    while time.monotonic() < end:
        r, _, _ = select.select([fd], [], [], 0.2)
        if r:
            try:
                out += os.read(fd, 65536)
            except OSError:
                break
    return _ANSI.sub(b"", out).decode(errors="replace")


@pytest.mark.skipif(not sys.stdout.isatty() and os.environ.get("CI") == "true",
                    reason="no pty allowed in this CI sandbox")
def test_tui_end_to_end_pty(tmp_path):
    song = str(tmp_path / "tone.wav")
    write_wav(song, stereo(sine(500.0, 2.0, 44100, -12.0)), 44100)

    pid, fd = _spawn_tui(song)
    try:
        # startup + file load + first analysis frames (cpu jit compiles)
        screen = _drain(fd, 25.0)
        assert "tone" in screen, screen[-2000:]
        assert "spectrum" in screen
        assert "lufs" in screen or "LUFS" in screen

        os.write(fd, b"h")           # help popup
        screen = _drain(fd, 2.0)
        assert "Play/pause" in screen
        os.write(fd, b"h")           # close help
        _drain(fd, 1.0)

        os.write(fd, b" ")           # pause
        _drain(fd, 0.5)
        os.write(fd, b"q")           # quit
        deadline = time.monotonic() + 15.0
        status = None
        while time.monotonic() < deadline:
            done, st = os.waitpid(pid, os.WNOHANG)
            if done:
                status = st
                break
            time.sleep(0.2)
        assert status is not None, "TUI did not exit on 'q'"
        assert os.waitstatus_to_exitcode(status) == 0
    finally:
        try:
            os.kill(pid, 9)
        except ProcessLookupError:
            pass
        os.close(fd)
