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

import pytest

from soundscope_tpu.utils.io import write_wav
from soundscope_tpu.utils.synth import sine, stereo

_ANSI = re.compile(rb"\x1b\[[0-9;?]*[a-zA-Z]|\x1b[()][0-9A-B]|\x1b[=>]")


def _spawn_tui(path, cols=100, rows=30):
    # openpty + a FRESH python subprocess: pty.fork() from the (threaded)
    # pytest process deadlocks in the child
    import fcntl
    import subprocess
    import termios

    master, slave = pty.openpty()
    fcntl.ioctl(master, termios.TIOCSWINSZ, struct.pack("HHHH", rows, cols, 0, 0))
    env = dict(os.environ, TERM="xterm-256color",
               COLUMNS=str(cols), LINES=str(rows))
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu');\n"
        "from soundscope_tpu.apps.cli import main\n"
        f"raise SystemExit(main(['tui', {path!r}]))\n"
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.Popen(
        [sys.executable, "-c", code], stdin=slave, stdout=slave,
        stderr=subprocess.DEVNULL, env=env, cwd=repo, start_new_session=True,
    )
    os.close(slave)
    return proc, master


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


def _pty_available() -> bool:
    # GitHub's hosted runners allow openpty; only genuinely pty-less
    # sandboxes (no /dev/ptmx) should skip
    try:
        m, s = os.openpty()
        os.close(m)
        os.close(s)
        return True
    except OSError:
        return False


@pytest.mark.skipif(not _pty_available(), reason="no pty device available")
def test_tui_end_to_end_pty(tmp_path):
    song = str(tmp_path / "tone.wav")
    write_wav(song, stereo(sine(500.0, 2.0, 44100, -12.0)), 44100)

    proc, fd = _spawn_tui(song)
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
        try:
            assert proc.wait(timeout=15.0) == 0
        except Exception as e:
            raise AssertionError(f"TUI did not exit cleanly on 'q': {e}")
    finally:
        if proc.poll() is None:
            proc.kill()
        os.close(fd)
