"""TUI application: state machine, keymap, analysis glue, rendering —
driven headlessly through the same App the curses host runs.

Mirrors the reference's own TUI test strategy (a fake-backend App with
dangling channels, src/tui.rs:2193-2368) but drives the real player
thread with its virtual transport."""

import os
import time

import numpy as np
import pytest

from soundscope_tpu.apps.render import Screen
from soundscope_tpu.apps.tui import App, Mode
from soundscope_tpu.utils.io import write_wav
from soundscope_tpu.utils.synth import sine, stereo


@pytest.fixture
def song(tmp_path):
    p = str(tmp_path / "song.wav")
    write_wav(p, stereo(sine(500.0, 3.0, 44100, -12.0)), 44100)
    return p


@pytest.fixture
def app(tmp_path):
    a = App(config_dir=str(tmp_path / "cfg"))
    yield a
    a.handle_key("q")


def _frame(app, w=100, h=30):
    scr = Screen(w, h)
    app.draw(scr)
    return scr.text()


def test_initial_frame_empty_state(app):
    app.show_waveform = app.show_fft = app.show_lufs = False
    txt = _frame(app)
    assert "No open windows!" in txt
    assert "1 | Toggle waveform" in txt


def test_panes_toggle(app):
    txt = _frame(app)
    assert "spectrum" in txt and "lufs" in txt
    app.handle_key("2")
    app.handle_key("3")
    txt = _frame(app)
    assert "spectrum" not in txt and "lufs" not in txt
    app.handle_key("1")
    assert "No open windows!" in _frame(app)


def test_load_file_and_analyze(app, song):
    app.select_audio_file(song)
    assert app.audio_file is not None
    assert abs(app.audio_file.duration - 3.0) < 0.01
    # gain compensation = -13 - LUFS_I (src/tui.rs:49,1229-1238)
    lufs_i = app.file_analyzer.calculate_integrated_lufs(
        2, app.audio_file.interleaved()
    )
    assert abs(app.fft_gain_db - (-13.0 - lufs_i)) < 1e-6
    # feed a playback position like the transport does (interleaved
    # samples: 2 s * rate * 2 channels)
    app.analyze_audio_file_samples(2 * 44100 * 2)
    assert app.fft_mid is not None and app.fft_side is not None
    # 500 Hz peak at its log-x position
    peak_x = app.fft_mid[np.argmax(app.fft_mid[:, 1]), 0]
    expect = (np.log10(500) - np.log10(20)) / (np.log10(20000) - np.log10(20)) * 100
    assert abs(peak_x - expect) < 2.0
    assert app.lufs[-1] > -100.0
    txt = _frame(app)
    assert "song" in txt and "00:02" in txt and "00:03" in txt


def test_keymap_popups_and_navigation(app):
    app.handle_key("h")
    assert "Play/pause" in _frame(app)
    app.handle_key("esc")
    assert "Play/pause" not in _frame(app)

    app.handle_key("t")
    assert app.show_themes
    app.handle_key("down")
    app.handle_key("down")
    assert app.theme_selected == 2
    app.handle_key("up")
    assert app.theme_selected == 1
    sel_before = app.theme_selected
    for _ in range(len(app.themes_entries)):
        app.handle_key("down")
    assert app.theme_selected == sel_before  # wrap-around
    app.handle_key("enter")
    assert not app.show_themes
    assert app.theme.name in app.themes_entries[1]


def test_theme_persistence(tmp_path):
    cfg = str(tmp_path / "cfg")
    a = App(config_dir=cfg)
    a.handle_key("t")
    a.theme_selected = 1 + sorted(
        __import__("soundscope_tpu.apps.themes", fromlist=["x"]).list_themes()
    ).index("Nord")
    a.handle_key("enter")
    a.handle_key("q")
    b = App(config_dir=cfg)
    assert b.theme.name == "Nord"
    b.handle_key("q")


def test_mode_switch_and_mic_analysis(app):
    t0 = time.monotonic()
    app.handle_key("m")
    # the jit warmup runs on a worker thread — the switch itself must not
    # block the UI loop even though first compiles take seconds
    assert time.monotonic() - t0 < 2.0
    assert app.mode == Mode.MICROPHONE
    assert app.stream is not None
    assert app.live_ready.wait(timeout=300)
    time.sleep(0.3)  # synthetic device pushes ~10 ms blocks
    app.analyze_microphone_input()
    assert app.fft_mid is not None
    assert app.mic_waveform is not None
    txt = _frame(app)
    assert "Microphone" in txt
    app.handle_key("m")
    assert app.mode == Mode.PLAYER


def test_mic_spectrum_shows_sine(app):
    app.handle_key("m")
    assert app.live_ready.wait(timeout=300)  # async jit warmup
    rate = app.device_analyzer.sample_rate
    t = np.arange(rate * 16) / rate
    mono = (0.5 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)
    pseudo = np.zeros(2 * len(mono), np.float32)
    pseudo[0::2] = mono
    app.ring.push(pseudo)
    app.analyze_microphone_input()
    peak_x = app.fft_mid[np.argmax(app.fft_mid[:, 1]), 0]
    expect = (np.log10(440) - np.log10(20)) / (np.log10(20000) - np.log10(20)) * 100
    assert abs(peak_x - expect) < 2.0


def test_zoom_bounds(app, song):
    app.select_audio_file(song)
    assert app.waveform_window == 3.0  # min(duration, 15)
    app.handle_key("+")
    app.handle_key("+")
    assert app.waveform_window == 1.0
    app.handle_key("+")
    assert app.waveform_window == 1.0  # floor 1 s
    for _ in range(20):
        app.handle_key("-")
    assert app.waveform_window == 3.0  # cap min(duration, 15)


def test_error_popup_and_timer(app):
    app.handle_error("Boom!")
    assert "Boom!" in _frame(app)
    app.error_at -= 6.0  # simulate 6 s elapsing (5 s timeout)
    app.tick()
    assert "Boom!" not in _frame(app)


def test_test_error_key(app):
    app.handle_key("y")
    time.sleep(0.15)
    app.tick()
    assert "test error" in _frame(app)


def test_explorer_filtering(app, tmp_path, song):
    os.makedirs(tmp_path / "sub")
    (tmp_path / "notes.txt").write_text("x")
    (tmp_path / "cool.theme").write_text("[global]\n")
    app.explorer.cwd = str(tmp_path)
    app.handle_key("e")
    assert app.show_explorer
    names = app.explorer.entries
    assert "sub/" in names and "song.wav" in names and "cool.theme" in names
    assert "notes.txt" not in names
    # enter directory
    app.explorer.selected = names.index("sub/")
    app.handle_key("enter")
    assert app.explorer.cwd.endswith("sub")
    assert "../" in app.explorer.entries


def test_mouse_tooltip(app, song):
    app.select_audio_file(song)
    app.analyze_audio_file_samples(44100)
    scr = Screen(100, 30)
    app.draw(scr)  # establishes chart_rect
    cr = app.chart_rect.inner()
    app.handle_mouse(cr.x + cr.w // 2, cr.y + cr.h // 2)
    txt = _frame(app)
    assert "Hz" in txt and "dB" in txt


def test_seek_and_playpause_reset_meter(app, song):
    import time as _time

    app.select_audio_file(song)  # auto-plays
    app.analyze_audio_file_samples(44100 * 2)
    assert app.lufs[-1] > -100.0
    app.handle_key("space")  # pause: chart stays frozen (tui.rs:1586-1591)
    assert app.lufs[-1] > -100.0
    _time.sleep(0.05)
    app.handle_key("space")  # resume: meter + history reset
    assert app.lufs[-1] == -100.0
    app.analyze_audio_file_samples(44100 * 2)
    app.handle_key("right")  # seek resets meter AND history
    assert app.lufs[-1] == -100.0
    assert app.file_analyzer.get_integrated_lufs() == -np.inf
    # seek is ignored while a popup is open or in mic mode (tui.rs:1594+)
    app.analyze_audio_file_samples(44100 * 2)
    app.show_themes = True
    app.handle_key("right")
    assert app.lufs[-1] > -100.0
    app.show_themes = False


def test_mic_mode_uses_device_resident_live_path(app):
    """After device selection the mic path runs through LiveAnalyzer
    (one jitted push per quantum + one jitted frame)."""
    app.handle_key("m")
    assert app.live is not None
    assert app.live_ready.wait(timeout=300)  # async jit warmup
    rate = 44100
    t = np.arange(rate * 4) / rate
    mono = (0.4 * np.sin(2 * np.pi * 700.0 * t)).astype(np.float32)
    pseudo = np.zeros(2 * len(mono), np.float32)
    pseudo[0::2] = mono
    app.ring.push(pseudo)
    app.analyze_microphone_input()
    assert app.fft_mid is not None and app.fft_mid.shape[1] == 2
    peak_x = app.fft_mid[np.argmax(app.fft_mid[:, 1]), 0]
    expect = (np.log10(700) - np.log10(20)) / (np.log10(20000) - np.log10(20)) * 100
    assert abs(peak_x - expect) < 2.0
    assert app.mic_waveform is not None
    assert app.lufs[-1] > -100.0


def test_transport_seek_accuracy(app, song):
    """The reference's known defects are rapid-seek playhead misplacement
    and gradual drift (README:170-172); the sample-accurate transport must
    land seeks exactly and not drift while paused."""
    import time as _time

    app.select_audio_file(song)
    app.handle_key("space")   # pause (file auto-plays on load)
    tr = app.player.transport
    _time.sleep(0.05)
    if tr.playing():          # ordering race: ensure paused
        tr.pause()
    p0 = tr.position()
    for _ in range(3):
        app.handle_key("right")
    _time.sleep(0.1)
    p1 = tr.position()
    assert p1 == min(p0 + 3 * 5 * 44100, 3 * 44100)  # clamped at EOF
    _time.sleep(0.15)
    assert tr.position() == p1  # no drift while paused
    app.handle_key("left")
    _time.sleep(0.1)
    assert tr.position() == max(p1 - 5 * 44100, 0)


def test_devices_key_gated_to_microphone_mode(app):
    """'d' opens the device list only in Microphone mode (tui.rs:1641-1645);
    'm' is ignored while a list popup is open (tui.rs:1647-1650)."""
    app.handle_key("d")
    assert not app.show_devices  # Player mode: ignored
    app.handle_key("m")
    assert app.mode == Mode.MICROPHONE
    app.handle_key("d")
    assert app.show_devices
    app.handle_key("m")  # popup open: mode switch ignored
    assert app.mode == Mode.MICROPHONE
    app.handle_key("esc")
    app.handle_key("m")
    assert app.mode == Mode.PLAYER


def test_empty_state_big_text(app):
    """The no-panes screen renders a big block-glyph 'Soundscope' banner
    (reference: tui-big-text, src/tui.rs:598-630)."""
    app.show_waveform = app.show_fft = app.show_lufs = False
    txt = _frame(app, w=100, h=30)
    assert "No open windows!" in txt
    assert "█" in txt  # the banner glyphs
    # on a tiny screen the banner is skipped but the hint box remains
    txt_small = _frame(app, w=40, h=12)
    assert "No open windows!" in txt_small
    assert "█" not in txt_small


def test_explorer_directory_coloring(app, tmp_path, song):
    """Directories render with the theme's dir_foreground, files with
    item_foreground (reference: ratatui-explorer dir styling)."""
    from soundscope_tpu.apps.render import Screen
    from soundscope_tpu.apps.themes import Color

    os.makedirs(tmp_path / "subdir", exist_ok=True)
    app.explorer.cwd = str(tmp_path)
    dir_c = Color.parse(33)
    item_c = Color.parse(244)
    app.theme.sections["explorer"].colors["dir_foreground"] = dir_c
    app.theme.sections["explorer"].colors["item_foreground"] = item_c
    app.handle_key("e")
    scr = Screen(100, 30)
    app.draw(scr)

    def row_color(substr):
        for y, row in enumerate(scr.cells):
            line = "".join(c.ch for c in row)
            x = line.find(substr)
            if x >= 0:
                return scr.cells[y][x].fg
        raise AssertionError(f"{substr!r} not on screen")

    assert row_color("subdir/") == dir_c
    assert row_color("song.wav") == item_c


def test_metrics_readout(app, song):
    app.show_metrics = True
    app.select_audio_file(song)
    app.tick()
    time.sleep(0.01)
    app.tick()
    app.analyze_audio_file_samples(44100 * 2)  # drive one analysis frame
    txt = _frame(app, w=120, h=30)
    assert "tick" in txt and "ms" in txt
    assert "lufs_push" in txt  # RT-factor entries appear once ops have run


def test_slow_decode_surfaces_popup_then_loads(app, song, monkeypatch):
    """A decode that outlives the bounded wait must not be silently
    dropped: the select shows an explanatory popup, the UI keeps ticking,
    and the handle is picked up once the player thread finishes
    (reference blocks at tui.rs:1892; we bound the block instead)."""
    from soundscope_tpu.apps import player as player_mod

    real_decode = player_mod.decode_file

    def slow_decode(path):
        time.sleep(0.6)
        return real_decode(path)

    monkeypatch.setattr(player_mod, "decode_file", slow_decode)
    app.DECODE_WAIT_SECONDS = 0.1
    app.select_audio_file(song)
    # timed out: no file yet, but the user was told why
    assert app.audio_file is None
    assert "Still decoding" in app.error_text
    # UI keeps ticking; the late handle lands via tick(), not discarded
    deadline = time.monotonic() + 10.0
    while app.audio_file is None and time.monotonic() < deadline:
        app.tick()
        time.sleep(0.02)
    assert app.audio_file is not None
    assert abs(app.audio_file.duration - 3.0) < 0.01
