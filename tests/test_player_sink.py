"""Audible playback wiring: the SinkFeeder streams transport-paced PCM
into the sink, stops while paused, and resyncs across seeks (reference:
rodio sink pull loop, src/audio_player.rs:270-397 — here the transport is
the clock and the feeder pushes)."""

import time

import numpy as np
import pytest

from soundscope_tpu.apps.player import AudioPlayer, Command, PlayerCommand
from soundscope_tpu.utils.io import write_wav
from soundscope_tpu.utils.synth import sine, stereo

RATE = 44100


class FakeSink:
    """Records every interleaved f32 chunk it is fed."""

    def __init__(self, rate):
        self.rate = rate
        self.samples = 0
        self.stopped = False

    def write(self, interleaved_f32: np.ndarray):
        self.samples += len(interleaved_f32)

    def stop(self):
        self.stopped = True


@pytest.fixture
def song(tmp_path):
    p = str(tmp_path / "song.wav")
    write_wav(p, stereo(sine(440.0, 3.0, RATE, -12.0)), RATE)
    return p


@pytest.fixture
def player(song):
    sinks = []

    def factory(rate):
        s = FakeSink(rate)
        sinks.append(s)
        return s

    pl = AudioPlayer(sink_factory=factory)
    pl.start()
    pl.send(PlayerCommand(Command.SELECT_FILE, song))
    pl.file_q.get(timeout=10.0)  # select auto-plays
    deadline = time.monotonic() + 2.0
    while not sinks and time.monotonic() < deadline:
        time.sleep(0.01)
    assert sinks, "sink was never constructed"
    yield pl, sinks[0]
    pl.stop()


def test_sink_receives_transport_paced_audio(player):
    pl, sink = player
    time.sleep(0.5)
    pl.send(PlayerCommand(Command.CHANGE_STATE))  # pause
    time.sleep(0.1)
    frames = sink.samples / 2
    # fed ≈ played (≥0.4 s) plus the ≤0.15 s lead; generous bounds for CI
    assert 0.3 * RATE < frames < 1.2 * RATE


def test_pause_stops_the_feed(player):
    pl, sink = player
    time.sleep(0.3)
    pl.send(PlayerCommand(Command.CHANGE_STATE))  # pause
    time.sleep(0.15)  # let any in-flight write land
    at_pause = sink.samples
    time.sleep(0.4)
    # nothing (beyond one in-flight chunk) is written while paused
    assert sink.samples - at_pause <= 0.2 * RATE * 2
    pl.send(PlayerCommand(Command.CHANGE_STATE))  # resume
    time.sleep(0.3)
    assert sink.samples > at_pause


def test_seek_resyncs_the_feed(player):
    pl, sink = player
    time.sleep(0.3)
    pl.send(PlayerCommand(Command.MOVE_RIGHT))  # +5 s, clamps to EOF
    time.sleep(0.3)
    # still playing and feeding after the jump, without a 5 s backlog dump
    frames = sink.samples / 2
    assert frames < 2.0 * RATE


def test_sink_stopped_on_new_file_and_quit(player, tmp_path):
    pl, sink = player
    p2 = str(tmp_path / "song2.wav")
    write_wav(p2, stereo(sine(880.0, 1.0, RATE, -12.0)), RATE)
    pl.send(PlayerCommand(Command.SELECT_FILE, p2))
    pl.file_q.get(timeout=10.0)
    deadline = time.monotonic() + 2.0
    while not sink.stopped and time.monotonic() < deadline:
        time.sleep(0.01)
    assert sink.stopped
