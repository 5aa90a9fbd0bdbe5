"""PulseAudio backend (apps/pulse.py) against a fake libpulse-simple.

The CI/dev images have no Pulse server (or even libpulse), so these tests
inject a Python fake with the pa_simple_* surface and verify:
  * the sink streams f32le stereo bytes and frees its handle on stop;
  * the capture stream pushes pseudo-stereo mono blocks into the ring
    (the reference upmix, src/audio_capture.rs:37-52);
  * availability gating composes with the device list.
"""

import ctypes
import threading
import time

import numpy as np
import pytest

from soundscope_tpu.apps import pulse
from soundscope_tpu.apps.capture import PyRing


class FakePulse:
    """Duck-typed stand-in for the ctypes CDLL of libpulse-simple."""

    def __init__(self, record_blocks=None, fail_new=False):
        self.fail_new = fail_new
        self.written = []          # bytes chunks from pa_simple_write
        self.freed = []            # handles passed to pa_simple_free
        self.specs = []            # (direction, rate, channels)
        self._next = 1000
        self._record = record_blocks or []
        self._ri = 0
        self._read_gate = threading.Semaphore(len(self._record))

    def pa_simple_new(self, server, name, direction, dev, what, spec_p,
                      cmap, attr, err_p):
        if self.fail_new:
            err_p._obj.value = 6  # PA_ERR_CONNECTIONREFUSED
            return None
        spec = spec_p._obj
        self.specs.append((direction, spec.rate, spec.channels))
        self._next += 1
        return self._next

    def pa_simple_write(self, handle, data, nbytes, err_p):
        self.written.append(bytes(data[:nbytes]) if isinstance(data, bytes)
                            else ctypes.string_at(data, nbytes))
        return 0

    def pa_simple_read(self, handle, buf, nbytes, err_p):
        # serve a scripted block when available; -1 shortly after exhausted
        if not self._read_gate.acquire(timeout=0.2):
            return -1
        block = self._record[self._ri]
        self._ri += 1
        raw = np.asarray(block, "<f4").tobytes()[:nbytes]
        ctypes.memmove(buf, raw, len(raw))
        return 0

    def pa_simple_free(self, handle):
        self.freed.append(handle)


@pytest.fixture
def fake_lib(monkeypatch):
    def install(fake):
        monkeypatch.setattr(pulse, "_lib_cache", [fake])
        monkeypatch.setenv("PULSE_SERVER", "unix:/tmp/fake-pulse")
        return fake
    return install


def test_sink_writes_f32le_and_frees(fake_lib):
    fake = fake_lib(FakePulse())
    assert pulse.PulseSink.available()
    sink = pulse.PulseSink(48000)
    x = np.arange(8, dtype=np.float32) / 8.0
    sink.write(x)
    sink.stop()
    sink.stop()  # idempotent
    assert fake.specs == [(pulse._PA_STREAM_PLAYBACK, 48000, 2)]
    assert fake.written == [x.astype("<f4").tobytes()]
    assert len(fake.freed) == 1
    # writes after stop are dropped, not crashes
    sink.write(x)
    assert len(fake.written) == 1


def test_sink_connect_failure_raises(fake_lib):
    fake_lib(FakePulse(fail_new=True))
    with pytest.raises(OSError, match="pulse error 6"):
        pulse.PulseSink(44100)


def test_capture_pushes_pseudo_stereo(fake_lib):
    rate = 48000
    n = rate // 100  # one 10 ms block
    mono = (np.arange(n, dtype=np.float32) + 1.0) / n
    fake = fake_lib(FakePulse(record_blocks=[mono]))
    ring = PyRing(rate)
    stream = pulse.PulseStream(ring, rate)
    deadline = time.monotonic() + 2.0
    while ring.total_pushed < 2 * n and time.monotonic() < deadline:
        time.sleep(0.01)
    stream.stop()
    assert fake.specs == [(pulse._PA_STREAM_RECORD, rate, 1)]
    snap = ring.snapshot()
    got = snap[-2 * n:]
    np.testing.assert_allclose(got[0::2], mono, rtol=0, atol=0)
    assert not got[1::2].any()  # [x, 0, x, 0...] upmix
    assert len(fake.freed) == 1  # reader thread freed the handle


def test_gating_without_library(monkeypatch):
    monkeypatch.setattr(pulse, "_lib_cache", [None])
    assert not pulse.PulseSink.available()
    assert not pulse.PulseStream.available()
    with pytest.raises(OSError, match="not present"):
        pulse.PulseSink(44100)


def test_device_list_prefers_alsa_then_pulse(fake_lib, monkeypatch):
    from soundscope_tpu.apps import capture

    fake_lib(FakePulse())
    monkeypatch.setattr(capture.AlsaStream, "available",
                        staticmethod(lambda: False))
    devs = capture.list_input_devices()
    assert devs[0] == "default (PulseAudio)"
    monkeypatch.setattr(capture.AlsaStream, "available",
                        staticmethod(lambda: True))
    assert capture.list_input_devices()[0] == "default (ALSA)"


def test_build_input_stream_uses_pulse(fake_lib, monkeypatch):
    from soundscope_tpu.apps import capture

    fake = fake_lib(FakePulse(record_blocks=[]))
    monkeypatch.setattr(capture.AlsaStream, "available",
                        staticmethod(lambda: False))
    ring = PyRing(1000)
    stream = capture.build_input_stream(ring, 44100, "default (PulseAudio)")
    assert isinstance(stream, pulse.PulseStream)
    stream.stop()
    assert fake.specs == [(pulse._PA_STREAM_RECORD, 44100, 1)]


def test_player_default_sink_prefers_pulse(fake_lib, monkeypatch):
    from soundscope_tpu.apps import player

    fake_lib(FakePulse())
    monkeypatch.setattr(player.AlsaSink, "available",
                        staticmethod(lambda: False))
    p = player.AudioPlayer()
    assert p._sink_factory is pulse.PulseSink
