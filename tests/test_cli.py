"""CLI host: analyze/scan/themes through the real argv surface."""

import json
import os

import numpy as np
import pytest

from soundscope_tpu.apps.cli import main
from soundscope_tpu.utils.io import write_wav
from soundscope_tpu.utils.synth import sine, stereo


@pytest.fixture
def wav_dir(tmp_path):
    x1 = stereo(sine(997.0, 6.0, 48000, -23.0))
    write_wav(str(tmp_path / "a.wav"), x1, 48000)
    x2 = stereo(sine(440.0, 3.0, 44100, -30.0))
    write_wav(str(tmp_path / "b.wav"), x2, 44100)
    return tmp_path


def test_analyze_json(wav_dir, capsys):
    rc = main(["analyze", str(wav_dir / "a.wav"), "--json", "--compact"])
    assert rc == 0
    rows = json.loads(capsys.readouterr().out)
    assert len(rows) == 1
    r = rows[0]
    assert abs(r["integrated_lufs"] + 23.0) < 0.1
    assert abs(r["true_peak_dbtp"] + 23.0) < 0.15
    assert r["rate"] == 48000 and r["channels"] == 2
    assert abs(r["duration_s"] - 6.0) < 0.01


def test_scan_table(wav_dir, capsys):
    rc = main(["scan", str(wav_dir)])
    assert rc == 0
    out = capsys.readouterr().out
    assert "LUFS-I" in out and "a.wav" in out and "b.wav" in out


def test_analyze_error_reported(wav_dir, capsys):
    bad = wav_dir / "broken.wav"
    bad.write_bytes(b"garbage")
    rc = main(["analyze", str(bad), str(wav_dir / "a.wav"), "--json", "--compact"])
    assert rc == 1
    rows = json.loads(capsys.readouterr().out)
    assert any("error" in r for r in rows)
    assert any("integrated_lufs" in r for r in rows)


def test_themes_list(capsys):
    assert main(["themes"]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 17 and "Nord" in out


def test_scan_incremental_bucket_flush(tmp_path, capsys):
    """More files than the flush threshold: all analyzed, order preserved,
    memory bounded by one bucket (behavioral: results complete+correct)."""
    n_files = 9
    for i in range(n_files):
        write_wav(str(tmp_path / f"f{i:02d}.wav"),
                  stereo(sine(997.0, 0.8, 16000, -20.0 - i)), 16000)
    rc = main(["scan", str(tmp_path), "--json", "--compact"])
    assert rc == 0
    rows = json.loads(capsys.readouterr().out)
    assert len(rows) == n_files
    assert [r["file"].rsplit("/", 1)[-1] for r in rows] == [
        f"f{i:02d}.wav" for i in range(n_files)
    ]
    for i, r in enumerate(rows):
        assert abs(r["integrated_lufs"] + 20.0 + i) < 0.1


def test_analyze_silence_json_is_valid(tmp_path, capsys):
    """Silent file: true_peak_dbtp must be null, output strict-JSON."""
    p = str(tmp_path / "silence.wav")
    write_wav(p, np.zeros((2, 16000), np.float32), 16000)
    rc = main(["analyze", p, "--json", "--compact"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Infinity" not in out
    rows = json.loads(out)
    assert rows[0]["true_peak_dbtp"] is None


def test_cli_metrics_flag(tmp_path, capsys):
    """--metrics prints a per-op RT-factor JSON report on stderr while
    stdout stays parseable."""
    import json as _json

    from soundscope_tpu.apps.cli import main
    from soundscope_tpu.utils.io import write_wav
    from soundscope_tpu.utils.metrics import GLOBAL
    from soundscope_tpu.utils.synth import sine, stereo

    GLOBAL.reset()
    p = str(tmp_path / "a.wav")
    write_wav(p, stereo(sine(440.0, 1.0, 48000, -14.0)), 48000)
    rc = main(["analyze", p, "--json", "--compact", "--metrics"])
    assert rc == 0
    out, err = capsys.readouterr()
    _json.loads(out)  # stdout unpolluted
    rep = _json.loads(err.strip().splitlines()[-1])["metrics"]
    assert "analyze" in rep and "decode" in rep
    assert rep["analyze"]["calls"] >= 1
    assert rep["analyze"]["audio_s"] > 0.9


def test_bare_file_maps_to_tui():
    """`soundscope-tpu SONG.wav` opens the TUI like the reference binary
    (src/main.rs:21-30)."""
    from soundscope_tpu.apps.cli import _normalize_argv

    assert _normalize_argv(["song.wav"]) == ["tui", "song.wav"]
    assert _normalize_argv(["analyze", "x.wav"]) == ["analyze", "x.wav"]
    assert _normalize_argv(["-v"]) == ["-v"]
    # no args opens the TUI like the reference binary
    assert _normalize_argv([]) == ["tui"]


def test_cli_timeline_export(tmp_path, capsys):
    import json as _json

    import numpy as np

    from soundscope_tpu.apps.cli import main
    from soundscope_tpu.utils.io import write_wav
    from soundscope_tpu.utils.synth import segments, sine, stereo

    # 4 s at -23 then 4 s at -33: the short-term timeline must show both
    x = stereo(segments([sine(997.0, 4.0, 48000, -23.0),
                         sine(997.0, 4.0, 48000, -33.0)]))
    p = str(tmp_path / "steps.wav")
    write_wav(p, x, 48000)
    out_dir = str(tmp_path / "tl")
    rc = main(["analyze", p, "--json", "--compact", "--timeline", out_dir])
    assert rc == 0
    row = _json.loads(capsys.readouterr().out)[0]
    data = np.load(row["timeline"])
    st = data["shortterm_lufs"]
    mom = data["momentary_lufs"]
    assert float(data["hop_seconds"]) == 0.1
    assert len(mom) > len(st) > 0
    # settled values at the end of each half
    assert abs(st[int(3.5 / 0.1) - 30] + 23.0) < 0.2
    assert abs(st[-1] + 33.0) < 0.2
    assert abs(mom[int(3.5 / 0.1) - 4] + 23.0) < 0.2


def test_no_args_maps_to_tui():
    from soundscope_tpu.apps.cli import _normalize_argv

    assert _normalize_argv([]) == ["tui"]


def test_export_names_do_not_collide(tmp_path, capsys):
    """Two same-titled files in different folders keep separate timelines."""
    import json as _json

    import numpy as np

    from soundscope_tpu.apps.cli import main
    from soundscope_tpu.utils.io import write_wav
    from soundscope_tpu.utils.synth import sine, stereo

    for sub, db in [("a", -23.0), ("b", -33.0)]:
        os.makedirs(tmp_path / sub, exist_ok=True)
        write_wav(str(tmp_path / sub / "intro.wav"),
                  stereo(sine(997.0, 4.0, 48000, db)), 48000)
    out_dir = str(tmp_path / "tl")
    rc = main(["scan", str(tmp_path), "--json", "--compact",
               "--timeline", out_dir])
    assert rc == 0
    rows = _json.loads(capsys.readouterr().out)
    tls = {r["file"]: r["timeline"] for r in rows}
    assert len(set(tls.values())) == 2
    vals = sorted(float(np.load(t)["shortterm_lufs"][-1]) for t in tls.values())
    assert abs(vals[0] + 33.0) < 0.3 and abs(vals[1] + 23.0) < 0.3


def test_low_rate_spectrogram_uses_xla_path(tmp_path):
    """Rates whose Nyquist is inside the display range cannot use the
    half-spectrum Pallas kernel; spectrogram() must gate and succeed."""
    import numpy as np
    import pytest

    from soundscope_tpu.ops.pallas_stft import pallas_supported, stft_pooled_pallas
    from soundscope_tpu.ops.stft import spectrogram
    from soundscope_tpu.utils.synth import sine, stereo

    assert not pallas_supported(32000) and pallas_supported(44100)
    x = stereo(sine(500.0, 1.5, 32000, -12.0))
    spec = spectrogram(np.asarray(x), 32000, use_pallas="yes")
    assert spec["mid_db"].shape[1] == 128
    import jax.numpy as jnp

    with pytest.raises(ValueError, match="Nyquist"):
        stft_pooled_pallas(jnp.zeros((1, 1 << 15)), jnp.zeros((1, 1 << 15)), 32000)


def test_warmup_compiles_and_caches(capsys):
    # minimum-bucket warmup: one AOT compile, persisted to the shared
    # compile cache so a later fresh-process analyze of that shape is warm
    rc = main(["warmup", "--rates", "44100", "--max-seconds", "0.1"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "warmed rate=44100 samples=32768 batch=1" in out
    assert "warmup: 1 programs" in out
