"""Theme engine parity (reference: src/tui.rs:137-355, builtin_themes.rs)."""

import pytest

from soundscope_tpu.apps import themes as T


def test_17_builtins():
    names = T.list_themes()
    assert len(names) == 17
    for n in names:
        th = T.get_by_name(n)
        assert th is not None
        # every field filled after apply_global_as_default
        for sec in th.sections.values():
            for f, v in sec.colors.items():
                assert v is not None, (n, sec.name, f)


def test_global_fill_inheritance():
    """Unset fields inherit fg/bg/highlight like the reference's
    apply_global_as_default (src/tui.rs:166-235)."""
    th = T.Theme(
        background=T.Color.parse("#101010"),
        foreground=T.Color.parse("#eeeeee"),
        highlight=T.Color.parse("#ff0000"),
    )
    th.sections["waveform"].colors["playhead"] = T.Color.parse("#00ff00")
    th.apply_global_as_default()
    assert th.waveform.playhead.hex() == "#00ff00"          # explicit kept
    assert th.waveform.background.hex() == "#101010"        # bg fill
    assert th.waveform.waveform.hex() == "#eeeeee"          # fg fill
    assert th.waveform.controls_highlight.hex() == "#ff0000"  # hl fill
    assert th.fft.side_fft.hex() == "#ff0000"
    assert th.lufs.numbers.hex() == "#eeeeee"


def test_highlight_defaults_to_foreground():
    th = T.Theme(
        background=T.Color.parse("black"),
        foreground=T.Color.parse("#abcdef"),
        highlight=None,
    ).apply_global_as_default()
    assert th.highlight.hex() == "#abcdef"
    assert th.devices.highlight.hex() == "#abcdef"


def test_color_parsing():
    assert T.Color.parse("#ff8000").hex() == "#ff8000"
    assert T.Color.parse("Light Blue").hex() == "#5c5cff"
    assert T.Color.parse(160).index == 160
    assert T.Color.parse((1, 2, 3)).hex() == "#010203"
    with pytest.raises(ValueError):
        T.Color.parse("not-a-color")


def test_theme_file_roundtrip(tmp_path):
    p = tmp_path / "custom.theme"
    p.write_text(
        """
[global]
background = "#222222"
foreground = "#dddddd"
highlight = "#ffaa00"

[waveform]
playhead = "#ff0000"

[lufs]
numbers = "#00ffff"
"""
    )
    th = T.load_theme_file(str(p))
    assert th.waveform.playhead.hex() == "#ff0000"
    assert th.lufs.numbers.hex() == "#00ffff"
    assert th.fft.mid_fft.hex() == "#dddddd"  # inherited


def test_persistence(tmp_path):
    d = str(tmp_path)
    T.save_current_theme("builtin:Nord", d)
    th = T.load_current_theme(d)
    assert th.name == "Nord"
    T.save_current_theme("DEFAULT", d)
    assert T.load_current_theme(d).name == "DEFAULT"
    # dangling file selection falls back to default
    T.save_current_theme("missing.theme", d)
    assert T.load_current_theme(d).name == "DEFAULT"


def test_default_theme_matches_reference_defaults():
    """Reference defaults: bg black, fg indexed 221, hl indexed 160
    (src/tui.rs:250-258)."""
    th = T.default_theme()
    assert th.foreground.index == 221
    assert th.highlight.index == 160
