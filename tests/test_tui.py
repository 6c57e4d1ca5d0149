"""Interactive terminal viewer: key-driven model tests (no terminal).

The reference's viewer interactions (tools/viewer/viewer_app.cpp): pan /
zoom to micro-triangle level, click-to-inspect, parameter widgets with
reset, re-bake on change, reuse highlighting.  TuiViewer is the terminal
build of that loop; these tests drive it through handle_key like a user
at a keyboard and assert on the model + rendered frame.
"""
import numpy as np
import pytest

import omm_tpu as omm
from fixtures import standard_circle
from omm_tpu.baker import Baker
from omm_tpu.tui import TuiViewer, render_ansi
from omm_tpu.viewer import TWEAKABLE, ViewerSession


@pytest.fixture(scope="module")
def session_blob():
    tex = omm.Texture([standard_circle(32, 32)], omm.TextureFormat.FP32)
    desc = omm.BakeInputDesc(
        texture=tex,
        tex_coords=np.array([[0, 0], [0, 0.7], [0.7, 0], [0.7, 0.7]],
                            np.float32),
        index_buffer=np.array([0, 1, 2, 3, 1, 2], np.uint32), index_count=6,
        max_subdivision_level=4)
    res = omm.bake(desc)
    return Baker().serialize(input_descs=[desc], result_descs=[res],
                             compress=True)


def _viewer(blob):
    return TuiViewer(ViewerSession(blob))


def test_frame_and_pan_zoom(session_blob):
    tv = _viewer(session_blob)
    f0 = tv.frame_rgb(12, 40)
    assert f0.shape == (24, 40, 3)
    assert f0.max() > 0.1  # something rendered
    c0 = tv.center.copy()
    assert tv.handle_key("KEY_RIGHT")
    assert tv.center[0] > c0[0]
    assert tv.handle_key("+")
    assert tv.span < 1.0
    assert tv.handle_key("-") and tv.handle_key("-")
    assert tv.span > 1.0
    # out-of-bounds panning greys the border rather than crashing
    for _ in range(20):
        tv.handle_key("h")
    f = tv.frame_rgb(8, 16)
    assert np.isfinite(f).all()
    assert not tv.handle_key("q")


def test_zoom_to_prim_and_cycle(session_blob):
    tv = _viewer(session_blob)
    tv.handle_key("g")
    assert tv.span < 1.0  # zoomed onto primitive 0's AABB
    tv.handle_key("n")
    assert tv.cur_prim == 1
    tv.handle_key("p")
    assert tv.cur_prim == 0
    # the crosshair is inside the current primitive after zoom
    assert tv.prim_at(tv.center) == 0


def test_inspect_and_reuse_messages(session_blob):
    tv = _viewer(session_blob)
    tv.handle_key("g")
    tv.handle_key("i")
    assert tv.messages and ("µtri" in tv.messages[-1]
                            or "prim 0" in tv.messages[-1])
    tv.handle_key("u")
    assert len(tv.messages) >= 2  # reuse browser reported something


def test_param_step_rebake_reset(session_blob):
    tv = _viewer(session_blob)
    # move the parameter cursor to alpha_cutoff and step it
    names = list(TWEAKABLE)
    while names[tv.param_i] != "alpha_cutoff":
        tv.handle_key("c")
    v0 = tv.s.params()["alpha_cutoff"]
    tv.handle_key("]")
    assert tv.s.params()["alpha_cutoff"] == pytest.approx(v0 + 0.05)
    assert tv.s._dirty
    tv.handle_key("r")
    assert not tv.s._dirty
    tv.handle_key("x")  # per-widget reset (the viewer's reset arrow)
    assert tv.s.params()["alpha_cutoff"] == pytest.approx(v0)
    # enum parameter cycles instead of stepping
    while names[tv.param_i] != "format":
        tv.handle_key("c")
    f0 = tv.s.params()["format"]
    tv.handle_key("]")
    assert tv.s.params()["format"] != f0
    tv.handle_key("R")
    assert tv.s.params()["format"] == f0


def test_param_clamps_and_enum_domains(session_blob):
    """Steps must stay inside each parameter's valid domain: the status
    line never shows a value the bake would reject (subdiv > 12) or
    silently alias (OpacityState > 3)."""
    tv = _viewer(session_blob)
    names = list(TWEAKABLE)
    while names[tv.param_i] != "max_subdivision_level":
        tv.handle_key("c")
    for _ in range(15):
        tv.handle_key("]")
    assert tv.s.params()["max_subdivision_level"] == 12
    while names[tv.param_i] != "alpha_cutoff_greater":
        tv.handle_key("c")
    seen = set()
    for _ in range(6):
        tv.handle_key("]")
        seen.add(int(tv.s.params()["alpha_cutoff_greater"]))
    assert seen <= {0, 1, 2, 3}  # cycles OpacityState, never escapes


def test_failed_rebake_is_a_message_not_a_crash(session_blob):
    """An invalid parameter combo must surface as a status message and
    keep the last good frame — not tear the interactive session down."""
    tv = _viewer(session_blob)
    tv.frame_rgb(4, 8)  # bake + cache a good frame
    tv.s.set_param("max_workload_size", 1)  # forces WORKLOAD_TOO_BIG
    assert tv.handle_key("r")  # session stays alive
    assert any("bake failed" in m for m in tv.messages)
    f = tv.frame_rgb(4, 8)  # stale-but-good frame, no exception
    assert np.isfinite(f).all()


def test_zoom_to_prim_validates_index(session_blob):
    tv = _viewer(session_blob)
    with pytest.raises(IndexError):
        tv.zoom_to_prim(99)
    with pytest.raises(IndexError):
        tv.zoom_to_prim(-1)


def test_cli_frame_bad_zoom_exits_2(session_blob, tmp_path, capsys):
    from omm_tpu import cli
    p = tmp_path / "v.bin"
    p.write_bytes(session_blob)
    assert cli.main(["viewer", str(p), "--frame", "--zoom", "99"]) == 2


def test_status_and_ansi_frame(session_blob):
    tv = _viewer(session_blob)
    lines = tv.status_lines()
    assert any("prim 0" in ln for ln in lines)
    assert any("param>" in ln for ln in lines)
    s = render_ansi(tv, rows=6, cols=20)
    assert "\x1b[38;2;" in s and s.count("▀") == 6 * 20


def test_cli_frame(session_blob, tmp_path, capsys):
    from omm_tpu import cli
    p = tmp_path / "v.bin"
    p.write_bytes(session_blob)
    assert cli.main(["viewer", str(p), "--frame", "--frame-rows", "4",
                     "--frame-cols", "12", "--zoom", "0"]) == 0
    out = capsys.readouterr().out
    assert out.count("▀") == 4 * 12
    assert "param>" in out
