"""Streamlit dashboard logic, driven by a scripted stub `streamlit` module.

streamlit is not installed in this environment; the stub implements the
exact API surface apps/dashboard.py uses, so the full dashboard code path
(process -> session state -> three tabs -> search -> DB save) executes for
real against the device pipeline — it is not dead code."""

import sys
import types

import numpy as np
import pytest


class _Ctx:
    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False

    def __getattr__(self, name):
        # Nested widget calls inside a context (sidebar.header etc.).
        return getattr(sys.modules["streamlit"], name)


class _Column(_Ctx):
    pass


class _SessionState(dict):
    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e

    def __setattr__(self, k, v):
        self[k] = v


def _make_stub(button_script):
    """A streamlit stub; ``button_script`` maps button label -> bool."""
    st = types.ModuleType("streamlit")
    st.session_state = _SessionState()
    st.calls = []

    def rec(name, ret=None):
        def f(*a, **k):
            st.calls.append((name, a[:1]))
            return ret

        return f

    st.set_page_config = rec("set_page_config")
    st.title = rec("title")
    st.header = rec("header")
    st.subheader = rec("subheader")
    st.info = rec("info")
    st.success = rec("success")
    st.write = rec("write")
    st.json = rec("json")
    st.image = rec("image")
    st.metric = rec("metric")
    st.bar_chart = rec("bar_chart")
    st.line_chart = rec("line_chart")
    st.file_uploader = rec("file_uploader", None)
    st.checkbox = lambda label, value=False, **k: value
    st.toggle = lambda label, value=False, **k: value
    st.text_input = rec("text_input", "")
    st.sidebar = _Ctx()
    st.spinner = lambda *a, **k: _Ctx()

    def slider(label, mn=0, mx=1, value=None, *a, **k):
        st.calls.append(("slider", (label,)))
        return mn  # smallest workload / first frame

    st.slider = slider

    def button(label, *a, **k):
        return button_script.get(label, False)

    st.button = button

    def tabs(labels):
        return [_Ctx() for _ in labels]

    st.tabs = tabs

    def columns(n):
        n = n if isinstance(n, int) else len(n)
        cols = []
        for _ in range(n):
            c = _Column()
            c.image = st.image
            c.metric = st.metric
            cols.append(c)
        return cols

    st.columns = columns
    return st


@pytest.fixture
def small_cfg(monkeypatch):
    import multimodal_autonomous_driving_perception_and_planning_tpu as m

    cfg = m.DEFAULT_CONFIG.replace(frame_height=120, frame_width=160)
    monkeypatch.setattr(m, "DEFAULT_CONFIG", cfg)
    return cfg


def test_dashboard_process_and_render(monkeypatch, tmp_path, small_cfg):
    from multimodal_autonomous_driving_perception_and_planning_tpu.apps import (
        dashboard,
    )

    monkeypatch.chdir(tmp_path)  # driving_tags.db lands here

    # Run 1: press Process (synthetic, 30 frames at the stubbed slider min).
    st = _make_stub({"Process": True})
    monkeypatch.setitem(sys.modules, "streamlit", st)
    dashboard.main()
    assert st.session_state.results is not None
    frames, dets, outs, tagger, n = st.session_state.results
    assert n == 30 and len(tagger.frame_tags) == 30
    # All three tabs rendered: camera+bev images, metrics, charts.
    names = [c[0] for c in st.calls]
    assert names.count("image") >= 2
    assert names.count("metric") >= 4
    assert "bar_chart" in names and "line_chart" in names

    # Run 2: rerun without Process — renders from cached session state.
    st2 = _make_stub({})
    st2.session_state = st.session_state
    monkeypatch.setitem(sys.modules, "streamlit", st2)
    dashboard.main()
    assert [c[0] for c in st2.calls].count("image") >= 2

    # Run 3: save to DB.
    st3 = _make_stub({"Save tags to database": True})
    st3.session_state = st.session_state
    monkeypatch.setitem(sys.modules, "streamlit", st3)
    dashboard.main()
    assert any(c[0] == "success" for c in st3.calls)
    import sqlite3

    con = sqlite3.connect(tmp_path / "driving_tags.db")
    # frame_tags holds one row per (frame, tag); frames is one per frame.
    n_frames = con.execute("SELECT COUNT(*) FROM frames").fetchone()[0]
    n_tag_rows = con.execute(
        "SELECT COUNT(DISTINCT frame_id) FROM frame_tags"
    ).fetchone()[0]
    con.close()
    assert n_frames == 30 and n_tag_rows == 30
