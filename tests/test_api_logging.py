"""API-surface and logging-layer tests.

Covers the callable ``vpt.render`` module trick (render/__init__.py) and the
utils/logging severity filter — the TPU build's vptFATAL/WARN/INFO/DEBUG
parity layer (/root/reference/include/vpt/logging.hpp:10-23).
"""
import importlib
import inspect

import pytest


class TestRenderModuleAPI:
    def test_vpt_render_is_callable(self):
        import volume_path_tracer_tpu as vpt

        assert callable(vpt.render)

    def test_submodule_import_still_works(self):
        mod = importlib.import_module("volume_path_tracer_tpu.render.integrator")
        assert hasattr(mod, "trace_rays")

    def test_signature_forwards_to_renderer(self):
        import volume_path_tracer_tpu as vpt
        from volume_path_tracer_tpu.render.renderer import render

        assert inspect.signature(vpt.render) == inspect.signature(render)


class TestLogging:
    def _capture(self, capsys, fn, *args):
        fn(*args)
        return capsys.readouterr().err

    def test_levels_and_filtering(self, capsys, monkeypatch):
        from volume_path_tracer_tpu.utils import logging as vlog

        monkeypatch.setenv("VPT_LOG_LEVEL", "WARN")
        assert self._capture(capsys, vlog.info, "hidden") == ""
        out = self._capture(capsys, vlog.warn, "shown")
        assert "[vpt WARN] shown" in out

        monkeypatch.setenv("VPT_LOG_LEVEL", "DEBUG")
        out = self._capture(capsys, vlog.debug, "dbg")
        # DEBUG lines carry the call-site (source_location parity).
        assert "test_api_logging.py" in out

    def test_fatal_exits_1(self, capsys, monkeypatch):
        from volume_path_tracer_tpu.utils import logging as vlog

        monkeypatch.setenv("VPT_LOG_LEVEL", "INFO")
        with pytest.raises(SystemExit) as ei:
            vlog.fatal("boom")
        assert ei.value.code == 1
        assert "[vpt FATAL] boom" in capsys.readouterr().err

    def test_cli_routes_config_error_through_fatal(self, tmp_path, capsys):
        from volume_path_tracer_tpu.cli import main

        bad = tmp_path / "bad.json"
        bad.write_text('{"definitely": "not a scene"}')
        with pytest.raises(SystemExit) as ei:
            main([str(bad), str(tmp_path / "out.png"), "--cpu"])
        assert ei.value.code == 1
        assert "[vpt FATAL]" in capsys.readouterr().err
