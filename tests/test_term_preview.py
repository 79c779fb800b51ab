"""Terminal live preview (io/term.py) — the raylib-window equivalent."""
import io

import numpy as np

from volume_path_tracer_tpu.io.term import TermPreview, _downsample


class _FakeTTY(io.StringIO):
    def isatty(self):
        return True


def test_downsample_box_average_preserves_mean():
    img = (np.random.default_rng(0).uniform(0, 255, (64, 96, 3))).astype(np.uint8)
    small = _downsample(img, 48, 32)
    assert small.shape == (32, 48, 3)
    assert abs(float(small.mean()) - float(img.mean())) < 3.0


def test_ansi_truecolor_halfblocks_and_inplace_repaint():
    img = (np.random.default_rng(1).uniform(0, 255, (32, 48, 3))).astype(np.uint8)
    s = _FakeTTY()
    tp = TermPreview(max_cols=40, stream=s)
    tp.draw(img, "[vpt] 50%")
    out1 = s.getvalue()
    assert "\x1b[38;2;" in out1 and "▀" in out1 and "[vpt] 50%" in out1
    tp.draw(img, "[vpt] 100%")
    out2 = s.getvalue()[len(out1):]
    # second frame repaints over the first: starts with a cursor-up sequence
    assert out2.startswith("\x1b[") and "A" in out2[:6]


def test_non_tty_is_noop():
    s = io.StringIO()
    tp = TermPreview(stream=s)
    tp.draw(np.zeros((8, 8, 3), np.uint8))
    assert s.getvalue() == "" and not tp.enabled
