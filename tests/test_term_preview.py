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


def test_geometry_contract_and_presmall_passthrough():
    """geometry() publishes the draw target; an already-small image skips the
    host downsample (the CLI downsamples on device — cli._live_draw)."""
    s = _FakeTTY()
    tp = TermPreview(max_cols=40, stream=s)
    out_h, out_w = tp.geometry(1024, 1024)
    assert out_w <= 40 and out_h % 2 == 0 and out_h >= 2
    # aspect: ~1 image row per column at square-ish half-block cells
    assert abs(out_h - out_w) <= 2
    small = (np.random.default_rng(2).uniform(0, 255, (out_h, out_w, 3))).astype(
        np.uint8
    )
    tp.draw(small, "pre-small")
    txt = s.getvalue()
    assert "\x1b[38;2;" in txt and "pre-small" in txt
    # exact passthrough: the first painted top-row pixel is small[0, 0]
    r, g, b = (int(v) for v in small[0, 0])
    assert f"\x1b[38;2;{r};{g};{b}m" in txt
