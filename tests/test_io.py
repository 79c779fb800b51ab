"""I/O tests: PNG codec, NanoVDB round-trip, CLI end-to-end."""
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class TestPng:
    def test_roundtrip_u8(self, tmp_path):
        from volume_path_tracer_tpu.io.png import read_png, write_png
        rs = np.random.default_rng(0)
        img = rs.integers(0, 256, (33, 47, 3), dtype=np.uint8)
        p = str(tmp_path / "t.png")
        write_png(p, img)
        back = read_png(p)
        assert (back == img).all()

    def test_roundtrip_u16(self, tmp_path):
        from volume_path_tracer_tpu.io.png import read_png, write_png
        rs = np.random.default_rng(1)
        img = rs.integers(0, 65536, (8, 9, 3), dtype=np.uint16)
        p = str(tmp_path / "t16.png")
        write_png(p, img)
        back = read_png(p)
        assert back.dtype == np.uint16 and (back == img).all()

    def test_external_readers_accept(self, tmp_path):
        # PIL is not in the image; validate structure with zlib+struct checks
        # plus a header sanity parse instead.
        from volume_path_tracer_tpu.io.png import write_png
        img = np.zeros((4, 4, 3), np.uint8)
        p = str(tmp_path / "z.png")
        write_png(p, img)
        raw = open(p, "rb").read()
        assert raw[:8] == b"\x89PNG\r\n\x1a\n"
        assert b"IHDR" in raw and b"IDAT" in raw and raw.rstrip().endswith(b"IEND" + raw[-4:])


class TestNvdb:
    def _roundtrip(self, data, origin, voxel, offset):
        import tempfile
        from volume_path_tracer_tpu.grids.nvdb import read_nvdb, write_nvdb
        with tempfile.TemporaryDirectory() as td:
            p = os.path.join(td, "g.nvdb")
            write_nvdb(p, {"density": (data, origin, voxel, offset)})
            grids = read_nvdb(p)
        assert "density" in grids
        return grids["density"]

    def test_roundtrip_simple(self):
        rs = np.random.default_rng(2)
        data = (rs.random((20, 12, 9)) * (rs.random((20, 12, 9)) > 0.5)).astype(np.float32)
        g = self._roundtrip(data, (0, 0, 0), 0.5, (1.0, -2.0, 3.0))
        assert g.voxel_size == 0.5
        assert g.world_offset == (1.0, -2.0, 3.0)
        # reader returns the active bbox; embed original into it for compare
        lo = np.array(g.origin_ijk)
        assert (lo >= 0).all()
        sub = g.data
        ref = data[lo[0] : lo[0] + sub.shape[0], lo[1] : lo[1] + sub.shape[1], lo[2] : lo[2] + sub.shape[2]]
        np.testing.assert_array_equal(sub, ref)

    def test_roundtrip_negative_origin_multi_leaf(self):
        rs = np.random.default_rng(3)
        data = rs.random((40, 33, 21)).astype(np.float32)
        g = self._roundtrip(data, (-17, -8, -3), 1.0, (0.0, 0.0, 0.0))
        # all voxels nonzero -> bbox == full extent
        assert g.origin_ijk == (-17, -8, -3)
        np.testing.assert_array_equal(g.data, data)

    def test_roundtrip_spanning_upper_nodes(self):
        # volume spanning two 4096-extent upper nodes via negative coords
        data = np.zeros((16, 8, 8), np.float32)
        data[2, 3, 4] = 1.5
        data[13, 2, 1] = 2.5
        g = self._roundtrip(data, (-8, 0, 0), 1.0, (0.0, 0.0, 0.0))
        lo = np.array(g.origin_ijk)
        # absolute positions of the two voxels
        assert g.data[2 - (lo[0] + 8), 3 - lo[1], 4 - lo[2]] == 1.5 or True
        # simpler: reconstruct dense world from reader output
        full = np.zeros((16, 8, 8), np.float32)
        s = lo - np.array([-8, 0, 0])
        full[s[0] : s[0] + g.data.shape[0], s[1] : s[1] + g.data.shape[1], s[2] : s[2] + g.data.shape[2]] = g.data
        np.testing.assert_array_equal(full, data)

    def test_medium_from_nvdb(self, tmp_path):
        from volume_path_tracer_tpu.grids.nvdb import read_nvdb_medium, write_nvdb
        rs = np.random.default_rng(4)
        d = rs.random((10, 10, 10)).astype(np.float32)
        t = (rs.random((10, 10, 10)) * 20).astype(np.float32)
        p = str(tmp_path / "m.nvdb")
        write_nvdb(p, {
            "density": (d, (0, 0, 0), 1.0, (0.0, 0.0, 0.0)),
            "temperature": (t, (0, 0, 0), 1.0, (0.0, 0.0, 0.0)),
        })
        med = read_nvdb_medium(p)
        assert med.has_temperature
        np.testing.assert_array_equal(np.asarray(med.density.data), d)
        np.testing.assert_array_equal(np.asarray(med.temperature.data), t)

    def test_missing_density_fatal(self, tmp_path):
        from volume_path_tracer_tpu.grids.nvdb import (
            NvdbError, read_nvdb_medium, write_nvdb,
        )
        p = str(tmp_path / "x.nvdb")
        write_nvdb(p, {"foo": (np.ones((4, 4, 4), np.float32), (0, 0, 0), 1.0, (0, 0, 0))})
        with pytest.raises(NvdbError, match="density"):
            read_nvdb_medium(p)


class TestCli:
    def test_cli_end_to_end(self, tmp_path):
        import json
        scene = {
            "output_size": [24, 16],
            "worker_parameters": {
                "single_pixel": {"enabled": False, "coord": [0, 0]},
                "infinite_light": {"xyz": [0.25, 0.25, 0.5], "multiplier": 2},
                "distant_light": {"xyz": [0.95, 1.0, 1.09], "multiplier": 5,
                                  "inv_direction": [0.5, 1, 0]},
                "use_jitter": True,
                "max_depth": 40,
            },
            "volume_parameters": {
                "sigma_s": 0.2, "sigma_a": 0.05, "henyey_greenstein_g": 0.3,
                "le_scale": 0.0, "temperature_offset": 300.0,
                "temperature_scale": 40.0,
            },
            "seed": 7, "tile_size": [8, 8], "num_waves": 2, "num_workers": 1,
            "volume_path": "vol.nvdb",
            "camera_parameters": {
                "position": [70, 0, 0], "look": [0, 0, 0], "up": [0, 1, 0],
                "vfov_deg": 35, "imaging_ratio": 0.1,
            },
        }
        cfg = tmp_path / "scene.json"
        cfg.write_text(json.dumps(scene))
        # write the referenced volume as .nvdb (tests reader+CLI integration)
        from volume_path_tracer_tpu.grids.nvdb import write_nvdb
        from volume_path_tracer_tpu.grids.procedural import fog_sphere
        g = fog_sphere(radius=12.0)
        write_nvdb(str(tmp_path / "vol.nvdb"),
                   {"density": (np.asarray(g.data), g.origin_ijk, g.voxel_size, g.world_offset)})
        out = tmp_path / "out.png"
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        r = subprocess.run(
            [sys.executable, "-m", "volume_path_tracer_tpu.cli", str(cfg),
             str(out), "--cpu", "--mesh", "1"],
            capture_output=True, text=True, cwd=REPO, env=env, timeout=500,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        from volume_path_tracer_tpu.io.png import read_png
        img = read_png(str(out))
        assert img.shape == (16, 24, 3)
        assert img.max() > 0  # the scene is lit
