"""Debug tooling tests: traces, path events, visualizer."""
import os
import subprocess
import sys

import numpy as np

import jax.numpy as jnp

from volume_path_tracer_tpu.grids.grid import sample_trilinear_local
from volume_path_tracer_tpu.grids.procedural import fog_sphere
from volume_path_tracer_tpu.models.medium import Medium
from volume_path_tracer_tpu.render.integrator import IntegratorParams

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _params(**kw):
    d = dict(
        sigma_a=0.1, sigma_s=0.4, hg_g=0.3, le_scale=0.0,
        temperature_offset=300.0, temperature_scale=40.0,
        infinite_xyz=(0.25, 0.25, 0.5), infinite_multiplier=1.0,
        distant_xyz=(0.95, 1.0, 1.09), distant_multiplier=3.0,
        distant_inv_direction=(0.5, 1.0, 0.0),
        max_depth=40, max_iters=2048,
    )
    d.update(kw)
    return IntegratorParams(**d)


class TestTraces:
    def test_majorant_segments_tile_and_bound(self, tmp_path):
        from volume_path_tracer_tpu.tools.trace import majorant_segments, majorant_trace
        med = Medium.from_grids(fog_sphere(radius=10.0))
        # graze the shell so the ray crosses bricks with varied majorants
        o = np.array([-40.0, 9.5, 0.5])
        d = np.array([1.0, 0.02, 0.01]); d /= np.linalg.norm(d)
        segs = majorant_segments(med, o, d)
        assert len(segs) >= 2
        assert len({round(s[2], 5) for s in segs}) >= 2  # varied majorants
        # segments tile the clipped ray: contiguous, increasing
        for (a0, a1, _), (b0, b1, _) in zip(segs, segs[1:]):
            assert a1 <= b0 + 1e-4
            assert a1 > a0
        # majorant bounds the density at sampled points within each segment
        g = med.density
        o_i = np.asarray(g.world_to_index(jnp.asarray(o, jnp.float32)))
        for t0, t1, maj in segs:
            ts = np.linspace(t0 + 1e-3, t1 - 1e-3, 7)
            pts = o_i[None, :] + d[None, :] * ts[:, None]
            vals = np.asarray(
                sample_trilinear_local(
                    g.data, jnp.asarray(pts - np.asarray(g.origin_ijk))
                )
            )
            assert (vals <= maj + 1e-4).all(), (maj, vals.max())
        # CSV writes with the reference header
        p = str(tmp_path / "mt.csv")
        majorant_trace(med, o, d, p)
        header = open(p).readline().strip()
        assert header == "X0,Y0,Z0,X1,Y1,Z1,T0,T1,Majorant"

    def test_path_events_consistent_radiance(self, tmp_path):
        from volume_path_tracer_tpu.render.integrator import trace_rays
        from volume_path_tracer_tpu.tools.trace import (
            trace_path_events, write_path_events_csv,
        )
        from volume_path_tracer_tpu.utils import rng as vrng
        med = Medium.from_grids(fog_sphere(radius=10.0))
        params = _params()
        o = np.array([-40.0, 0.5, 0.2], np.float32)
        d = np.array([1.0, 0.0, 0.0], np.float32)
        events = trace_path_events(med, params, None, o, d, pixel_id=5, seed=3)
        kinds = [e["kind"] for e in events]
        assert kinds[0] == "new_ray" and kinds[-1] == "radiance"
        assert any(k in ("sampled_point", "escaped") for k in kinds)
        # the debug-instrumented trace must reproduce the production result
        L, _, _ = trace_rays(
            med, params, None, jnp.asarray([o]), jnp.asarray([d]),
            jnp.asarray([5], jnp.int32), vrng.mix_stream(3, 1),
        )
        np.testing.assert_allclose(events[-1]["L"], np.asarray(L[0]), rtol=1e-5)
        p = str(tmp_path / "log.csv")
        write_path_events_csv(events, p)
        assert open(p).readline().startswith("new_ray")

    def test_dda_trace(self, tmp_path):
        from volume_path_tracer_tpu.tools.trace import dda_trace
        med = Medium.from_grids(fog_sphere(radius=8.0))
        rows = dda_trace(
            med, np.array([-30.0, 0.5, 0.5]), np.array([1.0, 0.0, 0.0]),
            str(tmp_path / "dda.csv"),
        )
        assert len(rows) > 10
        # values bounded by their brick maxima
        for r in rows:
            assert r[4] <= r[7] + 1e-5  # Value <= Maximum


class TestVisualizer:
    def test_visualize_ray_cli(self, tmp_path):
        import json
        scene = {
            "output_size": [32, 32],
            "worker_parameters": {
                "single_pixel": {"enabled": True, "coord": [16, 16]},
                "infinite_light": {"xyz": [0.25, 0.25, 0.5], "multiplier": 1},
                "distant_light": {"xyz": [0.95, 1.0, 1.09], "multiplier": 3,
                                  "inv_direction": [0.5, 1, 0]},
                "use_jitter": True, "max_depth": 30,
            },
            "volume_parameters": {
                "sigma_s": 0.3, "sigma_a": 0.1, "henyey_greenstein_g": 0.3,
                "le_scale": 0.0, "temperature_offset": 300.0,
                "temperature_scale": 40.0,
            },
            "seed": 5, "tile_size": [8, 8], "num_waves": 1, "num_workers": 1,
            "volume_path": "unused.nvdb",
            "camera_parameters": {
                "position": [60, 0, 0], "look": [0, 0, 0], "up": [0, 1, 0],
                "vfov_deg": 35, "imaging_ratio": 0.1,
            },
        }
        cfg = tmp_path / "scene.json"
        cfg.write_text(json.dumps(scene))
        out = tmp_path / "ray.png"
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        r = subprocess.run(
            [sys.executable, "-m", "volume_path_tracer_tpu.tools.visualize_ray",
             str(cfg), str(out), "--procedural", "sphere", "--cpu"],
            capture_output=True, text=True, cwd=REPO, env=env, timeout=400,
        )
        assert r.returncode == 0, r.stderr[-1500:]
        assert out.exists() and out.stat().st_size > 1000

    def test_plot_scripts(self, tmp_path):
        from volume_path_tracer_tpu.tools.trace import (
            dda_trace, majorant_trace, trace_path_events, write_path_events_csv,
        )
        med = Medium.from_grids(fog_sphere(radius=8.0))
        o = np.array([-30.0, 0.5, 0.5]); d = np.array([1.0, 0.0, 0.0])
        mt = str(tmp_path / "mt.csv"); dt = str(tmp_path / "dt.csv")
        lg = str(tmp_path / "log.csv")
        majorant_trace(med, o, d, mt)
        dda_trace(med, o, d, dt)
        write_path_events_csv(
            trace_path_events(med, _params(), None, o, d), lg
        )
        env = dict(os.environ, JAX_PLATFORMS="cpu", MPLBACKEND="Agg")
        for script, arg in [
            ("scripts/plot_majorant_trace.py", mt),
            ("scripts/plot_dda_trace.py", dt),
            ("scripts/plot_raytrace.py", lg),
        ]:
            png = str(tmp_path / (os.path.basename(script) + ".png"))
            r = subprocess.run(
                [sys.executable, script, arg, png],
                capture_output=True, text=True, cwd=REPO, env=env, timeout=200,
            )
            assert r.returncode == 0, (script, r.stderr[-800:])
            assert os.path.exists(png)
