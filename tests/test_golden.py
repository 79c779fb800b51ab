"""Golden regression tests: pin the renderer's converged statistics.

No C++ reference build or .nvdb assets exist in this environment
(BASELINE.md), so golden values are *self-recorded* converged statistics of
this renderer on procedural scenes, pinned with generous-but-meaningful
tolerances. They guard the estimator against silent behavioral drift
(a change to event probabilities, emission weighting, NEE, light handling or
RNG keying moves these numbers far beyond the tolerance; noise does not).
The semantics themselves are validated against the independent NumPy oracle
in test_integrator.py.
"""
import numpy as np

import jax.numpy as jnp

from volume_path_tracer_tpu.grids.procedural import fire_plume, fog_sphere
from volume_path_tracer_tpu.models.camera import Camera
from volume_path_tracer_tpu.models.medium import Medium
from volume_path_tracer_tpu.render.integrator import IntegratorParams, trace_rays
from volume_path_tracer_tpu.utils import rng as vrng
from volume_path_tracer_tpu.utils.config import CameraParameters
from volume_path_tracer_tpu.utils.spectral import blackbody_xyz_table


def _render_mean(medium, camera, params, W, H, waves, bb=None, seed=10):
    ys, xs = np.mgrid[0:H, 0:W]
    raster = jnp.asarray(np.stack([xs.reshape(-1), ys.reshape(-1)], -1).astype(np.int32))
    pids = jnp.arange(W * H, dtype=jnp.int32)
    acc = 0
    for w in range(1, waves + 1):
        stream = vrng.mix_stream(seed, w)
        u = vrng.counter_uniforms(pids, stream, jnp.int32(2**31 - 1), 2)
        o_w, d_w = camera.generate_rays(raster, u * 0.5)
        L, _, _ = trace_rays(medium, params, bb, o_w, d_w, pids, stream)
        acc = acc + L
    return np.asarray(acc / waves).reshape(H, W, 3)


class TestGolden:
    def test_scattering_cloud_statistics(self):
        medium = Medium.from_grids(fog_sphere(radius=12.0, falloff=3.0))
        camera = Camera.from_parameters(
            CameraParameters((50.0, 0.0, 0.0), (0.0, 0.0, 0.0), (0.0, 1.0, 0.0),
                             36.0, 1.0),
            (32, 32),
        )
        params = IntegratorParams(
            sigma_a=0.0, sigma_s=0.15, hg_g=0.4, le_scale=0.0,
            temperature_offset=300.0, temperature_scale=40.0,
            infinite_xyz=(4.382, 3.509, 17.603), infinite_multiplier=0.14,
            distant_xyz=(0.95047, 1.0, 1.08883), distant_multiplier=50.0,
            distant_inv_direction=(0.5826, 0.766, 0.2717),
            max_depth=100, max_iters=2048,
        )
        img = _render_mean(medium, camera, params, 32, 32, 24)
        mean = img.mean(axis=(0, 1))
        center = img[12:20, 12:20].mean(axis=(0, 1))
        # Golden statistics recorded at framework version 0.1 (24 waves):
        golden_mean = np.array([2.2713, 2.2355, 4.3636])
        golden_center = np.array([5.8577, 6.0087, 8.4720])
        np.testing.assert_allclose(mean, golden_mean, rtol=0.05)
        np.testing.assert_allclose(center, golden_center, rtol=0.08)

    def test_emissive_fire_statistics(self):
        d, t = fire_plume()
        medium = Medium.from_grids(d, t)
        camera = Camera.from_parameters(
            CameraParameters((80.0, 30.0, 0.0), (0.0, 30.0, 0.0), (0.0, 1.0, 0.0),
                             37.0, 1.0),
            (24, 32),
        )
        params = IntegratorParams(
            sigma_a=2.0, sigma_s=0.9, hg_g=0.7, le_scale=4e-4,
            temperature_offset=300.0, temperature_scale=43.0,
            infinite_xyz=(0.25, 0.25, 0.5), infinite_multiplier=10.0,
            distant_xyz=(0.95047, 1.0, 1.08883), distant_multiplier=20.0,
            distant_inv_direction=(0.5, 1.0, 0.0),
            max_depth=200, max_iters=3000,
        )
        bb = jnp.asarray(blackbody_xyz_table())
        img = _render_mean(medium, camera, params, 24, 32, 12, bb=bb)
        mean = img.mean(axis=(0, 1))
        golden_mean = np.array([1.4558, 1.4601, 2.8355])
        np.testing.assert_allclose(mean, golden_mean, rtol=0.06)
        assert np.isfinite(img).all()

    @staticmethod
    def record():
        """Regenerate golden values (run manually after intended changes)."""
        t = TestGolden()
        for name in ("test_scattering_cloud_statistics", "test_emissive_fire_statistics"):
            try:
                getattr(t, name)()
                print(name, "matches current goldens")
            except AssertionError as e:
                print(name, "MISMATCH:", e)


if __name__ == "__main__":
    TestGolden.record()
