"""Unit tests for config, camera, color, spectral, RNG, grid, majorant layers."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from volume_path_tracer_tpu.utils import color, rng as vrng, spectral
from volume_path_tracer_tpu.utils.config import ConfigError, read_configuration, loads_configuration
from volume_path_tracer_tpu.models.camera import Camera
from volume_path_tracer_tpu.grids.grid import dense_grid_from_array, sample_trilinear_local
from volume_path_tracer_tpu.grids.majorant import (
    BRICK,
    build_majorants,
    brick_majorant_reference,
)

REF_SCENES = "/root/reference/scenes"


# ---------------- config ----------------
class TestConfig:
    @pytest.mark.parametrize(
        "name", ["wdas_cloud.json", "fire.json", "fire_lowscattering.json"]
    )
    def test_reference_scenes_parse_unmodified(self, name):
        cfg = read_configuration(f"{REF_SCENES}/{name}")
        assert cfg.output_size[0] > 0 and cfg.output_size[1] > 0
        assert cfg.volume_parameters.sigma_t >= 0
        assert cfg.volume_path.endswith(".nvdb")

    def test_wdas_cloud_values(self):
        cfg = read_configuration(f"{REF_SCENES}/wdas_cloud.json")
        assert cfg.seed == 10
        assert cfg.output_size == (1920, 1080)
        assert cfg.num_waves == 128
        assert cfg.volume_parameters.sigma_s == pytest.approx(0.15)
        assert cfg.volume_parameters.sigma_a == 0.0
        assert cfg.worker_parameters.max_depth == 100
        assert cfg.camera_parameters.vfov_deg == pytest.approx(35)
        assert not cfg.worker_parameters.single_pixel.enabled

    def test_missing_key_rejected(self):
        import json
        obj = json.load(open(f"{REF_SCENES}/wdas_cloud.json"))
        del obj["seed"]
        with pytest.raises(ConfigError, match="missing required key.*seed"):
            loads_configuration(json.dumps(obj))

    def test_unknown_key_rejected(self):
        import json
        obj = json.load(open(f"{REF_SCENES}/wdas_cloud.json"))
        obj["output_image"] = "x.png"  # the stale root configuration.json key
        with pytest.raises(ConfigError, match="unknown key"):
            loads_configuration(json.dumps(obj))

    def test_volume_path_resolved_relative_to_config(self):
        cfg = read_configuration(f"{REF_SCENES}/fire.json")
        assert cfg.volume_path == "/root/reference/volumes/fire.nvdb"


# ---------------- camera ----------------
class TestCamera:
    def _cam(self, w=64, h=48):
        from volume_path_tracer_tpu.utils.config import CameraParameters
        p = CameraParameters(
            position=(10.0, 2.0, 3.0), look=(0.0, 0.0, 0.0), up=(0.0, 1.0, 0.0),
            vfov_deg=40.0, imaging_ratio=0.1,
        )
        return Camera.from_parameters(p, (w, h)), p

    def test_center_ray_points_at_look(self):
        cam, p = self._cam()
        # Center of the image (jitter cancels the +0.5 center offset).
        xy = jnp.array([[31, 23]], jnp.int32)
        o, d = cam.generate_rays(xy, jnp.array([[0.5, 0.5]]) * 0.0 + jnp.array([[0.0, 0.0]]))
        # exact film center: raster (32, 24) maps to screen (0,0) -> camera z axis
        o2, d2 = cam.generate_rays(jnp.array([[32, 24]], jnp.int32), jnp.array([[-0.5, -0.5]]))
        look_dir = -np.asarray(p.position) / np.linalg.norm(p.position)
        np.testing.assert_allclose(np.asarray(d2[0]), look_dir, atol=1e-5)
        np.testing.assert_allclose(np.asarray(o[0]), p.position)

    def test_directions_unit(self):
        cam, _ = self._cam()
        xs = jnp.array([[0, 0], [63, 47], [10, 20]], jnp.int32)
        _, d = cam.generate_rays(xs, jnp.zeros((3, 2)))
        np.testing.assert_allclose(np.linalg.norm(np.asarray(d), axis=-1), 1.0, atol=1e-6)

    def test_raster_orientation(self):
        # (0,0) maps to screen (1,1): left(+x basis col sign) and up direction.
        cam, p = self._cam()
        _, d_tl = cam.generate_rays(jnp.array([[0, 0]], jnp.int32), jnp.zeros((1, 2)))
        _, d_br = cam.generate_rays(jnp.array([[63, 47]], jnp.int32), jnp.zeros((1, 2)))
        d_tl, d_br = np.asarray(d_tl[0]), np.asarray(d_br[0])
        # top-left ray should have larger world-y component than bottom-right
        assert d_tl[1] > d_br[1]


# ---------------- color ----------------
class TestColor:
    def test_xyz_white_maps_to_near_unit_rgb(self):
        white = jnp.array([0.95047, 1.0, 1.08883])
        rgb = color.xyz_to_linsrgb(white)
        np.testing.assert_allclose(np.asarray(rgb), [1.0, 1.0, 1.0], atol=2e-3)

    def test_srgb_curve(self):
        lin = jnp.array([0.0, 0.0015, 0.5, 1.0])
        s = np.asarray(color.linsrgb_to_srgb(lin))
        assert s[0] == 0.0
        np.testing.assert_allclose(s[1], 12.92 * 0.0015, rtol=1e-6)
        np.testing.assert_allclose(s[2], 1.055 * 0.5 ** (1 / 2.4) - 0.055, rtol=1e-5)
        np.testing.assert_allclose(s[3], 1.0, rtol=1e-5)

    def test_film_tonemap(self):
        film = jnp.zeros((2, 2, 4)).at[..., 3].set(2.0).at[0, 0, :3].set(
            jnp.array([0.95047, 1.0, 1.08883]) * 2.0
        )
        img = np.asarray(color.film_to_srgb_u8(film))
        assert img.shape == (2, 2, 3)
        assert (img[0, 0] > 250).all()
        assert (img[1, 1] == 0).all()

    def test_film_tonemap_zero_weight_is_black(self):
        # A fresh film mid-wave has weight-0 pixels; they must tonemap to
        # black, not NaN->u8 garbage (first-wave live preview).
        img = np.asarray(color.film_to_srgb_u8(jnp.zeros((2, 2, 4))))
        assert (img == 0).all()


# ---------------- spectral ----------------
class TestSpectral:
    def test_lut_matches_direct_integration(self):
        table = jnp.asarray(spectral.blackbody_xyz_table())
        for T in [500.0, 1700.0, 6600.0]:
            direct = spectral.blackbody_spectrum_to_xyz(T)
            # exact breakpoint: T=1700 lives at idx 18 (shifted table)
            lut = np.asarray(spectral.blackbody_radiation_xyz(table, jnp.array(T)))
            np.testing.assert_allclose(lut, direct, rtol=2e-2)

    def test_breakpoint_exact(self):
        table = jnp.asarray(spectral.blackbody_xyz_table())
        # slot i holds T=(i-1)*100; T=300 -> slot 4
        lut = np.asarray(spectral.blackbody_radiation_xyz(table, jnp.array(300.0)))
        np.testing.assert_allclose(lut, np.asarray(table[4]), rtol=1e-6)

    def test_nonpositive_temperature_is_zero(self):
        table = jnp.asarray(spectral.blackbody_xyz_table())
        out = np.asarray(
            spectral.blackbody_radiation_xyz(table, jnp.array([-5.0, 0.0]))
        )
        assert (out == 0).all()

    def test_differentiable(self):
        table = jnp.asarray(spectral.blackbody_xyz_table())
        g = jax.grad(lambda t: spectral.blackbody_radiation_xyz(table, t)[1])(
            jnp.float32(1750.0)
        )
        # Y increases with temperature in this range
        assert float(g) > 0

    def test_extended_table_covers_high_temperatures(self):
        # The reference integrates exactly for T >= 49,900 K
        # (precompute_blackbody.cpp:25-36); we size the table to the scene's
        # max temperature instead. A 60,000 K lookup through the extended
        # table must match direct integration; the default 500-slot table
        # clamps (documented behavior for out-of-table input).
        n = spectral.breakpoints_for_max_temp(60000.0)
        assert n >= 602
        big = jnp.asarray(spectral.blackbody_xyz_table(n))
        # Default-table region is bit-identical (same breakpoints).
        small = jnp.asarray(spectral.blackbody_xyz_table())
        np.testing.assert_array_equal(np.asarray(big[:500]), np.asarray(small))
        direct = spectral.blackbody_spectrum_to_xyz(60000.0)
        lut = np.asarray(spectral.blackbody_radiation_xyz(big, jnp.array(60000.0)))
        np.testing.assert_allclose(lut, direct, rtol=2e-2)
        clamped = np.asarray(
            spectral.blackbody_radiation_xyz(small, jnp.array(60000.0))
        )
        # Out-of-table input pins to the table end (linear continuation of
        # the last segment, within a fraction of a percent of the endpoint).
        np.testing.assert_allclose(clamped, np.asarray(small[-1]), rtol=5e-3)

    def test_planck_peak_wien(self):
        # Wien displacement: peak wavelength ~ 2.898e-3 / T
        lam = np.linspace(2e-7, 3e-6, 2000).astype(np.float32)
        for T in [3000.0, 5000.0]:
            vals = spectral.planck_law(lam, T)
            peak = lam[np.argmax(vals)]
            np.testing.assert_allclose(peak, 2.898e-3 / T, rtol=2e-2)


# ---------------- rng ----------------
class TestRng:
    def test_counter_uniform_range_and_determinism(self):
        pids = jnp.arange(4096, dtype=jnp.int32)
        u1 = vrng.counter_uniforms(pids, vrng.mix_stream(1, 2), 7, 8)
        u2 = vrng.counter_uniforms(pids, vrng.mix_stream(1, 2), 7, 8)
        u3 = vrng.counter_uniforms(pids, vrng.mix_stream(1, 3), 7, 8)
        assert (np.asarray(u1) == np.asarray(u2)).all()
        assert not (np.asarray(u1) == np.asarray(u3)).all()
        a = np.asarray(u1)
        assert a.min() >= 0.0 and a.max() < 1.0
        np.testing.assert_allclose(a.mean(), 0.5, atol=0.01)
        np.testing.assert_allclose(a.var(), 1.0 / 12, atol=0.01)

    def test_shard_invariance(self):
        # A lane's stream depends only on its global pixel id: computing a
        # subset of pixel ids yields the same values as the full batch.
        full = vrng.counter_uniforms(
            jnp.arange(64, dtype=jnp.int32), jnp.uint32(5), 3, 4
        )
        part = vrng.counter_uniforms(
            jnp.arange(32, 64, dtype=jnp.int32), jnp.uint32(5), 3, 4
        )
        assert (np.asarray(full)[32:] == np.asarray(part)).all()

    def test_sample_discrete3_matches_weights(self):
        u = vrng.counter_uniforms(jnp.arange(200000, dtype=jnp.int32), jnp.uint32(1), 0, 1)[:, 0]
        idx = np.asarray(vrng.sample_discrete3(0.2, 0.3, 0.5, u))
        counts = np.bincount(idx, minlength=3) / idx.size
        np.testing.assert_allclose(counts, [0.2, 0.3, 0.5], atol=0.01)

    def test_sample_exponential(self):
        u = vrng.counter_uniforms(jnp.arange(100000, dtype=jnp.int32), jnp.uint32(9), 0, 1)[:, 0]
        x = np.asarray(vrng.sample_exponential(u, 2.0))
        np.testing.assert_allclose(x.mean(), 0.5, atol=0.02)


# ---------------- grid / trilinear ----------------
class TestGrid:
    def test_trilinear_at_voxel_centers(self):
        rs = np.random.default_rng(0)
        data = rs.random((5, 6, 7)).astype(np.float32)
        g = dense_grid_from_array(data, origin_ijk=(-2, 3, 1))
        pts = np.array([[0, 0, 0], [4, 5, 6], [2, 3, 4]], np.float32)
        vals = np.asarray(sample_trilinear_local(g.data, jnp.asarray(pts)))
        expect = [data[0, 0, 0], data[4, 5, 6], data[2, 3, 4]]
        np.testing.assert_allclose(vals, expect, rtol=1e-6)

    def test_trilinear_interpolates(self):
        data = np.zeros((3, 3, 3), np.float32)
        data[1, 1, 1] = 8.0
        g = dense_grid_from_array(data)
        v = float(sample_trilinear_local(g.data, jnp.array([[0.5, 0.5, 0.5]]))[0])
        np.testing.assert_allclose(v, 1.0, rtol=1e-6)  # 8 * (0.5)^3

    def test_background_zero_outside(self):
        data = np.ones((4, 4, 4), np.float32)
        g = dense_grid_from_array(data)
        v = np.asarray(
            sample_trilinear_local(
                g.data, jnp.array([[-2.0, 1.0, 1.0], [1.0, 1.0, 5.5]])
            )
        )
        assert (v == 0).all()

    def test_world_index_roundtrip(self):
        g = dense_grid_from_array(
            np.ones((4, 4, 4), np.float32), origin_ijk=(2, 2, 2),
            voxel_size=0.5, world_offset=(1.0, -2.0, 3.0),
        )
        p = jnp.array([[3.3, 2.1, 4.9]])
        back = g.index_to_world(g.world_to_index(p))
        np.testing.assert_allclose(np.asarray(back), np.asarray(p), rtol=1e-6)

    def test_trilinear_grad(self):
        data = jnp.ones((4, 4, 4))
        grad = jax.grad(
            lambda d: sample_trilinear_local(d, jnp.array([[1.25, 1.5, 1.75]]))[0]
        )(data)
        np.testing.assert_allclose(float(jnp.sum(grad)), 1.0, rtol=1e-6)
        assert float(jnp.max(grad)) < 1.0  # spread over 8 corners


# ---------------- majorants ----------------
class TestMajorants:
    def test_matches_direct_reference(self):
        rs = np.random.default_rng(1)
        data = rs.random((20, 17, 9)).astype(np.float32)
        g = dense_grid_from_array(data)
        pyr = build_majorants(g, order=1)
        direct = brick_majorant_reference(data, order=1)
        np.testing.assert_allclose(np.asarray(pyr.brick_maj), direct, rtol=1e-6)

    def test_majorant_bounds_trilinear_everywhere(self):
        # The section 3.5 invariant: brick majorant >= interpolated density at
        # every point inside the brick (sampled densely).
        rs = np.random.default_rng(2)
        data = (rs.random((16, 16, 16)) ** 3).astype(np.float32)
        g = dense_grid_from_array(data)
        pyr = build_majorants(g, order=1)
        pts = rs.random((20000, 3)).astype(np.float32) * 15.0
        vals = np.asarray(sample_trilinear_local(g.data, jnp.asarray(pts)))
        bricks = np.floor(pts / BRICK).astype(int)
        majs = np.asarray(pyr.brick_maj)[bricks[:, 0], bricks[:, 1], bricks[:, 2]]
        assert (vals <= majs + 1e-5).all()

    def test_super_majorant_bounds_bricks(self):
        rs = np.random.default_rng(3)
        data = rs.random((70, 70, 70)).astype(np.float32)
        pyr = build_majorants(dense_grid_from_array(data))
        b = np.asarray(pyr.brick_maj)
        s = np.asarray(pyr.super_maj)
        bx, by, bz = b.shape
        for i in range(bx):
            for j in range(by):
                for k in range(bz):
                    assert b[i, j, k] <= s[i // 8, j // 8, k // 8] + 1e-6

    def test_majorants_detached(self):
        import dataclasses
        g = dense_grid_from_array(np.ones((8, 8, 8), np.float32))

        def f(d):
            grid = dataclasses.replace(g, data=d)
            return jnp.sum(build_majorants(grid).brick_maj)

        grad = jax.grad(f)(jnp.ones((8, 8, 8)))
        assert float(jnp.abs(grad).max()) == 0.0


class TestPackedTrilinear:
    def test_rows_match_generic_everywhere(self):
        from volume_path_tracer_tpu.grids.grid import (
            pack_corner_rows,
            sample_trilinear_rows,
        )
        rs = np.random.default_rng(11)
        data = rs.random((9, 7, 11)).astype(np.float32)
        rows = np.asarray(pack_corner_rows(jnp.asarray(data)))
        # points spanning inside, faces, the [-1,dim] halo, and far outside
        pts = (rs.random((5000, 3)).astype(np.float32) * 16.0 - 3.0)
        a = np.asarray(sample_trilinear_local(jnp.asarray(data), jnp.asarray(pts)))
        b = np.asarray(
            sample_trilinear_rows(jnp.asarray(rows), data.shape, jnp.asarray(pts))
        )
        np.testing.assert_allclose(a, b, atol=1e-6)

    def test_majorant_rows_pack(self):
        from volume_path_tracer_tpu.grids.majorant import build_majorants
        rs = np.random.default_rng(12)
        data = rs.random((70, 30, 20)).astype(np.float32)
        pyr = build_majorants(dense_grid_from_array(data))
        b = np.asarray(pyr.brick_maj)
        rows = np.asarray(pyr.rows)
        s = np.asarray(pyr.super_maj)
        bx, by, bz = b.shape
        np.testing.assert_allclose(rows[:, 0], b.reshape(-1))
        idx = 0
        for i in range(bx):
            for j in range(by):
                for k in range(bz):
                    assert rows[idx, 1] == s[i // 8, j // 8, k // 8]
                    idx += 1


class TestWaveDriverContracts:
    """Round-5 driver tunnel-hygiene surfaces (renderer.py)."""

    def test_render_wave_image_return_ncap(self):
        import jax
        import numpy as np

        from tests.scene_fixtures import small_scene
        from volume_path_tracer_tpu.render.renderer import (
            Scene, render_wave_image,
        )

        medium, camera, params, W, H = small_scene()
        scene = Scene(
            medium=medium, camera=camera, params=params, width=W, height=H,
            seed=5, num_waves=1, use_jitter=True,
        )
        film, ncap = render_wave_image(scene, 1, return_ncap=True)
        assert film.shape == (H, W, 4)
        # the scalar stays on device until the caller reads it
        assert int(ncap) >= 0
        film2 = render_wave_image(scene, 1)
        np.testing.assert_array_equal(np.asarray(film), np.asarray(film2))

    def test_pixel_coords_device_cache(self):
        from volume_path_tracer_tpu.render.renderer import (
            _pixel_coords_device, pixel_coords,
        )
        import numpy as np

        c1, p1 = _pixel_coords_device(8, 6)
        c2, p2 = _pixel_coords_device(8, 6)
        assert c1 is c2 and p1 is p2  # cached: uploaded once per shape
        np.testing.assert_array_equal(np.asarray(c1), pixel_coords(8, 6))
        np.testing.assert_array_equal(np.asarray(p1), np.arange(48))
