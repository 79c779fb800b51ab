"""Round-4 wide fused rows: temperature_on_density_grid + 16-wide tables.

An alignment-compatible temperature grid (same voxel size, integer index
offset between frames) folds into columns 8..15 of the fused row table
(models/medium.pack_fused_rows) so emissive collisions cost zero extra
gathers. The fold must be EXACT: for aligned grids a density cell maps onto
exactly one temperature cell, so interpolating the folded corner values
reproduces the reference's own-transform temperature sample
(/root/reference/src/worker.cpp:153-155).
"""
import numpy as np

import jax
import jax.numpy as jnp

from volume_path_tracer_tpu.grids.grid import dense_grid_from_array
from volume_path_tracer_tpu.grids.procedural import fire_plume
from volume_path_tracer_tpu.models.camera import Camera
from volume_path_tracer_tpu.models.medium import (
    Medium,
    temperature_on_density_grid,
)
from volume_path_tracer_tpu.render.integrator import (
    IntegratorParams,
    trace_rays,
)
from volume_path_tracer_tpu.utils import rng as vrng
from volume_path_tracer_tpu.utils.config import CameraParameters
from volume_path_tracer_tpu.utils.spectral import (
    blackbody_pairs,
    blackbody_radiation_xyz,
    blackbody_radiation_xyz_from_pairs,
    blackbody_xyz_table,
)


def _grids(offset=(0.0, 0.0, 0.0), voxel=1.0, t_origin=(-2, 0, -2)):
    rng = np.random.default_rng(3)
    dens = dense_grid_from_array(
        rng.uniform(0, 1, (12, 10, 11)).astype(np.float32),
        origin_ijk=(-4, 0, -5), voxel_size=1.0,
    )
    temp = dense_grid_from_array(
        rng.uniform(0, 20, (10, 12, 9)).astype(np.float32),
        origin_ijk=t_origin, voxel_size=voxel, world_offset=offset,
    )
    return dens, temp


class TestAlignmentDetection:
    def test_integer_offset_is_aligned(self):
        dens, temp = _grids(offset=(3.0, -2.0, 7.0))
        assert temperature_on_density_grid(dens, temp) is not None

    def test_half_voxel_shift_is_not(self):
        dens, temp = _grids(offset=(0.5, 0.0, 0.0))
        assert temperature_on_density_grid(dens, temp) is None

    def test_mismatched_voxel_size_is_not(self):
        dens, temp = _grids(voxel=0.5)
        assert temperature_on_density_grid(dens, temp) is None

    def test_fire_plume_fixture_stays_misaligned(self):
        # The pinned fixture deliberately exercises the own-transform path.
        d, t = fire_plume(height=16, radius=5.0)
        assert temperature_on_density_grid(d, t) is None
        assert Medium.from_grids(d, t).density_rows.shape[1] == 8

    def test_exact_shifted_copy(self):
        """T[q + 1] must equal the temperature value at density coord q, over
        the full corner-table extent -1..dim (including the fringe where the
        temperature grid extends beyond the density bbox)."""
        dens, temp = _grids(offset=(3.0, -2.0, 7.0), t_origin=(-1, 2, -3))
        T = np.asarray(temperature_on_density_grid(dens, temp))
        X, Y, Z = dens.shape
        assert T.shape == (X + 2, Y + 2, Z + 2)
        for q in [(0, 0, 0), (3, 4, 5), (X - 1, Y - 1, Z - 1), (7, 1, 9),
                  (-1, -1, -1), (X, Y, Z), (-1, 4, 5), (X, 0, Z)]:
            # world position of density coord q -> temperature local coords
            w = (np.add(dens.origin_ijk, q)) * dens.voxel_size
            w = w + np.asarray(dens.world_offset)
            tl = (w - np.asarray(temp.world_offset)) / temp.voxel_size
            tl = tl - np.asarray(temp.origin_ijk)
            tl = np.round(tl).astype(int)
            inside = all(0 <= tl[a] < temp.shape[a] for a in range(3))
            want = np.asarray(temp.data)[tuple(tl)] if inside else 0.0
            got = T[tuple(np.add(q, 1))]
            assert got == want, (q, got, want)


class TestWideRowRendering:
    def _fire_scene(self):
        d, t = fire_plume(height=24, radius=7.0)
        t_al = dense_grid_from_array(
            np.asarray(t.data), origin_ijk=t.origin_ijk,
            voxel_size=t.voxel_size, world_offset=(0.0, 0.0, 0.0),
        )
        params = IntegratorParams(
            sigma_a=2.0, sigma_s=0.9, hg_g=0.7, le_scale=4e-8,
            temperature_offset=300.0, temperature_scale=43.0,
            infinite_xyz=(0.25, 0.25, 0.5), infinite_multiplier=10.0,
            distant_xyz=(0.95, 1.0, 1.09), distant_multiplier=20.0,
            distant_inv_direction=(0.5, 1.0, 0.0),
            max_depth=10000, max_iters=512,
        )
        cam = Camera.from_parameters(
            CameraParameters((60.0, 12.0, 0.0), (0.0, 12.0, 0.0),
                             (0.0, 1.0, 0.0), 37.0, 0.1), (24, 16),
        )
        N = 24 * 16
        ys, xs = np.mgrid[0:16, 0:24]
        raster = jnp.asarray(
            np.stack([xs.reshape(-1), ys.reshape(-1)], -1).astype(np.int32))
        pids = jnp.arange(N, dtype=jnp.int32)
        stream = jnp.broadcast_to(vrng.mix_stream(7, 1), (N,))
        u = vrng.counter_uniforms(pids, stream, jnp.int32(2**31 - 1), 2)
        o, dr = cam.generate_rays(raster, u * 0.5)
        return d, t_al, params, o, dr, pids, stream

    def test_wide_rows_match_unpacked_oracle(self):
        d, t_al, params, o, dr, pids, stream = self._fire_scene()
        med_wide = Medium.from_grids(d, t_al)
        assert med_wide.density_rows.shape[1] == 16
        med_raw = Medium.from_grids(d, t_al, pack=False)
        bb = jnp.asarray(blackbody_xyz_table())
        Lw, _, _ = trace_rays(med_wide, params, bb, o, dr, pids, stream)
        Lr, _, _ = trace_rays(med_raw, params, bb, o, dr, pids, stream)
        np.testing.assert_allclose(
            np.asarray(Lw), np.asarray(Lr), rtol=1e-4, atol=1e-5
        )

    def test_fuse_temperature_false_opts_out(self):
        d, t_al, *_ = self._fire_scene()
        med = Medium.from_grids(d, t_al, fuse_temperature=False)
        assert med.density_rows.shape[1] == 8


class TestBlackbodyPairs:
    def test_pairs_lookup_is_bitwise_the_table_lookup(self):
        table = jnp.asarray(blackbody_xyz_table())
        pairs = blackbody_pairs(table)
        t = jnp.asarray(
            np.r_[np.random.default_rng(0).uniform(-500, 55000, 4096),
                  [0.0, -1.0, 100.0, 49899.0, 1e7]], dtype=jnp.float32,
        )
        a = blackbody_radiation_xyz(table, t)
        b = blackbody_radiation_xyz_from_pairs(pairs, t)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
