"""Worker for the true multi-process jax.distributed test.

Launched N times by tests/test_multiprocess.py (subprocesses on localhost,
CPU backend with virtual devices). Each process joins the jax.distributed
job, builds the global ('rays', 'spp') mesh via parallel/multihost.py,
renders one wave of a deterministic scene through the SAME shard_map code as
single-process rendering, computes a grid gradient with the replay VJP
(psum'd over the global mesh), and process 0 writes the results to an .npz
for the parent test to compare against a single-process run.

Usage: python multiprocess_worker.py <coord_addr> <num_procs> <proc_id>
       <devices_per_proc> <out_npz>
"""
import sys


def main():
    coord, nprocs, pid, dev_per_proc, out = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]),
        sys.argv[5],
    )
    import os

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={dev_per_proc}"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    from volume_path_tracer_tpu.parallel import multihost

    multihost.initialize(
        coordinator_address=coord, num_processes=nprocs, process_id=pid
    )
    assert jax.process_count() == nprocs, jax.process_count()
    assert jax.device_count() == nprocs * dev_per_proc

    import numpy as np
    import jax.numpy as jnp

    from volume_path_tracer_tpu.parallel.shard import render_wave_sharded
    from tests.scene_fixtures import small_scene

    medium, camera, params, W, H = small_scene()

    mesh = multihost.global_mesh(spp=2)
    raster_g, pids_g, npix = multihost.make_global_ray_batch(mesh, W, H)
    medium_r = multihost.replicate(mesh, medium)
    camera_r = multihost.replicate(mesh, camera)

    contrib, n_capped, _ = render_wave_sharded(
        mesh, medium_r, params, camera_r, None, raster_g, pids_g,
        seed=7, wave=3, use_jitter=True,
    )
    film = multihost.gather_film_to_host(contrib)

    # Grid gradient: value_and_grad inside shard_map, psum over the global
    # mesh (the DCN grad all-reduce path), via the replay VJP.
    import functools
    from jax.sharding import PartitionSpec as P
    from volume_path_tracer_tpu.diff.prb import trace_rays_prb
    from volume_path_tracer_tpu.utils import rng as vrng

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P("rays", None), P("rays")), out_specs=P(),
        check_vma=False,
    )
    def grad_shard(dens, raster, pids):
        import dataclasses

        med = dataclasses.replace(
            medium_r, density=dataclasses.replace(medium_r.density, data=dens)
        )
        stream = vrng.mix_stream(7, 3)

        def loss(d):
            m = dataclasses.replace(
                med, density=dataclasses.replace(med.density, data=d)
            )
            u = vrng.counter_uniforms(pids, stream, jnp.int32(2**31 - 1), 2)
            o_w, d_w = camera_r.generate_rays(raster, u * 0.5)
            L = trace_rays_prb(m, params, None, o_w, d_w, pids, stream)
            return jnp.sum(L)

        g = jax.grad(loss)(dens)
        return jax.lax.psum(g, ("rays", "spp"))

    # HLO collective census on the TRUE cross-process compile (VERDICT r4
    # item 5): the program this 2-process job actually runs must contain no
    # forbidden collectives and only all-reduce psums — proving the
    # single-process census (tests/test_sharding.py) holds across DCN.
    from tests.test_sharding import TestCollectiveStructure as TCS

    hlo = (
        jax.jit(grad_shard)
        .lower(medium_r.density.data, raster_g, pids_g)
        .compile()
        .as_text()
    )
    census = TCS._collective_census(hlo)
    for kind in TCS.FORBIDDEN:
        assert census[kind] == 0, census
    assert census["all-reduce"] >= 1, census

    grad = grad_shard(medium_r.density.data, raster_g, pids_g)
    grad_np = multihost.gather_film_to_host(grad)

    if jax.process_index() == 0:
        np.savez(out, film=np.asarray(film), grad=np.asarray(grad_np),
                 npix=npix, census_all_reduce=census["all-reduce"])
        print("worker0: wrote", out, "census", census, flush=True)
    # all processes must stay alive until the collectives finish
    jax.effects_barrier()


if __name__ == "__main__":
    main()
