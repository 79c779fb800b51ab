"""Multi-host orchestration: process groups, global meshes, film gather.

The reference is a single process (SURVEY.md section 2.3); multi-host scaling
is a new capability mandated by the north star (>=85% rays/s scaling from
1 chip -> 1 host -> N>=2 hosts). The recipe:

  1. every host calls `initialize()` (jax.distributed handshake over DCN);
  2. `global_mesh()` builds a ('rays', 'spp') mesh over ALL devices of the
     job, laid out so the 'spp' axis stays within a host (its psum rides ICI)
     while 'rays' spans hosts (pixel shards are independent: zero cross-host
     traffic in the forward pass);
  3. ray batches are assembled with `make_global_ray_batch` from per-host
     shards (jax.make_array_from_process_local_data);
  4. rendering/training uses the exact same shard_map code as single-host
     (parallel/shard.py, diff/inverse.py) — the collectives are
     mesh-topology-agnostic;
  5. `gather_film_to_host` pulls the film to host 0 for display/save (the
     only host transfer, like the reference's final tonemap+save).

Forward rendering communicates nothing across hosts; inverse rendering's
grid-gradient psum crosses DCN once per step, overlapped by XLA with the
backward scatter-adds.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """jax.distributed.initialize with env-var fallbacks (no-op if single)."""
    if num_processes in (None, 1) and coordinator_address is None:
        return  # single-process: nothing to do
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_mesh(spp: int = 1) -> Mesh:
    """('rays', 'spp') mesh over every device in the job.

    Device order groups each host's devices together along 'spp' first, so
    the spp-psum stays on-host (ICI) and the rays axis spans hosts.
    """
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    n = len(devs)
    assert n % spp == 0, (n, spp)
    arr = np.array(devs).reshape(n // spp, spp)
    return Mesh(arr, ("rays", "spp"))


def make_global_ray_batch(
    mesh: Mesh, width: int, height: int
) -> Tuple[jax.Array, jax.Array, int]:
    """Assemble the globally-sharded (raster_xy, pixel_ids) ray batch.

    Each process contributes only its addressable shards; returns global
    arrays sharded P('rays') plus the unpadded pixel count.
    """
    npix = width * height
    n_rays_axis = mesh.shape["rays"]
    pad = (-npix) % n_rays_axis
    ys, xs = np.mgrid[0:height, 0:width]
    raster = np.stack([xs.reshape(-1), ys.reshape(-1)], -1).astype(np.int32)
    pids = np.arange(npix, dtype=np.int32)
    if pad:
        # Same padding sentinel as shard.pad_ray_batch: the OUT-OF-IMAGE id
        # `npix`, never a real pixel's id — a future pid-keyed film scatter
        # must not double-count the last pixel on the multihost path.
        raster = np.concatenate([raster, np.zeros((pad, 2), np.int32)])
        pids = np.concatenate([pids, np.full((pad,), npix, np.int32)])
    raster_sh = NamedSharding(mesh, P("rays", None))
    pids_sh = NamedSharding(mesh, P("rays"))
    # Every process computes the FULL batch (it is cheap and deterministic);
    # passing global_shape tells jax the data is global, so it slices out
    # this process's addressable shards instead of concatenating per-process
    # contributions.
    raster_g = jax.make_array_from_process_local_data(
        raster_sh, raster, global_shape=raster.shape
    )
    pids_g = jax.make_array_from_process_local_data(
        pids_sh, pids, global_shape=pids.shape
    )
    return raster_g, pids_g, npix


def gather_film_to_host(film: jax.Array) -> Optional[np.ndarray]:
    """Fetch the (possibly sharded) film to host memory on process 0.

    Returns the numpy film on process 0, None elsewhere. Handles all three
    layouts: fully addressable (single process), fully replicated (every host
    holds a copy — e.g. psum'd gradients), and cross-host sharded (shards are
    allgathered tiled, one DCN collective).
    """
    if film.is_fully_addressable:
        arr = np.asarray(film)
    else:
        if not film.is_fully_replicated:
            # One XLA all-gather: reshard to fully-replicated on the array's
            # own mesh (handles partial replication correctly, which
            # multihost_utils.process_allgather does not).
            sh = film.sharding
            film = jax.jit(
                lambda x: x, out_shardings=NamedSharding(sh.mesh, P())
            )(film)
        arr = np.asarray(film.addressable_data(0))
    return arr if jax.process_index() == 0 else None


def replicate(mesh: Mesh, tree):
    """Place a pytree replicated over the mesh (grids, camera)."""
    sh = NamedSharding(mesh, P())
    return jax.tree.map(
        lambda a: jax.device_put(a, sh) if hasattr(a, "shape") else a, tree
    )
