"""Inverse rendering: recover density/temperature grids from target images.

The new capability mandated by the north star (BASELINE.json): reverse-mode
pixel gradients w.r.t. the voxel grids, with the grid-gradient all-reduce
overlapped with the backward pass. The forward estimator is the same
wavefront delta tracker (render/integrator.py) run under a bounded scan;
gradients flow through trilinear density/temperature samples, ratio-tracking
weights, and the emission term, with score-function factors for the discrete
event choices (detached-majorant differentiable delta tracking).

Sharded training: value_and_grad runs *inside* shard_map, then the grid
gradients are psum'd over both mesh axes — XLA schedules the psum against the
remaining backward scatter-adds, giving the comm/compute overlap. The loss is
a global mean over all rays (per-shard sums psum'd and normalized).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, PartitionSpec as P

from ..grids.grid import pack_corner_rows
from ..grids.majorant import build_majorants
from ..models.camera import Camera
from ..models.medium import Medium, pack_fused_rows
from ..render.integrator import IntegratorParams, trace_rays_diff
from ..utils import rng as vrng
from .prb import trace_rays_prb


class OptimizableGrids(NamedTuple):
    """The leaves being optimized. log-parameterized density keeps rho >= 0."""

    log_density: jnp.ndarray  # [X,Y,Z]; density = softplus(log_density)
    temperature: Optional[jnp.ndarray] = None  # raw adimensional grid or None


def save_train_checkpoint(path, grids, opt_state, step: int) -> None:
    """Persist (grids, optimizer state, step) at a wave/step boundary.

    SURVEY.md section 5 checkpoint bullet: the reference's wave boundaries are
    consistent snapshots; for inverse rendering the optimizer state must be
    part of the snapshot too or resuming silently resets Adam moments.
    Leaves are stored flat; the caller re-creates identically-shaped
    (grids, opt_state) templates to load into (load_train_checkpoint).
    """
    import os

    leaves = jax.tree.leaves((grids, opt_state))
    payload = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez_compressed(f, step=step, n_leaves=len(leaves), **payload)
    os.replace(tmp, path)


def load_train_checkpoint(path, grids_like, opt_state_like):
    """Returns (grids, opt_state, step) or None if absent/shape-mismatched."""
    import os

    if not os.path.exists(path):
        return None
    z = np.load(path)
    template = (grids_like, opt_state_like)
    leaves_like, treedef = jax.tree.flatten(template)
    n = int(z["n_leaves"])
    if n != len(leaves_like):
        return None
    leaves = []
    for i, like in enumerate(leaves_like):
        arr = z[f"leaf_{i}"]
        if tuple(arr.shape) != tuple(np.shape(like)):
            return None
        leaves.append(jnp.asarray(arr, dtype=np.asarray(like).dtype))
    grids, opt_state = jax.tree.unflatten(treedef, leaves)
    return grids, opt_state, int(z["step"])


def density_from_param(p: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.softplus(p)


def param_from_density(d: jnp.ndarray, eps: float = 1e-4) -> jnp.ndarray:
    # inverse softplus
    d = jnp.maximum(d, eps)
    return d + jnp.log(-jnp.expm1(-d))


def medium_with_params(
    base: Medium, grids: OptimizableGrids, bloat: float = 0.1, pack: bool = False
) -> Medium:
    """Rebuild the medium from optimizable leaves.

    Majorants get `bloat` slack: gradient rendering requires a strictly
    positive null-collision probability everywhere (see build_majorants).
    pack=True builds the fused fast-gather rows too — usable with the replay
    VJP (trace_rays_prb), which never differentiates *through* the rows.
    """
    density = dataclasses.replace(
        base.density, data=density_from_param(grids.log_density)
    )
    temperature = base.temperature
    if grids.temperature is not None and base.temperature is not None:
        temperature = dataclasses.replace(base.temperature, data=grids.temperature)
    majorants = build_majorants(density, bloat=bloat)
    return Medium(
        density=density,
        majorants=majorants,
        temperature=temperature,
        density_rows=pack_fused_rows(density.data, majorants) if pack else None,
        temperature_rows=(
            pack_corner_rows(temperature.data)
            if (pack and temperature is not None)
            else None
        ),
    )


def make_render_loss(
    base_medium: Medium,
    params: IntegratorParams,
    camera: Camera,
    bb_table,
    n_iters: int,
    use_jitter: bool,
    samples_per_step: int = 4,
    use_prb: bool = True,
    pack: bool = False,
    dual_buffer: bool = False,
):
    """loss(grids, raster, pids, target_px, seed_wave) -> (sum_sq, n) per batch.

    Renders `samples_per_step` independent waves of the pixel batch in one
    flat ray batch and compares the per-pixel *mean* to the target — the MSE
    of a 1-spp Monte Carlo render is dominated by irreducible sampling
    variance, so averaging k samples per step cuts the noise floor k-fold and
    makes the optimization signal visible.

    dual_buffer=True (requires k >= 2) splits the k samples into two
    independent half-buffers A, B and uses sum((A-t)*(B-t)) instead of
    sum((mean-t)^2). The plain MSE of a k-sample Monte Carlo render is
    E[(mean_k - t)^2] = (E-t)^2 + Var/k, and the Var/k term's gradient
    BIASES the optimization toward low-variance (not correct) parameters —
    visibly so for blackbody emission, whose variance grows steeply with
    temperature. A and B are independent, so E[(A-t)(B-t)] = (E-t)^2
    exactly: the dual-buffer gradient is an unbiased estimator of the true
    MSE gradient (the standard dual-buffer trick of differentiable
    rendering).

    use_prb=True (default) differentiates through the replay custom VJP
    (diff/prb.py): O(1) backward memory, full-speed forward while_loop, and
    optionally the packed fast-gather layout (pack=True). use_prb=False keeps
    the bounded-scan AD path (trace_rays_diff) — the oracle the replay VJP is
    validated against.

    Returns per-batch *sums* so sharded callers can psum before normalizing.
    target_px: [N, 3] target film XYZ (already imaging_ratio-scaled means).
    """
    k = samples_per_step
    if dual_buffer and k < 2:
        raise ValueError("dual_buffer needs samples_per_step >= 2")
    if use_prb:
        # The replay truncates at params.max_iters; mirror the scan bound.
        params = dataclasses.replace(params, max_iters=n_iters)

    def loss_fn(grids: OptimizableGrids, raster, pids, target_px, seed_wave):
        medium = medium_with_params(base_medium, grids, pack=pack and use_prb)
        N = pids.shape[0]
        raster_k = jnp.tile(raster, (k, 1))
        pids_k = jnp.tile(pids, (k,))
        waves = seed_wave[1] * jnp.uint32(k) + jnp.arange(k, dtype=jnp.uint32)
        stream_k = jnp.repeat(vrng.mix_stream(seed_wave[0], waves), N)  # [k*N]
        u_jit = vrng.counter_uniforms(pids_k, stream_k, jnp.int32(2**31 - 1), 2)
        jitter = u_jit * (0.5 if use_jitter else 0.0)
        o_w, d_w = camera.generate_rays(raster_k, jitter)
        if use_prb:
            L = trace_rays_prb(
                medium, params, bb_table, o_w, d_w, pids_k, stream_k
            )
        else:
            L = trace_rays_diff(
                medium, params, bb_table, o_w, d_w, pids_k, stream_k, n_iters
            )
        Lk = camera.imaging_ratio * L.reshape(k, N, 3)
        if dual_buffer:
            a = jnp.mean(Lk[: k // 2], axis=0) - target_px
            b = jnp.mean(Lk[k // 2 :], axis=0) - target_px
            sq = jnp.sum(a * b)
        else:
            px = jnp.mean(Lk, axis=0)
            sq = jnp.sum((px - target_px) ** 2)
        return sq, jnp.float32(N * 3)

    return loss_fn


def make_train_step(
    base_medium: Medium,
    params: IntegratorParams,
    camera: Camera,
    bb_table,
    optimizer: optax.GradientTransformation,
    n_iters: int = 512,
    use_jitter: bool = True,
    mesh: Optional[Mesh] = None,
    samples_per_step: int = 4,
    use_prb: bool = True,
    pack: bool = False,
    dual_buffer: bool = False,
):
    """Build a jitted train step.

    Single-device: step(grids, opt_state, raster, pids, target, seed_wave).
    With a mesh: rays are sharded over 'rays' (and waves over 'spp'), grid
    gradients psum'd over both axes inside shard_map. dual_buffer: see
    make_render_loss (unbiased MSE gradient; recommended for emissive
    media, whose sample variance grows steeply with temperature).
    """
    loss_fn = make_render_loss(
        base_medium, params, camera, bb_table, n_iters, use_jitter,
        samples_per_step=samples_per_step, use_prb=use_prb, pack=pack,
        dual_buffer=dual_buffer,
    )

    # The PRB replay's pending-payload scatter loop (diff/prb.py) nests
    # while loops; XLA's while-loop-fusible-sinking pass then fails an
    # internal RET_CHECK (hlo_computation.cc ReplaceInstruction shape
    # mismatch: it appends sunk operands to the outer while's carry tuple)
    # when compiling for TPU. Disable that one pass for the train step —
    # measured neutral on step time (the replay is scatter/gather-bound,
    # not constant-sinking-bound).
    _opts = {"xla_disable_hlo_passes": "while-loop-fusible-sinking"}

    if mesh is None:

        @functools.partial(jax.jit, compiler_options=_opts)
        def train_step(grids, opt_state, raster, pids, target_px, seed_wave):
            (sq, n), grads = jax.value_and_grad(
                lambda g: loss_fn(g, raster, pids, target_px, seed_wave),
                has_aux=True,
            )(grids)
            loss = sq / n
            grads = jax.tree.map(lambda x: x / n, grads)
            updates, opt_state = optimizer.update(grads, opt_state, grids)
            grids = optax.apply_updates(grids, updates)
            return grids, opt_state, loss

        return train_step

    spp_size = mesh.shape["spp"]

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P("rays", None), P("rays"), P("rays", None), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def grad_shard(grids, raster, pids, target_px, seed_wave):
        # Each 'spp' row renders a different wave of the same pixels.
        spp_idx = jax.lax.axis_index("spp").astype(jnp.uint32)
        sw = jnp.stack([seed_wave[0], seed_wave[1] * spp_size + spp_idx])
        (sq, n), grads = jax.value_and_grad(
            lambda g: loss_fn(g, raster, pids, target_px, sw), has_aux=True
        )(grids)
        # Grid-gradient all-reduce over both mesh axes; XLA overlaps this
        # psum with the remaining backward computation.
        grads = jax.tree.map(
            lambda x: jax.lax.psum(x, ("rays", "spp")), grads
        )
        tot = jax.lax.psum(jnp.stack([sq, n]), ("rays", "spp"))
        return grads, tot

    @functools.partial(jax.jit, compiler_options=_opts)
    def train_step(grids, opt_state, raster, pids, target_px, seed_wave):
        grads, tot = grad_shard(grids, raster, pids, target_px, seed_wave)
        n = tot[1]
        loss = tot[0] / n
        grads = jax.tree.map(lambda x: x / n, grads)
        updates, opt_state = optimizer.update(grads, opt_state, grids)
        grids = optax.apply_updates(grids, updates)
        return grids, opt_state, loss

    return train_step
