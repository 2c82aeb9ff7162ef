"""Flagship end-to-end pipeline: pointclouds -> occupancy -> SDF ->
differentiable sphere-traced render, with gradient-based refinement.

This composes the framework's stages into the "one model running end-to-end"
milestone from SURVEY.md section 7 stage 4:

  multi-camera depth clouds --(DDA carve + fusion filter)--> occupancy grid
  --(separable EDT)--> signed distance field --(sphere tracing)--> depth /
  silhouette images, with pixel gradients flowing back to voxel distances and
  camera poses (BASELINE.json north star).

Notes on differentiability: the carve (integer scatter) and the EDT (discrete
nearest-site assignment) are data pipeline stages — piecewise-constant in
their inputs, so gradients flow from pixels to the *SDF voxel values* and the
*poses*, not through the carve. Refinement therefore treats the SDF distance
grid (and optionally a camera pose) as the trainable parameters, exactly the
setup the north star measures (pose-gradient descent fit; voxel-gradient
all-reduce in the sharded variant)."""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax

from ..core.maps import OccupancyMap, SignedDistanceField
from ..ops import edt, render, sdf_query, voxelize

Array = jnp.ndarray


class PipelineOutput(NamedTuple):
    occupancy_map: OccupancyMap
    sdf: SignedDistanceField
    render_result: render.RenderResult


def reconstruct(static_environment: OccupancyMap,
                clouds: Sequence[voxelize.PointCloud],
                camera: render.PinholeCamera,
                filter_options: voxelize.FilterOptions = voxelize.FilterOptions(),
                unknown_is_filled: bool = True,
                num_render_steps: int = 64,
                max_depth: float = 100.0) -> PipelineOutput:
    """Full forward pipeline: carve -> fuse -> EDT -> render."""
    carved = voxelize.voxelize_pointclouds(static_environment, filter_options,
                                           list(clouds))
    sdf = edt.extract_sdf_from_occupancy(
        carved.occupancy, carved.spec, carved.origin_transform,
        frame=carved.frame, unknown_is_filled=unknown_is_filled)
    result = render.render_depth(sdf, camera, num_steps=num_render_steps,
                                 max_depth=max_depth)
    return PipelineOutput(carved, sdf, result)


# -- Pose parameterization (se3 tangent) -------------------------------------


def se3_exp(tangent: Array) -> Array:
    """Differentiable pose chart: SO(3) exponential on ``(rx, ry, rz)``
    with the translation ``(tx, ty, tz)`` copied RAW (an SO(3) x R^3
    chart, NOT the full SE(3) exponential — the V-matrix coupling is
    deliberately omitted; as an optimization parameterization around a
    base pose the choice of chart only reparameterizes the search space,
    but do not use this to integrate twists).

    Uses the unnormalized-skew Rodrigues form ``R = I + A K + B K^2`` with
    smooth coefficients ``A = sin(t)/t``, ``B = (1-cos(t))/t^2`` so gradients
    are finite at the identity (a normalized-axis formulation has a NaN
    gradient at ``tangent = 0``, exactly where pose fits start)."""
    rot_vec = tangent[:3]
    trans = tangent[3:]
    theta_sq = jnp.sum(rot_vec * rot_vec)
    # Double-where Taylor switch: near zero use the series (the trig branch
    # sees a safe theta so its unused gradient stays finite in f32).
    small = theta_sq < 1e-8
    safe_theta_sq = jnp.where(small, 1.0, theta_sq)
    safe_theta = jnp.sqrt(safe_theta_sq)
    a = jnp.where(small, 1.0 - theta_sq / 6.0,
                  jnp.sin(safe_theta) / safe_theta)
    b = jnp.where(small, 0.5 - theta_sq / 24.0,
                  (1.0 - jnp.cos(safe_theta)) / safe_theta_sq)
    kx, ky, kz = rot_vec[0], rot_vec[1], rot_vec[2]
    zero = jnp.zeros((), tangent.dtype)
    k = jnp.stack([
        jnp.stack([zero, -kz, ky]),
        jnp.stack([kz, zero, -kx]),
        jnp.stack([-ky, kx, zero]),
    ])
    rot = jnp.eye(3, dtype=tangent.dtype) + a * k + b * (k @ k)
    m = jnp.eye(4, dtype=tangent.dtype)
    m = m.at[:3, :3].set(rot)
    return m.at[:3, 3].set(trans)


def perturb_pose(base_pose: Array, tangent: Array) -> Array:
    """Left-compose a tangent perturbation onto a base pose."""
    return se3_exp(tangent) @ base_pose


# -- Differentiable fitting ---------------------------------------------------


def depth_loss(sdf: SignedDistanceField, camera: render.PinholeCamera,
               target_depth: Array, num_steps: int = 64,
               max_depth: float = 100.0,
               huber_delta: float = 0.1, **render_kwargs) -> Array:
    """Masked Huber loss between rendered and target depth (rays that miss in
    either image are excluded so the loss is smooth). Extra kwargs reach
    :func:`render.render_depth` — e.g. ``remat=True`` to rematerialize the
    march in the backward pass (full-frame fits otherwise store ~36
    B/ray/step of activations), or a prebuilt ``corner_table``."""
    result = render.render_depth(sdf, camera, num_steps=num_steps,
                                 max_depth=max_depth, **render_kwargs)
    # target > 0: depth cameras encode missing returns as 0 (RealSense /
    # Kinect convention) — such pixels must not become hard targets at
    # depth zero dragging the fit toward the camera.
    valid = result.hit & jnp.isfinite(target_depth) & (
        target_depth > 0.0) & (target_depth < max_depth)
    err = jnp.where(valid, result.depth - target_depth, 0.0)
    loss = optax.huber_loss(err, delta=huber_delta)
    return jnp.sum(loss) / jnp.maximum(jnp.sum(valid), 1)


@dataclasses.dataclass
class PoseFitResult:
    pose: Array
    tangent: Array
    losses: Array
    # Fraction of rays hitting in BOTH rendered and target images at the
    # final pose; ~0 means the fit never engaged (see fit_camera_pose).
    valid_fraction: float = float("nan")


def fit_camera_pose(sdf: SignedDistanceField, base_camera: render.PinholeCamera,
                    target_depth: Array, num_iters: int = 100,
                    learning_rate: float = 1e-2, num_steps: int = 48,
                    max_depth: float = 100.0,
                    **render_kwargs) -> PoseFitResult:
    """Gradient-descent camera pose fit against a target depth image — the
    north star's "pose-gradient descent convergence" benchmark: pixel
    gradients flow through sphere tracing into the se3 tangent. Extra
    kwargs reach :func:`render.render_depth` (``remat=True`` bounds
    backward-pass memory for full-frame fits)."""
    base_pose = base_camera.pose

    def loss_fn(tangent):
        cam = dataclasses.replace(base_camera,
                                  pose=perturb_pose(base_pose, tangent))
        return depth_loss(sdf, cam, target_depth, num_steps=num_steps,
                          max_depth=max_depth, **render_kwargs)

    optimizer = optax.adam(learning_rate)

    @jax.jit
    def step(tangent, opt_state):
        loss, grads = jax.value_and_grad(loss_fn)(tangent)
        updates, opt_state = optimizer.update(grads, opt_state)
        return optax.apply_updates(tangent, updates), opt_state, loss

    tangent = jnp.zeros(6, jnp.float32)
    opt_state = optimizer.init(tangent)
    losses = []
    for _ in range(num_iters):
        tangent, opt_state, loss = step(tangent, opt_state)
        losses.append(loss)
    # Overlap diagnostic: with NO valid rays (non-overlapping silhouettes
    # at a bad initial pose) the loss and its gradient are exactly zero
    # and the fit silently no-ops — expose the final overlap so callers
    # can tell "converged" from "never engaged".
    final_cam = dataclasses.replace(base_camera,
                                    pose=perturb_pose(base_pose, tangent))
    res = render.render_depth(sdf, final_cam, num_steps=num_steps,
                              max_depth=max_depth, **render_kwargs)
    valid = res.hit & jnp.isfinite(target_depth) & (target_depth > 0.0) \
        & (target_depth < max_depth)
    return PoseFitResult(pose=perturb_pose(base_pose, tangent),
                         tangent=tangent, losses=jnp.stack(losses),
                         valid_fraction=float(jnp.mean(valid)))


def fit_voxels(sdf: SignedDistanceField, cameras: Sequence[render.PinholeCamera],
               target_depths: Sequence[Array], num_iters: int = 50,
               learning_rate: float = 0.05, num_steps: int = 48,
               max_depth: float = 100.0,
               smoothness_weight: float = 0.1,
               **render_kwargs) -> Tuple[SignedDistanceField, Array]:
    """Optimize the SDF voxel grid against target depth images (multi-view
    voxel refinement — pixel-to-voxel gradients with a TV smoothness prior).
    Returns the refined (re-locked) SDF and the loss history. Extra kwargs
    reach :func:`render.render_depth` (``remat=True`` bounds backward-pass
    memory for full-frame multi-view fits). A ``corner_table`` kwarg is
    treated as a REQUEST for the fast sampling path: the table is rebuilt
    from the CURRENT distances inside each loss evaluation (a prebuilt
    table bakes the original values, making the data term's gradient
    w.r.t. the optimized voxels identically zero — the fit would silently
    minimize only the smoothness prior).

    NOTE: gradient updates do not preserve the 1-Lipschitz metric
    property; render the refined field without certified acceleration
    (no ``mip``/``coarse_factor``), or re-extract an exact SDF from its
    sign via the EDT, before relying on certified-skip rendering."""
    if not cameras:
        raise ValueError("fit_voxels needs at least one camera")
    if len(cameras) != len(target_depths):
        raise ValueError(
            f"{len(cameras)} cameras but {len(target_depths)} target "
            "depth images")
    render_kwargs = dict(render_kwargs)
    table_proto = render_kwargs.pop("corner_table", None)

    def loss_fn(distances):
        cur = sdf.replace(distances=distances)
        kw = dict(render_kwargs)
        if table_proto is not None:
            build = (sdf_query.build_corner_pair_table
                     if isinstance(table_proto, sdf_query.CornerPairTable)
                     else sdf_query.build_corner_table)
            kw["corner_table"] = build(cur)
        loss = 0.0
        for cam, target in zip(cameras, target_depths):
            loss = loss + depth_loss(cur, cam, target, num_steps=num_steps,
                                     max_depth=max_depth, **kw)
        tv = (jnp.mean(jnp.abs(jnp.diff(distances, axis=0)))
              + jnp.mean(jnp.abs(jnp.diff(distances, axis=1)))
              + jnp.mean(jnp.abs(jnp.diff(distances, axis=2))))
        return loss / len(cameras) + smoothness_weight * tv

    optimizer = optax.adam(learning_rate)

    @jax.jit
    def step(distances, opt_state):
        loss, grads = jax.value_and_grad(loss_fn)(distances)
        updates, opt_state = optimizer.update(grads, opt_state)
        return optax.apply_updates(distances, updates), opt_state, loss

    distances = sdf.distances
    opt_state = optimizer.init(distances)
    losses = []
    for _ in range(num_iters):
        distances, opt_state, loss = step(distances, opt_state)
        losses.append(loss)
    refined = sdf.replace(distances=distances).lock()
    return refined, jnp.stack(losses)
