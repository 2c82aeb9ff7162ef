"""Differentiable SDF raycasting / sphere tracing.

This is new TPU-native capability built *on top of* the reference's query
primitives (the reference has no renderer; its raycasting — cpu DDA carving —
is reproduced in :mod:`.voxelize`): a sphere-traced depth/occupancy renderer
over :class:`SignedDistanceField` grids in which **pixel gradients flow back
to voxel distances and to the camera pose** (the BASELINE.json north star).

Design:

* rays are generated from a pinhole camera (pose = ``[4,4]`` isometry leaf, so
  ``jax.grad`` reaches translation/rotation through ray origins/directions),
* marching is a fixed-length ``lax.scan`` (static trip count -> reverse-mode
  AD and remat work; converged rays keep ``dt = 0`` so extra iterations are
  no-ops in both value and gradient),
* distance samples use the trilinear interpolation from
  :mod:`.sdf_query` — continuous in position and linear in the voxel values,
* rays are first clipped to the grid AABB with a slab test so marching starts
  at the grid boundary; rays that miss return ``hit=False`` with depth at
  ``max_depth``.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..core import transforms
from ..core.maps import SignedDistanceField
from . import sdf_query

Array = jnp.ndarray


@dataclasses.dataclass(frozen=True)
class PinholeCamera:
    """Pinhole camera: intrinsics + world-from-camera pose. The optical
    convention is +z forward, +x right, +y down (standard depth camera)."""
    pose: Array  # [4,4] X_WC
    fx: Array
    fy: Array
    cx: Array
    cy: Array
    width: int = dataclasses.field(metadata=dict(static=True))
    height: int = dataclasses.field(metadata=dict(static=True))

    @staticmethod
    def create(pose, width: int, height: int,
               focal: float = None, fx=None, fy=None, cx=None, cy=None
               ) -> "PinholeCamera":
        if focal is not None:
            fx = fy = focal
        if cx is None:
            cx = (width - 1) / 2.0
        if cy is None:
            cy = (height - 1) / 2.0
        return PinholeCamera(
            pose=jnp.asarray(pose, jnp.float32),
            fx=jnp.float32(fx), fy=jnp.float32(fy),
            cx=jnp.float32(cx), cy=jnp.float32(cy),
            width=int(width), height=int(height))


PinholeCamera = jax.tree_util.register_dataclass(
    PinholeCamera,
    data_fields=["pose", "fx", "fy", "cx", "cy"],
    meta_fields=["width", "height"])


class RenderResult(NamedTuple):
    depth: Array      # [H, W] ray depth (t along unit ray direction)
    hit: Array        # [H, W] bool, surface hit within max_depth
    points: Array     # [H, W, 3] final world-space sample positions
    distance: Array   # [H, W] final SDF sample value


def camera_rays(camera: PinholeCamera) -> Tuple[Array, Array]:
    """World-frame ray origins ``[H,W,3]`` and unit directions ``[H,W,3]``."""
    u = jnp.arange(camera.width, dtype=jnp.float32)
    v = jnp.arange(camera.height, dtype=jnp.float32)
    uu, vv = jnp.meshgrid(u, v, indexing="xy")
    dirs_cam = jnp.stack([
        (uu - camera.cx) / camera.fx,
        (vv - camera.cy) / camera.fy,
        jnp.ones_like(uu),
    ], axis=-1)
    dirs_cam = dirs_cam / jnp.linalg.norm(dirs_cam, axis=-1, keepdims=True)
    dirs_world = transforms.rotate_vector(camera.pose, dirs_cam)
    origins = jnp.broadcast_to(camera.pose[:3, 3], dirs_world.shape)
    return origins, dirs_world


def _clip_to_grid(sdf: SignedDistanceField, origins: Array,
                  dirs: Array) -> Tuple[Array, Array, Array]:
    """Slab-clip rays to the grid AABB in grid frame. Returns
    (t_enter, t_exit, hits_grid)."""
    inv = sdf.inverse_origin_transform()
    o_grid = transforms.apply_isometry(inv, origins)
    d_grid = transforms.rotate_vector(inv, dirs)
    sizes = jnp.asarray(sdf.spec.grid_sizes, jnp.float32)

    safe_d = jnp.where(jnp.abs(d_grid) < 1e-12,
                       jnp.where(d_grid < 0, -1e-12, 1e-12), d_grid)
    t_low = (0.0 - o_grid) / safe_d
    t_high = (sizes - o_grid) / safe_d
    t1 = jnp.minimum(t_low, t_high)
    t2 = jnp.maximum(t_low, t_high)
    t_enter = jnp.max(t1, axis=-1)
    t_exit = jnp.min(t2, axis=-1)
    hits = (t_exit > jnp.maximum(t_enter, 0.0))
    return jnp.maximum(t_enter, 0.0), t_exit, hits


def sphere_trace(sdf: SignedDistanceField, origins: Array, dirs: Array,
                 num_steps: int = 64,
                 surface_threshold: Optional[float] = None,
                 max_depth: float = 100.0,
                 step_scale: float = 1.0) -> RenderResult:
    """Sphere-trace rays through an SDF grid.

    ``origins``/``dirs`` are ``[..., 3]`` world frame. The march advances each
    ray by its sampled distance (classic sphere tracing) until the sample
    falls below ``surface_threshold`` (default: half a voxel — the corrected-
    center distance of :mod:`.sdf_query` is zero at the surface, half-voxel
    keeps marching stable at coarse grids), the ray exits the grid, or
    ``num_steps`` is exhausted."""
    if surface_threshold is None:
        surface_threshold = 0.25 * sdf.resolution
    thresh = jnp.float32(surface_threshold)
    eps = jnp.float32(1e-3 * sdf.resolution)

    t_enter, t_exit, hits_grid = _clip_to_grid(sdf, origins, dirs)
    t0 = jnp.where(hits_grid, t_enter + eps, jnp.float32(max_depth))
    t_stop = jnp.minimum(t_exit, jnp.float32(max_depth))

    def step(carry, _):
        t, alive = carry
        pos = origins + dirs * t[..., None]
        q = sdf_query.estimate_location_distance(sdf, pos)
        d = jnp.where(q.valid, q.value, thresh)  # nudge forward if outside
        converged = q.valid & (d <= thresh)
        advance = jnp.maximum(d * step_scale, eps)
        new_t = jnp.where(alive & ~converged, t + advance, t)
        new_alive = alive & ~converged & (new_t < t_stop)
        return (new_t, new_alive), None

    alive0 = hits_grid
    (t_final, alive), _ = lax.scan(step, (t0, alive0), None,
                                   length=num_steps)

    points = origins + dirs * t_final[..., None]
    q = sdf_query.estimate_location_distance(sdf, points)
    final_d = jnp.where(q.valid, q.value, jnp.inf)
    hit = hits_grid & q.valid & (final_d <= thresh * 2.0)

    # Newton-style refinement: pull the depth to the zero crossing along the
    # ray using the final sample. Keeps depth differentiable in voxel values
    # even where the march converged early (d(depth)/d(voxels) = -dd/1 along
    # the ray direction via the chain rule).
    refined_t = t_final + jnp.where(hit, final_d, 0.0)
    depth = jnp.where(hit, refined_t, jnp.float32(max_depth))
    return RenderResult(depth=depth, hit=hit, points=points,
                        distance=final_d)


def render_depth(sdf: SignedDistanceField, camera: PinholeCamera,
                 num_steps: int = 64, max_depth: float = 100.0,
                 surface_threshold: Optional[float] = None) -> RenderResult:
    """Render an ``[H, W]`` depth image (differentiable in ``sdf.distances``
    and ``camera.pose``)."""
    origins, dirs = camera_rays(camera)
    return sphere_trace(sdf, origins, dirs, num_steps=num_steps,
                        max_depth=max_depth,
                        surface_threshold=surface_threshold)


def render_occupancy_image(sdf: SignedDistanceField, camera: PinholeCamera,
                           num_steps: int = 64, max_depth: float = 100.0,
                           softness: float = 1.0) -> Array:
    """Soft silhouette: sigmoid of the final SDF sample — a smooth hit mask
    whose gradients reach voxels even for near-miss rays."""
    result = render_depth(sdf, camera, num_steps=num_steps,
                          max_depth=max_depth)
    scale = jnp.float32(softness * sdf.resolution)
    d = jnp.where(jnp.isfinite(result.distance), result.distance,
                  10.0 * scale)
    return jax.nn.sigmoid(-d / scale)


def depth_to_pointcloud(result: RenderResult, camera: PinholeCamera,
                        max_range: Optional[float] = None):
    """Back-project a rendered depth image into a :class:`PointCloud` in the
    camera frame — closes the loop render -> sensor model -> carving."""
    from .voxelize import PointCloud
    origins, dirs = camera_rays(camera)
    pts_world = origins + dirs * result.depth[..., None]
    inv = transforms.invert_isometry(camera.pose)
    pts_cam = transforms.apply_isometry(inv, pts_world)
    pts = jnp.where(result.hit[..., None], pts_cam, jnp.nan)
    return PointCloud.create(
        pts.reshape(-1, 3), camera.pose,
        max_range=max_range if max_range is not None else jnp.inf)
