"""Pointcloud voxelization: multi-camera depth-cloud ray carving + fusion.

TPU-native redesign of the reference's voxelization stack
(/root/reference/include/voxelized_geometry_tools/pointcloud_voxelization_interface.hpp,
.../src/.../cpu_pointcloud_voxelization.cpp and the CUDA/OpenCL kernels in
cuda_voxelization_helpers.cu:73-426):

* a *pointcloud* is a pytree of ``[N, 3]`` camera-frame points + an
  ``X_WC`` origin transform + max range (replaces ``PointCloudWrapper``,
  pointcloud_voxelization_interface.hpp:94-204),
* per-cloud *tracking grids* of ``{seen_free, seen_filled}`` int32 counters
  (replaces atomic ``CpuVoxelizationTrackingCell``) are built with an
  Amanatides–Woo DDA walk under ``lax.scan`` vmapped over rays, accumulated
  with a single scatter-add per cloud — the contention-free TPU analogue of
  ``atomicAdd`` carving,
* the ``CountsSeenAs`` fusion filter (hpp:55-86 + cpu cpp:438-497) is a pure
  per-voxel map over stacked camera grids.

Ray-walk semantics (entry clipping, endpoint marking, step tie-breaking,
early exit at grid boundaries) follow cpu_pointcloud_voxelization.cpp:208-436
exactly, so the raycast count invariants from voxel_raycasting_test.cpp hold.
"""

from __future__ import annotations

import dataclasses
import enum
import time
from typing import Callable, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..core import transforms
from ..core.grid import GridSpec
from ..core.maps import OccupancyMap

Array = jnp.ndarray


class SeenAs(enum.IntEnum):
    """pointcloud_voxelization_interface.hpp:18."""
    UNKNOWN = 0
    FILLED = 1
    FREE = 2


class FilterOptions(NamedTuple):
    """``PointCloudVoxelizationFilterOptions`` (hpp:20-92)."""
    percent_seen_free: float = 1.0
    outlier_points_threshold: int = 1
    num_cameras_seen_free: int = 1

    def validate(self) -> "FilterOptions":
        if not (0.0 < self.percent_seen_free <= 1.0):
            raise ValueError("0 < percent_seen_free <= 1 must be true")
        if self.outlier_points_threshold <= 0:
            raise ValueError("outlier_points_threshold <= 0")
        if self.num_cameras_seen_free <= 0:
            raise ValueError("num_cameras_seen_free <= 0")
        return self


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PointCloud:
    """Camera-frame depth points + camera pose (``PointCloudWrapper``)."""
    points: Array  # f32 [N, 3] in camera frame; non-finite points skipped
    origin_transform: Array  # f32 [4, 4] X_WC
    max_range: Array  # f32 scalar

    @staticmethod
    def create(points, origin_transform=None,
               max_range: float = float("inf")) -> "PointCloud":
        if origin_transform is None:
            origin_transform = jnp.eye(4, dtype=jnp.float32)
        return PointCloud(
            points=jnp.asarray(points, dtype=jnp.float32).reshape(-1, 3),
            origin_transform=jnp.asarray(origin_transform, jnp.float32),
            max_range=jnp.float32(max_range))


class TrackingGrid(NamedTuple):
    """Per-camera carve counters (cpu_pointcloud_voxelization.hpp:24-40)."""
    seen_free: Array  # i32 [nx, ny, nz]
    seen_filled: Array  # i32 [nx, ny, nz]


class VoxelizerRuntime(NamedTuple):
    """Phase wall timings (pointcloud_voxelization_interface.hpp:206-229)."""
    raycasting_time: float
    filtering_time: float


def _ray_visits(spec: GridSpec, p_start_grid: Array, start_index: Array,
                p_final_grid: Array, final_index: Array, ray: Array,
                hit: Array, clipped: Array):
    """Batched DDA walk setup over a whole ray block (cpu cpp:292-435).
    Inputs are ``[N, 3]`` / ``[N]``; returns ``(init_state, step_fn,
    endpoint_flat, endpoint_is_filled)`` — the walk itself is driven by
    :func:`_walk_and_scatter` so segments can early-exit.

    Everything is expressed as component-wise selects on separate per-axis
    ``[N]`` arrays: per-lane dynamic indexing (``t[axis]``,
    ``cur.at[axis].add``) vmaps to one gather/scatter PER STEP PER OPERAND —
    measured ~700M gather rows for a single 640x480 cloud at 128^3, 8x the
    whole carve's useful work."""
    n_counts = jnp.asarray(spec.counts, dtype=jnp.int32)
    res = jnp.float32(spec.resolution)
    half = res * 0.5

    # Axis steps from index difference sign (cpp:299-321).
    step = jnp.sign(final_index - start_index).astype(jnp.int32)

    # Initial per-axis t to leave the start voxel, in units of the full ray
    # (cpp:323-361).
    start_center = spec.grid_index_to_location_in_grid_frame(start_index)
    bottom = start_center - half
    top = start_center + half

    t_pos = jnp.abs((top - p_start_grid) / ray)
    t_neg = jnp.abs((p_start_grid - bottom) / ray)
    t0 = jnp.where(ray > 0.0, t_pos,
                   jnp.where(ray < 0.0, t_neg, jnp.inf))  # [N, 3]
    delta_t = jnp.where(ray != 0.0, jnp.abs(res / ray), jnp.inf)

    # Endpoint mark (cpp:367-381): filled unless range-clipped.
    final_in = spec.check_grid_index_in_bounds(final_index)
    endpoint_flat = jnp.where(
        hit & final_in, spec.flat_index(final_index).astype(jnp.int32), -1)
    endpoint_is_filled = ~clipped

    ny, nz = spec.counts[1], spec.counts[2]
    fx, fy, fz = final_index[:, 0], final_index[:, 1], final_index[:, 2]
    sx, sy, sz = step[:, 0], step[:, 1], step[:, 2]
    dtx, dty, dtz = delta_t[:, 0], delta_t[:, 1], delta_t[:, 2]

    def body(state, _):
        cx_, cy_, cz_, tx, ty, tz, active = state
        running = active & ((cx_ != fx) | (cy_ != fy) | (cz_ != fz))
        in_b = ((cx_ >= 0) & (cx_ < n_counts[0])
                & (cy_ >= 0) & (cy_ < n_counts[1])
                & (cz_ >= 0) & (cz_ < n_counts[2]))
        alive = running & in_b
        visit = jnp.where(alive, cx_ * (ny * nz) + cy_ * nz + cz_,
                          -1).astype(jnp.int32)
        # Axis choice with the reference's exact tie-breaking (cpp:405-434).
        pick_x = (tx <= ty) & (tx <= tz)
        pick_y = ~pick_x & (ty <= tx) & (ty <= tz)
        pick_z = ~pick_x & ~pick_y
        at_final = jnp.where(pick_x, cx_ == fx,
                             jnp.where(pick_y, cy_ == fy, cz_ == fz))
        alive = alive & ~at_final
        adv_x = alive & pick_x
        adv_y = alive & pick_y
        adv_z = alive & pick_z
        new = (jnp.where(adv_x, cx_ + sx, cx_),
               jnp.where(adv_y, cy_ + sy, cy_),
               jnp.where(adv_z, cz_ + sz, cz_),
               jnp.where(adv_x, tx + dtx, tx),
               jnp.where(adv_y, ty + dty, ty),
               jnp.where(adv_z, tz + dtz, tz),
               alive)
        return new, visit

    init = (start_index[:, 0], start_index[:, 1], start_index[:, 2],
            t0[:, 0], t0[:, 1], t0[:, 2], hit)
    return init, body, endpoint_flat, endpoint_is_filled


_DDA_SEGMENT = 64


def _walk_and_scatter(init, body, free_counts, max_steps: int):
    """March the DDA in ``_DDA_SEGMENT``-step segments under a while_loop,
    scattering each segment's visits and stopping as soon as every ray in
    the block has finished — the walk budget must cover the grid diagonal
    but typical paths are far shorter, so fixed-length scans waste most of
    their scatter slots on dead lanes."""
    n_segments = -(-max_steps // _DDA_SEGMENT)

    def seg_cond(state):
        i, dda, _ = state
        return (i < n_segments) & jnp.any(dda[-1])

    def seg_body(state):
        i, dda, counts = state
        dda, visits = lax.scan(body, dda, None, length=_DDA_SEGMENT)
        return i + 1, dda, _scatter_counts(counts, visits.reshape(-1))

    _, _, free_counts = lax.while_loop(
        seg_cond, seg_body, (jnp.int32(0), init, free_counts))
    return free_counts


def _prepare_rays(spec: GridSpec, X_GC: Array, points: Array,
                  max_range: Array):
    """Per-ray setup: range clip + grid entry clip (cpp:216-290)."""
    p_gco = X_GC[:3, 3]
    p_gp = transforms.apply_isometry(X_GC, points)  # [N, 3]
    finite = jnp.all(jnp.isfinite(points), axis=-1)

    ray = p_gp - p_gco
    ray_len = jnp.linalg.norm(ray, axis=-1)
    clipped = ray_len > max_range
    scale = jnp.where(ray_len > 0, max_range / jnp.maximum(ray_len, 1e-30),
                      0.0)
    p_final = jnp.where(clipped[:, None], p_gco + ray * scale[:, None], p_gp)

    grid_sizes = jnp.asarray(spec.grid_sizes, dtype=jnp.float32)
    origin_index = spec.location_in_grid_frame_to_grid_index(p_gco)
    origin_in = spec.check_grid_index_in_bounds(origin_index)

    # Slab test for rays starting outside the grid (cpp:234-290,
    # Ericson RTCD 5.3.3).
    direction = ray / jnp.maximum(ray_len, 1e-30)[:, None]
    flat_thresh = 1e-10

    def slab(carry, axis):
        tmin, tmax, miss = carry
        d = direction[:, axis]
        nearly_flat = jnp.abs(d) < flat_thresh
        in_slab = (p_gco[axis] >= 0.0) & (p_gco[axis] < grid_sizes[axis])
        ood = 1.0 / jnp.where(nearly_flat, 1.0, d)
        tlow = (0.0 - p_gco[axis]) * ood
        thigh = (grid_sizes[axis] - p_gco[axis]) * ood
        t1 = jnp.minimum(tlow, thigh)
        t2 = jnp.maximum(tlow, thigh)
        tmin_new = jnp.where(nearly_flat, tmin, jnp.maximum(tmin, t1))
        # NOTE: the reference updates tmax with `if (t2 > tmax) tmax = t2`
        # (cpp:273-276) — widening, as written upstream — mirrored here.
        tmax_new = jnp.where(nearly_flat, tmax, jnp.maximum(tmax, t2))
        miss_new = miss | jnp.where(nearly_flat, ~in_slab,
                                    tmin_new > tmax_new)
        return (tmin_new, tmax_new, miss_new), None

    n = points.shape[0]
    # Initial carries derive from `points` so their varying-manual-axes match
    # the body outputs under shard_map (points may be +/-inf: use a select,
    # not arithmetic, to avoid NaNs).
    seed = jnp.where(jnp.zeros(n, dtype=bool), points[:, 0], 0.0)
    tmin0 = seed
    tmax0 = seed + jnp.broadcast_to(max_range, (n,)).astype(jnp.float32)
    miss0 = seed > 0.0  # all False, varying like points
    (tmin, _, miss), _ = lax.scan(slab, (tmin0, tmax0, miss0),
                                  jnp.arange(3))
    # The reference nudges the entry point 1e-10 into the grid (cpp:287-289);
    # that vanishes in f32 (boundary-exact entries would index out of bounds
    # and kill the whole ray), so the nudge scales with the voxel size.
    nudge = 1e-3 * spec.resolution
    p_entry = p_gco + direction * (tmin + nudge)[:, None]
    p_start = jnp.where(origin_in, p_gco[None, :], p_entry)
    hit = finite & (origin_in | ~miss)

    start_index = spec.location_in_grid_frame_to_grid_index(p_start)
    final_index = spec.location_in_grid_frame_to_grid_index(p_final)
    return p_start, start_index, p_final, final_index, ray, hit, clipped


def _scatter_counts(counts_flat: Array, flat_targets: Array) -> Array:
    valid = flat_targets >= 0
    safe = jnp.where(valid, flat_targets, 0)
    return counts_flat.at[safe].add(valid.astype(jnp.int32), mode="drop")


def raycast_pointcloud(spec: GridSpec, grid_origin_transform: Array,
                       cloud: PointCloud,
                       max_steps: Optional[int] = None,
                       ray_chunk: int = 16384) -> TrackingGrid:
    """Carve one cloud into a fresh tracking grid
    (``DoRaycastPointCloud``, cpu cpp:167-206). Fully jittable; rays are the
    vmapped axis, counter accumulation is a scatter-add. Rays are processed in
    ``ray_chunk`` blocks under ``lax.scan`` so the per-step visit buffer stays
    bounded at ``ray_chunk * max_steps`` regardless of cloud size."""
    if max_steps is None:
        max_steps = spec.num_x + spec.num_y + spec.num_z + 2

    X_GW = transforms.invert_isometry(grid_origin_transform)
    X_GC = X_GW @ cloud.origin_transform

    n_rays = cloud.points.shape[0]
    n_total = spec.num_total
    if n_rays == 0:
        zero = jnp.zeros(spec.counts, jnp.int32)
        return TrackingGrid(zero, zero)

    chunk = min(ray_chunk, max(n_rays, 1))
    pad = (-n_rays) % chunk
    # Padding rays are non-finite -> hit=False -> no marks.
    points = jnp.pad(cloud.points, ((0, pad), (0, 0)),
                     constant_values=jnp.inf)
    points = points.reshape(-1, chunk, 3)

    def chunk_body(carry, chunk_points):
        free_counts, filled_counts = carry
        (p_start, start_idx, p_final, final_idx, ray, hit,
         clipped) = _prepare_rays(spec, X_GC, chunk_points, cloud.max_range)

        init, body, endpoint_flat, endpoint_filled = _ray_visits(
            spec, p_start, start_idx, p_final, final_idx, ray, hit, clipped)
        free_counts = _walk_and_scatter(init, body, free_counts, max_steps)

        # Endpoint marks (cpp:367-381): free if range-clipped, else filled.
        free_counts = _scatter_counts(
            free_counts, jnp.where(endpoint_filled, -1, endpoint_flat))
        filled_flat = jnp.where(endpoint_filled, endpoint_flat, -1)
        return (free_counts,
                _scatter_counts(filled_counts, filled_flat)), None

    # Zero counters derived from the (possibly device-varying) points so the
    # scan carry types match under shard_map.
    vary = jnp.any(jnp.zeros((), dtype=bool) & jnp.isfinite(points[0, 0, 0]))
    zero_counts = jnp.where(vary, 1, 0).astype(jnp.int32) + jnp.zeros(
        n_total, jnp.int32)
    init = (zero_counts, zero_counts)
    (free_counts, filled_counts), _ = lax.scan(chunk_body, init, points)
    return TrackingGrid(seen_free=free_counts.reshape(spec.counts),
                        seen_filled=filled_counts.reshape(spec.counts))


def raycast_single_point(spec: GridSpec, grid_origin_transform: Array,
                         p_world_origin, p_world_point,
                         max_range: float = float("inf"),
                         max_steps: Optional[int] = None) -> TrackingGrid:
    """``CpuPointCloudVoxelizer::RaycastSinglePoint`` (cpu cpp:81-109): carve a
    single origin->point ray given in the *grid frame* (the reference API
    takes grid-frame p_GCo/p_GP; pass an identity grid transform for that)."""
    origin = jnp.asarray(p_world_origin, jnp.float32)[:3]
    point = jnp.asarray(p_world_point, jnp.float32)[:3]
    # The cloud's camera frame is a pure translation to the ray origin, so the
    # camera-frame point is the world offset from that origin.
    cloud = PointCloud.create(
        (point - origin).reshape(1, 3),
        origin_transform=transforms.isometry_from_translation(origin),
        max_range=max_range)
    return raycast_pointcloud(spec, grid_origin_transform, cloud, max_steps)


def counts_seen_as(options: FilterOptions, seen_free: Array,
                   seen_filled: Array) -> Array:
    """Vectorized ``CountsSeenAs`` voting rule (hpp:55-86). Returns int8
    SeenAs codes."""
    filtered_filled = jnp.where(
        seen_filled >= options.outlier_points_threshold, seen_filled, 0)
    both = (seen_free > 0) & (filtered_filled > 0)
    pct = seen_free.astype(jnp.float32) / jnp.maximum(
        (seen_free + filtered_filled).astype(jnp.float32), 1.0)
    both_result = jnp.where(pct >= options.percent_seen_free,
                            SeenAs.FREE, SeenAs.FILLED)
    result = jnp.where(
        both, both_result,
        jnp.where(seen_free > 0, SeenAs.FREE,
                  jnp.where(filtered_filled > 0, SeenAs.FILLED,
                            SeenAs.UNKNOWN)))
    return result.astype(jnp.int8)


def combine_and_filter(options: FilterOptions, seen_free: Array,
                       seen_filled: Array, occupancy: Array) -> Array:
    """Fuse stacked per-camera counters ``[C, nx, ny, nz]`` into occupancy
    (``DoCombineAndFilterGrids``, cpu cpp:438-497). Filled static cells are
    left untouched; others become filled if any camera saw a hit, free if
    enough cameras saw through, else unknown."""
    seen = counts_seen_as(options, seen_free, seen_filled)  # [C, ...]
    cameras_filled = jnp.sum((seen == SeenAs.FILLED).astype(jnp.int32),
                             axis=0)
    cameras_free = jnp.sum((seen == SeenAs.FREE).astype(jnp.int32), axis=0)
    fused = jnp.where(
        cameras_filled > 0, jnp.float32(1.0),
        jnp.where(cameras_free >= options.num_cameras_seen_free,
                  jnp.float32(0.0), jnp.float32(0.5)))
    return jnp.where(occupancy <= 0.5, fused, occupancy)


def voxelize_pointclouds(
        static_environment: OccupancyMap,
        filter_options: FilterOptions,
        pointclouds: Sequence[PointCloud],
        runtime_log_fn: Optional[Callable[[VoxelizerRuntime], None]] = None,
        max_steps: Optional[int] = None) -> OccupancyMap:
    """End-to-end ``VoxelizePointClouds`` (pointcloud_voxelization_interface.
    hpp:246-292): carve each cloud into its own tracking grid, then fuse.
    Wall times for the two phases are reported like ``VoxelizerRuntime``."""
    filter_options.validate()
    spec = static_environment.spec

    # Phase sync points only exist outside a trace: under jit the whole
    # pipeline fuses and the per-phase VoxelizerRuntime is reported as
    # zeros (the caller times the fused call instead).
    import jax.core as jax_core

    def _sync(x):
        if runtime_log_fn is not None and not isinstance(x, jax_core.Tracer):
            from ..utils import force_materialize
            force_materialize(x)

    t0 = time.monotonic()
    if pointclouds:
        grids = [raycast_pointcloud(spec,
                                    static_environment.origin_transform,
                                    cloud, max_steps)
                 for cloud in pointclouds]
        seen_free = jnp.stack([g.seen_free for g in grids])
        seen_filled = jnp.stack([g.seen_filled for g in grids])
    else:
        seen_free = jnp.zeros((0,) + spec.counts, jnp.int32)
        seen_filled = jnp.zeros((0,) + spec.counts, jnp.int32)
    _sync(seen_free)
    t1 = time.monotonic()

    occupancy = combine_and_filter(filter_options, seen_free, seen_filled,
                                   static_environment.occupancy)
    _sync(occupancy)
    t2 = time.monotonic()

    if runtime_log_fn is not None:
        runtime_log_fn(VoxelizerRuntime(t1 - t0, t2 - t1))
    return static_environment.replace(occupancy=occupancy)
