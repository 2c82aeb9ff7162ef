"""Sharded implementations of the dense passes (shard_map over a device mesh).

Strategy (SURVEY.md section 5, BASELINE.json north star):

* **EDT**: the grid is sharded by Z-slabs. The X and Y sweeps only need data
  within a slab, so they run locally. The Z sweep needs whole Z lines, so the
  grid is *transposed through the interconnect* with ``all_to_all`` (X-shards
  <-> Z-shards), swept locally, and transposed back — the all-to-all rides
  ICI and moves each element exactly twice, which beats halo-exchange
  envelope merging for the global lower-envelope pass.
* **Ray carving**: rays are sharded; every device scatter-adds its rays into
  a local full-size counter grid and a single ``psum`` fuses the per-camera
  tracking grids (the contention-free analogue of the reference's atomics
  across devices).
* **Rendering**: rays (pixels) are sharded; the SDF grid is replicated inside
  the shard (gather-heavy sampling wants local data); the loss/gradients
  ``psum`` back — gradient all-reduce handled by jit's partitioner.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

shard_map = jax.shard_map

from ..core import transforms
from ..core.grid import GridSpec
from ..core.maps import OccupancyMap, SignedDistanceField
from ..ops import edt as edt_ops
from ..ops import render as render_ops
from ..ops import voxelize as voxelize_ops

Array = jnp.ndarray


# -- Sharded EDT -------------------------------------------------------------


def sharded_squared_edt(seed: Array, mesh: Mesh, axis_name: str = "z",
                        block: int = 32, backend: str = "xla") -> Array:
    """Exact squared EDT over a Z-slab-sharded ``[nx, ny, nz]`` bool grid.

    ``backend`` selects the per-shard envelope implementation (see
    :func:`...ops.edt.squared_edt`); ``"pallas-windowed"`` runs the adaptive
    TPU kernel inside the shard_map (validated on hardware with a 1-device
    mesh; defaults to the XLA fusion, which is what virtual CPU meshes
    support)."""
    n_shards = mesh.shape[axis_name]
    nx, ny, nz = seed.shape
    # 'auto' is passed through to each axis pass (NOT resolved against the
    # global shape here): per-pass local shapes differ after the all_to_all
    # transposes, and the kernels tile per-axis.
    if backend not in ("auto", "xla", "pallas", "pallas-windowed",
                       "pallas-bestfirst"):
        raise ValueError(f"Unknown EDT backend {backend!r}")
    if nx % n_shards or nz % n_shards:
        raise ValueError(
            f"the '{axis_name}' axis size {n_shards} must divide both "
            f"nx ({nx}) and nz ({nz})")

    def local_edt(local_seed):
        # local_seed: [nx, ny, nz / n]; X pass (binary) + Y pass are local.
        d = jnp.moveaxis(
            edt_ops._binary_squared_dist_last(
                jnp.moveaxis(local_seed, 0, -1)), -1, 0)
        if ny > 1:
            d = jnp.moveaxis(
                edt_ops._envelope_last(
                    jnp.moveaxis(d, 1, -1), block, backend), -1, 1)
        if nz > 1:
            # Transpose through ICI: X-shard the grid, full Z locally.
            d = lax.all_to_all(d, axis_name, split_axis=0, concat_axis=2,
                               tiled=True)  # [nx/n, ny, nz]
            d = edt_ops._envelope_last(d, block, backend)
            d = lax.all_to_all(d, axis_name, split_axis=2, concat_axis=0,
                               tiled=True)  # [nx, ny, nz/n]
        return d

    fn = shard_map(local_edt, mesh=mesh,
                   in_specs=P(None, None, axis_name),
                   out_specs=P(None, None, axis_name))
    return fn(seed)


def sharded_signed_distance(is_filled: Array, resolution: float, mesh: Mesh,
                            axis_name: str = "z", block: int = 32,
                            backend: str = "xla") -> Array:
    """Sharded two-field signed combine (matches
    :func:`...ops.edt.signed_distance_from_filled_mask`)."""
    is_filled = jnp.asarray(is_filled, dtype=bool)
    d2_filled = sharded_squared_edt(is_filled, mesh, axis_name, block,
                                    backend)
    d2_free = sharded_squared_edt(~is_filled, mesh, axis_name, block,
                                  backend)
    res = jnp.float32(resolution)
    return jnp.sqrt(d2_filled) * res - jnp.sqrt(d2_free) * res


def sharded_extract_sdf(occupancy: Array, spec: GridSpec, origin_transform,
                        mesh: Mesh, axis_name: str = "z", frame: str = "",
                        unknown_is_filled: bool = True,
                        oob_value: float = float("inf"),
                        block: int = 32,
                        backend: str = "xla") -> SignedDistanceField:
    mask = edt_ops.filled_mask_from_occupancy(occupancy, unknown_is_filled)
    values = sharded_signed_distance(mask, spec.resolution, mesh, axis_name,
                                     block, backend)
    return SignedDistanceField.create(
        spec=spec, distances=values, origin_transform=origin_transform,
        frame=frame, oob_value=oob_value, locked=True)


# -- Sharded ray carving -------------------------------------------------------


def sharded_raycast_pointcloud(spec: GridSpec, grid_origin_transform: Array,
                               cloud: voxelize_ops.PointCloud, mesh: Mesh,
                               axis_name: str = "z",
                               max_steps: Optional[int] = None,
                               ray_chunk: int = 16384,
                               run_axis: Optional[int] = None
                               ) -> voxelize_ops.TrackingGrid:
    """Carve one cloud with rays sharded across the mesh; per-device counter
    grids are fused with a single ``psum`` (replicated output).

    ``run_axis`` switches each shard to the column-marching carve
    (ops/voxelize.raycast_pointcloud_columns — bit-exact with the walk,
    ~4x on v5e); ``None`` keeps the voxel walk."""
    n_shards = mesh.shape[axis_name]
    n_rays = cloud.points.shape[0]
    pad = (-n_rays) % n_shards
    points = jnp.pad(cloud.points, ((0, pad), (0, 0)),
                     constant_values=jnp.inf)

    def local_carve(local_points, origin_transform, max_range):
        local_cloud = voxelize_ops.PointCloud(
            points=local_points, origin_transform=origin_transform,
            max_range=max_range)
        if run_axis is None:
            grid = voxelize_ops.raycast_pointcloud(
                spec, grid_origin_transform, local_cloud,
                max_steps=max_steps, ray_chunk=ray_chunk)
        else:
            grid = voxelize_ops.raycast_pointcloud_columns(
                spec, grid_origin_transform, local_cloud,
                max_steps=max_steps, ray_chunk=ray_chunk,
                run_axis=int(run_axis))
        return (lax.psum(grid.seen_free, axis_name),
                lax.psum(grid.seen_filled, axis_name))

    fn = shard_map(local_carve, mesh=mesh,
                   in_specs=(P(axis_name), P(), P()),
                   out_specs=(P(), P()))
    free, filled = fn(points, cloud.origin_transform, cloud.max_range)
    return voxelize_ops.TrackingGrid(free, filled)


def sharded_voxelize_pointclouds(
        static_environment: OccupancyMap,
        filter_options: voxelize_ops.FilterOptions,
        pointclouds: Sequence[voxelize_ops.PointCloud], mesh: Mesh,
        axis_name: str = "z", max_steps: Optional[int] = None
        ) -> OccupancyMap:
    """Multi-device ``VoxelizePointClouds``: per-cloud sharded carving, then
    the fusion filter on replicated tracking grids."""
    filter_options.validate()
    spec = static_environment.spec
    grids = [sharded_raycast_pointcloud(
        spec, static_environment.origin_transform, c, mesh, axis_name,
        max_steps) for c in pointclouds]
    if grids:
        seen_free = jnp.stack([g.seen_free for g in grids])
        seen_filled = jnp.stack([g.seen_filled for g in grids])
    else:
        seen_free = jnp.zeros((0,) + spec.counts, jnp.int32)
        seen_filled = jnp.zeros((0,) + spec.counts, jnp.int32)
    occupancy = voxelize_ops.combine_and_filter(
        filter_options, seen_free, seen_filled, static_environment.occupancy)
    return static_environment.replace(occupancy=occupancy)


# -- Sharded rendering ---------------------------------------------------------


def sharded_render_depth(sdf: SignedDistanceField,
                         camera: render_ops.PinholeCamera, mesh: Mesh,
                         axis_name: str = "z", num_steps: int = 64,
                         max_depth: float = 100.0,
                         corner_table=None,
                         early_exit: bool = False,
                         head_steps: int = 8,
                         tail_chunks: int = 8,
                         coarse_factor: int = 0) -> Array:
    """Render with pixel rows sharded across devices (grid replicated).
    Returns the ``[H, W]`` depth image.

    ``corner_table`` / ``early_exit`` / ``head_steps`` / ``tail_chunks`` /
    ``coarse_factor`` are the single-chip fast-path knobs (ops/render.py);
    the table is replicated alongside the grid — gathers want device-local
    data — and each shard's early-exit wave, convergence-sorted tail, and
    cone-certified starting depths adapt to ITS pixels only
    (silhouette-heavy shards no longer stall the rest)."""
    n_shards = mesh.shape[axis_name]
    if camera.height % n_shards:
        raise ValueError(
            f"{n_shards} shards must divide camera height "
            f"{camera.height}")
    origins, dirs = render_ops.camera_rays(camera)

    t_init = None
    if coarse_factor and camera.width % coarse_factor == 0 \
            and camera.height % (coarse_factor * n_shards) == 0:
        # The cone prepass is tiny (rays / factor^2) — run it replicated
        # and shard the resulting per-pixel start depths with the rays.
        thresh = 0.25 * sdf.resolution
        t_init = render_ops._cone_prepass(
            sdf, camera, coarse_factor, num_steps, thresh, max_depth,
            corner_table)

    table_rows = corner_table.rows if corner_table is not None else None

    def local_render(local_origins, local_dirs, distances, rows=None,
                     local_t_init=None):
        local_sdf = sdf.replace(distances=distances)
        table = None
        if rows is not None:
            from ..ops.sdf_query import CornerTable
            table = CornerTable(rows=rows)
        result = render_ops.sphere_trace(
            local_sdf, local_origins, local_dirs, num_steps=num_steps,
            max_depth=max_depth, corner_table=table, early_exit=early_exit,
            head_steps=head_steps, tail_chunks=tail_chunks,
            t_init=local_t_init)
        return result.depth

    args = [origins, dirs, sdf.distances]
    specs = [P(axis_name), P(axis_name), P()]
    has_rows = table_rows is not None
    has_tinit = t_init is not None
    if has_rows:
        args.append(table_rows)
        specs.append(P())
    if has_tinit:
        args.append(t_init)
        specs.append(P(axis_name))

    def fn(o, d, dist, *extra):
        rows = extra[0] if has_rows else None
        t_i = extra[-1] if has_tinit else None
        return local_render(o, d, dist, rows=rows, local_t_init=t_i)

    mapped = shard_map(fn, mesh=mesh, in_specs=tuple(specs),
                       out_specs=P(axis_name))
    return mapped(*args)


def sharded_render_depth_grid_sharded(
        sdf: SignedDistanceField, camera: render_ops.PinholeCamera,
        mesh: Mesh, axis_name: str = "z", num_steps: int = 64,
        max_depth: float = 100.0,
        surface_threshold: Optional[float] = None) -> Array:
    """Render with the GRID Z-slab sharded (for grids too big for one chip);
    rays are replicated.

    Each device holds ``[nx, ny, nz/K]`` plus ONE halo plane from its +z
    neighbor (``ppermute``), enough for any trilinear stencil whose base cell
    lies in its slab. Per march step every device samples only the rays whose
    stencil it owns and a ``psum`` assembles the full sample vector — each
    base cell has exactly one owner, so the masked sum IS the value. This is
    the sphere-tracing analogue of halo-exchange stencils: jumps are
    arbitrary-length so samples route by reduction rather than
    neighbor-handoff (which only suits unit-step DDA walks).

    Equals the single-device render up to float reassociation. Inference
    path (``while_loop``).
    """
    spec = sdf.spec
    n_shards = mesh.shape[axis_name]
    nx, ny, nz = spec.counts
    if nz % n_shards:
        raise ValueError(f"{n_shards} shards must divide nz ({nz})")
    lz = nz // n_shards
    res = jnp.float32(spec.resolution)
    if surface_threshold is None:
        surface_threshold = 0.25 * spec.resolution
    thresh = jnp.float32(surface_threshold)
    eps = jnp.float32(1e-3 * spec.resolution)

    origins, dirs = render_ops.camera_rays(camera)
    t_enter, t_exit, hits_grid = render_ops._clip_to_grid(sdf, origins, dirs)
    t0 = jnp.where(hits_grid, t_enter + eps, jnp.float32(max_depth))
    t_stop = jnp.minimum(t_exit, jnp.float32(max_depth))
    inv = sdf.inverse_origin_transform()

    counts_i = jnp.asarray(spec.counts, jnp.int32)
    perm = [(i, (i - 1) % n_shards) for i in range(n_shards)]

    def local_render(local_d):
        local_d = local_d  # [nx, ny, lz]
        shard = lax.axis_index(axis_name)
        z_lo = shard * lz
        # +z halo plane from the next shard (the last shard's halo is unused:
        # base cells there are clamped to nz-2, owned by the last shard with
        # its own planes; a zero plane keeps shapes static).
        halo = lax.ppermute(local_d[:, :, :1], axis_name, perm)
        ext = jnp.concatenate([local_d, halo], axis=2)  # [nx, ny, lz + 1]

        half = res * 0.5
        corrected = jnp.where(ext >= 0.0, ext - half, ext + half)

        def sample(pos):
            p = pos.reshape(-1, 3)
            p_grid = transforms.apply_isometry(inv, p)
            finite = jnp.all(jnp.isfinite(p), axis=-1)
            index = spec.location_in_grid_frame_to_grid_index(
                jnp.where(finite[:, None], p_grid, 0.0))
            valid = finite & spec.check_grid_index_in_bounds(index)
            s = jnp.where(finite[:, None], p_grid, 0.0) / res - 0.5
            b = jnp.clip(jnp.floor(s).astype(jnp.int32), 0,
                         jnp.maximum(counts_i - 2, 0))
            t = s - b.astype(jnp.float32)
            mine = (b[:, 2] >= z_lo) & (b[:, 2] < z_lo + lz)
            bz = jnp.where(mine, b[:, 2] - z_lo, 0)
            bx = b[:, 0]
            by = b[:, 1]
            bx1 = jnp.minimum(bx + 1, nx - 1)
            by1 = jnp.minimum(by + 1, ny - 1)
            bz1 = bz + 1  # halo plane covers the slab's top stencil

            def corner(ix, iy, iz):
                return corrected[ix, iy, iz]

            tx = t[:, 0]
            ty = t[:, 1]
            tz = t[:, 2]
            c00 = corner(bx, by, bz) * (1 - tx) + corner(bx1, by, bz) * tx
            c10 = corner(bx, by1, bz) * (1 - tx) + corner(bx1, by1, bz) * tx
            c01 = corner(bx, by, bz1) * (1 - tx) + corner(bx1, by, bz1) * tx
            c11 = corner(bx, by1, bz1) * (1 - tx) + corner(bx1, by1, bz1) * tx
            c0 = c00 * (1 - ty) + c10 * ty
            c1 = c01 * (1 - ty) + c11 * ty
            value = c0 * (1 - tz) + c1 * tz
            value = lax.psum(jnp.where(mine, value, 0.0), axis_name)
            return value.reshape(pos.shape[:-1]), valid.reshape(
                pos.shape[:-1])

        def cond(carry):
            i, _, alive = carry
            return (i < num_steps) & (lax.psum(
                jnp.sum(alive.astype(jnp.int32)), axis_name) > 0)

        def body(carry):
            i, t, alive = carry
            pos = origins + dirs * t[..., None]
            d, valid = sample(pos)
            d = jnp.where(valid, d, thresh)
            converged = valid & (d <= thresh)
            new_t = jnp.where(alive & ~converged,
                              t + jnp.maximum(d, eps), t)
            new_alive = alive & ~converged & (new_t < t_stop)
            return i + 1, new_t, new_alive

        _, t_final, _ = lax.while_loop(
            cond, body, (jnp.int32(0), t0, hits_grid))

        points = origins + dirs * t_final[..., None]
        final_d, valid = sample(points)
        final_d = jnp.where(valid, final_d, jnp.inf)
        hit = hits_grid & valid & (final_d <= thresh * 2.0)
        refined = t_final + jnp.where(hit, final_d, 0.0)
        return jnp.where(hit, refined, jnp.float32(max_depth))

    fn = shard_map(local_render, mesh=mesh,
                   in_specs=P(None, None, axis_name), out_specs=P())
    return fn(sdf.distances)
