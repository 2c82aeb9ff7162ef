"""Lossless conversions between occupancy map types
(/root/reference/include/voxelized_geometry_tools/occupancy_map_conversions.hpp).

The reference converts cell-by-cell over the raw backing store; here the
channels are already struct-of-arrays, so conversion is just channel
selection/initialization. Component/segment labels are dropped going down and
zero-initialized (= "not computed", cache invalid) going up, exactly like the
reference's cell constructors.

The origin-transform leaf is copied VERBATIM (``dataclasses.replace``, not
re-validated through ``create``): the source map's transform is already
legitimate by construction — re-validating could reject a gradient-
optimized pose that drifted slightly from orthonormal, and would downcast
a float64 transform to float32, breaking the "lossless" contract."""

from __future__ import annotations

import jax.numpy as jnp

from .maps import (
    OccupancyComponentMap, OccupancyMap,
    TaggedObjectOccupancyComponentMap, TaggedObjectOccupancyMap)


def to_occupancy_component_map(omap: OccupancyMap) -> OccupancyComponentMap:
    """``ConvertToOccupancyComponentMap``."""
    out = OccupancyComponentMap.create(omap.spec, None, omap.frame)
    return out.replace(origin_transform=omap.origin_transform,
                       occupancy=omap.occupancy)


def from_occupancy_component_map(omap: OccupancyComponentMap) -> OccupancyMap:
    """``ConvertFromOccupancyComponentMap``."""
    out = OccupancyMap.create(omap.spec, None, omap.frame)
    return out.replace(origin_transform=omap.origin_transform,
                       occupancy=omap.occupancy)


def to_tagged_object_occupancy_component_map(
        omap: TaggedObjectOccupancyMap) -> TaggedObjectOccupancyComponentMap:
    """``ConvertToTaggedObjectOccupancyComponentMap``."""
    out = TaggedObjectOccupancyComponentMap.create(omap.spec, None,
                                                   omap.frame)
    return out.replace(origin_transform=omap.origin_transform,
                       occupancy=omap.occupancy, object_id=omap.object_id)


def from_tagged_object_occupancy_component_map(
        omap: TaggedObjectOccupancyComponentMap) -> TaggedObjectOccupancyMap:
    """``ConvertFromTaggedObjectOccupancyComponentMap``."""
    out = TaggedObjectOccupancyMap.create(omap.spec, None, omap.frame)
    return out.replace(origin_transform=omap.origin_transform,
                       occupancy=omap.occupancy, object_id=omap.object_id)


def occupancy_map_to_tagged(omap: OccupancyMap,
                            object_id: int = 0) -> TaggedObjectOccupancyMap:
    """Convenience lift: occupancy -> tagged, stamping ``object_id`` on
    OCCUPIED voxels only — free/unknown cells keep id 0 (named free space
    is reserved for genuinely tagged cells; a uniform stamp would make
    free voxels satisfy the ``object_id > 0`` named-space predicates of
    the spatial-segment pipeline)."""
    out = TaggedObjectOccupancyMap.create(omap.spec, None, omap.frame)
    oid = jnp.where(omap.occupancy > 0.5, jnp.uint32(object_id),
                    jnp.uint32(0))
    return out.replace(origin_transform=omap.origin_transform,
                       occupancy=omap.occupancy, object_id=oid)
