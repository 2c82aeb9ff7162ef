"""Lossless conversions between occupancy map types
(/root/reference/include/voxelized_geometry_tools/occupancy_map_conversions.hpp).

The reference converts cell-by-cell over the raw backing store; here the
channels are already struct-of-arrays, so conversion is just channel
selection/initialization. Component/segment labels are dropped going down and
zero-initialized (= "not computed", cache invalid) going up, exactly like the
reference's cell constructors."""

from __future__ import annotations

import jax.numpy as jnp

from .maps import (
    OccupancyComponentMap, OccupancyMap,
    TaggedObjectOccupancyComponentMap, TaggedObjectOccupancyMap)


def to_occupancy_component_map(omap: OccupancyMap) -> OccupancyComponentMap:
    """``ConvertToOccupancyComponentMap``."""
    out = OccupancyComponentMap.create(omap.spec, omap.origin_transform,
                                       omap.frame)
    return out.replace(occupancy=omap.occupancy, components_valid=False)


def from_occupancy_component_map(omap: OccupancyComponentMap) -> OccupancyMap:
    """``ConvertFromOccupancyComponentMap``."""
    out = OccupancyMap.create(omap.spec, omap.origin_transform, omap.frame)
    return out.replace(occupancy=omap.occupancy)


def to_tagged_object_occupancy_component_map(
        omap: TaggedObjectOccupancyMap) -> TaggedObjectOccupancyComponentMap:
    """``ConvertToTaggedObjectOccupancyComponentMap``."""
    out = TaggedObjectOccupancyComponentMap.create(
        omap.spec, omap.origin_transform, omap.frame)
    return out.replace(occupancy=omap.occupancy, object_id=omap.object_id,
                       components_valid=False, spatial_segments_valid=False)


def from_tagged_object_occupancy_component_map(
        omap: TaggedObjectOccupancyComponentMap) -> TaggedObjectOccupancyMap:
    """``ConvertFromTaggedObjectOccupancyComponentMap``."""
    out = TaggedObjectOccupancyMap.create(omap.spec, omap.origin_transform,
                                          omap.frame)
    return out.replace(occupancy=omap.occupancy, object_id=omap.object_id)


def occupancy_map_to_tagged(omap: OccupancyMap,
                            object_id: int = 0) -> TaggedObjectOccupancyMap:
    """Convenience lift: occupancy -> tagged with a uniform object id."""
    out = TaggedObjectOccupancyMap.create(
        omap.spec, omap.origin_transform, omap.frame,
        default_object_id=object_id)
    return out.replace(occupancy=omap.occupancy)
