"""Map-level operations: the functional equivalents of the reference's map
*methods* (connected components, spatial segments, per-object SDFs, surface
queries, candidate corners).

Because maps are immutable pytrees, every "update" returns a new map; the
cached-validity flags mirror the reference's invalidation-on-write semantics
(occupancy_component_map.cpp:111-127) at the API level.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax.numpy as jnp
import numpy as np

from ..core.grid import get_index_values
from ..core.maps import (OccupancyComponentMap, SignedDistanceField,
                         TaggedObjectOccupancyComponentMap)
from . import edt, sdf_query, topology

Array = jnp.ndarray


# -- Connected components ----------------------------------------------------


def update_connected_components(omap: OccupancyComponentMap
                                ) -> OccupancyComponentMap:
    """``OccupancyComponentMap::UpdateConnectedComponents``
    (occupancy_component_map.cpp:447-509)."""
    if omap.components_valid:
        return omap
    components, num = topology.connected_components_by_occupancy(
        omap.occupancy)
    return omap.replace(component=components, number_of_components=num,
                        components_valid=True)


def update_tagged_connected_components(
        omap: TaggedObjectOccupancyComponentMap,
        connect_across_objects: bool = False
) -> TaggedObjectOccupancyComponentMap:
    """``TaggedObjectOccupancyComponentMap::UpdateConnectedComponents``
    (tagged_object_occupancy_component_map.cpp:689-773).

    Mirrors the reference's ``components_valid_`` early-out — which means
    the PARAMETER is part of the cached state: a labeling computed under
    one ``connect_across_objects`` is returned verbatim for the other
    value. Force a recompute with
    ``omap.replace(components_valid=False)`` when changing the flag
    (same rule as the reference's mutate-then-update flow)."""
    if omap.components_valid:
        return omap
    components, num = topology.connected_components_by_occupancy(
        omap.occupancy, omap.object_id, connect_across_objects)
    return omap.replace(component=components, number_of_components=num,
                        components_valid=True)


# -- SDF extraction per map type ---------------------------------------------


def extract_signed_distance_field(omap, oob_value: float = float("inf"),
                                  unknown_is_filled: bool = True,
                                  add_virtual_border: bool = False,
                                  **edt_kwargs) -> SignedDistanceField:
    """SDF from any occupancy-carrying map (occupancy_map.hpp:174-210).
    ``edt_kwargs`` reach :func:`..ops.edt.extract_sdf_from_occupancy` —
    ``dtype=jnp.float64`` is the reference's ``<double>`` instantiation
    (ExtractSignedDistanceFieldDouble), ``streaming``/``block`` control the
    pipeline."""
    return edt.extract_sdf_from_occupancy(
        omap.occupancy, omap.spec, omap.origin_transform, frame=omap.frame,
        oob_value=oob_value, unknown_is_filled=unknown_is_filled,
        add_virtual_border=add_virtual_border, **edt_kwargs)


def _tagged_filled_mask(omap, objects_to_use: Sequence[int],
                        unknown_is_filled: bool) -> Array:
    occ_filled = edt.filled_mask_from_occupancy(omap.occupancy,
                                                unknown_is_filled)
    if len(objects_to_use) == 0:
        return occ_filled
    ids = np.asarray(list(objects_to_use))
    if (ids < 0).any() or (ids > np.iinfo(np.uint32).max).any():
        raise ValueError(f"object ids out of uint32 range: {ids}")
    in_set = jnp.isin(omap.object_id, jnp.asarray(ids, jnp.uint32))
    return occ_filled & in_set


def extract_tagged_signed_distance_field(
        omap, objects_to_use: Sequence[int] = (),
        oob_value: float = float("inf"), unknown_is_filled: bool = True,
        add_virtual_border: bool = False,
        **edt_kwargs) -> SignedDistanceField:
    """``TaggedObject*Map::ExtractSignedDistanceField(objects_to_use, ...)``
    (tagged_object_occupancy_component_map.hpp:360-409): only voxels whose
    object id is in ``objects_to_use`` (or all, when empty) count as
    filled. ``edt_kwargs``: see :func:`extract_signed_distance_field`
    (``dtype=jnp.float64`` = the reference ``<double>`` variants)."""
    mask = _tagged_filled_mask(omap, objects_to_use, unknown_is_filled)
    return edt.extract_signed_distance_field(
        mask, omap.spec, omap.origin_transform, frame=omap.frame,
        oob_value=oob_value, add_virtual_border=add_virtual_border,
        **edt_kwargs)


def make_separate_object_sdfs(omap, object_ids: Sequence[int],
                              **kwargs) -> Dict[int, SignedDistanceField]:
    """``MakeSeparateObjectSDFs`` (hpp:411-424)."""
    return {int(oid): extract_tagged_signed_distance_field(
        omap, [int(oid)], **kwargs) for oid in object_ids}


def make_all_object_sdfs(omap, **kwargs) -> Dict[int, SignedDistanceField]:
    """``MakeAllObjectSDFs`` (hpp:426-452): one SDF per object id present."""
    ids = np.unique(np.asarray(omap.object_id))
    ids = [int(i) for i in ids if i > 0]
    return make_separate_object_sdfs(omap, ids, **kwargs)


def extract_free_and_named_objects_signed_distance_field(
        omap, oob_value: float = float("inf"),
        unknown_is_filled: bool = True,
        add_virtual_border: bool = False) -> SignedDistanceField:
    """``ExtractFreeAndNamedObjectsSignedDistanceField`` (hpp:454-542):
    combine the all-obstacles SDF (outside values) with the named-objects-only
    SDF (inside values)."""
    free_mask = edt.filled_mask_from_occupancy(omap.occupancy,
                                               unknown_is_filled)
    named_mask = free_mask & (omap.object_id > 0)

    free_sdf = edt.extract_signed_distance_field(
        free_mask, omap.spec, omap.origin_transform, frame=omap.frame,
        oob_value=oob_value, add_virtual_border=add_virtual_border)
    named_sdf = edt.extract_signed_distance_field(
        named_mask, omap.spec, omap.origin_transform, frame=omap.frame,
        oob_value=oob_value, add_virtual_border=add_virtual_border)

    combined = edt.merge_free_and_named_object_sdfs(
        free_sdf.distances, named_sdf.distances)
    return SignedDistanceField.create(
        spec=omap.spec, distances=combined,
        origin_transform=omap.origin_transform, frame=omap.frame,
        oob_value=oob_value, locked=True)


# -- Spatial segments --------------------------------------------------------


def update_spatial_segments(
        omap: TaggedObjectOccupancyComponentMap,
        connected_threshold: float,
        unknown_is_filled: bool = True,
        add_virtual_border: bool = False
) -> TaggedObjectOccupancyComponentMap:
    """``UpdateSpatialSegments`` (tagged_object_occupancy_component_map.cpp:
    775-868): SDF -> local-extrema map -> cluster voxels of the same object
    whose extrema lie within ``connected_threshold``.

    The reference picks the SDF variant on ``AddVirtualBorder`` (cpp:786-789);
    cells are eligible iff free or belonging to a named object AND their
    extrema are finite (cpp:821-852)."""
    if omap.spatial_segments_valid:
        return omap

    if add_virtual_border:
        sdf = extract_tagged_signed_distance_field(
            omap, (), unknown_is_filled=unknown_is_filled,
            add_virtual_border=True)
    else:
        sdf = extract_free_and_named_objects_signed_distance_field(
            omap, unknown_is_filled=unknown_is_filled)

    extrema = sdf_query.compute_local_extrema_map(sdf)  # [nx,ny,nz,3]

    finite = jnp.all(jnp.isfinite(extrema), axis=-1)
    eligible = ((omap.occupancy < 0.5) | (omap.object_id > 0)) & finite

    # Face connectivity: same object id and extrema within threshold.
    thresh = jnp.float32(connected_threshold)

    def extrema_close(a, b):
        return jnp.linalg.norm(a - b, axis=-1) < thresh

    ox, oy, oz = topology.face_adjacency_from_key(omap.object_id)
    cx = ox & extrema_close(extrema[1:], extrema[:-1])
    cy = oy & extrema_close(extrema[:, 1:], extrema[:, :-1])
    cz = oz & extrema_close(extrema[:, :, 1:], extrema[:, :, :-1])

    segments, num = topology.label_components(cx, cy, cz, eligible)
    return omap.replace(spatial_segment=segments,
                        number_of_spatial_segments=num,
                        spatial_segments_valid=True)


# -- Surfaces / topology / corners -------------------------------------------


def is_surface_index(omap, index=None) -> Array:
    """Occupancy surface mask (occupancy_map.cpp:201-248); full-grid or
    gathered at ``index``. Out-of-bounds indices gather ``False`` — the
    payload of the reference's empty ``OwningMaybe``; callers needing the
    OOB/valid distinction should test
    ``omap.spec.check_grid_index_in_bounds(index)`` alongside (the
    query-object style of :func:`check_if_candidate_corner`)."""
    mask = topology.is_surface_index(omap.occupancy)
    if index is None:
        return mask
    return get_index_values(mask, jnp.asarray(index), False)


def extract_component_surfaces(omap, component_types: int):
    """Per-component surface indices (occupancy_component_map.cpp:511-571)."""
    return topology.extract_component_surfaces(
        omap.occupancy, omap.component, component_types)


def compute_component_topology(omap, component_types: int,
                               connect_across_objects: bool = False,
                               logging_fn=None):
    """``ComputeComponentTopology`` for component maps
    (occupancy_component_map.cpp:594-653)."""
    if isinstance(omap, TaggedObjectOccupancyComponentMap):
        omap = update_tagged_connected_components(omap,
                                                  connect_across_objects)
    else:
        omap = update_connected_components(omap)
    return omap, topology.compute_component_topology(
        omap.occupancy, omap.component, component_types, logging_fn)


def check_if_candidate_corner(omap, index) -> sdf_query.DistanceQuery:
    """``CheckIfCandidateCorner`` (occupancy_component_map.cpp:380-445): a
    cell is a candidate corner if >= 2 of its 6 in-grid neighbors belong to a
    different component. Returns (is_corner, valid) batched."""
    idx = jnp.asarray(index)
    comp = omap.component
    counts = jnp.asarray(omap.spec.counts, dtype=idx.dtype)
    valid = jnp.all((idx >= 0) & (idx < counts), axis=-1)
    own = get_index_values(comp, idx, 0)

    different = jnp.zeros(idx.shape[:-1], dtype=jnp.int32)
    for off in ((1, 0, 0), (-1, 0, 0), (0, 1, 0), (0, -1, 0),
                (0, 0, 1), (0, 0, -1)):
        nidx = idx + jnp.asarray(off, dtype=idx.dtype)
        n_in = jnp.all((nidx >= 0) & (nidx < counts), axis=-1)
        nval = get_index_values(comp, nidx, 0)
        different = different + (n_in & (nval != own)).astype(jnp.int32)
    is_corner = different >= 2
    return sdf_query.DistanceQuery(
        jnp.where(valid, is_corner, False), valid)
