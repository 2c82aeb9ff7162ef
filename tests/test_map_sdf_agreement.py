"""Cross-map-type SDF agreement + per-object SDF extraction.

Mirrors the reference's core SDF test pattern: build IDENTICAL occupancy in
all four map types and assert the four extracted SDFs agree exactly
(sdf_generation_test.cpp GenerateSignedDistanceFields, 41-106), then cover
the tagged per-object extraction surface
(tagged_object_occupancy_component_map.hpp:360-542)."""

import numpy as np
import jax.numpy as jnp
import pytest

from voxelized_geometry_tools_tpu import (
    GridSpec, OccupancyMap, OccupancyComponentMap, TaggedObjectOccupancyMap,
    TaggedObjectOccupancyComponentMap)
from voxelized_geometry_tools_tpu.core import transforms
from voxelized_geometry_tools_tpu.ops import map_ops


def _make_all_four(spec, occ, obj):
    origin = transforms.isometry_from_translation((0.25, -0.5, 1.0))
    occ = jnp.asarray(occ)
    obj = jnp.asarray(obj)
    m1 = OccupancyMap.create(spec, origin, "w").replace(occupancy=occ)
    m2 = OccupancyComponentMap.create(spec, origin, "w").set_occupancy(occ)
    m3 = TaggedObjectOccupancyMap.create(spec, origin, "w").replace(
        occupancy=occ, object_id=obj)
    m4 = TaggedObjectOccupancyComponentMap.create(
        spec, origin, "w").replace(occupancy=occ, object_id=obj)
    return m1, m2, m3, m4


@pytest.mark.parametrize("unknown_is_filled", [True, False])
@pytest.mark.parametrize("add_virtual_border", [False, True])
def test_four_map_types_agree(unknown_is_filled, add_virtual_border):
    rng = np.random.default_rng(11)
    spec = GridSpec.from_voxel_counts(0.5, (6, 7, 8))
    occ = rng.choice([0.0, 0.5, 1.0], size=(6, 7, 8),
                     p=[0.5, 0.2, 0.3]).astype(np.float32)
    obj = (occ > 0.5).astype(np.uint32) * 3

    maps = _make_all_four(spec, occ, obj)
    sdfs = [map_ops.extract_signed_distance_field(
        m, unknown_is_filled=unknown_is_filled,
        add_virtual_border=add_virtual_border) for m in maps]
    base = np.asarray(sdfs[0].distances)
    for other in sdfs[1:]:
        np.testing.assert_array_equal(base, np.asarray(other.distances))
    assert all(s.locked for s in sdfs)
    # Frame and origin ride along (occupancy_map.hpp:174-210).
    assert sdfs[0].frame == "w"
    np.testing.assert_allclose(np.asarray(sdfs[0].origin_transform),
                               np.asarray(maps[0].origin_transform))


def test_tagged_objects_to_use_subset():
    """Only the requested object ids count as filled
    (tagged_object_occupancy_component_map.hpp:360-409)."""
    spec = GridSpec.from_voxel_counts(1.0, (8, 1, 1))
    occ = np.zeros((8, 1, 1), np.float32)
    obj = np.zeros((8, 1, 1), np.uint32)
    occ[1, 0, 0] = 1.0
    obj[1, 0, 0] = 7
    occ[6, 0, 0] = 1.0
    obj[6, 0, 0] = 9
    m = TaggedObjectOccupancyMap.create(spec, None, "w").replace(
        occupancy=jnp.asarray(occ), object_id=jnp.asarray(obj))

    both = map_ops.extract_tagged_signed_distance_field(
        m, unknown_is_filled=False)
    only7 = map_ops.extract_tagged_signed_distance_field(
        m, objects_to_use=[7], unknown_is_filled=False)
    d_both = np.asarray(both.distances)[:, 0, 0]
    d_7 = np.asarray(only7.distances)[:, 0, 0]
    # With both objects, cell 4 is 2 from the nearer obstacle (index 6).
    assert d_both[4] == 2.0
    # With only object 7, cell 4 is 3 from index 1 and index 6 is free.
    assert d_7[4] == 3.0 and d_7[6] > 0


def test_make_all_object_sdfs():
    """One SDF per present object id, keyed by id (hpp:426-452)."""
    spec = GridSpec.from_voxel_counts(1.0, (4, 4, 1))
    occ = np.zeros((4, 4, 1), np.float32)
    obj = np.zeros((4, 4, 1), np.uint32)
    occ[0, 0, 0] = 1.0
    obj[0, 0, 0] = 2
    occ[3, 3, 0] = 1.0
    obj[3, 3, 0] = 5
    m = TaggedObjectOccupancyComponentMap.create(spec, None, "w").replace(
        occupancy=jnp.asarray(occ), object_id=jnp.asarray(obj))
    sdfs = map_ops.make_all_object_sdfs(m, unknown_is_filled=False)
    assert set(sdfs.keys()) == {2, 5}
    # Each per-object SDF is negative only at its own object's voxel.
    d2 = np.asarray(sdfs[2].distances)[..., 0]
    assert d2[0, 0] < 0 and d2[3, 3] > 0
    d5 = np.asarray(sdfs[5].distances)[..., 0]
    assert d5[3, 3] < 0 and d5[0, 0] > 0


def test_free_and_named_objects_sdf():
    """Outside values from the all-obstacles field, inside values from the
    named-objects field; zero in unnamed obstacles (hpp:454-542)."""
    spec = GridSpec.from_voxel_counts(1.0, (1, 1, 8))
    occ = np.zeros((1, 1, 8), np.float32)
    obj = np.zeros((1, 1, 8), np.uint32)
    # Unnamed obstacle at z=1, named object (id 4) at z=6.
    occ[0, 0, 1] = 1.0
    occ[0, 0, 6] = 1.0
    obj[0, 0, 6] = 4
    m = TaggedObjectOccupancyComponentMap.create(spec, None, "w").replace(
        occupancy=jnp.asarray(occ), object_id=jnp.asarray(obj))
    sdf = map_ops.extract_free_and_named_objects_signed_distance_field(
        m, unknown_is_filled=False)
    d = np.asarray(sdf.distances)[0, 0]
    # Free cells: distance to the nearest obstacle of ANY kind.
    assert d[3] == 2.0  # two cells from z=1
    # Named object interior: negative (inside a named object).
    assert d[6] < 0
    # Unnamed obstacle interior: clamped to 0 (free SDF negative there, but
    # the named-objects field is positive -> merge rule yields 0).
    assert d[1] == 0.0
