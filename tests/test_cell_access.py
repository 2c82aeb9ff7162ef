"""Cell-level get/set accessors (the reference's VoxelGridBase OO surface:
GetIndexImmutable / SetIndex / GetLocationImmutable / SetLocation, batched
and functional)."""

import numpy as np
import jax.numpy as jnp
import pytest

from voxelized_geometry_tools_tpu import (
    GridSpec, OccupancyComponentMap, OccupancyMap, SignedDistanceField,
    TaggedObjectOccupancyMap)


def make_map():
    spec = GridSpec.from_voxel_counts(0.5, (4, 5, 6))
    return OccupancyMap.create(spec, None, "f")


def test_get_set_index_roundtrip():
    m = make_map()
    idx = jnp.asarray([[1, 2, 3], [0, 0, 0]])
    m2 = m.set_index(idx, occupancy=jnp.asarray([1.0, 0.5]))
    values, valid = m2.get_index(idx)
    assert bool(valid.all())
    np.testing.assert_allclose(np.asarray(values["occupancy"]), [1.0, 0.5])
    # Original map unchanged (functional).
    assert float(m.occupancy[1, 2, 3]) == 0.0


def test_out_of_bounds_get_set():
    m = make_map()
    oob = jnp.asarray([[9, 9, 9]])
    _, valid = m.get_index(oob)
    assert not bool(valid[0])
    m2 = m.set_index(oob, occupancy=1.0)  # dropped, no crash
    np.testing.assert_array_equal(np.asarray(m2.occupancy),
                                  np.asarray(m.occupancy))


def test_location_accessors_respect_origin():
    spec = GridSpec.from_voxel_counts(0.5, (4, 4, 4))
    origin = np.eye(4, dtype=np.float32)
    origin[:3, 3] = (10.0, 0.0, 0.0)
    m = OccupancyMap.create(spec, origin, "f")
    m = m.set_location(jnp.asarray([10.1, 0.1, 0.1]), occupancy=1.0)
    values, valid = m.get_location(jnp.asarray([10.1, 0.1, 0.1, 1.0]))  # 4d
    assert bool(valid)
    assert float(values["occupancy"]) == 1.0
    assert float(m.occupancy[0, 0, 0]) == 1.0


def test_component_cache_invalidation_on_set():
    spec = GridSpec.from_voxel_counts(0.5, (4, 4, 4))
    m = OccupancyComponentMap.create(spec, None, "f")
    m = m.replace(components_valid=True)
    m2 = m.set_index(jnp.asarray([1, 1, 1]), occupancy=1.0)
    assert not m2.components_valid  # OnMutableAccess analogue


def test_tagged_multichannel_set():
    spec = GridSpec.from_voxel_counts(0.5, (4, 4, 4))
    m = TaggedObjectOccupancyMap.create(spec, None, "f")
    m = m.set_index(jnp.asarray([2, 2, 2]), occupancy=1.0, object_id=7)
    values, _ = m.get_index(jnp.asarray([2, 2, 2]))
    assert float(values["occupancy"]) == 1.0
    assert int(values["object_id"]) == 7


def test_sdf_get_index_still_distance_specific():
    spec = GridSpec.from_voxel_counts(0.5, (3, 3, 3))
    sdf = SignedDistanceField.create(spec, jnp.ones(spec.counts), None, "f")
    # The SDF's own get_index (distance + oob_value semantics) wins.
    out = sdf.get_index(jnp.asarray([9, 9, 9]))
    assert np.isinf(float(out))


def test_oob_set_does_not_clobber_valid_duplicate():
    """Regression: an OOB lane clipped onto a valid lane's cell must not
    scatter a stale value over the valid write (mode='drop' semantics)."""
    spec = GridSpec.from_voxel_counts(0.5, (4, 4, 4))
    m = OccupancyMap.create(spec, None, "f")
    m2 = m.set_index(jnp.asarray([[3, 3, 3], [5, 3, 3]]),
                     occupancy=jnp.asarray([1.0, 0.7]))
    assert float(m2.occupancy[3, 3, 3]) == 1.0


def test_negative_index_set_dropped():
    spec = GridSpec.from_voxel_counts(0.5, (4, 4, 4))
    m = OccupancyMap.create(spec, None, "f")
    m2 = m.set_index(jnp.asarray([[-1, 0, 0]]), occupancy=1.0)
    np.testing.assert_array_equal(np.asarray(m2.occupancy),
                                  np.asarray(m.occupancy))


def test_locked_sdf_set_index_raises():
    import pytest
    spec = GridSpec.from_voxel_counts(0.5, (3, 3, 3))
    sdf = SignedDistanceField.create(spec, jnp.ones(spec.counts), None, "f",
                                     locked=True)
    with pytest.raises(ValueError):
        sdf.set_index(jnp.asarray([0, 0, 0]), distances=-5.0)
    # Unlocked mutation works and min/max recompute live.
    sdf2 = sdf.unlock().set_index(jnp.asarray([0, 0, 0]), distances=-5.0)
    mn, _ = sdf2.get_minimum_maximum()
    assert float(mn) == -5.0


def test_sdf_get_location_keeps_dict_contract():
    spec = GridSpec.from_voxel_counts(0.5, (3, 3, 3))
    sdf = SignedDistanceField.create(spec, jnp.ones(spec.counts), None, "f")
    values, valid = sdf.get_location(jnp.asarray([0.1, 0.1, 0.1]))
    assert bool(valid)
    assert float(values["distances"]) == 1.0


def test_non_uniform_voxel_sizes_l1_surface():
    """VoxelSizes / HasUniformVoxelSize parity (SURVEY.md §2.12b): per-axis
    sizes work at the GridSpec level; map containers enforce uniformity like
    the reference's EnforceUniformVoxelSize."""
    import pytest
    from voxelized_geometry_tools_tpu import GridSpec, OccupancyMap

    spec = GridSpec.from_voxel_sizes((0.1, 0.2, 0.4), (4, 5, 6))
    assert not spec.has_uniform_voxel_size
    assert spec.voxel_sizes == (0.1, 0.2, 0.4)
    assert spec.resolution == 0.1  # VoxelXSize convention
    np.testing.assert_allclose(spec.grid_sizes, (0.4, 1.0, 2.4))
    # index -> center -> index round trip with per-axis sizes
    idx = np.array([[0, 0, 0], [3, 4, 5], [1, 2, 3]])
    centers = np.asarray(spec.grid_index_to_location_in_grid_frame(idx))
    np.testing.assert_allclose(
        centers[1], [3.5 * 0.1, 4.5 * 0.2, 5.5 * 0.4], rtol=1e-6)
    back = np.asarray(spec.location_in_grid_frame_to_grid_index(centers))
    np.testing.assert_array_equal(back, idx)
    with pytest.raises(ValueError):
        spec.enforce_uniform_voxel_size()
    with pytest.raises(ValueError):
        OccupancyMap.create(spec)
    # Uniform specs are unaffected.
    uspec = GridSpec.from_voxel_counts(0.25, (2, 2, 2))
    assert uspec.has_uniform_voxel_size
    assert uspec.enforce_uniform_voxel_size() is uspec
    OccupancyMap.create(uspec)


def test_sdf_create_validates_shape_and_keeps_f64_origin():
    import jax
    spec = GridSpec.from_voxel_counts(1.0, (4, 4, 4))
    with pytest.raises(ValueError, match="shape"):
        SignedDistanceField.create(spec, jnp.zeros((3, 4, 4)))
    with jax.enable_x64():
        t = np.eye(4)
        t[:3, 3] = (2.0 ** 24 + 1.0, 0.0, 0.0)  # not representable in f32
        sdf = SignedDistanceField.create(
            spec, jnp.zeros((4, 4, 4), jnp.float64), t, dtype=jnp.float64)
        assert sdf.origin_transform.dtype == jnp.float64
        assert float(sdf.origin_transform[0, 3]) == 2.0 ** 24 + 1.0


def test_locked_sdf_unlocks_on_distance_replace():
    """replace(distances=...) must not keep a stale locked min/max cache."""
    spec = GridSpec.from_voxel_counts(1.0, (4, 4, 4))
    sdf = SignedDistanceField.create(spec, jnp.zeros((4, 4, 4)), locked=True)
    assert sdf.locked
    sdf2 = sdf.replace(distances=jnp.full((4, 4, 4), 7.0))
    assert not sdf2.locked
    lo, hi = sdf2.get_minimum_maximum()
    assert float(lo) == float(hi) == 7.0
    # Replacing unrelated fields keeps the lock (and the valid cache).
    sdf3 = sdf.replace(frame="other")
    assert sdf3.locked and float(sdf3.maximum) == 0.0
    # lock() itself still round-trips through replace.
    assert sdf2.lock().locked


def test_non_isometry_origin_rejected():
    spec = GridSpec.from_voxel_counts(1.0, (4, 4, 4))
    bad = np.diag([2.0, 2.0, 2.0, 1.0])
    with pytest.raises(ValueError, match="isometry"):
        OccupancyMap.create(spec, bad)
    with pytest.raises(ValueError, match="isometry"):
        SignedDistanceField.create(spec, jnp.zeros((4, 4, 4)), bad)


def test_grid_spec_validation_edges():
    import math
    # NaN/inf sizes must not construct (NaN compares False both ways).
    with pytest.raises(ValueError):
        GridSpec((4, 4, 4), float("nan"))
    with pytest.raises(ValueError):
        GridSpec((4, 4, 4), 0.1, voxel_sizes=(0.1, float("nan"), 0.2))
    with pytest.raises(ValueError):
        GridSpec((4, 4, 4), 0.1, voxel_sizes=(0.1, float("inf"), 0.2))
    # Wrong-length tuples fail at construction, not later.
    with pytest.raises(ValueError, match="3 entries"):
        GridSpec((4, 4, 4), 0.1, voxel_sizes=(0.1, 0.1))
    # Same nominal size at f32 precision is accepted; resolution snaps.
    s = GridSpec((4, 4, 4), 0.1, voxel_sizes=(np.float32(0.1),) * 3)
    assert s.resolution == float(np.float32(0.1))
    assert s.has_uniform_voxel_size
    # Genuinely different X size still rejected.
    with pytest.raises(ValueError, match="VoxelXSize"):
        GridSpec((4, 4, 4), 0.1, voxel_sizes=(0.2, 0.2, 0.2))
    assert math.isclose(s.grid_sizes[0], 0.4, rel_tol=1e-6)


def test_non_uniform_spec_rejected_by_mesh_and_serialization():
    from voxelized_geometry_tools_tpu.ops import mesh
    from voxelized_geometry_tools_tpu.core import serialization
    spec = GridSpec.from_voxel_sizes((0.1, 0.2, 0.1), (4, 4, 4))
    omap = OccupancyMap(origin_transform=jnp.eye(4),
                        occupancy=jnp.zeros((4, 4, 4)), spec=spec, frame="")
    v = np.array([[0.05, 0.05, 0.05], [0.3, 0.05, 0.05],
                  [0.05, 0.3, 0.05]], np.float32)
    with pytest.raises(ValueError, match="uniform"):
        mesh.rasterize_mesh(omap, v, np.array([[0, 1, 2]]))
    with pytest.raises(ValueError, match="uniform"):
        serialization.serialize(omap)


def test_conversions_preserve_transform_and_tag_occupied_only():
    from voxelized_geometry_tools_tpu.core import conversions
    spec = GridSpec.from_voxel_counts(0.5, (4, 4, 4))
    # A pose that drifted slightly from orthonormal (gradient-optimized):
    # conversions must copy it verbatim, not re-validate and reject.
    t = np.eye(4, dtype=np.float32)
    t[0, 1] = 5e-4
    m = OccupancyMap.create(spec, None, "w").replace(
        origin_transform=jnp.asarray(t))
    occ = np.full((4, 4, 4), 0.0, np.float32)
    occ[1, 1, 1] = 1.0
    m = m.replace(occupancy=jnp.asarray(occ))
    cm = conversions.to_occupancy_component_map(m)
    np.testing.assert_array_equal(np.asarray(cm.origin_transform), t)
    back = conversions.from_occupancy_component_map(cm)
    np.testing.assert_array_equal(np.asarray(back.occupancy), occ)
    # Lifting stamps the object id on OCCUPIED voxels only.
    tagged = conversions.occupancy_map_to_tagged(m, object_id=7)
    oid = np.asarray(tagged.object_id)
    assert oid[1, 1, 1] == 7
    assert (oid.sum() == 7)  # free cells stay 0
