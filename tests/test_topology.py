"""Topology tests: connected components (vs scipy-style oracle), surface
stencils, holes/voids invariants, and spatial segmentation.

The reference tests don't cover topology directly (its examples print the
invariants), so oracles here are analytic: known shapes with known Betti
numbers (solid box: 0 holes/0 voids; hollow box: 0 holes/1 void; torus of
voxels: 1 hole; two boxes: 2 components)."""

import numpy as np
import jax.numpy as jnp
import pytest

from voxelized_geometry_tools_tpu import (
    GridSpec, OccupancyComponentMap, TaggedObjectOccupancyComponentMap)
from voxelized_geometry_tools_tpu.ops import map_ops, topology


def bfs_components_oracle(key: np.ndarray) -> np.ndarray:
    """Serial BFS mirroring the reference's scan-order numbering."""
    shape = key.shape
    comp = np.zeros(shape, dtype=np.uint32)
    next_id = 0
    for x in range(shape[0]):
        for y in range(shape[1]):
            for z in range(shape[2]):
                if comp[x, y, z] != 0:
                    continue
                next_id += 1
                stack = [(x, y, z)]
                comp[x, y, z] = next_id
                while stack:
                    cx, cy, cz = stack.pop()
                    for dx, dy, dz in ((1, 0, 0), (-1, 0, 0), (0, 1, 0),
                                       (0, -1, 0), (0, 0, 1), (0, 0, -1)):
                        nx, ny, nz = cx + dx, cy + dy, cz + dz
                        if (0 <= nx < shape[0] and 0 <= ny < shape[1]
                                and 0 <= nz < shape[2]
                                and comp[nx, ny, nz] == 0
                                and key[nx, ny, nz] == key[cx, cy, cz]):
                            comp[nx, ny, nz] = next_id
                            stack.append((nx, ny, nz))
    return comp


def test_components_match_bfs_oracle():
    rng = np.random.default_rng(11)
    occ = rng.choice([0.0, 0.5, 1.0], size=(7, 8, 9)).astype(np.float32)
    comp, num = topology.connected_components_by_occupancy(jnp.asarray(occ))
    oracle = bfs_components_oracle(topology.occupancy_class(occ))
    np.testing.assert_array_equal(np.asarray(comp), oracle)
    assert int(num) == oracle.max()


def test_two_boxes_two_components_plus_background():
    occ = np.zeros((10, 4, 4), dtype=np.float32)
    occ[1:3, 1:3, 1:3] = 1.0
    occ[6:8, 1:3, 1:3] = 1.0
    comp, num = topology.connected_components_by_occupancy(jnp.asarray(occ))
    assert int(num) == 3  # background + 2 boxes
    comp = np.asarray(comp)
    assert comp[1, 1, 1] != comp[6, 1, 1]
    assert comp[0, 0, 0] not in (comp[1, 1, 1], comp[6, 1, 1])


def test_update_connected_components_map_api():
    spec = GridSpec.from_voxel_counts(1.0, (10, 4, 4))
    omap = OccupancyComponentMap.create(spec)
    occ = np.zeros(spec.counts, dtype=np.float32)
    occ[1:3, 1:3, 1:3] = 1.0
    occ[6:8, 1:3, 1:3] = 1.0
    omap = omap.set_occupancy(jnp.asarray(occ))
    assert not omap.components_valid
    omap = map_ops.update_connected_components(omap)
    assert omap.components_valid
    assert int(omap.number_of_components) == 3
    # Idempotent on the valid cache.
    omap2 = map_ops.update_connected_components(omap)
    assert omap2 is omap


def test_tagged_components_object_split():
    spec = GridSpec.from_voxel_counts(1.0, (6, 2, 2))
    omap = TaggedObjectOccupancyComponentMap.create(spec)
    occ = np.zeros(spec.counts, np.float32)
    obj = np.zeros(spec.counts, np.uint32)
    occ[0:4, :, :] = 1.0  # one solid slab...
    obj[0:2, :, :] = 1
    obj[2:4, :, :] = 2  # ...split across two object ids
    omap = omap.replace(occupancy=jnp.asarray(occ), object_id=jnp.asarray(obj))
    split = map_ops.update_tagged_connected_components(
        omap, connect_across_objects=False)
    merged = map_ops.update_tagged_connected_components(
        omap.replace(components_valid=False), connect_across_objects=True)
    assert int(split.number_of_components) == 3  # obj1, obj2, free space
    assert int(merged.number_of_components) == 2  # slab, free space


def test_surface_stencils():
    occ = np.zeros((5, 5, 5), dtype=np.float32)
    occ[1:4, 1:4, 1:4] = 1.0
    surf = np.asarray(topology.is_surface_index(jnp.asarray(occ)))
    # Box faces are surface; the very center is not; the free cells adjacent
    # to the box are surface too (occupancy difference in 26-neighborhood).
    assert surf[1, 1, 1]
    assert not surf[2, 2, 2]
    assert surf[0, 0, 0]  # free corner diagonal to box corner (26-adjacent)

    comp, _ = topology.connected_components_by_occupancy(jnp.asarray(occ))
    csurf = np.asarray(topology.is_connected_component_surface_index(comp))
    assert csurf[1, 1, 1]
    assert not csurf[2, 2, 2]
    assert csurf[0, 0, 0]  # grid edge is automatically surface


def test_solid_box_topology():
    occ = np.zeros((6, 6, 6), dtype=np.float32)
    occ[1:4, 1:4, 1:4] = 1.0
    spec = GridSpec.from_voxel_counts(1.0, occ.shape)
    omap = OccupancyComponentMap.create(spec).set_occupancy(jnp.asarray(occ))
    omap, invariants = map_ops.compute_component_topology(
        omap, topology.FILLED_COMPONENTS)
    assert len(invariants) == 1
    holes_voids = list(invariants.values())[0]
    assert holes_voids.num_holes == 0
    assert holes_voids.num_voids == 0


def test_hollow_box_has_void():
    occ = np.zeros((7, 7, 7), dtype=np.float32)
    occ[1:6, 1:6, 1:6] = 1.0
    occ[3, 3, 3] = 0.0  # hollow center
    spec = GridSpec.from_voxel_counts(1.0, occ.shape)
    omap = OccupancyComponentMap.create(spec).set_occupancy(jnp.asarray(occ))
    omap, invariants = map_ops.compute_component_topology(
        omap, topology.FILLED_COMPONENTS)
    filled_comp = int(np.asarray(omap.component)[1, 1, 1])
    hv = invariants[filled_comp]
    assert hv.num_voids == 1
    # Reference semantics (hpp:631-632): the cavity surface's 8 concave M3
    # vertices make raw = -1, then +1 void -> 0 holes.
    assert hv.num_holes == 0


def test_torus_has_hole():
    # A square voxel ring in the z=1 plane.
    occ = np.zeros((7, 7, 3), dtype=np.float32)
    occ[1:6, 1:6, 1] = 1.0
    occ[2:5, 2:5, 1] = 0.0
    spec = GridSpec.from_voxel_counts(1.0, occ.shape)
    omap = OccupancyComponentMap.create(spec).set_occupancy(jnp.asarray(occ))
    omap, invariants = map_ops.compute_component_topology(
        omap, topology.FILLED_COMPONENTS)
    ring_comp = int(np.asarray(omap.component)[1, 1, 1])
    hv = invariants[ring_comp]
    assert hv.num_holes == 1
    assert hv.num_voids == 0


def test_spatial_segments():
    # Two separated objects segment apart; free space segments by extrema.
    spec = GridSpec.from_voxel_counts(1.0, (12, 5, 5))
    omap = TaggedObjectOccupancyComponentMap.create(spec)
    occ = np.zeros(spec.counts, np.float32)
    obj = np.zeros(spec.counts, np.uint32)
    occ[2:4, 2:4, 2:4] = 1.0
    obj[2:4, 2:4, 2:4] = 1
    occ[8:10, 2:4, 2:4] = 1.0
    obj[8:10, 2:4, 2:4] = 2
    omap = omap.replace(occupancy=jnp.asarray(occ), object_id=jnp.asarray(obj))
    omap = map_ops.update_spatial_segments(omap, connected_threshold=3.0)
    assert omap.spatial_segments_valid
    seg = np.asarray(omap.spatial_segment)
    assert int(omap.number_of_spatial_segments) >= 2
    # The two objects are in different segments.
    assert seg[2, 2, 2] != 0
    assert seg[8, 2, 2] != 0
    assert seg[2, 2, 2] != seg[8, 2, 2]


def test_candidate_corner():
    spec = GridSpec.from_voxel_counts(1.0, (5, 5, 5))
    omap = OccupancyComponentMap.create(spec)
    occ = np.zeros(spec.counts, np.float32)
    occ[0:2, 0:2, 0:2] = 1.0
    omap = map_ops.update_connected_components(
        omap.set_occupancy(jnp.asarray(occ)))
    # Box corner cell (1,1,1) has 3 different-component neighbors.
    result = map_ops.check_if_candidate_corner(omap, np.array([1, 1, 1]))
    assert bool(result.valid) and bool(result.value)
    # Face-center cell has only 1 -> not a corner.
    result2 = map_ops.check_if_candidate_corner(omap, np.array([0, 0, 0]))
    assert bool(result2.valid) and not bool(result2.value)
    # Out of grid -> invalid.
    result3 = map_ops.check_if_candidate_corner(omap, np.array([-1, 0, 0]))
    assert not bool(result3.valid)


def test_batched_topology_matches_per_component():
    """The one-pass all-components topology (_holes_voids_all_device) must
    produce identical hole/void dicts to the per-component device path on a
    speckled multi-component grid."""
    rng = np.random.default_rng(11)
    occ = (rng.random((9, 9, 9)) < 0.35).astype(np.float32)
    spec = GridSpec.from_voxel_counts(1.0, occ.shape)
    omap = OccupancyComponentMap.create(spec).set_occupancy(jnp.asarray(occ))
    omap, invariants = map_ops.compute_component_topology(
        omap, topology.FILLED_COMPONENTS)
    assert len(invariants) >= 3  # genuinely multi-component
    mask = topology.component_surfaces_mask(
        omap.occupancy, omap.component, topology.FILLED_COMPONENTS)
    comp_np = np.asarray(omap.component)
    mask_np = np.asarray(mask)
    expected = {}
    for c in sorted(np.unique(comp_np[mask_np])):
        expected[int(c)] = topology.compute_holes_and_voids(
            omap.component, mask, int(c))
    assert invariants == expected


def test_hole_formula_truncates_like_cpp():
    """The reference divides with C++ `/` (truncation toward zero); Python
    `//` floors. For negative m5+2*m6-m3 not divisible by 8 — routine on
    non-manifold surfaces of speckled grids — the two differ by one."""
    # q = -6: C++ 1 + (-6)/8 = 1 + 0 = 1; Python floor gives 1 + (-1) = 0.
    r = topology._holes_and_voids_from_counts(6, 0, 0, 1)
    assert r == topology.NumberOfHolesAndVoids(1, 0)
    # q = -14: C++ 1 + (-14)/8 = 1 - 1 = 0.
    r = topology._holes_and_voids_from_counts(14, 0, 0, 1)
    assert r == topology.NumberOfHolesAndVoids(0, 0)
    # Positive multiples behave identically in both conventions.
    assert topology._holes_and_voids_from_counts(0, 8, 0, 1).num_holes == 2


def test_empty_surface_raises():
    """An absent component id mirrors the reference's invalid_argument
    instead of fabricating a phantom hole."""
    comps = jnp.ones((4, 4, 4), jnp.uint32)
    surf = jnp.zeros((4, 4, 4), bool)
    with pytest.raises(ValueError, match="no surface"):
        topology.compute_holes_and_voids(comps, surf, component=77)


def test_nan_occupancy_cells_are_singletons():
    """Reference are_connected_fn comparisons are all false for NaN, so
    adjacent NaN cells must NOT merge into one 'unknown' component."""
    occ = np.zeros((1, 1, 4), np.float32)
    occ[0, 0, 1] = np.nan
    occ[0, 0, 2] = np.nan
    comps, n = topology.connected_components_by_occupancy(jnp.asarray(occ))
    comps = np.asarray(comps)[0, 0]
    assert int(n) == 4  # free run split by two NaN singletons
    assert comps[1] != comps[2]  # the NaN cells are separate
    assert comps[0] != comps[3]  # and they sever the free run


def test_batched_and_per_component_share_formula_on_random_grid():
    """Random speckled grid: every component reported by the batched pass
    must match the per-component path (both route through the shared
    truncating formula)."""
    rng = np.random.default_rng(41)
    occ = jnp.asarray((rng.random((7, 7, 7)) < 0.4).astype(np.float32))
    comps, n = topology.connected_components_by_occupancy(occ)
    types = (topology.FILLED_COMPONENTS | topology.EMPTY_COMPONENTS
             | topology.UNKNOWN_COMPONENTS)
    batched = topology.compute_component_topology(occ, comps, types)
    assert len(batched) == int(n)
    mask = topology.component_surfaces_mask(occ, comps, types)
    for c in list(batched)[:5]:
        single = topology.compute_holes_and_voids(comps, mask, component=c)
        assert batched[c] == single
