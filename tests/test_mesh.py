"""Mesh rasterization tests: the exact single-triangle fixture from
/root/reference/test/mesh_rasterization_test.cpp plus containment checks."""

import numpy as np
import pytest

from voxelized_geometry_tools_tpu.ops import mesh

VERTICES = np.array([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
TRIANGLES = np.array([[0, 1, 2]])
RESOLUTION = 0.125


def check_fixture(occ: np.ndarray):
    """mesh_rasterization_test.cpp:38-65."""
    nx, ny = occ.shape[0], occ.shape[1]
    # Lower layer empty ("due to how the triangle discretizes").
    assert np.all(occ[:, :, 0] == 0.0)
    for x in range(nx):
        for y in range(ny):
            if x == 0 or y == 0:
                assert occ[x, y, 1] == 0.0, (x, y)
            elif y >= ny - x:
                assert occ[x, y, 1] == 0.0, (x, y)
            else:
                assert occ[x, y, 1] == 1.0, (x, y)


def test_rasterize_into_occupancy_map():
    omap = mesh.rasterize_mesh_into_occupancy_map(VERTICES, TRIANGLES,
                                                  RESOLUTION)
    assert omap.spec.counts == (10, 10, 2)
    check_fixture(np.asarray(omap.occupancy))


def test_rasterize_into_occupancy_component_map():
    omap = mesh.rasterize_mesh_into_occupancy_component_map(
        VERTICES, TRIANGLES, RESOLUTION)
    check_fixture(np.asarray(omap.occupancy))


def test_bad_resolution():
    with pytest.raises(ValueError):
        mesh.rasterize_mesh_into_occupancy_map(VERTICES, TRIANGLES, 0.0)


def test_containment_enforcement():
    from voxelized_geometry_tools_tpu import GridSpec, OccupancyMap
    spec = GridSpec.from_voxel_counts(0.125, (2, 2, 2))
    omap = OccupancyMap.create(spec)
    with pytest.raises(RuntimeError):
        mesh.rasterize_mesh(omap, VERTICES, TRIANGLES,
                            enforce_containment=True)
    # Without enforcement: out-of-grid voxels silently dropped.
    result = mesh.rasterize_mesh(omap, VERTICES, TRIANGLES)
    assert np.asarray(result.occupancy).max() <= 1.0


def test_empty_mesh():
    from voxelized_geometry_tools_tpu import GridSpec, OccupancyMap
    spec = GridSpec.from_voxel_counts(0.125, (4, 4, 4))
    omap = OccupancyMap.create(spec)
    result = mesh.rasterize_mesh(omap, np.zeros((0, 3)), np.zeros((0, 3)))
    assert np.asarray(result.occupancy).sum() == 0.0
