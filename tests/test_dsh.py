"""Tests for the dynamic spatial-hashed (chunked sparse) occupancy map.

Coverage model: the reference exercises the DSH map through construction,
SetLocation/GetLocationImmutable, serialization, and the RViz chunk exporter
(dynamic_spatial_hashed_occupancy_map.hpp:18-115, ros_interface.hpp:258-328).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from voxelized_geometry_tools_tpu import (
    DSHGridSizes, DynamicSpatialHashedOccupancyMap, FillStatus)
from voxelized_geometry_tools_tpu.core import dsh as dsh_mod
from voxelized_geometry_tools_tpu.io import viz


def make_map(**kw):
    sizes = DSHGridSizes(0.25, (4, 4, 4))
    return DynamicSpatialHashedOccupancyMap(
        sizes, default_occupancy=0.5, frame="test", **kw)


def test_empty_lookup_not_filled():
    m = make_map()
    value, status = m.get_location((0.1, 0.1, 0.1))
    assert status == FillStatus.NOT_FILLED
    assert value == 0.5
    assert m.num_chunks == 0


def test_cell_set_get_roundtrip():
    m = make_map()
    m.set_location((0.1, 0.1, 0.1), 1.0)
    value, status = m.get_location((0.1, 0.1, 0.1))
    assert status == FillStatus.CELL_FILLED
    assert value == 1.0
    # Same chunk, different cell: default value, CELL_FILLED status.
    value, status = m.get_location((0.6, 0.1, 0.1))
    assert status == FillStatus.CELL_FILLED
    assert value == 0.5
    # Different chunk: untouched.
    value, status = m.get_location((5.0, 5.0, 5.0))
    assert status == FillStatus.NOT_FILLED
    assert m.num_chunks == 1


def test_negative_coordinates_chunking():
    m = make_map()
    m.set_location((-0.1, -0.1, -0.1), 1.0)
    assert m.chunk_region_of((-0.1, -0.1, -0.1)) == (-1, -1, -1)
    value, status = m.get_location((-0.1, -0.1, -0.1))
    assert status == FillStatus.CELL_FILLED
    assert value == 1.0


def test_chunk_fill_then_cell_split():
    m = make_map()
    m.set_location((0.1, 0.1, 0.1), 1.0, grain=FillStatus.CHUNK_FILLED)
    value, status = m.get_location((0.9, 0.9, 0.9))
    assert status == FillStatus.CHUNK_FILLED
    assert value == 1.0
    # A cell write densifies the chunk, preserving the chunk value elsewhere.
    m.set_location((0.1, 0.1, 0.1), 0.0)
    value, status = m.get_location((0.1, 0.1, 0.1))
    assert status == FillStatus.CELL_FILLED and value == 0.0
    value, status = m.get_location((0.9, 0.9, 0.9))
    assert status == FillStatus.CELL_FILLED and value == 1.0


def test_origin_transform_lookup():
    shift = np.eye(4)
    shift[:3, 3] = (10.0, 0.0, 0.0)
    m = make_map(origin_transform=shift)
    m.set_location((10.1, 0.1, 0.1), 1.0)
    assert m.get_location((10.1, 0.1, 0.1))[0] == 1.0
    assert m.chunk_region_of((10.1, 0.1, 0.1)) == (0, 0, 0)


def test_serialization_roundtrip(tmp_path):
    m = make_map()
    m.set_location((0.1, 0.2, 0.3), 1.0)
    m.set_location((-1.0, -1.0, -1.0), 0.0)
    m.set_location((3.0, 3.0, 3.0), 0.75, grain=FillStatus.CHUNK_FILLED)
    for compress in (True, False):
        path = str(tmp_path / f"m_{compress}.dmg")
        m.save_to_file(path, compress=compress)
        loaded = DynamicSpatialHashedOccupancyMap.load_from_file(path)
        assert loaded.frame == "test"
        assert loaded.sizes == m.sizes
        assert loaded.num_chunks == m.num_chunks
        for p in [(0.1, 0.2, 0.3), (-1.0, -1.0, -1.0), (3.0, 3.0, 3.0),
                  (0.9, 0.9, 0.9), (50.0, 0.0, 0.0)]:
            assert loaded.get_location(p) == m.get_location(p)


def test_to_occupancy_map_densify():
    m = make_map()
    m.set_location((0.1, 0.1, 0.1), 1.0)
    m.set_location((-0.1, 0.1, 0.1), 0.0)
    omap = m.to_occupancy_map()
    # Two chunks along x -> 8 x 4 x 4 dense voxels.
    assert omap.spec.counts == (8, 4, 4)
    occ = np.asarray(omap.occupancy)
    # World location -> dense map index round-trips the written values.
    idx = np.asarray(omap.location_to_grid_index(jnp.asarray(
        [[0.1, 0.1, 0.1], [-0.1, 0.1, 0.1]], jnp.float32)))
    assert occ[tuple(idx[0])] == 1.0
    assert occ[tuple(idx[1])] == 0.0
    assert occ[0, 0, 0] == 0.5  # untouched default


def test_packed_query_matches_host():
    rng = np.random.default_rng(0)
    m = make_map()
    pts = rng.uniform(-3.0, 3.0, size=(64, 3))
    for p in pts[:32]:
        m.set_location(p, float(rng.uniform()))
    packed = m.pack()
    query = np.concatenate([pts, rng.uniform(-8.0, 8.0, size=(64, 3))])
    values, status = dsh_mod.packed_get_location(
        packed, jnp.asarray(query, jnp.float32))
    values = np.asarray(values)
    status = np.asarray(status)
    for i, p in enumerate(query):
        host_value, host_status = m.get_location(p)
        assert values[i] == pytest.approx(host_value, abs=1e-6), p
        if host_status == FillStatus.NOT_FILLED:
            assert status[i] == int(FillStatus.NOT_FILLED)
        else:
            assert status[i] == int(FillStatus.CELL_FILLED)


def test_packed_query_empty_map():
    m = make_map()
    packed = m.pack()
    values, status = dsh_mod.packed_get_location(
        packed, jnp.asarray([[0.0, 0.0, 0.0]], jnp.float32))
    assert float(values[0]) == 0.5
    assert int(status[0]) == int(FillStatus.NOT_FILLED)


def test_dsh_viz_export():
    m = make_map()
    m.set_location((0.1, 0.1, 0.1), 1.0)
    m.set_location((-0.9, 0.1, 0.1), 1.0)
    marker = viz.export_dsh_occupancy_for_display(m)
    assert marker.num_cells == 2
    # Grid-frame positions are cell centers.
    got = {tuple(np.round(p, 3)) for p in marker.positions}
    assert (0.125, 0.125, 0.125) in got
    assert (-0.875, 0.125, 0.125) in got
    assert np.all(marker.colors[:, 3] > 0.0)


def test_many_chunks_hash_stress():
    rng = np.random.default_rng(1)
    m = make_map()
    pts = rng.uniform(-20.0, 20.0, size=(400, 3))
    vals = rng.uniform(size=400)
    for p, v in zip(pts, vals):
        m.set_location(p, float(v))
    packed = m.pack()
    values, status = dsh_mod.packed_get_location(
        packed, jnp.asarray(pts, jnp.float32))
    values = np.asarray(values)
    for i, p in enumerate(pts):
        host_value, _ = m.get_location(p)
        assert values[i] == pytest.approx(host_value, abs=1e-6)


def test_chunk_value_exact_roundtrip():
    """CHUNK-granularity values quantize to f32 at write time, so
    get_location is identical across a save/load round trip even for
    values like 0.1 that f64 and f32 disagree on."""
    sizes = dsh_mod.DSHGridSizes(resolution=0.5, chunk_counts=(4, 4, 4))
    m = dsh_mod.DynamicSpatialHashedOccupancyMap(sizes)
    m.set_location((0.6, 0.6, 0.6), 0.1, grain=dsh_mod.FillStatus.CHUNK_FILLED)
    before = m.get_location((0.6, 0.6, 0.6))
    loaded = dsh_mod.DynamicSpatialHashedOccupancyMap.from_file_bytes(
        m.to_file_bytes())
    assert loaded.get_location((0.6, 0.6, 0.6)) == before


def test_packed_matches_host_for_nonrigid_transform():
    """The packed probe uses the TRUE inverse of the origin transform, so a
    scaled (non-rigid) transform answers identically to the host path."""
    sizes = dsh_mod.DSHGridSizes(resolution=0.25, chunk_counts=(4, 4, 4))
    scale = np.diag([2.0, 2.0, 2.0, 1.0]).astype(np.float32)
    m = dsh_mod.DynamicSpatialHashedOccupancyMap(sizes, origin_transform=scale)
    m.set_location((1.3, 1.3, 1.3), 0.875)
    packed = m.pack()
    for p in [(1.3, 1.3, 1.3), (0.1, 0.1, 0.1), (3.0, 1.0, 1.0)]:
        host_v, host_s = m.get_location(p)
        v, s = dsh_mod.packed_get_location(packed, jnp.asarray([p]))
        assert float(v[0]) == host_v, p
        if host_s == dsh_mod.FillStatus.NOT_FILLED:
            assert int(s[0]) == int(dsh_mod.FillStatus.NOT_FILLED)
        else:
            assert int(s[0]) != int(dsh_mod.FillStatus.NOT_FILLED)


def test_pack_rejects_out_of_int32_regions():
    sizes = dsh_mod.DSHGridSizes(resolution=1.0, chunk_counts=(2, 2, 2))
    m = dsh_mod.DynamicSpatialHashedOccupancyMap(sizes)
    m._chunks[(2 ** 31, 0, 0)] = dsh_mod._Chunk(
        dsh_mod.FillStatus.CHUNK_FILLED, value=1.0)
    with pytest.raises(ValueError, match="int32"):
        m.pack()


def test_chunk_items_does_not_leak_live_storage():
    sizes = dsh_mod.DSHGridSizes(resolution=0.5, chunk_counts=(4, 4, 4))
    m = dsh_mod.DynamicSpatialHashedOccupancyMap(sizes)
    m.set_location((0.6, 0.6, 0.6), 1.0)
    for _, arr in m.chunk_items():
        arr[:] = -99.0  # mutating the yielded array must not corrupt the map
    assert m.get_location((0.6, 0.6, 0.6))[0] == 1.0


def test_corrupt_file_bytes_raise_valueerror():
    """The DSH envelope shares the package-wide error contract: corrupt
    compressed payloads raise ValueError, not raw zlib.error, and short
    files are rejected."""
    with pytest.raises(ValueError):
        dsh_mod.DynamicSpatialHashedOccupancyMap.from_file_bytes(
            b"DMGZ\x00\x01\x02")
    with pytest.raises(ValueError):
        dsh_mod.DynamicSpatialHashedOccupancyMap.from_file_bytes(b"DM")
