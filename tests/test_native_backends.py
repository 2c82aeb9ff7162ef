"""Native C++ runtime + backend registry tests.

The one-oracle-many-backends strategy from the reference
(pointcloud_voxelization_test.cpp:269-295): every enumerated backend must
pass the same two-camera fusion oracle; the native EDT must agree with the
JAX EDT on golden fixtures and random grids."""

import numpy as np
import pytest

from voxelized_geometry_tools_tpu import native
from voxelized_geometry_tools_tpu.ops import backends, edt, voxelize
from tests.test_voxelize import (check_empty_voxelization, check_voxelization,
                                 make_scene)

needs_native = pytest.mark.skipif(not native.available(),
                                  reason="no C++ toolchain")


@needs_native
def test_native_edt_matches_jax():
    rng = np.random.default_rng(9)
    filled = rng.random((9, 11, 13)) < 0.25
    filled[0, 0, 0] = True
    filled[8, 10, 12] = False
    got = native.edt_sdf(filled, 0.5)
    want = np.asarray(edt.signed_distance_from_filled_mask(filled, 0.5))
    np.testing.assert_allclose(got, want, atol=1e-5)


@needs_native
def test_native_edt_exact_fixture():
    filled = np.zeros((1, 1, 4), dtype=bool)
    filled[0, 0, 0:2] = True
    got = native.edt_sdf(filled, 1.0)
    np.testing.assert_allclose(got[0, 0], [-2.0, -1.0, 1.0, 2.0], rtol=1e-6)


@needs_native
def test_native_edt_degenerate():
    assert np.all(native.edt_sdf(np.ones((3, 4, 5), bool), 1.0) == -np.inf)
    assert np.all(native.edt_sdf(np.zeros((3, 4, 5), bool), 1.0) == np.inf)


@needs_native
def test_native_raycast_agrees_with_jax():
    """Native (f64 walk, like the reference CPU path) and JAX (f32 walk, like
    the reference CUDA path) agree on endpoint marks and count invariants;
    free-visit sets may differ by a few boundary-degenerate cells, exactly as
    the reference's CPU/CUDA backends do — so the comparison mirrors the
    reference's invariant-based oracle rather than bitwise equality."""
    from voxelized_geometry_tools_tpu import GridSpec
    spec = GridSpec.from_voxel_counts(0.125, (40, 40, 40))
    rng = np.random.default_rng(42)
    for _ in range(10):
        origin = rng.uniform(-2.0, 7.0, 3)
        target = rng.uniform(-2.0, 7.0, 3)
        free_n, filled_n = native.raycast(
            origin.astype(np.float32), target.astype(np.float32).reshape(1, 3),
            10.0, spec.counts, spec.resolution)
        grid = voxelize.raycast_single_point(
            spec, np.eye(4, dtype=np.float32), origin, target, max_range=10.0)
        free_j = np.asarray(grid.seen_free)
        filled_j = np.asarray(grid.seen_filled)
        # Invariants hold for the native walk too.
        assert free_n.max() <= 1 and filled_n.max() <= 1
        assert not np.any((free_n > 0) & (filled_n > 0))
        # Endpoint (seen-filled) marks agree exactly.
        np.testing.assert_array_equal(filled_n, filled_j)
        # Visit counts agree closely and every differing cell lies within one
        # voxel of the other backend's path (staircase tie-break divergence).
        assert abs(int(free_n.sum()) - int(free_j.sum())) <= 2

        def dilate(mask):
            out = mask.copy()
            for axis in range(3):
                out = out | np.roll(mask, 1, axis) | np.roll(mask, -1, axis)
            return out

        only_n = (free_n > 0) & ~(free_j > 0)
        only_j = (free_j > 0) & ~(free_n > 0)
        if only_n.any():
            assert np.all(dilate(free_j > 0)[only_n])
        if only_j.any():
            assert np.all(dilate(free_n > 0)[only_j])


def test_backend_registry_enumeration():
    available = backends.get_available_backends()
    assert len(available) >= 1
    names = [b.device_name() for b in available]
    assert any("accelerator" in n for n in names)


def test_all_backends_pass_oracle():
    """Run the exact reference oracle on every available backend."""
    static_env, clouds = make_scene()
    options = voxelize.FilterOptions(1.0, 1, 1)
    logs = []
    for backend in backends.get_available_backends():
        voxelizer = backends.make_pointcloud_voxelizer(backend, logs.append)
        empty = voxelizer.voxelize_pointclouds(static_env, options, [])
        check_empty_voxelization(np.asarray(empty.occupancy))
        result = voxelizer.voxelize_pointclouds(static_env, options, clouds)
        check_voxelization(np.asarray(result.occupancy))
    assert logs  # logging function was used


def test_null_logging_and_best_available():
    """Null logging + BEST_AVAILABLE construction never throw
    (pointcloud_voxelization_test.cpp:297-311)."""
    for backend in backends.get_available_backends():
        backends.make_pointcloud_voxelizer(backend, None)
    backends.make_best_available_pointcloud_voxelizer({}, None)


def test_option_resolution_logging():
    logs = []
    value = backends.retrieve_option_or_default(
        {"CPU_NUM_THREADS": 4}, "CPU_NUM_THREADS", 0, logs.append)
    assert value == 4
    default = backends.retrieve_option_or_default(
        {}, "CPU_NUM_THREADS", 7, logs.append)
    assert default == 7
    assert "value [4]" in logs[0]
    assert "default" in logs[1]


def test_invalid_options_rejected():
    with pytest.raises(ValueError, match="RAY_CHUNK"):
        backends.AcceleratorPointCloudVoxelizer({"RAY_CHUNK": 0})
    with pytest.raises(ValueError, match="MAX_STEPS"):
        backends.AcceleratorPointCloudVoxelizer({"MAX_STEPS": -5})
    # 0 means "unset" per the reference option convention.
    backends.AcceleratorPointCloudVoxelizer({"MAX_STEPS": 0})


def test_best_available_prefers_native_on_cpu_hosts():
    """Without a real accelerator device the multithreaded native backend
    must win over XLA-on-CPU (the reference's device-backend-only-when-a-
    device-exists ordering)."""
    import jax
    from voxelized_geometry_tools_tpu import native
    if any(d.platform != "cpu" for d in jax.devices()):
        pytest.skip("accelerator present")
    if not native.available():
        pytest.skip("no native toolchain")
    v = backends.make_best_available_pointcloud_voxelizer()
    assert isinstance(v, backends.NativeCpuPointCloudVoxelizer)


def test_probe_available_is_consistent():
    from voxelized_geometry_tools_tpu import native
    # probe may be optimistic (toolchain present) but must never be False
    # when the library actually loads.
    if native.available():
        assert native.probe_available()


def test_native_rejects_non_uniform_spec():
    from voxelized_geometry_tools_tpu import native
    if not native.available():
        pytest.skip("no native toolchain")
    from voxelized_geometry_tools_tpu import GridSpec, OccupancyMap
    import jax.numpy as jnp
    spec = GridSpec.from_voxel_sizes((0.1, 0.2, 0.1), (4, 4, 4))
    env = OccupancyMap(origin_transform=jnp.eye(4),
                       occupancy=jnp.full((4, 4, 4), 0.5), spec=spec,
                       frame="t")
    v = backends.NativeCpuPointCloudVoxelizer()
    cloud = voxelize.PointCloud.create(np.zeros((1, 3), np.float32))
    with pytest.raises(ValueError, match="uniform"):
        v.voxelize_pointclouds(env, voxelize.FilterOptions(), [cloud])


def test_native_raycast_sentinel_and_nan_origin():
    """Huge finite sentinel endpoints must carve toward the point (the
    float->int64 cast previously overflowed and flipped the DDA step), and
    NaN origins must skip the ray instead of UB."""
    if not native.available():
        pytest.skip("no native toolchain")
    counts = (8, 8, 8)
    origin = np.array([4.5, 4.5, 4.5], np.float32)
    pts = np.array([[4.5, 4.5, -3.0e38],    # ~FLT_MAX sentinel, -z
                    [np.nan, 4.5, 4.5]], np.float32)
    # NaN ORIGIN row exercised via per-ray origins.
    origins = np.stack([origin, np.array([np.nan, 4.5, 4.5], np.float32)])
    free, filled = native.raycast(origins, pts, np.inf, counts, 1.0)
    zs = sorted(np.argwhere(free > 0)[:, 2].tolist())
    assert zs == [0, 1, 2, 3, 4], zs   # toward the sentinel, not away
    assert filled.sum() == 0
    # Matches the JAX walk on the sentinel ray.
    from voxelized_geometry_tools_tpu import GridSpec
    spec = GridSpec.from_voxel_counts(1.0, counts)
    pose = np.eye(4, dtype=np.float32); pose[:3, 3] = origin
    cloud = voxelize.PointCloud.create(
        np.array([[0.0, 0.0, -3.0e38]], np.float32), pose)
    import jax.numpy as jnp
    walk = voxelize.raycast_pointcloud(spec, jnp.eye(4), cloud)
    np.testing.assert_array_equal(free, np.asarray(walk.seen_free))
