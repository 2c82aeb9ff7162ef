"""SDF query op tests: trilinear estimation, gradients (vs finite
differences), projection walks, and the local extrema map.

The reference has no unit tests for these (only the estimate_distance
example, /root/reference/example/estimate_distance.cpp, which prints values),
so the oracles here are analytic: a planar obstacle gives an exactly linear
corrected SDF away from the surface, making interpolation and gradients
predictable in closed form.
"""

import numpy as np
import jax
import jax.numpy as jnp

from voxelized_geometry_tools_tpu import GridSpec, SignedDistanceField
from voxelized_geometry_tools_tpu.core import transforms
from voxelized_geometry_tools_tpu.ops import edt, sdf_query


def make_planar_sdf(n=8, resolution=0.5):
    """Floor at z=0..1 filled -> SDF linear in z above the floor."""
    spec = GridSpec.from_voxel_counts(resolution, (n, n, n))
    filled = np.zeros(spec.counts, dtype=bool)
    filled[:, :, 0:2] = True
    return edt.extract_sdf_from_occupancy(
        filled.astype(np.float32), spec, None, unknown_is_filled=True)


def test_estimate_matches_corrected_linear_field():
    sdf = make_planar_sdf()
    res = sdf.resolution
    # Query at a cell center away from boundaries: estimate = corrected value
    # = stored - res/2 (positive side).
    p = np.array([2.25, 2.25, 2.25])  # center of cell (4, 4, 4)
    q = sdf_query.estimate_location_distance(sdf, p)
    stored = float(np.asarray(sdf.distances)[4, 4, 4])
    assert bool(q.valid)
    np.testing.assert_allclose(float(q.value), stored - res / 2, rtol=1e-5)


def test_estimate_is_continuous_and_linear_in_z():
    sdf = make_planar_sdf()
    zs = np.linspace(1.3, 3.2, 20)
    pts = np.stack([np.full_like(zs, 2.1), np.full_like(zs, 2.1), zs], axis=-1)
    q = sdf_query.estimate_location_distance(sdf, pts)
    assert np.all(np.asarray(q.valid))
    vals = np.asarray(q.value)
    # d(z) should be exactly linear with slope 1 in this region.
    slopes = np.diff(vals) / np.diff(zs)
    np.testing.assert_allclose(slopes, 1.0, atol=1e-4)


def test_estimate_out_of_bounds_invalid():
    sdf = make_planar_sdf()
    q = sdf_query.estimate_location_distance(
        sdf, np.array([[-1.0, 0.5, 0.5], [0.5, 0.5, 0.5]]))
    assert not bool(q.valid[0])
    assert bool(q.valid[1])
    assert np.isnan(np.asarray(q.value)[0])


def test_coarse_gradient_interior_and_edges():
    sdf = make_planar_sdf()
    # Interior cell: gradient is (0, 0, 1).
    g = sdf_query.get_index_coarse_gradient(sdf, np.array([4, 4, 4]))
    assert bool(g.valid)
    np.testing.assert_allclose(np.asarray(g.gradient), [0, 0, 1], atol=1e-5)
    # Edge cell without edge gradients -> invalid.
    g2 = sdf_query.get_index_coarse_gradient(sdf, np.array([0, 4, 4]))
    assert not bool(g2.valid)
    # With edge gradients -> one-sided difference, still (0, 0, 1).
    g3 = sdf_query.get_index_coarse_gradient(sdf, np.array([0, 4, 4]),
                                             enable_edge_gradients=True)
    assert bool(g3.valid)
    np.testing.assert_allclose(np.asarray(g3.gradient), [0, 0, 1], atol=1e-5)


def test_coarse_gradient_rotated_frame():
    # 90-degree rotation about x: grid +z maps to world +y.
    rot = transforms.isometry_from_axis_angle((1.0, 0.0, 0.0), np.pi / 2)
    sdf0 = make_planar_sdf()
    sdf = sdf0.replace(origin_transform=rot)
    g = sdf_query.get_index_coarse_gradient(sdf, np.array([4, 4, 4]))
    np.testing.assert_allclose(np.asarray(g.gradient), [0, -1, 0], atol=1e-5)


def test_fine_gradient_matches_finite_difference_of_estimate():
    sdf = make_planar_sdf()
    p = np.array([1.8, 2.2, 2.6])
    g = sdf_query.get_location_fine_gradient(sdf, p, 0.05)
    assert bool(g.valid)

    # Independent finite difference of the estimate itself.
    eps = 0.05
    fd = []
    for axis in range(3):
        pp, pm = p.copy(), p.copy()
        pp[axis] += eps
        pm[axis] -= eps
        vp = float(sdf_query.estimate_location_distance(sdf, pp).value)
        vm = float(sdf_query.estimate_location_distance(sdf, pm).value)
        fd.append((vp - vm) / (2 * eps))
    np.testing.assert_allclose(np.asarray(g.gradient), fd, atol=1e-4)


def test_jax_grad_through_estimate_matches_finite_difference():
    """Pixel/pose gradients flow through the estimate (north-star check)."""
    sdf = make_planar_sdf()

    def f(p):
        return sdf_query.estimate_location_distance(sdf, p).value

    p = jnp.array([1.9, 2.3, 2.7])
    autodiff = np.asarray(jax.grad(f)(p))
    eps = 1e-3
    fd = []
    for axis in range(3):
        pp = p.at[axis].add(eps)
        pm = p.at[axis].add(-eps)
        fd.append((float(f(pp)) - float(f(pm))) / (2 * eps))
    np.testing.assert_allclose(autodiff, fd, atol=1e-3)

    # Gradient wrt voxel values is nonzero and sums to 1 (interpolation).
    def g(distances):
        sdf2 = sdf.replace(distances=distances)
        return sdf_query.estimate_location_distance(sdf2, p).value

    dvox = np.asarray(jax.grad(g)(sdf.distances))
    assert abs(dvox.sum() - 1.0) < 1e-5
    assert (dvox != 0).sum() <= 8


def test_project_out_of_collision():
    sdf = make_planar_sdf()
    # Points inside the floor project up and out.
    pts = np.array([[1.1, 1.2, 0.4], [2.0, 2.0, 0.7], [3.0, 3.0, 2.5]])
    result = sdf_query.project_out_of_collision(sdf, pts)
    assert np.all(np.asarray(result.valid))
    final_d = sdf_query.estimate_location_distance(sdf, result.position)
    vals = np.asarray(final_d.value)
    assert np.all(vals > 0.0)
    # The already-free point should not move.
    np.testing.assert_allclose(np.asarray(result.position)[2], pts[2],
                               atol=1e-6)


def test_project_to_minimum_distance():
    sdf = make_planar_sdf()
    p = np.array([2.0, 2.0, 1.2])
    result = sdf_query.project_out_of_collision_to_minimum_distance(
        sdf, p, minimum_distance=0.6)
    assert bool(result.valid)
    d = float(sdf_query.estimate_location_distance(sdf, result.position).value)
    assert d > 0.6


def test_local_extrema_map_planar():
    sdf = make_planar_sdf()
    extrema = np.asarray(sdf_query.compute_local_extrema_map(sdf))
    assert extrema.shape == sdf.spec.counts + (3,)
    # Cells above the floor walk up in +z until they step off the grid
    # (gradient +z everywhere above the floor) -> +inf marker.
    assert np.all(np.isinf(extrema[:, :, 5]))
    # The extrema map is finite or +inf, never NaN or -inf.
    finite_or_posinf = np.isfinite(extrema) | (extrema == np.inf)
    assert np.all(finite_or_posinf)


def test_local_extrema_map_double_box():
    # Two separated boxes: free-space cells near each box should flow to
    # distinct extrema basins.
    spec = GridSpec.from_voxel_counts(1.0, (12, 4, 4))
    filled = np.zeros(spec.counts, dtype=bool)
    filled[1:3, 1:3, 1:3] = True
    filled[9:11, 1:3, 1:3] = True
    sdf = edt.extract_signed_distance_field(filled, spec, None)
    extrema = np.asarray(sdf_query.compute_local_extrema_map(sdf))
    # Inside-box cells (negative distance) walk toward the box center
    # (interior local minimum of |distance|... i.e. most-negative cell).
    # Their extrema should be finite and within each box's neighborhood.
    left = extrema[1:3, 1:3, 1:3]
    right = extrema[9:11, 1:3, 1:3]
    assert np.all(np.isfinite(left))
    assert np.all(np.isfinite(right))
    assert np.all(left[..., 0] < 6.0)
    assert np.all(right[..., 0] > 6.0)
