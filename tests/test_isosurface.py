"""Isosurface extraction (ops/isosurface.py).

Oracles: analytic sphere/plane SDFs (vertex-to-surface residuals must be
sub-voxel), gradient-aligned winding, overflow accounting, and a
mesh -> rasterizer round trip against ops/mesh.py (the two modules are
exact inverses up to the rasterizer's conservative shell).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from voxelized_geometry_tools_tpu import GridSpec
from voxelized_geometry_tools_tpu.core.maps import SignedDistanceField
from voxelized_geometry_tools_tpu.ops import isosurface, mesh


def _sphere_sdf(n=24, res=0.1, radius_vox=7.0):
    spec = GridSpec.from_voxel_counts(res, (n, n, n))
    ax = jnp.arange(n, dtype=jnp.float32) - (n - 1) / 2.0
    r = jnp.sqrt(ax[:, None, None] ** 2 + ax[None, :, None] ** 2
                 + ax[None, None, :] ** 2)
    d = (r - radius_vox) * res
    return SignedDistanceField.create(spec, d, locked=True), radius_vox * res


def _tri_residual_to_sphere(m, center, radius):
    v = np.asarray(m.vertices)[np.asarray(m.valid)]
    rr = np.linalg.norm(v.reshape(-1, 3) - center, axis=-1)
    return np.abs(rr - radius)


def test_sphere_vertices_on_surface():
    sdf, radius = _sphere_sdf()
    m = jax.jit(lambda s: isosurface.extract_isosurface(
        s, max_triangles=8192, frame="grid"))(sdf)
    n_valid = int(np.asarray(m.valid).sum())
    assert n_valid > 100
    assert int(m.num_triangles) == n_valid
    assert not bool(m.overflowed)
    # Grid-frame sphere center: cell centers span (idx + 0.5) * res and the
    # mask is centered at (n-1)/2 -> center = ((n-1)/2 + 0.5) * res.
    c = (24 - 1) / 2.0 * 0.1 + 0.05
    resid = _tri_residual_to_sphere(m, np.array([c, c, c]), radius)
    # Linear interpolation of an exact metric SDF puts every crossing
    # within a small fraction of a voxel of the true surface.
    assert float(resid.max()) < 0.35 * 0.1
    assert float(resid.mean()) < 0.1 * 0.1


def test_level_offset_shifts_radius():
    sdf, radius = _sphere_sdf()
    lvl = 2 * 0.1
    m = isosurface.extract_isosurface(sdf, level=lvl, max_triangles=8192,
                                      frame="grid")
    c = (24 - 1) / 2.0 * 0.1 + 0.05
    resid = _tri_residual_to_sphere(m, np.array([c, c, c]), radius + lvl)
    assert float(resid.max()) < 0.35 * 0.1


def test_winding_follows_gradient_plane():
    """A z-plane field (d = z - z0) must yield triangles whose normals all
    point along +z after the gradient winding fix."""
    n, res = 12, 0.5
    spec = GridSpec.from_voxel_counts(res, (n, n, n))
    z = (jnp.arange(n, dtype=jnp.float32) + 0.5) * res
    d = jnp.broadcast_to(z[None, None, :] - 3.1 * res, (n, n, n))
    sdf = SignedDistanceField.create(spec, d)
    m = isosurface.extract_isosurface(sdf, max_triangles=4096, frame="grid")
    v = np.asarray(m.vertices)[np.asarray(m.valid)]
    assert len(v) > 0
    nrm = np.cross(v[:, 1] - v[:, 0], v[:, 2] - v[:, 0])
    area = np.linalg.norm(nrm, axis=-1)
    keep = area > 1e-12  # marching tets emits some degenerate slivers
    assert keep.sum() > 0
    assert (nrm[keep, 2] > 0.0).all()
    np.testing.assert_allclose(v[..., 2], 3.1 * res, atol=1e-5)


def test_overflow_reports_true_count():
    sdf, _ = _sphere_sdf()
    full = isosurface.extract_isosurface(sdf, max_triangles=8192)
    true_count = int(full.num_triangles)
    small = isosurface.extract_isosurface(sdf, max_triangles=64)
    assert bool(small.overflowed)
    assert int(small.num_triangles) == true_count
    assert int(np.asarray(small.valid).sum()) == 64


def test_world_frame_applies_origin_transform():
    sdf, _ = _sphere_sdf(n=16, radius_vox=4.0)
    shift = np.eye(4, dtype=np.float32)
    shift[:3, 3] = (1.0, -2.0, 3.0)
    moved = sdf.replace(origin_transform=jnp.asarray(shift))
    mg = isosurface.extract_isosurface(moved, max_triangles=4096,
                                       frame="grid")
    mw = isosurface.extract_isosurface(moved, max_triangles=4096,
                                       frame="world")
    vg = np.asarray(mg.vertices)[np.asarray(mg.valid)]
    vw = np.asarray(mw.vertices)[np.asarray(mw.valid)]
    np.testing.assert_allclose(vw, vg + shift[:3, 3], atol=1e-5)


def test_roundtrip_mesh_rasterizes_back_onto_surface():
    """extract_isosurface o rasterize ~= the SDF's zero-crossing shell:
    every voxel whose center is within res/4 of the surface must be marked
    filled by rasterizing the extracted mesh (the rasterizer fills cells
    within sqrt(3)/2*res of any triangle), and no marked voxel may be
    farther than ~1 voxel from the surface."""
    sdf, radius = _sphere_sdf(n=20, radius_vox=6.0)
    # Identity origin transform: grid frame == world frame.
    m = isosurface.extract_isosurface(sdf, max_triangles=8192, frame="world")
    v = np.asarray(m.vertices)[np.asarray(m.valid)]
    nrm = np.linalg.norm(np.cross(v[:, 1] - v[:, 0], v[:, 2] - v[:, 0]),
                         axis=-1)
    v = v[nrm > 1e-12]  # the rasterizer's plane normal needs non-degenerate
    from voxelized_geometry_tools_tpu.core.maps import OccupancyMap
    omap = OccupancyMap.create(sdf.spec, sdf.origin_transform, "bench")
    grid = mesh.rasterize_mesh(
        omap, v.reshape(-1, 3), np.arange(v.size // 3).reshape(-1, 3))
    occ = np.asarray(grid.occupancy) > 0.5
    d = np.asarray(sdf.distances)
    shell = np.abs(d) < 0.25 * 0.1
    assert shell.sum() > 100  # the oracle mask must be non-vacuous
    assert occ[shell].all()
    assert (np.abs(d[occ]) < 1.1 * 0.1).all()


def test_empty_field_extracts_nothing():
    n, res = 8, 0.1
    spec = GridSpec.from_voxel_counts(res, (n, n, n))
    sdf = SignedDistanceField.create(spec, jnp.full((n, n, n), 5.0))
    m = isosurface.extract_isosurface(sdf, max_triangles=128)
    assert int(m.num_triangles) == 0
    assert not bool(np.asarray(m.valid).any())


def test_rejects_bad_args():
    sdf, _ = _sphere_sdf(n=16)
    with pytest.raises(ValueError):
        isosurface.extract_isosurface(sdf, frame="nope")
    spec1 = GridSpec.from_voxel_counts(0.1, (1, 4, 4))
    thin = SignedDistanceField.create(spec1, jnp.zeros((1, 4, 4)))
    with pytest.raises(ValueError):
        isosurface.extract_isosurface(thin)


def test_export_isosurface_marker():
    from voxelized_geometry_tools_tpu.io import viz
    sdf, _ = _sphere_sdf(n=16, radius_vox=4.0)
    m = isosurface.extract_isosurface(sdf, max_triangles=4096)
    mk = viz.export_isosurface_for_display(m, "bench")
    assert mk.num_triangles > 50
    assert mk.points.shape == (3 * mk.num_triangles, 3)
    # Triples must reproduce the valid, non-degenerate triangles in order.
    v = np.asarray(m.vertices)[np.asarray(m.valid)]
    area = np.linalg.norm(np.cross(v[:, 1] - v[:, 0], v[:, 2] - v[:, 0]),
                          axis=-1)
    np.testing.assert_allclose(
        mk.points.reshape(-1, 3, 3), v[area > 1e-12], atol=1e-7)


def test_weld_vertices_shares_edges():
    sdf, radius = _sphere_sdf()
    m = isosurface.extract_isosurface(sdf, max_triangles=8192, frame="grid")
    verts, faces = isosurface.weld_vertices(m)
    assert len(faces) > 0
    # Welding must shrink the vertex count well below 3 * faces (shared
    # edges), and faces must index valid vertices.
    assert len(verts) < 0.6 * 3 * len(faces)
    assert faces.min() >= 0 and faces.max() < len(verts)
    # A closed surface built by marching tets: every edge is shared by
    # exactly 2 faces (manifold, watertight).
    e = np.concatenate([faces[:, (0, 1)], faces[:, (1, 2)],
                        faces[:, (2, 0)]])
    e.sort(axis=1)
    _, cnt = np.unique(e, axis=0, return_counts=True)
    assert (cnt == 2).all()
    # Euler characteristic of a sphere: V - E + F = 2.
    n_edges = len(np.unique(e, axis=0))
    assert len(verts) - n_edges + len(faces) == 2


def test_save_obj_roundtrip(tmp_path):
    sdf, _ = _sphere_sdf(n=16, radius_vox=4.0)
    m = isosurface.extract_isosurface(sdf, max_triangles=4096, frame="grid")
    path = tmp_path / "sphere.obj"
    n_faces = isosurface.save_obj(path, m)
    lines = path.read_text().splitlines()
    v_lines = [l for l in lines if l.startswith("v ")]
    f_lines = [l for l in lines if l.startswith("f ")]
    assert len(f_lines) == n_faces > 0
    verts, faces = isosurface.weld_vertices(m)
    assert len(v_lines) == len(verts)
    p0 = np.asarray([float(x) for x in v_lines[0].split()[1:]])
    np.testing.assert_allclose(p0, verts[0], atol=1e-6)


def test_extract_object_meshes_two_boxes():
    from voxelized_geometry_tools_tpu import TaggedObjectOccupancyMap
    n, res = 16, 0.1
    spec = GridSpec.from_voxel_counts(res, (n, n, n))
    omap = TaggedObjectOccupancyMap.create(spec)
    occ = np.zeros((n, n, n), np.float32)
    oid = np.zeros((n, n, n), np.uint32)
    occ[2:6, 2:6, 2:6] = 1.0
    oid[2:6, 2:6, 2:6] = 3
    occ[9:14, 9:14, 9:14] = 1.0
    oid[9:14, 9:14, 9:14] = 7
    omap = omap.replace(occupancy=jnp.asarray(occ),
                        object_id=jnp.asarray(oid))
    meshes = isosurface.extract_object_meshes(omap, max_triangles=4096,
                                              frame="grid")
    assert sorted(meshes) == [3, 7]
    for oid_, lo, hi in [(3, 2, 6), (7, 9, 14)]:
        m = meshes[oid_]
        v = np.asarray(m.vertices)[np.asarray(m.valid)].reshape(-1, 3)
        assert len(v) > 0 and not bool(m.overflowed)
        # Each object's mesh must enclose only ITS box (within a voxel).
        assert (v > (lo - 1.0) * res).all() and (v < (hi + 1.0) * res).all()


def test_mesh_statistics_sphere():
    sdf, radius = _sphere_sdf()
    m = isosurface.extract_isosurface(sdf, max_triangles=8192, frame="grid")
    area, volume = isosurface.mesh_statistics(m)
    # Discrete level-set mesh of an analytic sphere: area and volume land
    # within a few percent of the closed forms at 14 voxels of diameter.
    assert abs(area - 4 * np.pi * radius ** 2) < 0.05 * 4 * np.pi * radius ** 2
    assert abs(volume - 4 / 3 * np.pi * radius ** 3) \
        < 0.05 * 4 / 3 * np.pi * radius ** 3
    # Level offset grows both monotonically.
    m2 = isosurface.extract_isosurface(sdf, level=0.15, max_triangles=8192,
                                       frame="grid")
    a2, v2 = isosurface.mesh_statistics(m2)
    assert a2 > area and v2 > volume
    # Empty mesh -> zeros.
    empty = isosurface.extract_isosurface(
        sdf.replace(distances=sdf.distances + 100.0), max_triangles=64)
    assert isosurface.mesh_statistics(empty) == (0.0, 0.0)


def test_random_fields_manifold_with_boundary_openings():
    """Random smooth fields exercise every tet sign case; the extracted
    mesh must be manifold everywhere (no edge in 3+ faces) and only edges
    on the lattice boundary box may be open (level sets clipped by the
    grid are not closed)."""
    rng = np.random.default_rng(5)
    n, res = 14, 0.1
    spec = GridSpec.from_voxel_counts(res, (n, n, n))
    for trial in range(3):
        raw = rng.normal(size=(n, n, n))
        # Smooth with a small box filter so the surface is coherent.
        f = raw.copy()
        for ax in range(3):
            f = (np.roll(f, 1, ax) + f + np.roll(f, -1, ax)) / 3.0
        sdf = SignedDistanceField.create(spec, jnp.asarray(f * res * 3))
        m = isosurface.extract_isosurface(sdf, max_triangles=32768,
                                          frame="grid")
        assert not bool(m.overflowed)
        verts, faces = isosurface.weld_vertices(m)
        if len(faces) == 0:
            continue
        e = np.concatenate([faces[:, (0, 1)], faces[:, (1, 2)],
                            faces[:, (2, 0)]])
        e.sort(axis=1)
        uniq, cnt = np.unique(e, axis=0, return_counts=True)
        assert cnt.max() <= 2, "non-manifold edge"
        open_edges = uniq[cnt == 1]
        if len(open_edges):
            lo, hi = 0.5 * res, (n - 0.5) * res
            pts = verts[open_edges]  # [E, 2, 3]
            on_boundary = (np.isclose(pts, lo, atol=1e-6)
                           | np.isclose(pts, hi, atol=1e-6)).any(axis=2)
            assert on_boundary.all(axis=1).all(), \
                "open edge away from the grid boundary"


def test_extraction_is_differentiable_in_field_values():
    """Crossing positions are smooth in the corner values (t = va/(va-vb)),
    so vertex-based losses differentiate back to the voxel field: the
    gradient of the mesh's mean radius under a uniform field shift must
    match finite differences (|grad d| ~= 1 -> the level set moves ~1:1)."""
    n, res = 12, 0.1
    spec = GridSpec.from_voxel_counts(res, (n, n, n))
    ax = jnp.arange(n, dtype=jnp.float32) - (n - 1) / 2.0
    r = jnp.sqrt(ax[:, None, None] ** 2 + ax[None, :, None] ** 2
                 + ax[None, None, :] ** 2)
    d0 = (r - 3.5) * res
    sdf = SignedDistanceField.create(spec, d0, locked=True)
    c = (n - 1) / 2.0 * res + 0.05

    def mean_radius(dvals):
        m = isosurface.extract_isosurface(sdf.replace(distances=dvals),
                                          max_triangles=2048, frame="grid")
        rr = jnp.linalg.norm(m.vertices.reshape(-1, 3) - c, axis=-1)
        w = jnp.repeat(m.valid, 3).astype(jnp.float32)
        return jnp.sum(rr * w) / jnp.sum(w)

    g = jax.grad(mean_radius)(d0)
    assert bool(jnp.isfinite(g).all())
    assert int((g != 0).sum()) > 100  # support on the crossing cells
    eps = 1e-3 * res
    fd = float((mean_radius(d0 + eps) - mean_radius(d0 - eps)) / (2 * eps))
    ad = float(g.sum())  # directional derivative along a uniform shift
    np.testing.assert_allclose(ad, fd, rtol=1e-3)
    # Inflating the field pulls the zero crossing inward ~1:1.
    np.testing.assert_allclose(ad, -1.0, atol=0.15)


def test_nonfinite_cells_emit_nothing():
    """Tets touching +-inf/NaN cells (oob padding of partially observed
    fields) must emit NO triangles — neither NaN vertices nor fabricated
    walls — and the rest of the surface must be unaffected."""
    n, res = 12, 0.1
    spec = GridSpec.from_voxel_counts(res, (n, n, n))
    ax = jnp.arange(n, dtype=jnp.float32) - (n - 1) / 2.0
    r = jnp.sqrt(ax[:, None, None] ** 2 + ax[None, :, None] ** 2
                 + ax[None, None, :] ** 2)
    d = (r - 3.5) * res
    # Pad one boundary plane with +inf and poison one far cell with NaN.
    d = d.at[0].set(jnp.inf).at[-1, -1, -1].set(jnp.nan)
    sdf = SignedDistanceField.create(spec, d, locked=True)
    m = isosurface.extract_isosurface(sdf, max_triangles=4096, frame="grid")
    v = np.asarray(m.vertices)[np.asarray(m.valid)]
    assert len(v) > 0
    assert np.isfinite(v).all()
    # The sphere's surface does not reach the padded plane; counts match
    # the unpadded extraction exactly.
    clean = isosurface.extract_isosurface(
        sdf.replace(distances=jnp.asarray((np.asarray(r) - 3.5) * res)),
        max_triangles=4096, frame="grid")
    assert int(m.num_triangles) == int(clean.num_triangles)
    # A crossing pair straddling an inf cell emits nothing (no wall).
    d2 = jnp.full((4, 4, 4), jnp.inf).at[2, 1, 1].set(-1.0)
    sdf2 = SignedDistanceField.create(
        GridSpec.from_voxel_counts(res, (4, 4, 4)), d2)
    m2 = isosurface.extract_isosurface(sdf2, max_triangles=64)
    assert int(m2.num_triangles) == 0
    assert np.isfinite(np.asarray(m2.vertices)).all()  # no NaN buffer rows


def test_weld_and_stats_reject_overflowed():
    sdf, _ = _sphere_sdf()
    small = isosurface.extract_isosurface(sdf, max_triangles=64)
    assert bool(small.overflowed)
    with pytest.raises(ValueError, match="overflowed"):
        isosurface.weld_vertices(small)
    with pytest.raises(ValueError, match="overflowed"):
        isosurface.mesh_statistics(small)
    with pytest.raises(ValueError, match="overflowed"):
        isosurface.save_obj("/tmp/should_not_exist.obj", small)


def test_export_marker_overflow_and_grid_pose():
    from voxelized_geometry_tools_tpu.io import viz
    sdf, _ = _sphere_sdf(n=16, radius_vox=4.0)
    small = isosurface.extract_isosurface(sdf, max_triangles=16)
    with pytest.raises(ValueError, match="overflowed"):
        viz.export_isosurface_for_display(small, "bench")
    # Grid-frame meshes carry the origin transform via the marker pose.
    shift = np.eye(4, dtype=np.float32)
    shift[:3, 3] = (1.0, -2.0, 3.0)
    moved = sdf.replace(origin_transform=jnp.asarray(shift))
    mg = isosurface.extract_isosurface(moved, max_triangles=4096,
                                       frame="grid")
    mk = viz.export_isosurface_for_display(mg, "bench",
                                           pose=moved.origin_transform)
    np.testing.assert_allclose(mk.pose, np.asarray(shift), atol=1e-7)
    t, q = mk.pose_translation_quaternion()
    np.testing.assert_allclose(t, (1.0, -2.0, 3.0), atol=1e-6)
