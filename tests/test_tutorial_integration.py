"""End-to-end tutorial-flow integration test.

Compact equivalent of example/tutorial.cpp:22-278 / examples/tutorial.py,
run as a test so interface drift between the core map API, map-level ops,
SDF queries, viz export, and serialization is caught by CI rather than
only by running the example by hand. Asserts the reference tutorial's
known values on a scaled-down grid."""

import numpy as np
import jax.numpy as jnp

import voxelized_geometry_tools_tpu as vgt
from voxelized_geometry_tools_tpu.core import serialization
from voxelized_geometry_tools_tpu.io import viz
from voxelized_geometry_tools_tpu.ops import map_ops, sdf_query


def test_tutorial_flow():
    resolution = 0.5
    spec = vgt.GridSpec.from_grid_sizes(resolution, (5.0, 5.0, 5.0))
    origin = np.eye(4, dtype=np.float32)
    origin[:3, 3] = (-2.5, -2.5, -2.5)
    omap = vgt.OccupancyComponentMap.create(spec, origin, "tutorial_frame")

    # Bottom-corner obstacle (tutorial.cpp:92-108).
    occ = np.zeros(spec.counts, np.float32)
    nx, ny, nz = spec.counts
    occ[: nx // 2, : ny // 2, : nz // 2] = 1.0
    omap = omap.set_occupancy(jnp.asarray(occ))

    # Index/location queries agree with construction (tutorial.cpp:112-144).
    assert float(omap.occupancy[1, 1, 1]) == 1.0
    idx = np.asarray(omap.location_to_grid_index(jnp.asarray([1.0, 1.0, 1.0])))
    assert float(omap.occupancy[tuple(idx)]) == 0.0

    # Connected components: obstacle + free space = 2 (tutorial.cpp:146-154).
    omap = map_ops.update_connected_components(omap)
    assert int(omap.number_of_components) == 2
    assert omap.components_valid

    # Display exports produce non-empty markers with the map's pose.
    occ_marker = viz.export_occupancy_for_display(omap)
    cc_marker = viz.export_connected_components_for_display(omap)
    assert occ_marker.num_cells == spec.num_total  # all cells colored
    assert cc_marker.num_cells == spec.num_total
    t, _q = occ_marker.pose_translation_quaternion()
    np.testing.assert_allclose(t, [-2.5, -2.5, -2.5])

    # SDF: negative inside the obstacle, positive outside, locked min/max
    # (tutorial.cpp:213-224).
    sdf = map_ops.extract_signed_distance_field(omap,
                                                unknown_is_filled=False)
    assert sdf.locked
    d_inside = float(sdf.get_index(jnp.asarray([1, 1, 1])))
    d_outside = float(sdf.get_index(jnp.asarray([nx - 1, ny - 1, nz - 1])))
    assert d_inside < 0 < d_outside
    mn, mx = sdf.get_minimum_maximum()
    assert float(mn) < 0 < float(mx)

    # Location distance + gradient queries (tutorial.cpp:226-260).
    q = sdf_query.estimate_location_distance(sdf, jnp.asarray([1.0, 1.0, 1.0]))
    assert bool(q.valid) and float(q.value) > 0
    g = sdf_query.get_location_coarse_gradient(sdf,
                                               jnp.asarray([1.0, 1.0, 1.0]))
    assert bool(g.valid)
    assert np.isfinite(np.asarray(g.gradient)).all()

    # Project a colliding point out of collision.
    inside_pt = jnp.asarray([-1.5, -1.5, -1.5])
    proj = sdf_query.project_out_of_collision(sdf, inside_pt)
    assert bool(proj.valid)
    d_after = sdf_query.estimate_location_distance(sdf, proj.position)
    assert float(d_after.value) >= 0.0

    # Serialization round trip preserves everything (the checkpoint story).
    blob = serialization.to_file_bytes(omap)
    back = serialization.from_file_bytes(blob)
    np.testing.assert_array_equal(np.asarray(back.occupancy),
                                  np.asarray(omap.occupancy))
    np.testing.assert_array_equal(np.asarray(back.component),
                                  np.asarray(omap.component))
    assert int(back.number_of_components) == 2
    assert back.frame == "tutorial_frame"
