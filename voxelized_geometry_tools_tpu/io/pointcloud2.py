"""PointCloud2-layout adapter: bind raw sensor blobs to :class:`PointCloud`.

Equivalent of the reference's ``PointCloud2Wrapper``
(/root/reference/src/voxelized_geometry_tools/pointcloud_voxelization_ros_interface.cpp:30-80):
validates that the cloud carries contiguous float32 x/y/z fields and exposes
the points as a zero-copy numpy view, without requiring ROS message types —
any object/dict with ``fields`` (name/offset/datatype), ``point_step``,
``width``, ``height`` and ``data`` matches the sensor_msgs/PointCloud2
layout.
"""

from __future__ import annotations

from typing import Mapping, Sequence

import numpy as np

from ..ops.voxelize import PointCloud

FLOAT32 = 7  # sensor_msgs::msg::PointField::FLOAT32


def points_from_pointcloud2(fields: Sequence[Mapping], point_step: int,
                            data: bytes, num_points: int) -> np.ndarray:
    """Validate the field layout and view the xyz points as ``[N, 3]`` f32
    (validation mirrors pointcloud_voxelization_ros_interface.cpp:44-78)."""
    field_types = {f["name"]: f["datatype"] for f in fields}
    field_offsets = {f["name"]: int(f["offset"]) for f in fields}
    for axis in ("x", "y", "z"):
        if axis not in field_types:
            raise ValueError(f"PointCloud missing {axis} field")
        if field_types[axis] != FLOAT32:
            raise ValueError(f"PointCloud {axis} field is not FLOAT32")
    x_off = field_offsets["x"]
    if (field_offsets["y"] - x_off != 4
            or field_offsets["z"] - field_offsets["y"] != 4):
        raise ValueError("PointCloud does not have sequential xyz fields")

    raw = np.frombuffer(data, dtype=np.uint8).reshape(num_points, point_step)
    xyz = raw[:, x_off:x_off + 12]
    return np.ascontiguousarray(xyz).view(np.float32).reshape(num_points, 3)


def pointcloud_from_pointcloud2(msg: Mapping, origin_transform,
                                max_range: float = float("inf")
                                ) -> PointCloud:
    """Build a :class:`PointCloud` from a PointCloud2-shaped mapping with
    keys ``fields``, ``point_step``, ``width``, ``height``, ``data``."""
    if max_range <= 0.0:
        raise ValueError("max_range <= 0.0")
    num_points = int(msg["width"]) * int(msg["height"])
    points = points_from_pointcloud2(
        msg["fields"], int(msg["point_step"]), msg["data"], num_points)
    return PointCloud.create(points, origin_transform, max_range)
