"""PointCloud2-layout adapter: bind raw sensor blobs to :class:`PointCloud`.

Equivalent of the reference's ``PointCloud2Wrapper``
(/root/reference/src/voxelized_geometry_tools/pointcloud_voxelization_ros_interface.cpp:30-80):
validates that the cloud carries contiguous little-endian float32 x/y/z
fields and extracts the points as an ``[N, 3]`` f32 array (a copy for the
common padded ``point_step > 12`` layouts; a view only for tightly packed
clouds), without requiring ROS message types — any dict-like object with
``fields`` (name/offset/datatype), ``point_step``, ``width``, ``height``
and ``data`` matching the sensor_msgs/PointCloud2 layout works (for an
actual ROS message object, convert with
``{k: getattr(msg, k) for k in (...)}`` or rclpy's message-to-dict
helpers).
"""

from __future__ import annotations

from typing import Mapping, Sequence

import numpy as np

from ..ops.voxelize import PointCloud

FLOAT32 = 7  # sensor_msgs::msg::PointField::FLOAT32


def points_from_pointcloud2(fields: Sequence[Mapping], point_step: int,
                            data: bytes, num_points: int,
                            row_step: int = 0, width: int = 0,
                            is_bigendian: bool = False) -> np.ndarray:
    """Validate the field layout and extract xyz points as ``[N, 3]`` f32
    (validation mirrors pointcloud_voxelization_ros_interface.cpp:44-78).

    ``row_step``/``width`` strip per-row padding of organized clouds;
    ``is_bigendian`` clouds are rejected (the parse assumes native little-
    endian — silently byte-swapped coordinates are the worst outcome)."""
    if is_bigendian:
        raise ValueError("big-endian PointCloud2 data is not supported")
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
    point_step = int(point_step)
    if x_off + 12 > point_step:
        raise ValueError(
            f"xyz fields at offset {x_off} overhang point_step "
            f"{point_step}")

    raw = np.frombuffer(data, dtype=np.uint8)
    row_step, width = int(row_step), int(width)
    if row_step and width and row_step != width * point_step:
        # Organized cloud with per-row padding (legal per the message
        # spec): strip the padding row by row before the point reshape.
        if width * point_step > row_step:
            raise ValueError(
                f"row_step {row_step} smaller than width {width} x "
                f"point_step {point_step}")
        if raw.size % row_step:
            raise ValueError(
                f"data size {raw.size} is not a multiple of row_step "
                f"{row_step}")
        raw = raw.reshape(-1, row_step)[:, : width * point_step].reshape(-1)
    if raw.size != num_points * point_step:
        raise ValueError(
            f"data size {raw.size} != num_points {num_points} x "
            f"point_step {point_step}")
    raw = raw.reshape(num_points, point_step)
    xyz = raw[:, x_off:x_off + 12]
    return np.ascontiguousarray(xyz).view(np.float32).reshape(num_points, 3)


def pointcloud_from_pointcloud2(msg: Mapping, origin_transform,
                                max_range: float = float("inf")
                                ) -> PointCloud:
    """Build a :class:`PointCloud` from a PointCloud2-shaped mapping with
    keys ``fields``, ``point_step``, ``width``, ``height``, ``data`` (and
    optionally ``row_step`` / ``is_bigendian``)."""
    if max_range <= 0.0:
        raise ValueError("max_range <= 0.0")
    num_points = int(msg["width"]) * int(msg["height"])
    points = points_from_pointcloud2(
        msg["fields"], int(msg["point_step"]), msg["data"], num_points,
        row_step=int(msg.get("row_step", 0)) if hasattr(msg, "get")
        else int(msg["row_step"]) if "row_step" in msg else 0,
        width=int(msg["width"]),
        is_bigendian=bool(msg.get("is_bigendian", False))
        if hasattr(msg, "get") else False)
    return PointCloud.create(points, origin_transform, max_range)
