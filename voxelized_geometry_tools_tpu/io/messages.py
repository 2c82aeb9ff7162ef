"""Message (de)serialization: the ROS message payloads without ROS.

The reference's six message types (/root/reference/msg/*.msg) all share the
layout ``header + uint8[] serialized_map + bool is_compressed`` (the SDF adds
a scalar-type tag, msg/SignedDistanceFieldMessage.msg:1-7). Here a "message"
is a plain dict carrying the same content, built on the binary serialization
in :mod:`..core.serialization`, so round-tripping through a transport layer
(ROS bridge, RPC, file) preserves everything the reference's
``GetMessageRepresentation`` / ``LoadFromMessageRepresentation`` do
(ros_interface.cpp:204-230). Dynamic spatial-hashed maps are supported too
(``DynamicSpatialHashedOccupancyMapMessage`` wrap/unwrap,
ros_interface.hpp:597-600) — their kind-6 payload is routed through
:mod:`..core.serialization`."""

from __future__ import annotations

import zlib
from typing import Any, Dict

import numpy as np

from ..core import serialization
from ..core.maps import SignedDistanceField

SCALAR_TYPE_FLOAT = 4   # msg/SignedDistanceFieldMessage.msg scalar tags
SCALAR_TYPE_DOUBLE = 8


def get_message_representation(m, compress: bool = True,
                               frame_id: str = "") -> Dict[str, Any]:
    """``GetMessageRepresentation``: wrap a map/SDF into a message dict."""
    payload = serialization.serialize(m)
    if compress:
        payload = zlib.compress(payload)
    msg = {
        "header": {"frame_id": frame_id or m.frame},
        "serialized_map": np.frombuffer(payload, dtype=np.uint8),
        "is_compressed": bool(compress),
    }
    if isinstance(m, SignedDistanceField):
        msg["scalar_type"] = (SCALAR_TYPE_DOUBLE
                              if np.asarray(m.distances).dtype == np.float64
                              else SCALAR_TYPE_FLOAT)
    return msg


def load_from_message_representation(msg: Dict[str, Any]):
    """``LoadFromMessageRepresentation``: unwrap a message dict."""
    payload = bytes(np.asarray(msg["serialized_map"], dtype=np.uint8))
    if msg.get("is_compressed", False):
        payload = zlib.decompress(payload)
    return serialization.deserialize(payload)
