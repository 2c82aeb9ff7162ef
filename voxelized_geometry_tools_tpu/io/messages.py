"""Message (de)serialization: the ROS message payloads without ROS.

The reference's six message types (/root/reference/msg/*.msg): the five
occupancy-map messages share ``header + uint8[] serialized_map + bool
is_compressed``; the SDF message carries ``serialized_sdf`` plus a
scalar-type tag (msg/SignedDistanceFieldMessage.msg:1-7). Here a "message"
is a plain dict carrying the same content and FIELD NAMES, built on the
binary serialization in :mod:`..core.serialization`, so round-tripping
through a transport layer (ROS bridge, RPC, file) preserves everything the
reference's ``GetMessageRepresentation`` / ``LoadFromMessageRepresentation``
do (ros_interface.cpp:204-230). Dynamic spatial-hashed maps are supported
too (``DynamicSpatialHashedOccupancyMapMessage`` wrap/unwrap,
ros_interface.hpp:597-600) — their kind-6 payload is routed through
:mod:`..core.serialization`."""

from __future__ import annotations

import struct
import zlib
from typing import Any, Dict

import jax.numpy as jnp
import numpy as np

from ..core import serialization
from ..core.maps import SignedDistanceField

# msg/SignedDistanceFieldMessage.msg:3-6 — the WIRE values a real bridged
# message carries (the reference loader throws on mismatch,
# ros_interface.hpp:452-465). Distinct from the internal payload dtype
# tags of core/serialization.
SCALAR_TYPE_FLOAT = 1
SCALAR_TYPE_DOUBLE = 2


def get_message_representation(m, compress: bool = True,
                               frame_id: str = "") -> Dict[str, Any]:
    """``GetMessageRepresentation``: wrap a map/SDF into a message dict
    (field names match the reference .msg definitions — the SDF payload
    rides ``serialized_sdf``, everything else ``serialized_map``)."""
    payload = serialization.serialize(m)
    if compress:
        payload = zlib.compress(payload)
    msg = {
        "header": {"frame_id": frame_id or m.frame},
        "is_compressed": bool(compress),
    }
    blob = np.frombuffer(payload, dtype=np.uint8)
    if isinstance(m, SignedDistanceField):
        msg["serialized_sdf"] = blob
        # dtype read — not np.asarray(m.distances), which would pull the
        # whole grid to host just to inspect its dtype.
        msg["scalar_type"] = (SCALAR_TYPE_DOUBLE
                              if m.distances.dtype == jnp.float64
                              else SCALAR_TYPE_FLOAT)
    else:
        msg["serialized_map"] = blob
    return msg


def load_from_message_representation(msg: Dict[str, Any]):
    """``LoadFromMessageRepresentation``: unwrap a message dict.

    Accepts the payload as bytes, list, or uint8 array under either
    ``serialized_sdf`` (SDF messages) or ``serialized_map``. When an SDF
    message carries a ``scalar_type`` tag, it is validated against the
    loaded field like the reference (ros_interface.hpp:452-465). Corrupt
    payloads raise ``ValueError`` (the package-wide loading contract)."""
    raw = msg.get("serialized_sdf")
    if raw is None:
        raw = msg["serialized_map"]
    # bytes must go through frombuffer: np.asarray(bytes, uint8) raises.
    payload = (bytes(raw) if isinstance(raw, (bytes, bytearray))
               else bytes(np.asarray(raw, dtype=np.uint8)))
    try:
        if msg.get("is_compressed", False):
            payload = zlib.decompress(payload)
        loaded = serialization.deserialize(payload)
    except (zlib.error, struct.error, IndexError) as e:
        raise ValueError(f"Corrupt message payload: {e}") from e
    tag = msg.get("scalar_type")
    if tag is not None and isinstance(loaded, SignedDistanceField):
        expect = (SCALAR_TYPE_DOUBLE
                  if loaded.distances.dtype == jnp.float64
                  else SCALAR_TYPE_FLOAT)
        if int(tag) != expect:
            raise ValueError(
                f"SignedDistanceFieldMessage scalar type {tag} does not "
                f"match the payload ({loaded.distances.dtype})")
    return loaded
