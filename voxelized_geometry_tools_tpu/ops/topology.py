"""Topology computation: connected components, surfaces, holes and voids.

TPU-native redesign of
/root/reference/include/voxelized_geometry_tools/topology_computation.hpp.

The reference marks components with a serial BFS over a closure-parameterized
connectivity relation (hpp:60-196). BFS is pointer-chasing and hostile to
vector hardware, so components here are computed by **min-label propagation
with pointer jumping**: every in-domain cell starts labeled with its own flat
index, labels flow across connected 6-neighbor faces, and a gather-based
path-compression step doubles the propagation distance per round. The result
is *identical* to the reference's BFS output, including component numbering:
the reference assigns ids in x-major scan order of first discovery
(hpp:167-195), which equals the rank of each component's minimum flat index —
exactly what min-label propagation converges to.

Connectivity is expressed as three face-adjacency boolean arrays (+x, +y, +z)
rather than a per-pair closure: any symmetric ``are_connected_fn`` from the
reference maps onto them (occupancy-class equality, object-id equality,
extrema-distance thresholds, ...).

Holes/voids use the Chen & Rong vertex-edge counting formula
``#holes = 1 + (M5 + 2*M6 - M3)/8`` (hpp:331-643). NOTE: the reference's
``ComputeHolesAndVoidsInSurface`` reads the ``z+1`` neighbor with a ``z-1``
offset (topology_computation.hpp:388-391, an upstream copy-paste slip); this
implementation uses the intended ``z+1`` neighbor.
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

Array = jnp.ndarray

# COMPONENT_TYPES bitmask (occupancy_component_map.hpp:244-246).
FILLED_COMPONENTS = 0x01
EMPTY_COMPONENTS = 0x02
UNKNOWN_COMPONENTS = 0x04


class NumberOfHolesAndVoids(NamedTuple):
    """topology_computation.hpp:23-48."""
    num_holes: int
    num_voids: int


def occupancy_class(occupancy: Array) -> Array:
    """Ternary occupancy class: 0=free (<0.5), 1=unknown (==0.5),
    2=filled (>0.5) — the equality classes used by every reference
    ``are_connected_fn`` (e.g. occupancy_component_map.cpp:457-481)."""
    return jnp.where(occupancy > 0.5, 2,
                     jnp.where(occupancy < 0.5, 0, 1)).astype(jnp.int32)


def face_adjacency_from_key(key: Array) -> Tuple[Array, Array, Array]:
    """Face connectivity for an equality-key relation: neighbors connect iff
    their keys match. Returns (+x, +y, +z) boolean arrays of shapes
    ``[nx-1,ny,nz] / [nx,ny-1,nz] / [nx,ny,nz-1]``."""
    cx = key[1:, :, :] == key[:-1, :, :]
    cy = key[:, 1:, :] == key[:, :-1, :]
    cz = key[:, :, 1:] == key[:, :, :-1]
    return cx, cy, cz


@jax.jit
def label_components(conn_x: Array, conn_y: Array, conn_z: Array,
                     domain: Array) -> Tuple[Array, Array]:
    """Min-label propagation connected components.

    Args:
      conn_x/y/z: face-adjacency booleans (see :func:`face_adjacency_from_key`).
      domain: bool ``[nx,ny,nz]``; cells outside the domain get component 0
        (matching the spatial-segments "ignored cell" semantics,
        tagged_object_occupancy_component_map.cpp:821-852).

    Returns:
      (components u32 ``[nx,ny,nz]`` numbered 1..K in reference scan order,
       K as a u32 scalar).
    """
    shape = domain.shape
    n = shape[0] * shape[1] * shape[2]
    flat_ids = jnp.arange(n, dtype=jnp.int32).reshape(shape)
    big = jnp.int32(n)  # out-of-domain sentinel (larger than any label)
    label = jnp.where(domain, flat_ids, big)

    # Only propagate across faces where both cells are in the domain.
    cx = conn_x & domain[1:, :, :] & domain[:-1, :, :]
    cy = conn_y & domain[:, 1:, :] & domain[:, :-1, :]
    cz = conn_z & domain[:, :, 1:] & domain[:, :, :-1]

    def neighbor_min(lbl):
        out = lbl
        out = out.at[:-1].min(jnp.where(cx, lbl[1:], big))
        out = out.at[1:].min(jnp.where(cx, lbl[:-1], big))
        out = out.at[:, :-1].min(jnp.where(cy, lbl[:, 1:], big))
        out = out.at[:, 1:].min(jnp.where(cy, lbl[:, :-1], big))
        out = out.at[:, :, :-1].min(jnp.where(cz, lbl[:, :, 1:], big))
        out = out.at[:, :, 1:].min(jnp.where(cz, lbl[:, :, :-1], big))
        return jnp.where(domain, out, big)

    def compress(lbl):
        # Pointer jumping: label <- label[label], doubling chain hops.
        flat = lbl.reshape(-1)
        flat_ext = jnp.concatenate([flat, jnp.array([big], jnp.int32)])
        jumped = flat_ext[jnp.minimum(flat, n)]
        return jnp.where(domain, jumped.reshape(shape), big)

    def cond(state):
        _, changed = state
        return changed

    def body(state):
        lbl, _ = state
        new = neighbor_min(lbl)
        new = compress(compress(new))
        return new, jnp.any(new != lbl)

    label, _ = lax.while_loop(cond, body, (label, jnp.bool_(True)))

    # Renumber roots 1..K in scan order (= reference numbering).
    flat_label = label.reshape(-1)
    is_root = (flat_label == jnp.arange(n, dtype=jnp.int32)) & domain.reshape(-1)
    rank = jnp.cumsum(is_root.astype(jnp.uint32))  # 1-based at roots
    comp_of_root = jnp.where(is_root, rank, 0)
    safe = jnp.minimum(flat_label, n - 1)
    components = jnp.where(domain.reshape(-1), comp_of_root[safe],
                           0).astype(jnp.uint32)
    num = jnp.where(is_root.any(), rank[-1], 0).astype(jnp.uint32)
    return components.reshape(shape), num


def connected_components_by_occupancy(occupancy: Array,
                                      object_id: Optional[Array] = None,
                                      connect_across_objects: bool = False
                                      ) -> Tuple[Array, Array]:
    """Components of equal occupancy class (and, unless
    ``connect_across_objects``, equal object id) — the relation used by
    ``OccupancyComponentMap::UpdateConnectedComponents``
    (occupancy_component_map.cpp:447-509) and the tagged variant
    (tagged_object_occupancy_component_map.cpp:689-773)."""
    key = occupancy_class(occupancy)
    cx, cy, cz = face_adjacency_from_key(key)
    if object_id is not None and not connect_across_objects:
        ox, oy, oz = face_adjacency_from_key(object_id)
        cx, cy, cz = cx & ox, cy & oy, cz & oz
    domain = jnp.ones(occupancy.shape, dtype=bool)
    return label_components(cx, cy, cz, domain)


# -- Surface predicates ------------------------------------------------------


def is_surface_index(occupancy: Array) -> Array:
    """26-neighbor occupancy surface test (occupancy_map.cpp:201-248),
    vectorized over the whole grid. Neighbors outside the grid are skipped
    (edge cells are surface only if an in-grid neighbor differs)."""
    occ = occupancy
    ours = occ

    def differs(ours_v, other_v):
        return ((ours_v < 0.5) & (other_v >= 0.5)
                | (ours_v > 0.5) & (other_v <= 0.5)
                | (ours_v == 0.5) & (other_v != 0.5))

    surface = jnp.zeros(occ.shape, dtype=bool)
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dz in (-1, 0, 1):
                if dx == 0 and dy == 0 and dz == 0:
                    continue
                shifted, valid = _shift_with_mask(occ, (dx, dy, dz))
                surface = surface | (valid & differs(ours, shifted))
    return surface


def _shift_with_mask(arr: Array, offset) -> Tuple[Array, Array]:
    """Shift ``arr`` so position p reads ``arr[p + offset]``; second return
    marks lanes whose source was inside the grid."""
    dx, dy, dz = offset
    shifted = arr
    valid = jnp.ones(arr.shape, dtype=bool)
    for axis, d in enumerate((dx, dy, dz)):
        if d == 0:
            continue
        shifted = jnp.roll(shifted, -d, axis=axis)
        idx = jnp.arange(arr.shape[axis]) + d
        ok = (idx >= 0) & (idx < arr.shape[axis])
        shape = [1, 1, 1]
        shape[axis] = arr.shape[axis]
        valid = valid & ok.reshape(shape)
    return shifted, valid


def is_connected_component_surface_index(components: Array) -> Array:
    """6-neighbor component surface test; grid-edge cells are automatically
    surface (occupancy_component_map.cpp:290-350)."""
    comp = components
    nx, ny, nz = comp.shape
    edge = jnp.zeros(comp.shape, dtype=bool)
    for axis, n in enumerate((nx, ny, nz)):
        idx = jnp.arange(n)
        on_edge = (idx == 0) | (idx == n - 1)
        shape = [1, 1, 1]
        shape[axis] = n
        edge = edge | on_edge.reshape(shape)

    surface = edge
    for offset in ((1, 0, 0), (-1, 0, 0), (0, 1, 0), (0, -1, 0),
                   (0, 0, 1), (0, 0, -1)):
        shifted, valid = _shift_with_mask(comp, offset)
        surface = surface | (valid & (shifted != comp))
    return surface


def component_surfaces_mask(occupancy: Array, components: Array,
                            component_types: int) -> Array:
    """Surface mask filtered by the COMPONENT_TYPES bitmask
    (``ExtractComponentSurfaces``, occupancy_component_map.cpp:511-571)."""
    cls = occupancy_class(occupancy)
    wanted = jnp.zeros(occupancy.shape, dtype=bool)
    if component_types & FILLED_COMPONENTS:
        wanted = wanted | (cls == 2)
    if component_types & EMPTY_COMPONENTS:
        wanted = wanted | (cls == 0)
    if component_types & UNKNOWN_COMPONENTS:
        wanted = wanted | (cls == 1)
    return wanted & is_connected_component_surface_index(components)


def extract_component_surfaces(occupancy: Array, components: Array,
                               component_types: int
                               ) -> Dict[int, np.ndarray]:
    """Host-facing API parity: map of component id -> ``[M, 3]`` surface
    voxel indices (the reference returns per-component index hash maps)."""
    mask = np.asarray(component_surfaces_mask(occupancy, components,
                                              component_types))
    comp = np.asarray(components)
    out: Dict[int, np.ndarray] = {}
    idx = np.argwhere(mask)
    for c in np.unique(comp[mask]):
        out[int(c)] = idx[comp[mask] == c]
    return out


# -- Holes and voids ---------------------------------------------------------


def _component_values_padded(components: Array) -> Array:
    """Components padded by one cell of -1 (the reference's OOB component,
    occupancy_component_map.cpp:482-494)."""
    return jnp.pad(components.astype(jnp.int32), 1, constant_values=-1)


@functools.partial(jax.jit, static_argnames=())
def _holes_voids_device(components: Array, surface: Array,
                        component: Array):
    """Device part of ``ComputeHolesAndVoidsInSurface`` (hpp:331-643) for one
    component id: surface-vertex extraction, M3/M5/M6 edge-exposure counts,
    and vertex-connectivity CC for the void count."""
    comp_pad = _component_values_padded(components)  # [-1 border]
    target = component.astype(jnp.int32)
    nx, ny, nz = components.shape

    # same[i,j,k] over the padded lattice: voxel (i-1,j-1,k-1) has the target
    # component.
    same = comp_pad == target

    # --- Surface vertices (hpp:374-489). Vertex lattice is (nx+1,ny+1,nz+1);
    # vertex v=(i,j,k) corresponds to voxel corner between voxels
    # (i-1..i, j-1..j, k-1..k). A vertex is generated by surface voxel s at
    # corner c if one of the three face-neighbors of s toward c differs.
    # Equivalent vectorized form: vertex v is on the surface iff among its 8
    # surrounding voxels, at least one is a surface voxel of this component
    # that exposes v.
    surf_same = jnp.pad(surface & (components.astype(jnp.int32) == target), 1,
                        constant_values=False)

    # neighbor-difference masks per voxel (padded frame), True when the
    # neighbor's component differs from target:
    def diff(off):
        dx, dy, dz = off
        rolled = jnp.roll(jnp.roll(jnp.roll(same, -dx, 0), -dy, 1), -dz, 2)
        return ~rolled

    d_zm = diff((0, 0, -1))
    d_zp = diff((0, 0, 1))
    d_ym = diff((0, -1, 0))
    d_yp = diff((0, 1, 0))
    d_xm = diff((-1, 0, 0))
    d_xp = diff((1, 0, 0))

    # For voxel at padded position p, its 8 corner-vertices get flagged per
    # the condition triples (hpp:408-489). Vertex lattice position of the
    # (-,-,-) corner of voxel (i,j,k)_unpadded is (i,j,k).
    vshape = (nx + 1, ny + 1, nz + 1)
    vertex = jnp.zeros(vshape, dtype=bool)
    center = surf_same[1:-1, 1:-1, 1:-1]
    conds = {
        (0, 0, 0): d_zm & d_ym & d_xm,
        (0, 0, 1): d_zp & d_ym & d_xm,
        (0, 1, 0): d_zm & d_yp & d_xm,
        (0, 1, 1): d_zp & d_yp & d_xm,
        (1, 0, 0): d_zm & d_ym & d_xp,
        (1, 0, 1): d_zp & d_ym & d_xp,
        (1, 1, 0): d_zm & d_yp & d_xp,
        (1, 1, 1): d_zp & d_yp & d_xp,
    }
    # NOTE: reference condition is OR of the three diffs (hpp:411-413); the
    # dicts above hold the AND'd *exposure* for edge counting; vertex
    # membership uses OR:
    vconds = {
        (0, 0, 0): d_zm | d_ym | d_xm,
        (0, 0, 1): d_zp | d_ym | d_xm,
        (0, 1, 0): d_zm | d_yp | d_xm,
        (0, 1, 1): d_zp | d_yp | d_xm,
        (1, 0, 0): d_zm | d_ym | d_xp,
        (1, 0, 1): d_zp | d_ym | d_xp,
        (1, 1, 0): d_zm | d_yp | d_xp,
        (1, 1, 1): d_zp | d_yp | d_xp,
    }
    del conds
    for (cx_, cy_, cz_), cond in vconds.items():
        contrib = center & cond[1:-1, 1:-1, 1:-1]
        vertex = vertex.at[cx_:cx_ + nx, cy_:cy_ + ny, cz_:cz_ + nz].max(
            contrib)

    # --- Edge exposure per vertex (hpp:508-624). The 8 voxels around vertex
    # (i,j,k) are voxels (i-1..i, j-1..j, k-1..k); in padded coordinates
    # voxel (i+a, j+b, k+c) for a,b,c in {0,1} reads same[i+a, j+b, k+c].
    def corner_same(a, b, c):
        return same[a:a + nx + 1, b:b + ny + 1, c:c + nz + 1]

    s = {(a, b, c): corner_same(a, b, c)
         for a in (0, 1) for b in (0, 1) for c in (0, 1)}

    def edge_exposed(quad):
        vals = [s[q] for q in quad]
        any_diff = ~(vals[0] & vals[1] & vals[2] & vals[3])
        all_diff = ~(vals[0] | vals[1] | vals[2] | vals[3])
        return any_diff & ~all_diff

    # The six edges with their 4 surrounding voxels (hpp:533-610); voxel
    # offsets here use {0,1} encoding of the reference's -1/+0 pattern.
    e_zm = edge_exposed([(0, 0, 0), (0, 1, 0), (1, 0, 0), (1, 1, 0)])
    e_zp = edge_exposed([(0, 0, 1), (0, 1, 1), (1, 0, 1), (1, 1, 1)])
    e_ym = edge_exposed([(0, 0, 0), (0, 0, 1), (1, 0, 0), (1, 0, 1)])
    e_yp = edge_exposed([(0, 1, 0), (0, 1, 1), (1, 1, 0), (1, 1, 1)])
    e_xm = edge_exposed([(0, 0, 0), (0, 0, 1), (0, 1, 0), (0, 1, 1)])
    e_xp = edge_exposed([(1, 0, 0), (1, 0, 1), (1, 1, 0), (1, 1, 1)])

    edge_count = sum(e.astype(jnp.int32)
                     for e in (e_zm, e_zp, e_ym, e_yp, e_xm, e_xp))
    edge_count = jnp.where(vertex, edge_count, 0)
    m3 = jnp.sum((edge_count == 3).astype(jnp.int32) * vertex)
    m5 = jnp.sum((edge_count == 5).astype(jnp.int32) * vertex)
    m6 = jnp.sum((edge_count == 6).astype(jnp.int32) * vertex)

    # --- Vertex-connectivity CC -> number of disjoint surfaces (hpp:198-299).
    # Vertices connect along exposed edges; both endpoints must be surface
    # vertices with that edge exposed (the edge bits are symmetric by
    # construction: the +z edge at v equals the -z edge at v+z).
    vx = vertex[:-1, :, :] & vertex[1:, :, :] & e_xp[:-1, :, :]
    vy = vertex[:, :-1, :] & vertex[:, 1:, :] & e_yp[:, :-1, :]
    vz = vertex[:, :, :-1] & vertex[:, :, 1:] & e_zp[:, :, :-1]
    _, num_surfaces = label_components(vx, vy, vz, vertex)

    return m3, m5, m6, num_surfaces


def compute_holes_and_voids(components: Array, surface_mask: Array,
                            component: int,
                            logging_fn: Optional[Callable[[str], None]] = None
                            ) -> NumberOfHolesAndVoids:
    """Chen & Rong topological invariants of one component's surface
    (hpp:331-643)."""
    m3, m5, m6, num_surfaces = _holes_voids_device(
        components, surface_mask, jnp.uint32(component))
    m3, m5, m6 = int(m3), int(m5), int(m6)
    num_surfaces = int(num_surfaces)
    num_voids = max(num_surfaces - 1, 0)
    raw_holes = 1 + (m5 + 2 * m6 - m3) // 8
    num_holes = raw_holes + num_voids
    if logging_fn:
        logging_fn(
            f"Processed surface with M3 = {m3} M5 = {m5} M6 = {m6} into "
            f"# holes = {num_holes} # of surfaces = {num_surfaces} "
            f"# of voids = {num_voids}")
    return NumberOfHolesAndVoids(num_holes, num_voids)


def compute_component_topology(
        occupancy: Array, components: Array, component_types: int,
        logging_fn: Optional[Callable[[str], None]] = None
) -> Dict[int, NumberOfHolesAndVoids]:
    """``ComputeComponentTopology`` (hpp:645-670): per-component hole/void
    invariants over the selected occupancy classes."""
    mask = component_surfaces_mask(occupancy, components, component_types)
    comp_np = np.asarray(components)
    mask_np = np.asarray(mask)
    result: Dict[int, NumberOfHolesAndVoids] = {}
    for c in sorted(np.unique(comp_np[mask_np])):
        result[int(c)] = compute_holes_and_voids(
            components, mask, int(c), logging_fn)
    return result
