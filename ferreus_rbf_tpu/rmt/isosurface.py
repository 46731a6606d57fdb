"""Surface-following regularised marching tetrahedra extraction.

Maps ``ferreus_rmt/src/isosurface.rs``: seed projection -> batched
wavefront expansion (one field evaluation per front generation) -> per
-sample topology tests + clustering into vertex candidates -> predicted
-edge-count prefilter -> marching tetrahedra -> up to four rounds of
non-manifold rollback -> self-intersection rollback -> AABB clip -> mesh
cleanup -> boundary closure.

The driver is host code; its cost is dominated by the batched field
evaluations it issues, which in the RBF pipeline run on the device through
the FMM leaf evaluator.
"""

from __future__ import annotations

import numpy as np

from ..isosurfacing import BoundaryClosure, ClusterMethod, Mesh
from ..progress import IsosurfaceStage, Message, SurfacingProgress
from . import seed_projection, topology
from .cleanup import clean_mesh
from .clipping import bbox_eps, clip_mesh_to_aabb, facets_fully_inside_aabb
from .closure import cap_mesh_to_aabb
from .constants import (
    EDGE_DELTAS,
    FACE_DIRS,
    FACES,
    MT_TABLE,
    OWNED_TET_EDGES,
    REVERSE_EDGE,
    TET_EDGE_PAIRS,
)
from .curvature import curvature_weighted_cluster_point
from .intersections import get_intersecting_triangles
from .isosurface_util import (
    edge_intersection_point,
    edge_points_8,
    get_edge_owner,
    is_inside,
)
from .lattice import SampleLattice

_OWNED_TET_DELTAS = [
    [tuple(EDGE_DELTAS[e]) for e in tet] for tet in OWNED_TET_EDGES.tolist()
]


def _emit(progress, isovalue, stage: IsosurfaceStage, fraction: float):
    if progress is not None:
        progress.emit(
            SurfacingProgress(isovalue=isovalue, stage=str(stage), progress=fraction)
        )


def _emit_msg(progress, message: str):
    if progress is not None:
        progress.emit(Message(message=message))


def _march_tets(keys, evaluated, resolve, emit):
    """March the six owned tetrahedra of each sample point."""
    for c0 in keys:
        for tet in _OWNED_TET_DELTAS:
            corners = [
                c0,
                (c0[0] + tet[0][0], c0[1] + tet[0][1], c0[2] + tet[0][2]),
                (c0[0] + tet[1][0], c0[1] + tet[1][1], c0[2] + tet[1][2]),
                (c0[0] + tet[2][0], c0[1] + tet[2][1], c0[2] + tet[2][2]),
            ]
            vals = []
            ok = True
            for c in corners:
                v = evaluated.get(c)
                if v is None or v != v:
                    ok = False
                    break
                vals.append(v)
            if not ok:
                continue

            case = 0
            for i, s in enumerate(vals):
                if is_inside(s):
                    case |= 1 << i
            for tri in MT_TABLE[case]:
                vids = []
                ok = True
                for te in tri:
                    a, b = TET_EDGE_PAIRS[te]
                    vid = resolve(corners[a], corners[b])
                    if vid is None:
                        ok = False
                        break
                    vids.append(vid)
                if not ok or vids[0] == vids[1] or vids[1] == vids[2] or vids[0] == vids[2]:
                    continue
                emit(vids)


def build_isosurfaces(
    seed_points,
    extents,
    resolution,
    isovalues,
    isosurface_fn,
    gradient_fn=None,
    cluster_method=ClusterMethod.CurvatureWeighted,
    boundary_closure=BoundaryClosure.None_,
    progress_callback=None,
):
    return [
        build_isosurface(
            seed_points, extents, resolution, iso, isosurface_fn, gradient_fn,
            cluster_method, boundary_closure, progress_callback,
        )
        for iso in isovalues
    ]


def build_isosurface(
    seed_points,
    extents,
    resolution,
    isovalue,
    isosurface_fn,
    gradient_fn=None,
    cluster_method=ClusterMethod.CurvatureWeighted,
    boundary_closure=BoundaryClosure.None_,
    progress_callback=None,
) -> Mesh:
    extents = np.asarray(extents, np.float64).reshape(6)
    lattice = SampleLattice(resolution, extents)
    eps = bbox_eps(extents)

    _emit(progress_callback, isovalue, IsosurfaceStage.ProjectingSeeds, 0.0)

    if gradient_fn is not None:
        def grad_wrap(pts):
            vals, grads = gradient_fn(pts)
            return np.asarray(vals).reshape(-1, 1), np.asarray(grads).reshape(-1, 3)
    else:
        def grad_wrap(pts):
            return seed_projection.central_difference_values_and_gradients(
                pts, isosurface_fn, lattice
            )

    wavefront = seed_projection.get_unique_seed_point_ijks(
        seed_points, grad_wrap, lattice, isovalue
    )

    sample_points: dict[tuple, int] = {}
    seen_cells = set(wavefront)
    evaluated: dict[tuple, float] = {}

    _emit(progress_callback, isovalue, IsosurfaceStage.ExpandingWavefront, 0.05)

    face_dirs = [tuple(d) for d in FACE_DIRS.tolist()]
    faces = FACES.tolist()

    # --- wavefront expansion (batched evaluation per generation) -----------
    while wavefront:
        unevaluated = []
        for cell in wavefront:
            sample_points.setdefault(cell, 0)
            for corner in edge_points_8(cell):
                if corner not in evaluated:
                    evaluated[corner] = np.nan  # reserve
                    unevaluated.append(corner)

        if unevaluated:
            ijks = np.asarray(unevaluated, np.float64)
            worlds = lattice.ijk_to_world(ijks)
            vals = np.asarray(isosurface_fn(worlds)).reshape(-1)
            for key, v in zip(unevaluated, vals):
                evaluated[key] = float(v) - isovalue

        next_wavefront = set()
        for cell in wavefront:
            corners = edge_points_8(cell)
            corner_vals = [evaluated[c] for c in corners]
            s0 = corner_vals[0]
            inside0 = is_inside(s0)

            cell_has_intersections = False
            for corner_idx in range(1, 8):
                s1 = corner_vals[corner_idx]
                if inside0 == is_inside(s1):
                    continue
                eid = corner_idx - 1
                t = s0 / (s0 - s1)
                if t < 0.5:
                    sample_points[cell] |= 1 << eid
                else:
                    nbr_key = corners[corner_idx]
                    sample_points[nbr_key] = sample_points.get(nbr_key, 0) | (
                        1 << int(REVERSE_EDGE[eid])
                    )
                cell_has_intersections = True

            if not cell_has_intersections:
                continue

            for face_ids, d in zip(faces, face_dirs):
                any_in = any(is_inside(corner_vals[i]) for i in face_ids)
                any_out = any(not is_inside(corner_vals[i]) for i in face_ids)
                if not (any_in and any_out):
                    continue
                nbr = (cell[0] + d[0], cell[1] + d[1], cell[2] + d[2])
                if nbr in seen_cells:
                    continue
                nbr_corners = np.asarray(edge_points_8(nbr), np.int64)
                if not lattice.extraction_ijk_inbounds(nbr_corners).any():
                    continue
                seen_cells.add(nbr)
                sample_points.setdefault(nbr, 0)
                next_wavefront.add(nbr)
        wavefront = next_wavefront

    # --- fill missing neighbour values for topology tests ------------------
    missing = set()
    deltas = EDGE_DELTAS.tolist()
    for ijk, mask in sample_points.items():
        if mask == 0:
            continue
        if ijk not in evaluated:
            missing.add(ijk)
        for d in deltas:
            nbr = (ijk[0] + d[0], ijk[1] + d[1], ijk[2] + d[2])
            if nbr not in evaluated:
                missing.add(nbr)
    if missing:
        keys = list(missing)
        worlds = lattice.ijk_to_world(np.asarray(keys, np.float64))
        vals = np.asarray(isosurface_fn(worlds)).reshape(-1)
        for key, v in zip(keys, vals):
            evaluated[key] = float(v) - isovalue

    _emit(progress_callback, isovalue, IsosurfaceStage.ClusteringVertices, 0.7)

    # --- topology tests + clustering ---------------------------------------
    keys = list(sample_points.keys())
    candidates = []  # (point, edge_endpoints, owner)
    candidate_ref: dict[tuple, int] = {}
    case_counts = dict.fromkeys(
        ("ClosedSurface", "MultiHole", "FlatHole", "MultiSurface", "SimpleSurface"), 0
    )

    should_cluster = cluster_method != ClusterMethod.None_

    for ijk in keys:
        mask = sample_points[ijk]
        if mask == 0:
            continue
        case, clusters = topology.test_topology(mask, should_cluster, ijk, evaluated)
        if case.value in case_counts:
            case_counts[case.value] += 1

        for cluster in clusters:
            edge_endpoints = []
            pts = []
            for edge in cluster:
                d = deltas[edge]
                nbr = (ijk[0] + d[0], ijk[1] + d[1], ijk[2] + d[2])
                p = edge_intersection_point(ijk, nbr, evaluated, lattice)
                if p is not None:
                    edge_endpoints.append((ijk, nbr))
                    pts.append(p)
            if not pts:
                continue

            if cluster_method == ClusterMethod.CurvatureWeighted:
                cand = curvature_weighted_cluster_point(edge_endpoints, evaluated, lattice)
                if cand is None:
                    cand = pts[0] if len(pts) == 1 else tuple(np.mean(pts, axis=0))
            else:
                cand = pts[0] if len(pts) == 1 else tuple(np.mean(pts, axis=0))

            cid = len(candidates)
            for u, v in edge_endpoints:
                own = get_edge_owner(u, v)
                if own is not None:
                    candidate_ref[(own[0], own[2])] = cid
            candidates.append((cand, edge_endpoints, ijk))

    _emit_msg(
        progress_callback,
        "Closed surfaces: {ClosedSurface}\nMulti-holes: {MultiHole}\n"
        "Flat holes: {FlatHole}\nMulti-surfaces: {MultiSurface}\n"
        "Simple surfaces: {SimpleSurface}".format(**case_counts),
    )
    _emit(progress_callback, isovalue, IsosurfaceStage.BuildingFacets, 0.82)

    # --- predicted-edge-count prefilter ------------------------------------
    predicted_edge_counts: dict[tuple, int] = {}

    def resolve_candidate(u, v):
        own = get_edge_owner(u, v)
        if own is None:
            return None
        return candidate_ref.get((own[0], own[2]))

    def count_edges(vids):
        a, b, c = vids
        for x, y in ((a, b), (b, c), (c, a)):
            key = (x, y) if x <= y else (y, x)
            predicted_edge_counts[key] = predicted_edge_counts.get(key, 0) + 1

    _march_tets(keys, evaluated, resolve_candidate, count_edges)

    split_candidates = set()
    for (a, b), count in predicted_edge_counts.items():
        if count <= 2:
            continue
        if len(candidates[a][1]) > 1:
            split_candidates.add(a)
        if len(candidates[b][1]) > 1:
            split_candidates.add(b)

    # --- materialise vertices ----------------------------------------------
    vertices: list[tuple] = []
    edge_ref: dict[tuple, int] = {}
    cluster_vertex_edges: dict[int, list] = {}
    cluster_vertex_owner: dict[int, tuple] = {}
    owner_cluster_vertices: dict[tuple, list] = {}

    def set_edge(u, v, vid):
        own = get_edge_owner(u, v)
        if own is not None:
            edge_ref[(own[0], own[2])] = vid

    def get_edge(u, v):
        own = get_edge_owner(u, v)
        if own is None:
            return None
        return edge_ref.get((own[0], own[2]))

    for cid, (cand, edge_endpoints, owner) in enumerate(candidates):
        if cid in split_candidates:
            for u, v in edge_endpoints:
                p = edge_intersection_point(u, v, evaluated, lattice)
                if p is not None:
                    vid = len(vertices)
                    vertices.append(p)
                    set_edge(u, v, vid)
        else:
            vid = len(vertices)
            vertices.append(cand)
            if len(edge_endpoints) > 1:
                cluster_vertex_edges[vid] = list(edge_endpoints)
                cluster_vertex_owner[vid] = owner
                owner_cluster_vertices.setdefault(owner, []).append(vid)
            for u, v in edge_endpoints:
                set_edge(u, v, vid)

    facets: list[int] = []
    _march_tets(keys, evaluated, get_edge, lambda vids: facets.extend(vids))

    def rollback_owners(bad_owners) -> int:
        bad_vertices = set()
        rolled = 0
        for owner in bad_owners:
            vids = owner_cluster_vertices.pop(owner, None)
            if vids:
                rolled += 1
                bad_vertices.update(vids)
        for vid in bad_vertices:
            edges = cluster_vertex_edges.pop(vid, None)
            if edges is None:
                continue
            cluster_vertex_owner.pop(vid, None)
            for u, v in edges:
                p = edge_intersection_point(u, v, evaluated, lattice)
                if p is not None:
                    new_vid = len(vertices)
                    vertices.append(p)
                    set_edge(u, v, new_vid)
        return rolled

    # --- non-manifold rollback (up to 4 rounds) ----------------------------
    if cluster_vertex_edges and facets:
        total_rolled = 0
        for _ in range(4):
            edge_faces: dict[tuple, list] = {}
            for tri_idx in range(len(facets) // 3):
                a, b, c = facets[tri_idx * 3 : tri_idx * 3 + 3]
                for x, y in ((a, b), (b, c), (c, a)):
                    key = (x, y) if x <= y else (y, x)
                    edge_faces.setdefault(key, []).append(tri_idx)
            bad_owners = set()
            for tris in edge_faces.values():
                if len(tris) <= 2:
                    continue
                for tri_idx in tris:
                    for vid in facets[tri_idx * 3 : tri_idx * 3 + 3]:
                        owner = cluster_vertex_owner.get(vid)
                        if owner is not None:
                            bad_owners.add(owner)
            if not bad_owners:
                break
            rolled = rollback_owners(bad_owners)
            if rolled == 0:
                break
            total_rolled += rolled
            facets = []
            _march_tets(keys, evaluated, get_edge, lambda vids: facets.extend(vids))
        _emit_msg(
            progress_callback,
            f"Rolled back {total_rolled} sample points from non-manifold edges.",
        )

    # --- self-intersection rollback ----------------------------------------
    if cluster_vertex_edges and facets:
        verts_arr = np.asarray(vertices, np.float64)
        tris_arr = np.asarray(facets, np.int64).reshape(-1, 3)
        inside = facets_fully_inside_aabb(verts_arr, tris_arr, extents, eps)
        inside_idx = np.nonzero(inside)[0]
        bad_tris = get_intersecting_triangles(verts_arr, tris_arr[inside_idx])
        if bad_tris.size:
            bad_owners = set()
            for filtered in bad_tris:
                tri_idx = int(inside_idx[filtered])
                for vid in facets[tri_idx * 3 : tri_idx * 3 + 3]:
                    owner = cluster_vertex_owner.get(vid)
                    if owner is not None:
                        bad_owners.add(owner)
            if bad_owners:
                rolled = rollback_owners(bad_owners)
                if rolled:
                    facets = []
                    _march_tets(keys, evaluated, get_edge, lambda vids: facets.extend(vids))
                _emit_msg(
                    progress_callback,
                    f"Rolled back {rolled} sample points from self-intersections.",
                )

    # --- clip, clean, cap --------------------------------------------------
    verts_arr = np.asarray(vertices, np.float64).reshape(-1, 3)
    tris_arr = np.asarray(facets, np.int64).reshape(-1, 3)

    verts_arr, tris_arr = clip_mesh_to_aabb(verts_arr, tris_arr, extents, eps)

    _emit(progress_callback, isovalue, IsosurfaceStage.CleaningMesh, 0.94)
    verts_arr, tris_arr = clean_mesh(verts_arr, tris_arr, eps)

    _emit(progress_callback, isovalue, IsosurfaceStage.BoundaryClosure, 0.97)
    verts_arr, tris_arr = cap_mesh_to_aabb(
        verts_arr, tris_arr, extents, resolution, boundary_closure, eps
    )

    _emit(progress_callback, isovalue, IsosurfaceStage.Finished, 1.0)
    return Mesh(verts_arr, tris_arr)
