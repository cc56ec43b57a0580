"""Mesh -> navigation-metadata pipeline (the reference's
generate_replica_metadata.py / generate_matterport3d_metadata.py role,
rebuilt without habitat-sim): mesh loading, navigability and geodesic
queries, the exact graph rule, on-disk format, and non-contiguous node-id
ingestion."""

import os
import pickle

import numpy as np
import pytest

from soundspaces_tpu.scene.floorplan import recursive_division
from soundspaces_tpu.scene.graph import SceneGraph
from soundspaces_tpu.tools.mesh_metadata import (
    MeshNavGrid,
    candidate_points,
    floorplan_to_mesh,
    generate_graph,
    generate_scene_metadata,
    load_mesh,
    trim_small_components,
    write_obj,
)


def _room_mesh(width=6, depth=6, wall_height=2.5):
    """Open rectangular room ringed by walls."""
    keep = np.zeros((depth, width), bool)
    keep[1:-1, 1:-1] = True
    return keep, floorplan_to_mesh(keep, cell=0.5, wall_height=wall_height)


def test_obj_roundtrip(tmp_path):
    keep, (verts, faces) = _room_mesh()
    path = str(tmp_path / "room.obj")
    write_obj(path, verts, faces)
    v2, f2 = load_mesh(path)
    assert v2.shape == verts.shape and f2.shape == faces.shape
    np.testing.assert_allclose(v2, verts, atol=1e-5)
    np.testing.assert_array_equal(f2, faces)


def test_ascii_ply_loader(tmp_path):
    # a unit quad as an ascii PLY with a 4-gon face (fan-triangulated)
    ply = (
        "ply\nformat ascii 1.0\n"
        "element vertex 4\n"
        "property float x\nproperty float y\nproperty float z\n"
        "element face 1\n"
        "property list uchar int vertex_indices\n"
        "end_header\n"
        "0 0 0\n1 0 0\n1 0 1\n0 0 1\n"
        "4 0 1 2 3\n"
    )
    path = tmp_path / "quad.ply"
    path.write_text(ply)
    verts, faces = load_mesh(str(path))
    assert verts.shape == (4, 3)
    np.testing.assert_array_equal(faces, [[0, 1, 2], [0, 2, 3]])


def test_binary_ply_loader(tmp_path):
    import struct

    header = (
        b"ply\nformat binary_little_endian 1.0\n"
        b"element vertex 3\n"
        b"property float x\nproperty float y\nproperty float z\n"
        b"element face 1\n"
        b"property list uchar int vertex_indices\n"
        b"end_header\n"
    )
    body = b"".join(
        struct.pack("<fff", *v)
        for v in [(0, 0, 0), (2, 0, 0), (0, 0, 2)]
    ) + struct.pack("<Biii", 3, 0, 1, 2)
    path = tmp_path / "tri.ply"
    path.write_bytes(header + body)
    verts, faces = load_mesh(str(path))
    np.testing.assert_allclose(verts, [(0, 0, 0), (2, 0, 0), (0, 0, 2)])
    np.testing.assert_array_equal(faces, [[0, 1, 2]])


def test_navigability_floor_vs_walls():
    keep, (verts, faces) = _room_mesh()
    grid = MeshNavGrid.build(verts, faces)
    # open-floor cell centers are navigable at floor height
    assert grid.is_navigable((1.0, 0.0, 1.0))
    assert grid.is_navigable((2.0, 0.0, 1.5))
    # inside a wall cell: floor exists under the wall but no clearance
    assert not grid.is_navigable((0.0, 0.0, 0.0))
    # off-mesh: no support
    assert not grid.is_navigable((40.0, 0.0, 40.0))
    # floating in the air above the floor: no support within step_height
    assert not grid.is_navigable((1.0, 1.0, 1.0))


def test_thin_wall_blocks_edge_but_not_euclid():
    """The core navmesh behavior the geodesic rule reproduces: two navigable
    points 0.5 m apart with a thin wall between them must NOT get an edge
    (their walkable geodesic detours around), while the same pair without the
    wall must (generate_replica_metadata.py:120-127)."""
    # 4 m x 4 m open floor; thin wall (0.1 thick) along x in [1.3, 3.9],
    # leaving a gap near x in [0.25, 1.3] to walk around through
    floor_v = np.array(
        [(0, 0, 0), (4, 0, 0), (4, 0, 4), (0, 0, 4)], np.float32
    )
    floor_f = np.array([[0, 1, 2], [0, 2, 3]], np.int64)
    keepwall = np.zeros((0, 3))
    wall_v, wall_f = _box((1.3, 0.0, 1.95), (3.9, 2.0, 2.05))
    verts = np.concatenate([floor_v, wall_v])
    faces = np.concatenate([floor_f, wall_f + 4])
    pa, pb = (2.0, 0.0, 1.7), (2.0, 0.0, 2.3)  # straddling the wall
    del keepwall

    grid = MeshNavGrid.build(verts, faces)
    assert grid.is_navigable(pa) and grid.is_navigable(pb)
    # euclidean 0.6 apart, but the walkable path rounds the wall end
    assert grid.geodesic(pa, pb, max_dist=3.0) > 1.5
    g = generate_graph(
        np.array([pa, pb]), grid, edge_max=0.7, geo_max=0.8
    )
    assert not g.has_edge(0, 1)

    grid_open = MeshNavGrid.build(floor_v, floor_f)
    assert grid_open.geodesic(pa, pb, max_dist=3.0) == pytest.approx(
        0.6, abs=0.1
    )
    g2 = generate_graph(
        np.array([pa, pb]), grid_open, edge_max=0.7, geo_max=0.8
    )
    assert g2.has_edge(0, 1)


def _box(lo, hi):
    """Axis-aligned box as 12 triangles."""
    x0, y0, z0 = lo
    x1, y1, z1 = hi
    v = np.array(
        [
            (x0, y0, z0), (x1, y0, z0), (x1, y0, z1), (x0, y0, z1),
            (x0, y1, z0), (x1, y1, z0), (x1, y1, z1), (x0, y1, z1),
        ],
        np.float32,
    )
    quads = [
        (0, 1, 2, 3), (4, 5, 6, 7), (0, 1, 5, 4),
        (2, 3, 7, 6), (0, 3, 7, 4), (1, 2, 6, 5),
    ]
    f = []
    for a, b, c, d in quads:
        f.append((a, b, c))
        f.append((a, c, d))
    return v, np.array(f, np.int64)


def test_floorplan_parity(tmp_path):
    """Floorplan -> mesh -> full metadata pipeline recovers the same largest
    walkable component the floorplan defines (positions and 4-connected
    edges)."""
    rng = np.random.default_rng(3)
    keep = recursive_division(14, 14, rng, min_room=4)
    verts, faces = floorplan_to_mesh(keep, cell=0.5)
    mesh_path = str(tmp_path / "plan.obj")
    write_obj(mesh_path, verts, faces)
    out = str(tmp_path / "meta")
    pts, g = generate_scene_metadata(mesh_path, out, grid_size=0.5)

    got = SceneGraph.from_metadata(out).largest_component()

    # ground truth straight from the floorplan grid (floorplan_graph logic)
    depth, width = keep.shape
    ids = -np.ones((depth, width), np.int64)
    tpts, tedges = [], []
    for z in range(depth):
        for x in range(width):
            if keep[z, x]:
                ids[z, x] = len(tpts)
                tpts.append((x * 0.5, 0.0, z * 0.5))
    for z in range(depth):
        for x in range(width):
            if ids[z, x] < 0:
                continue
            if x + 1 < width and ids[z, x + 1] >= 0:
                tedges.append((ids[z, x], ids[z, x + 1]))
            if z + 1 < depth and ids[z + 1, x] >= 0:
                tedges.append((ids[z, x], ids[z + 1, x]))
    want = SceneGraph.from_edges(
        np.array(tpts, np.float32), np.array(tedges, np.int64), 0.5
    ).largest_component()

    def pos_set(sg):
        return {
            (round(float(p[0]), 3), round(float(p[2]), 3)) for p in sg.points
        }

    assert pos_set(got) == pos_set(want)

    def edge_set(sg):
        out = set()
        n = sg.num_nodes
        for a in range(n):
            for r in range(4):
                b = sg.forward_neighbor[a, r]
                if b >= 0:
                    pa, pb = sg.points[a], sg.points[int(b)]
                    key = tuple(
                        sorted(
                            [
                                (round(float(pa[0]), 3), round(float(pa[2]), 3)),
                                (round(float(pb[0]), 3), round(float(pb[2]), 3)),
                            ]
                        )
                    )
                    out.add(key)
        return out

    assert edge_set(got) == edge_set(want)
    # graph.pkl keeps original candidate indices => non-contiguous node ids
    with open(os.path.join(out, "graph.pkl"), "rb") as f:
        raw = pickle.load(f)
    nodes = sorted(raw.nodes())
    assert nodes != list(range(len(nodes))) or len(nodes) == len(pts)


def test_trim_small_components():
    import networkx as nx

    g = nx.Graph()
    for i in range(12):
        g.add_node(i, point=(float(i), 0.0, 0.0))
        if i:
            g.add_edge(i - 1, i)
    g.add_node(100, point=(50.0, 0.0, 0.0))
    g.add_node(101, point=(50.5, 0.0, 0.0))
    g.add_edge(100, 101)
    trim_small_components(g, min_nodes=10)
    assert 100 not in g and 101 not in g and len(g) == 12


def test_candidate_points_snap_to_floor():
    keep, (verts, faces) = _room_mesh()
    grid = MeshNavGrid.build(verts, faces)
    pts = candidate_points(grid, grid_size=0.5)
    floor = pts[np.abs(pts[:, 1]) < 1e-3]
    assert len(floor) > 0
    # all floor-level candidates lie on the 0.5 m lattice
    assert np.allclose(floor[:, 0] % 0.5, 0, atol=1e-6) or np.allclose(
        (floor[:, 0] % 0.5) - 0.5, 0, atol=1e-6
    )


def test_noncontiguous_node_ids_roundtrip(tmp_path):
    """The reference's shipped graph.pkl files have id gaps (adjust_graph
    removals, generate_replica_metadata.py:20-58) and its RIR files are named
    by ORIGINAL ids — ingestion must keep them aligned."""
    import networkx as nx
    from scipy.io import wavfile

    from soundspaces_tpu.scene.banks import AcousticBank

    g = nx.Graph()
    pts = {0: (0.0, 0.0, 0.0), 2: (0.5, 0.0, 0.0), 5: (1.0, 0.0, 0.0)}
    for i, p in pts.items():
        g.add_node(i, point=p)
    g.add_edge(0, 2)
    g.add_edge(2, 5)
    meta = tmp_path / "meta"
    meta.mkdir()
    with open(meta / "graph.pkl", "wb") as f:
        pickle.dump(g, f)

    sg = SceneGraph.from_metadata(str(meta))
    assert sg.num_nodes == 3
    np.testing.assert_array_equal(sg.node_ids, [0, 2, 5])
    # rows are dense: row 1 is original node 2 at x=0.5
    assert sg.points[1, 0] == pytest.approx(0.5)

    # RIR named by ORIGINAL ids: receiver row 1 (id 2), source row 2 (id 5)
    rir_dir = tmp_path / "rirs"
    for angle in (0, 90, 180, 270):
        (rir_dir / str(angle)).mkdir(parents=True)
    marker = np.zeros((16, 2), np.float32)
    marker[0] = [0.25, -0.5]
    wavfile.write(str(rir_dir / "0" / "2_5.wav"), 16000, marker)

    bank = AcousticBank.from_rir_dir(
        sg,
        str(rir_dir),
        goal_nodes=np.array([2]),  # dense row index of original node 5
        sounds=np.zeros((1, 16000), np.float32),
        sound_lengths_sec=np.ones(1, np.float32),
        sampling_rate=16000,
        rir_max_len=16,
    )
    rir = np.asarray(bank.rir)
    assert rir[0, 1, 0, 0, 0] == pytest.approx(0.25)
    assert rir[0, 1, 0, 1, 0] == pytest.approx(-0.5)
    assert np.abs(rir[0, 0, 0]).max() == 0  # other rows stay silent
