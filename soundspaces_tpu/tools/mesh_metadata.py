"""Mesh-based scene metadata generation — the reference's
`scripts/generate_replica_metadata.py` / `generate_matterport3d_metadata.py`
without habitat-sim.

The reference builds per-scene navigation graphs by querying habitat-sim's
NavMesh PathFinder over candidate points: nodes are the navigable points and
an edge joins two points when they are 0.1..0.51 m apart (Replica;
0.1..1.01 m for MP3D) AND the navmesh geodesic between them is < 0.8 m
(< 1.3 m MP3D) — generate_replica_metadata.py:105-130,
generate_matterport3d_metadata.py:80-105. Small disconnected components are
trimmed for MP3D (generate_matterport3d_metadata.py:20-30).

This module derives the same navigability oracle directly from the scene's
triangle mesh, with no external engine:

  triangle mesh (.ply / .obj)
    -> `MeshNavGrid`: top-down rasterization of the mesh into per-cell
       sorted height columns — up-facing surfaces (slope filter) are floor
       candidates, all surfaces are solid for clearance tests (the same
       heightfield idea recast/NavMesh generation uses)
    -> is_navigable(p): floor support within step_height under the agent's
       whole footprint + agent_height clearance above it
    -> geodesic(a, b): Dijkstra over raster cells with height propagation
       bounded by step_height (replaces pathfinder.find_path for the short
       edge-validation paths)
    -> the reference's exact graph rule + component trim
    -> points.txt + pickled networkx graph.pkl (soundspaces/utils.py:15-39)

Graph node ids are indices into the candidate point list and are therefore
non-contiguous after navigability filtering/trimming — exactly like the
reference's shipped graph.pkl files (SceneGraph.from_metadata densifies them
and keeps the originals in `node_ids`).
"""

from __future__ import annotations

import dataclasses
import heapq
import os
import pickle

import numpy as np

_SQRT2 = float(np.sqrt(2.0))


# --------------------------------------------------------------- mesh loading
def load_mesh(path: str) -> tuple[np.ndarray, np.ndarray]:
    """Load a triangle mesh: ASCII/binary-little-endian PLY or OBJ.
    Returns (vertices [V, 3] float32, faces [F, 3] int64); polygon faces are
    fan-triangulated. Pure numpy — no trimesh/habitat dependency."""
    ext = os.path.splitext(path)[1].lower()
    if ext == ".ply":
        return _load_ply(path)
    if ext == ".obj":
        return _load_obj(path)
    raise ValueError(f"unsupported mesh format: {path}")


def _load_ply(path: str) -> tuple[np.ndarray, np.ndarray]:
    with open(path, "rb") as f:
        magic = f.readline().strip()
        assert magic == b"ply", f"{path}: not a PLY file"
        fmt = None
        elements: list[tuple[str, int, list[tuple[str, str]]]] = []
        cur_props: list[tuple[str, str]] = []
        while True:
            line = f.readline()
            if not line:
                raise ValueError(f"{path}: unterminated PLY header")
            tok = line.decode("ascii", "replace").split()
            if not tok:
                continue
            if tok[0] == "format":
                fmt = tok[1]
            elif tok[0] == "element":
                cur_props = []
                elements.append((tok[1], int(tok[2]), cur_props))
            elif tok[0] == "property":
                if tok[1] == "list":
                    cur_props.append(("list:" + tok[2] + ":" + tok[3], tok[-1]))
                else:
                    cur_props.append((tok[1], tok[2]))
            elif tok[0] == "end_header":
                break
        assert fmt in ("ascii", "binary_little_endian"), (
            f"{path}: unsupported PLY format {fmt}"
        )
        verts = np.zeros((0, 3), np.float32)
        faces: list[list[int]] = []
        if fmt == "ascii":
            for name, count, props in elements:
                rows = [f.readline().split() for _ in range(count)]
                if name == "vertex":
                    names = [p[1] for p in props]
                    ix, iy, iz = (names.index(a) for a in ("x", "y", "z"))
                    verts = np.array(
                        [[r[ix], r[iy], r[iz]] for r in rows], np.float32
                    )
                elif name == "face":
                    for r in rows:
                        k = int(r[0])
                        faces.extend(_fan([int(v) for v in r[1 : 1 + k]]))
        else:
            np_types = {
                "char": "i1", "int8": "i1", "uchar": "u1", "uint8": "u1",
                "short": "i2", "int16": "i2", "ushort": "u2", "uint16": "u2",
                "int": "i4", "int32": "i4", "uint": "u4", "uint32": "u4",
                "float": "f4", "float32": "f4", "double": "f8",
                "float64": "f8",
            }
            for name, count, props in elements:
                if name == "vertex" and all(
                    not t.startswith("list:") for t, _ in props
                ):
                    dt = np.dtype(
                        [(pn, "<" + np_types[t]) for t, pn in props]
                    )
                    rec = np.frombuffer(
                        f.read(dt.itemsize * count), dt, count
                    )
                    verts = np.stack(
                        [rec["x"], rec["y"], rec["z"]], axis=1
                    ).astype(np.float32)
                elif name == "face":
                    # faces are a (count-type, index-type) list property
                    t = props[0][0]
                    assert t.startswith("list:"), f"{path}: odd face element"
                    _, ct, it = t.split(":")
                    cdt = np.dtype("<" + np_types[ct])
                    idt = np.dtype("<" + np_types[it])
                    for _ in range(count):
                        k = int(
                            np.frombuffer(f.read(cdt.itemsize), cdt, 1)[0]
                        )
                        idx = np.frombuffer(f.read(idt.itemsize * k), idt, k)
                        faces.extend(_fan([int(v) for v in idx]))
                else:
                    # skip unknown fixed-width elements
                    dt = np.dtype(
                        [(pn, "<" + np_types[t]) for t, pn in props]
                    )
                    f.read(dt.itemsize * count)
    return verts, np.array(faces, np.int64).reshape(-1, 3)


def _load_obj(path: str) -> tuple[np.ndarray, np.ndarray]:
    verts: list[list[float]] = []
    faces: list[list[int]] = []
    with open(path) as f:
        for line in f:
            tok = line.split()
            if not tok:
                continue
            if tok[0] == "v":
                verts.append([float(v) for v in tok[1:4]])
            elif tok[0] == "f":
                idx = [int(t.split("/")[0]) for t in tok[1:]]
                idx = [i - 1 if i > 0 else len(verts) + i for i in idx]
                faces.extend(_fan(idx))
    return (
        np.array(verts, np.float32),
        np.array(faces, np.int64).reshape(-1, 3),
    )


def _fan(poly: list[int]) -> list[list[int]]:
    return [[poly[0], poly[i], poly[i + 1]] for i in range(1, len(poly) - 1)]


def write_obj(path: str, verts: np.ndarray, faces: np.ndarray) -> None:
    """Minimal OBJ writer (test fixtures / exporting generated scenes)."""
    with open(path, "w") as f:
        for v in verts:
            f.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        for a, b, c in faces:
            f.write(f"f {a + 1} {b + 1} {c + 1}\n")


# --------------------------------------------------------- navigability grid
@dataclasses.dataclass
class MeshNavGrid:
    """Top-down heightfield rasterization of a triangle mesh.

    Per (ix, iz) cell, two sorted height columns (CSR layout):
    - floor: sample heights from up-facing triangles (normal_y >= cos(slope))
    - solid: sample heights from ALL triangles (clearance tests)
    This is the same surface decomposition a NavMesh voxelization performs;
    queries replace habitat-sim's `pathfinder.is_navigable`/`find_path`
    (generate_replica_metadata.py:106,122-127).
    """

    origin: np.ndarray  # [2] (xmin, zmin)
    cell: float
    nx: int
    nz: int
    floor_vals: np.ndarray  # sorted-by-(cell, h) heights
    floor_ptr: np.ndarray  # [nx*nz + 1] CSR row pointers
    solid_vals: np.ndarray
    solid_ptr: np.ndarray
    agent_height: float = 1.2
    agent_radius: float = 0.1
    step_height: float = 0.2

    @classmethod
    def build(
        cls,
        verts: np.ndarray,
        faces: np.ndarray,
        cell: float = 0.1,
        max_slope_deg: float = 40.0,
        agent_height: float = 1.2,
        agent_radius: float = 0.1,
        step_height: float = 0.2,
    ) -> "MeshNavGrid":
        verts = np.asarray(verts, np.float64)
        faces = np.asarray(faces, np.int64)
        samples, up = _sample_triangles(
            verts, faces, spacing=cell * 0.5,
            cos_slope=float(np.cos(np.deg2rad(max_slope_deg))),
        )
        xmin, zmin = samples[:, 0].min(), samples[:, 2].min()
        origin = np.array([xmin, zmin])
        ix = np.floor((samples[:, 0] - xmin) / cell).astype(np.int64)
        iz = np.floor((samples[:, 2] - zmin) / cell).astype(np.int64)
        nx = int(ix.max()) + 1
        nz = int(iz.max()) + 1
        flat = ix * nz + iz

        def csr(mask):
            f = flat[mask]
            h = samples[mask, 1]
            order = np.lexsort((h, f))
            f, h = f[order], h[order]
            ptr = np.zeros(nx * nz + 1, np.int64)
            np.add.at(ptr, f + 1, 1)
            return h.astype(np.float32), np.cumsum(ptr)

        floor_vals, floor_ptr = csr(up)
        solid_vals, solid_ptr = csr(np.ones(len(samples), bool))
        return cls(
            origin, cell, nx, nz, floor_vals, floor_ptr, solid_vals,
            solid_ptr, agent_height, agent_radius, step_height,
        )

    # ------------------------------------------------------------- queries
    def _cell(self, x: float, z: float) -> tuple[int, int]:
        return (
            int(np.floor((x - self.origin[0]) / self.cell)),
            int(np.floor((z - self.origin[1]) / self.cell)),
        )

    def _col(self, vals, ptr, ix: int, iz: int) -> np.ndarray:
        if not (0 <= ix < self.nx and 0 <= iz < self.nz):
            return vals[0:0]
        k = ix * self.nz + iz
        return vals[ptr[k] : ptr[k + 1]]

    def floor_heights(self, ix: int, iz: int, dedup: float = 0.05) -> list[float]:
        """Distinct floor-surface heights in a cell (merged within `dedup`)."""
        col = self._col(self.floor_vals, self.floor_ptr, ix, iz)
        out: list[float] = []
        for h in col:
            if not out or h - out[-1] > dedup:
                out.append(float(h))
            else:
                out[-1] = float(h)  # keep the top of the merged band
        return out

    def _support(self, ix: int, iz: int, y: float) -> float | None:
        """Floor height nearest y within step_height, else None."""
        col = self._col(self.floor_vals, self.floor_ptr, ix, iz)
        if col.size == 0:
            return None
        j = int(np.searchsorted(col, y))
        best, bd = None, self.step_height
        for k in (j - 1, j):
            if 0 <= k < col.size and abs(float(col[k]) - y) <= bd:
                best, bd = float(col[k]), abs(float(col[k]) - y)
        return best

    def _clear(self, ix: int, iz: int, h: float) -> bool:
        """No solid geometry inside the agent band (h+step, h+agent_height)."""
        col = self._col(self.solid_vals, self.solid_ptr, ix, iz)
        lo = int(np.searchsorted(col, h + self.step_height, side="right"))
        hi = int(np.searchsorted(col, h + self.agent_height, side="left"))
        return hi <= lo

    def _footprint(self) -> list[tuple[int, int]]:
        r = max(int(np.ceil(self.agent_radius / self.cell)), 0)
        out = []
        for dx in range(-r, r + 1):
            for dz in range(-r, r + 1):
                if (dx * dx + dz * dz) * self.cell**2 <= (
                    self.agent_radius + 1e-9
                ) ** 2:
                    out.append((dx, dz))
        return out

    def is_navigable(self, p) -> bool:
        """The reference's `pathfinder.is_navigable(point)`
        (generate_replica_metadata.py:106): supported by an up-facing surface
        within step_height of p's height, with floor support and agent-height
        clearance across the whole footprint."""
        x, y, z = float(p[0]), float(p[1]), float(p[2])
        ix, iz = self._cell(x, z)
        h = self._support(ix, iz, y)
        if h is None:
            return False
        for dx, dz in self._footprint():
            hh = self._support(ix + dx, iz + dz, h)
            if hh is None or not self._clear(ix + dx, iz + dz, hh):
                return False
        return True

    def geodesic(self, pa, pb, max_dist: float) -> float:
        """Shortest walkable distance between two points, Dijkstra over raster
        cells with step_height-bounded height propagation (8-connected, no
        diagonal corner cutting). Returns inf if no path <= max_dist exists —
        the reference's `pathfinder.find_path(...).geodesic_distance` role for
        edge validation (generate_replica_metadata.py:122-127)."""
        sa, sb = self._cell(pa[0], pa[2]), self._cell(pb[0], pb[2])
        ha = self._support(sa[0], sa[1], float(pa[1]))
        hb = self._support(sb[0], sb[1], float(pb[1]))
        if ha is None or hb is None:
            return float("inf")
        q = float(self.step_height)

        def walkable(ix, iz, h):
            key = (ix, iz, round(h / q))
            hit = self._nav_cache.get(key) if hasattr(self, "_nav_cache") else None
            if hit is not None:
                return hit
            hh = self._support(ix, iz, h)
            ok = hh is not None and self._clear(ix, iz, hh)
            res = (ok, hh)
            if not hasattr(self, "_nav_cache"):
                self._nav_cache = {}
            self._nav_cache[key] = res
            return res

        heap = [(0.0, sa, ha)]
        seen: dict[tuple[int, int, int], float] = {}
        while heap:
            d, (ix, iz), h = heapq.heappop(heap)
            if d > max_dist:
                return float("inf")
            if (ix, iz) == sb and abs(h - hb) <= q:
                return d
            key = (ix, iz, round(h / q))
            if seen.get(key, np.inf) < d - 1e-12:
                continue
            for dx, dz in (
                (1, 0), (-1, 0), (0, 1), (0, -1),
                (1, 1), (1, -1), (-1, 1), (-1, -1),
            ):
                nxi, nzi = ix + dx, iz + dz
                ok, hh = walkable(nxi, nzi, h)
                if not ok:
                    continue
                if dx and dz:  # diagonal: both orthogonal cells must pass
                    if not walkable(ix + dx, iz, h)[0]:
                        continue
                    if not walkable(ix, iz + dz, h)[0]:
                        continue
                nd = d + self.cell * (_SQRT2 if dx and dz else 1.0)
                nk = (nxi, nzi, round(hh / q))
                if nd < seen.get(nk, np.inf) - 1e-12:
                    seen[nk] = nd
                    heapq.heappush(heap, (nd, (nxi, nzi), hh))
        return float("inf")


def _sample_triangles(
    verts: np.ndarray, faces: np.ndarray, spacing: float, cos_slope: float
) -> tuple[np.ndarray, np.ndarray]:
    """Supersample every triangle at ~`spacing` with a barycentric lattice;
    returns (samples [M, 3], up_mask [M]). Faces are processed in groups of
    equal subdivision count so the lattice expansion is one einsum per group."""
    tri = verts[faces]  # [F, 3, 3]
    e1 = tri[:, 1] - tri[:, 0]
    e2 = tri[:, 2] - tri[:, 0]
    nrm = np.cross(e1, e2)
    nlen = np.linalg.norm(nrm, axis=1)
    up = np.zeros(len(faces), bool)
    ok = nlen > 1e-12
    up[ok] = np.abs(nrm[ok, 1] / nlen[ok]) >= cos_slope
    longest = np.maximum(
        np.linalg.norm(e1, axis=1),
        np.maximum(np.linalg.norm(e2, axis=1), np.linalg.norm(tri[:, 2] - tri[:, 1], axis=1)),
    )
    m = np.clip(np.ceil(longest / spacing).astype(np.int64), 1, 96)
    out_pts, out_up = [], []
    for mv in np.unique(m):
        sel = m == mv
        # barycentric lattice including edges/vertices: (i/m, j/m), i+j <= m
        ij = [
            (i / mv, j / mv)
            for i in range(mv + 1)
            for j in range(mv + 1 - i)
        ]
        uv = np.array(ij)  # [S, 2]
        pts = (
            tri[sel, None, 0]
            + uv[None, :, 0, None] * e1[sel, None]
            + uv[None, :, 1, None] * e2[sel, None]
        )  # [f, S, 3]
        out_pts.append(pts.reshape(-1, 3))
        out_up.append(np.repeat(up[sel], len(uv)))
    return np.concatenate(out_pts), np.concatenate(out_up)


# ------------------------------------------------------------ graph building
def generate_graph(
    points: np.ndarray,
    grid: MeshNavGrid,
    edge_max: float = 0.51,
    geo_max: float = 0.8,
):
    """The reference's generate_graph with MeshNavGrid standing in for the
    habitat PathFinder (generate_replica_metadata.py:105-130): nodes are the
    navigable candidate points (original indices preserved); an edge joins
    points 0.1 < euclid < edge_max apart whose walkable geodesic < geo_max.
    MP3D uses edge_max=1.01, geo_max=1.3
    (generate_matterport3d_metadata.py:96-102)."""
    import networkx as nx
    from scipy.spatial import cKDTree

    points = np.asarray(points, np.float64)
    nav = [i for i in range(len(points)) if grid.is_navigable(points[i])]
    g = nx.Graph()
    for i in nav:
        g.add_node(i, point=tuple(float(v) for v in points[i]))
    if not nav:
        return g
    tree = cKDTree(points[nav])
    for a, b in tree.query_pairs(edge_max):
        ia, ib = nav[a], nav[b]
        d = float(np.linalg.norm(points[ia] - points[ib]))
        if d <= 0.1:
            continue
        if grid.geodesic(points[ia], points[ib], max_dist=geo_max) < geo_max:
            g.add_edge(ia, ib)
    return g


def trim_small_components(graph, min_nodes: int = 10):
    """MP3D adjust_graph: drop connected components with < min_nodes nodes
    (generate_matterport3d_metadata.py:20-30). Mutates and returns graph."""
    import networkx as nx

    drop: list[int] = []
    for comp in nx.connected_components(graph):
        if len(comp) < min_nodes:
            drop.extend(comp)
    graph.remove_nodes_from(drop)
    return graph


def candidate_points(grid: MeshNavGrid, grid_size: float = 0.5) -> np.ndarray:
    """Candidate node lattice: a grid_size-spaced (x, z) lattice snapped to
    every distinct floor surface in each cell (the role of the reference's
    pre-existing points.txt, which generate_graph filters to the navigable
    subset)."""
    pts: list[tuple[float, float, float]] = []
    x0 = float(np.ceil(grid.origin[0] / grid_size) * grid_size)
    z0 = float(np.ceil(grid.origin[1] / grid_size) * grid_size)
    xmax = grid.origin[0] + grid.nx * grid.cell
    zmax = grid.origin[1] + grid.nz * grid.cell
    x = x0
    while x < xmax:
        z = z0
        while z < zmax:
            ix, iz = grid._cell(x, z)
            for h in grid.floor_heights(ix, iz):
                pts.append((x, h, z))
            z += grid_size
        x += grid_size
    return np.array(pts, np.float64).reshape(-1, 3)


def generate_scene_metadata(
    mesh_path: str,
    out_dir: str,
    grid_size: float = 0.5,
    edge_max: float = 0.51,
    geo_max: float = 0.8,
    min_component: int = 10,
    cell: float = 0.1,
    points: np.ndarray | None = None,
    **grid_kwargs,
):
    """End-to-end: mesh -> nav grid -> candidate points -> graph -> the
    reference's on-disk metadata (points.txt with ALL candidates, graph.pkl
    with the navigable subset keeping original point indices — exactly the
    shape load_metadata consumes, soundspaces/utils.py:15-39). Returns
    (points, networkx graph)."""
    verts, faces = load_mesh(mesh_path)
    grid = MeshNavGrid.build(verts, faces, cell=cell, **grid_kwargs)
    if points is None:
        points = candidate_points(grid, grid_size)
    g = generate_graph(points, grid, edge_max, geo_max)
    trim_small_components(g, min_component)
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "points.txt"), "w") as f:
        for i, p in enumerate(points):
            f.write(f"{i}\t{p[0]:.6f}\t{p[1]:.6f}\t{p[2]:.6f}\n")
    with open(os.path.join(out_dir, "graph.pkl"), "wb") as f:
        pickle.dump(g, f)
    return points, g


# ---------------------------------------------------------- test-world meshes
def floorplan_to_mesh(
    walkable: np.ndarray,  # [depth, width] bool — True = open floor
    cell: float = 0.5,
    wall_height: float = 2.5,
) -> tuple[np.ndarray, np.ndarray]:
    """Extrude a boolean floorplan into a triangle mesh: one floor quad per
    WALKABLE cell (y=0, at (x, z) = (i*cell, j*cell) cell centers matching
    scene.floorplan conventions) and a box per wall cell. Like a real scan,
    there is no floor surface inside walls (the scanner never sees it) — so
    wall interiors offer no support and are non-navigable. Used to exercise
    the mesh pipeline against floorplan ground truth and to export generated
    scenes as meshes."""
    walkable = np.asarray(walkable, bool)
    depth, width = walkable.shape
    verts: list[tuple[float, float, float]] = []
    faces: list[tuple[int, int, int]] = []

    def quad(a, b, c, d):
        base = len(verts)
        verts.extend([a, b, c, d])
        faces.append((base, base + 1, base + 2))
        faces.append((base, base + 2, base + 3))

    # node (i, j) in the floorplan graph sits at x = i*cell, z = j*cell
    # (scene/floorplan.py::floorplan_graph); each cell spans +-cell/2.
    for j in range(depth):
        for i in range(width):
            x0, x1 = (i - 0.5) * cell, (i + 0.5) * cell
            z0, z1 = (j - 0.5) * cell, (j + 0.5) * cell
            if walkable[j, i]:
                quad(
                    (x0, 0.0, z0), (x1, 0.0, z0), (x1, 0.0, z1), (x0, 0.0, z1)
                )
            else:
                h = wall_height
                quad((x0, h, z0), (x1, h, z0), (x1, h, z1), (x0, h, z1))
                quad((x0, 0, z0), (x1, 0, z0), (x1, h, z0), (x0, h, z0))
                quad((x0, 0, z1), (x1, 0, z1), (x1, h, z1), (x0, h, z1))
                quad((x0, 0, z0), (x0, 0, z1), (x0, h, z1), (x0, h, z0))
                quad((x1, 0, z0), (x1, 0, z1), (x1, h, z1), (x1, h, z0))
    return np.array(verts, np.float32), np.array(faces, np.int64)
