"""Mesh container: host-side buffers + device-ready SoA arrays.

Host `Mesh` mirrors the reference container (/root/reference/src/mesh.h:80-185):
indexed geometry, optional per-vertex normals/uvs, per-primitive material
ranges, textures, and a `build_bvh()` that reorders triangles into BVH leaf
order. The CUDA `uploadToDevice()/deviceView()` pointer-packing
(mesh.cu:91-261) is replaced by `to_arrays()`, which emits a `MeshArrays`
pytree of jnp arrays (SoA in HBM) that jitted pipelines close over.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field

import numpy as np

import jax
import jax.numpy as jnp

from .bvh import BvhArrays, build_bvh, remap_material_ranges
from .materials import Material, MaterialTable


@jax.tree_util.register_dataclass
@dataclass
class MeshArrays:
    """Device-side mesh: geometry + BVH + material tables as flat arrays.

    All per-element arrays are CHANNEL-MAJOR ([3, V] not [V, 3]): TPU tiling
    pads the minor dimension to 128 lanes, so the big element axis must be
    minor (see ops/linalg.py). Gathers then produce dense [3, N] results.

    The static metadata (flags, counts) is jit-compile-time constant so XLA
    specializes each mesh's trace code; the arrays live in HBM.
    """
    # Geometry
    vertices: jnp.ndarray      # [3, V] f32
    normals: jnp.ndarray       # [3, V] f32 (zeros when has_normals=False)
    uvs: jnp.ndarray           # [2, V] f32 (zeros when has_uvs=False)
    indices: jnp.ndarray       # [3, T] i32
    tri_material: jnp.ndarray  # [T] i32, -1 = use global material
    # BVH (flat binary nodes, reference BvhNode layout, bvh_data.h:5-13)
    bvh_bounds_min: jnp.ndarray  # [3, N] f32
    bvh_bounds_max: jnp.ndarray  # [3, N] f32
    bvh_left: jnp.ndarray        # [N] i32
    bvh_right: jnp.ndarray       # [N] i32
    bvh_first: jnp.ndarray       # [N] i32
    bvh_count: jnp.ndarray       # [N] i32
    bvh_is_leaf: jnp.ndarray     # [N] i32
    # Threaded-DFS skip links: next node when the current subtree is done.
    # This replaces the reference's 256-deep per-thread traversal stack
    # (mesh_traversal.cuh:137-139) with a stackless scheme — uniform control
    # flow and no per-lane scatter, which is what the TPU VPU wants.
    bvh_skip: jnp.ndarray        # [N] i32 (-1 terminates traversal)
    # Gather-packed mirrors: XLA TPU gathers pay a large per-call/per-index
    # cost, so the traversal fetches ONE packed row per node / per triangle
    # instead of 7+ separate takes.
    # nodes_packed rows: 0-2 bmin, 3-5 bmax, 6 left, 7 skip, 8 first,
    # 9 count, 10 is_leaf (int rows bitcast to f32).
    nodes_packed: jnp.ndarray    # [11, N] f32
    # tris_packed rows: 0-2 v0, 3-5 e1(=v1-v0), 6-8 e2(=v2-v0).
    tris_packed: jnp.ndarray     # [9, T] f32
    # Two-level dense tracing (ops/trace_cluster.py): AABBs of consecutive
    # CLUSTER_SIZE-triangle chunks of the BVH-leaf-ordered triangle array
    # (leaf order makes chunks spatially tight). Rows 0-2 min, 3-5 max;
    # empty padding clusters carry an inverted box. This is the TPU
    # replacement for the role of OptiX GAS on large meshes
    # (/root/reference/src/mesh.cu:297-357).
    cluster_bounds: jnp.ndarray  # [6, C] f32, C = ceil(T / CLUSTER_SIZE)
    # Materials (transposed: scalar/slot axis major, material axis minor)
    mat_scalars: jnp.ndarray   # [NUM_SCALARS, M] f32
    mat_tex_ids: jnp.ndarray   # [NUM_TEX_SLOTS, M] i32
    mat_tex_chans: jnp.ndarray  # [NUM_TEX_SLOTS, M] i32
    atlas: jnp.ndarray         # [3, P] f32
    tex_offset: jnp.ndarray    # [Ntex] i32
    tex_width: jnp.ndarray     # [Ntex] i32
    tex_height: jnp.ndarray    # [Ntex] i32
    # Static metadata
    has_normals: bool = dataclasses.field(metadata=dict(static=True), default=False)
    has_uvs: bool = dataclasses.field(metadata=dict(static=True), default=False)
    has_materials: bool = dataclasses.field(metadata=dict(static=True), default=False)
    has_textures: bool = dataclasses.field(metadata=dict(static=True), default=False)
    texture_nearest: bool = dataclasses.field(metadata=dict(static=True), default=False)
    is_empty: bool = dataclasses.field(metadata=dict(static=True), default=False)
    max_depth: int = dataclasses.field(metadata=dict(static=True), default=0)
    max_leaf: int = dataclasses.field(metadata=dict(static=True), default=4)
    has_normal_maps: bool = dataclasses.field(metadata=dict(static=True), default=False)

    @property
    def num_triangles(self) -> int:
        return int(self.indices.shape[1])

    @property
    def num_nodes(self) -> int:
        return int(self.bvh_left.shape[0])


class Mesh:
    """Host-side mesh with CPU buffers and dirty-flag BVH build."""

    def __init__(self):
        self.vertices = np.zeros((0, 3), dtype=np.float32)
        self.normals = np.zeros((0, 3), dtype=np.float32)
        self.texcoords = np.zeros((0, 2), dtype=np.float32)
        self.indices = np.zeros((0, 3), dtype=np.uint32)
        self.materials: list[Material] = []
        self.material_map = np.zeros(0, dtype=np.uint32)   # first tri per primitive
        self.material_ids = np.zeros(0, dtype=np.int32)    # material per primitive
        self.has_mesh_materials = False
        self.textures: list[np.ndarray] = []
        self.texture_nearest = False
        # BVH cache
        self._bvh: BvhArrays | None = None
        self._tri_material: np.ndarray | None = None
        self._bvh_dirty = True
        self._bounds: tuple[np.ndarray, np.ndarray] | None = None

    # -- stats ---------------------------------------------------------------
    @property
    def num_triangles(self) -> int:
        return int(self.indices.shape[0])

    @property
    def num_vertices(self) -> int:
        return int(self.vertices.shape[0])

    @property
    def has_normals(self) -> bool:
        return self.normals.shape[0] > 0

    @property
    def has_texcoords(self) -> bool:
        return self.texcoords.shape[0] > 0

    def mark_dirty(self):
        self._bvh_dirty = True
        self._bounds = None

    # -- transforms (ref: mesh_loader.cpp:56-82) ------------------------------
    def normalize(self):
        """Center at origin and scale so max extent = 10 (normalizeMesh)."""
        if self.num_vertices == 0:
            return
        vmin = self.vertices.min(axis=0)
        vmax = self.vertices.max(axis=0)
        extent = float((vmax - vmin).max())
        if extent <= 0.0:
            return
        center = 0.5 * (vmin + vmax)
        self.vertices = ((self.vertices - center) * (2.0 / extent * 5.0)).astype(np.float32)
        self.mark_dirty()

    def scale(self, s: float):
        if s == 1.0:
            return
        self.vertices = (self.vertices * np.float32(s)).astype(np.float32)
        self.mark_dirty()

    # -- bounds ---------------------------------------------------------------
    def bounds(self) -> tuple[np.ndarray, np.ndarray]:
        if self._bounds is None:
            if self.num_vertices == 0:
                z = np.zeros(3, dtype=np.float32)
                self._bounds = (z, z)
            else:
                self._bounds = (
                    self.vertices.min(axis=0).astype(np.float32),
                    self.vertices.max(axis=0).astype(np.float32),
                )
        return self._bounds

    # -- BVH ------------------------------------------------------------------
    def build_bvh(self, max_leaf_size: int = 4) -> BvhArrays:
        """Build (or return cached) SAH BVH; reorders self.indices to leaf
        order and remaps material ranges (ref: mesh_bvh.cpp:27-162)."""
        if not self._bvh_dirty and self._bvh is not None:
            return self._bvh
        t = self.num_triangles
        if t == 0:
            self._bvh = BvhArrays(
                bounds_min=np.zeros((1, 3), np.float32),
                bounds_max=np.zeros((1, 3), np.float32),
                left=np.full(1, -1, np.int32), right=np.full(1, -1, np.int32),
                first=np.zeros(1, np.int32), count=np.zeros(1, np.int32),
                is_leaf=np.ones(1, np.int32))
            self._tri_material = np.zeros(0, np.int32)
            self._bvh_dirty = False
            return self._bvh

        tri = self.vertices[self.indices.astype(np.int64)]  # [T, 3, 3]
        tri_min = tri.min(axis=1)
        tri_max = tri.max(axis=1)
        bvh, perm = build_bvh(tri_min, tri_max, max_leaf_size=max_leaf_size)
        self.indices = self.indices[perm]
        mmap, mids, per_tri = remap_material_ranges(
            self.material_map, self.material_ids, perm, t)
        self.material_map = mmap.astype(np.uint32)
        self.material_ids = mids.astype(np.int32)
        self._tri_material = per_tri
        self._bvh = bvh
        self._bvh_dirty = False
        return bvh

    def tri_material(self) -> np.ndarray:
        if self._tri_material is None or self._bvh_dirty:
            self.build_bvh()
        return self._tri_material

    # -- device export ---------------------------------------------------------
    def to_arrays(self, dtype=jnp.float32) -> MeshArrays:
        bvh = self.build_bvh()
        is_empty = self.num_triangles == 0
        v = max(1, self.num_vertices)
        t = max(1, self.num_triangles)
        vertices = np.zeros((v, 3), np.float32)
        vertices[:self.num_vertices] = self.vertices
        normals = np.zeros((v, 3), np.float32)
        if self.has_normals:
            normals[:self.normals.shape[0]] = self.normals
        uvs = np.zeros((v, 2), np.float32)
        if self.has_texcoords:
            uvs[:self.texcoords.shape[0]] = self.texcoords
        indices = np.zeros((t, 3), np.int32)
        indices[:self.num_triangles] = self.indices.astype(np.int32)
        tri_material = np.full(t, -1, np.int32)
        tm = self.tri_material()
        tri_material[:tm.shape[0]] = tm

        table = MaterialTable.build(self.materials, self.textures,
                                    texture_nearest=self.texture_nearest)
        skip = _compute_skip_links(bvh)
        has_normal_maps = (len(self.textures) > 0 and
                           any(m.normal.textured for m in self.materials))

        nn = bvh.bounds_min.shape[0]
        nodes_packed = np.zeros((11, nn), np.float32)
        nodes_packed[0:3] = bvh.bounds_min.T
        nodes_packed[3:6] = bvh.bounds_max.T
        nodes_packed[6] = bvh.left.astype(np.int32).view(np.float32)
        nodes_packed[7] = skip.astype(np.int32).view(np.float32)
        nodes_packed[8] = bvh.first.astype(np.int32).view(np.float32)
        nodes_packed[9] = bvh.count.astype(np.int32).view(np.float32)
        nodes_packed[10] = bvh.is_leaf.astype(np.int32).view(np.float32)

        tri = vertices[indices.astype(np.int64)]  # [T, 3, 3]
        tris_packed = np.zeros((9, t), np.float32)
        tris_packed[0:3] = tri[:, 0].T
        tris_packed[3:6] = (tri[:, 1] - tri[:, 0]).T
        tris_packed[6:9] = (tri[:, 2] - tri[:, 0]).T

        from ..ops.trace_cluster import cluster_bounds_from_packed
        cluster_bounds = cluster_bounds_from_packed(
            tris_packed, self.num_triangles)

        return MeshArrays(
            vertices=jnp.asarray(vertices.T, dtype),
            normals=jnp.asarray(normals.T, dtype),
            uvs=jnp.asarray(uvs.T, dtype),
            indices=jnp.asarray(indices.T),
            tri_material=jnp.asarray(tri_material),
            bvh_bounds_min=jnp.asarray(bvh.bounds_min.T, dtype),
            bvh_bounds_max=jnp.asarray(bvh.bounds_max.T, dtype),
            bvh_left=jnp.asarray(bvh.left),
            bvh_right=jnp.asarray(bvh.right),
            bvh_first=jnp.asarray(bvh.first),
            bvh_count=jnp.asarray(bvh.count),
            bvh_is_leaf=jnp.asarray(bvh.is_leaf),
            bvh_skip=jnp.asarray(skip),
            nodes_packed=jnp.asarray(nodes_packed),
            tris_packed=jnp.asarray(tris_packed),
            cluster_bounds=jnp.asarray(cluster_bounds),
            mat_scalars=jnp.asarray(table.scalars.T, dtype),
            mat_tex_ids=jnp.asarray(table.tex_ids.T),
            mat_tex_chans=jnp.asarray(table.tex_chans.T),
            atlas=jnp.asarray(table.atlas.T, dtype),
            tex_offset=jnp.asarray(table.tex_offset),
            tex_width=jnp.asarray(table.tex_width),
            tex_height=jnp.asarray(table.tex_height),
            has_normals=self.has_normals,
            has_uvs=self.has_texcoords,
            has_materials=self.has_mesh_materials and len(self.materials) > 0,
            has_textures=len(self.textures) > 0,
            texture_nearest=self.texture_nearest,
            is_empty=is_empty,
            max_depth=bvh.depth(),
            max_leaf=max(1, bvh.max_leaf_count()),
            has_normal_maps=has_normal_maps,
        )

    @staticmethod
    def empty() -> "Mesh":
        return Mesh()


def _compute_skip_links(bvh: BvhArrays) -> np.ndarray:
    """Skip link per node: where a DFS continues after this subtree.

    For internal node n with children (l, r): entering n descends to l;
    skip[l] = r and skip[r] = skip[n], so a leaf/missed node always jumps to
    the next unvisited subtree. skip[root] = -1 terminates.
    """
    n = bvh.num_nodes
    skip = np.full(n, -1, dtype=np.int32)
    stack = [(0, -1)]
    while stack:
        node, cont = stack.pop()
        skip[node] = cont
        if not bvh.is_leaf[node]:
            left, right = int(bvh.left[node]), int(bvh.right[node])
            stack.append((right, cont))
            stack.append((left, right))
    return skip
