"""Shared test fixtures: outward-winding spheres, shell scenes, crafted
networks."""

import numpy as np

import jax.numpy as jnp

from neural_renderer_tpu.models import nbvh
from neural_renderer_tpu.scene.mesh_loader import generate_uv_sphere


def outward_sphere(stacks=10, slices=20, radius=1.0):
    """UV sphere with outward geometric normals (the reference fixture's
    winding faces inward; see mesh_loader.cpp:752-762)."""
    mesh = generate_uv_sphere(stacks, slices, radius)
    mesh.indices = mesh.indices[:, [0, 2, 1]].copy()
    mesh.mark_dirty()
    return mesh


def two_lobe_sphere(radius: float, offset: float, stacks=10, slices=20):
    """Union of two disjoint spheres at x = ±offset — a non-convex closed
    surface with up to four crossings per ray (re-entries occur)."""
    from neural_renderer_tpu.scene.mesh import Mesh

    a = outward_sphere(stacks, slices, radius)
    b = outward_sphere(stacks, slices, radius)
    a.vertices = (a.vertices - np.array([offset, 0, 0], np.float32)).astype(np.float32)
    b.vertices = (b.vertices + np.array([offset, 0, 0], np.float32)).astype(np.float32)
    m = Mesh()
    m.vertices = np.concatenate([a.vertices, b.vertices]).astype(np.float32)
    if a.has_normals:
        m.normals = np.concatenate([a.normals, b.normals]).astype(np.float32)
    m.indices = np.concatenate(
        [a.indices, b.indices + a.num_vertices]).astype(np.uint32)
    m.mark_dirty()
    return m


def crafted_net_params(config: nbvh.NbvhConfig, presence: float,
                       distance: float = 0.0):
    """Network with zero hash grids whose output is constant:
    out[0] = presence, out[1] = distance.

    Exploits SH coefficient 0 == 0.28209479 for every direction: with zero
    grids the encoded vector is zero except the SH block, so routing that
    constant through identity hidden layers gives a controllable constant
    output despite the MLP having no biases.
    """
    import jax
    params = jax.tree_util.tree_map(
        jnp.zeros_like, nbvh.init_params(jax.random.PRNGKey(0), config))
    sh0 = 0.28209479177387814
    e = config.encoded_dims
    w = config.mlp_width
    sh_index = config.point_count * config.grid.output_dim  # first SH coeff

    w_in = np.zeros((w, e), np.float32)
    w_in[0, sh_index] = 1.0  # h0 = sh0 (positive -> LeakyReLU passthrough)
    mats = [w_in]
    for _ in range(config.mlp_hidden_layers - 1):
        mats.append(np.eye(w, dtype=np.float32))
    w_out = np.zeros((config.padded_output_dims, w), np.float32)
    w_out[0, 0] = presence / sh0
    w_out[1, 0] = distance / sh0
    mats.append(w_out)
    params["mlp"] = [jnp.asarray(m) for m in mats]
    return params
