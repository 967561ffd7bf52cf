"""Scene: the four meshes + environment map + global material.

Mirrors /root/reference/src/scene.h:44-71 and adds the config-driven loading
path the reference apps duplicate in viewer.cu:102-141 / evaluate.cu:146-218
(mesh loading with UV-sphere fallback, material overrides that preserve
texture flags, environment setup).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..config import RendererConfig
from .envmap import EnvironmentMap
from .materials import Material, MaterialParam, MaterialParamVec3
from .mesh import Mesh
from .mesh_loader import generate_uv_sphere, load_mesh_labeled


@dataclass
class Scene:
    original_mesh: Mesh = field(default_factory=Mesh)
    inner_shell: Mesh = field(default_factory=Mesh)
    outer_shell: Mesh = field(default_factory=Mesh)
    additional_mesh: Mesh = field(default_factory=Mesh)
    environment: EnvironmentMap = field(default_factory=EnvironmentMap)
    global_material: Material = field(default_factory=Material.default)

    @staticmethod
    def from_config(config: RendererConfig, sphere_fallback: bool = True) -> "Scene":
        """Load all scene assets described by a RendererConfig.

        Follows evaluate.cu:146-218: original/additional meshes use nearest
        texture filtering, shells don't; the config material overrides the
        global material entirely and overrides only the non-texture params on
        per-mesh materials (evaluate.cu:181-209, viewer.cu:144-172). Viewer's
        UV-sphere fallback (viewer.cu:115-117) applies when enabled and the
        original mesh fails to load.
        """
        scene = Scene()

        mesh = load_mesh_labeled(config.original_mesh.path, "original",
                                 normalize=False, nearest_tex=True,
                                 scale=config.original_mesh.scale)
        if mesh is None and sphere_fallback:
            mesh = generate_uv_sphere(32, 64, 1.0)
        if mesh is not None:
            scene.original_mesh = mesh

        inner = load_mesh_labeled(config.inner_shell.path, "inner shell",
                                  normalize=False, nearest_tex=False,
                                  scale=config.inner_shell.scale)
        if inner is not None:
            scene.inner_shell = inner

        outer = load_mesh_labeled(config.outer_shell.path, "outer shell",
                                  normalize=False, nearest_tex=False,
                                  scale=config.outer_shell.scale)
        if outer is not None:
            scene.outer_shell = outer

        if config.additional_mesh.path:
            extra = load_mesh_labeled(config.additional_mesh.path, "additional mesh",
                                      normalize=False, nearest_tex=True,
                                      scale=config.additional_mesh.scale)
            if extra is not None:
                scene.additional_mesh = extra

        scene.apply_material_config(config)

        if config.environment.hdri_path:
            try:
                scene.environment.load_from_file(config.environment.hdri_path)
            except Exception as e:
                import sys
                print(f"Failed to load HDRI '{config.environment.hdri_path}': {e}",
                      file=sys.stderr)
        scene.environment.set_rotation(config.environment.rotation)
        scene.environment.set_strength(config.environment.strength)
        return scene

    def apply_material_config(self, config: RendererConfig):
        mc = config.material

        def apply_full(mat: Material):
            mat.base_color = MaterialParamVec3.constant(mc.base_color)
            apply_params_only(mat)

        def apply_params_only(mat: Material):
            # Preserve base_color textures on per-mesh materials
            # (evaluate.cu:194-204).
            mat.roughness = MaterialParam.constant(mc.roughness)
            mat.metallic = MaterialParam.constant(mc.metallic)
            mat.specular = MaterialParam.constant(mc.specular)
            mat.specular_tint = MaterialParam.constant(mc.specular_tint)
            mat.anisotropy = MaterialParam.constant(mc.anisotropy)
            mat.sheen = MaterialParam.constant(mc.sheen)
            mat.sheen_tint = MaterialParam.constant(mc.sheen_tint)
            mat.clearcoat = MaterialParam.constant(mc.clearcoat)
            mat.clearcoat_gloss = MaterialParam.constant(mc.clearcoat_gloss)

        apply_full(self.global_material)
        for mesh in (self.original_mesh, self.inner_shell, self.outer_shell,
                     self.additional_mesh):
            for mat in mesh.materials:
                apply_params_only(mat)
