from .materials import Material, MaterialParam, MaterialParamVec3, MaterialTable
from .mesh import Mesh, MeshArrays
from .mesh_loader import (
    generate_uv_sphere,
    load_gltf_with_materials,
    load_mesh_auto,
    load_mesh_from_file,
    load_mesh_labeled,
)
from .envmap import EnvironmentMap
from .scene import Scene
