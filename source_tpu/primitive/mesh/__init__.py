"""Triangle meshes: geometry, BVH, primitive node, file IO."""

from .data import MeshData
from .mesh import Mesh
from .io import (
    export_obj, export_ply, export_stl, export_vtk,
    import_obj, import_ply, import_stl, import_vtk,
)

__all__ = [
    "Mesh", "MeshData",
    "import_obj", "export_obj", "import_stl", "export_stl",
    "import_ply", "export_ply", "import_vtk", "export_vtk",
]
