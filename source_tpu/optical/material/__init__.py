from .base import (
    Material, NullSurface, NullVolume, NullMaterial, AbsorbingSurface,
)
from .lambert import Lambert
from .emitter import (
    UniformSurfaceEmitter, UnitySurfaceEmitter, AnisotropicSurfaceEmitter,
    Checkerboard, HomogeneousVolumeEmitter, UniformVolumeEmitter,
    UnityVolumeEmitter,
)

__all__ = [
    "Material", "NullSurface", "NullVolume", "NullMaterial",
    "AbsorbingSurface", "Lambert", "UniformSurfaceEmitter",
    "UnitySurfaceEmitter", "AnisotropicSurfaceEmitter", "Checkerboard",
    "HomogeneousVolumeEmitter", "UniformVolumeEmitter", "UnityVolumeEmitter",
]
