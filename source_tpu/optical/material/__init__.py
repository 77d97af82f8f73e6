from .base import (
    Material, NullSurface, NullVolume, NullMaterial, AbsorbingSurface,
)
from .lambert import Lambert
from .conductor import Conductor, RoughConductor
from .dielectric import Sellmeier, Dielectric
from .emitter import (
    UniformSurfaceEmitter, UnitySurfaceEmitter, AnisotropicSurfaceEmitter,
    Checkerboard, HomogeneousVolumeEmitter, UniformVolumeEmitter,
    UnityVolumeEmitter,
)

__all__ = [
    "Material", "NullSurface", "NullVolume", "NullMaterial",
    "AbsorbingSurface", "Lambert", "Conductor", "RoughConductor",
    "Sellmeier", "Dielectric", "UniformSurfaceEmitter",
    "UnitySurfaceEmitter", "AnisotropicSurfaceEmitter", "Checkerboard",
    "HomogeneousVolumeEmitter", "UniformVolumeEmitter", "UnityVolumeEmitter",
]
