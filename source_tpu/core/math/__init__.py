"""Math substrate: host vector types + device batched kernels."""

from .vector import Vector3D, Point3D, Normal3D, Vector2D, Point2D
from .affinematrix import AffineMatrix3D
from .quaternion import Quaternion
from .transform import (
    translate, rotate_x, rotate_y, rotate_z, rotate_vector, rotate,
    rotate_basis, to_cylindrical, from_cylindrical, extract_rotation,
    extract_translation,
)
from .statsarray import StatsBin, StatsArray1D, StatsArray2D, StatsArray3D
from .sampler import (
    SolidAngleSampler, SphereSampler, HemisphereUniformSampler,
    HemisphereCosineSampler, ConeUniformSampler,
    DiskSampler3D, RectangleSampler3D, TriangleSampler3D,
    TargetedHemisphereSampler, TargetedSphereSampler,
)
from .units import (
    kilometre, metre, centimetre, millimetre, micrometre, nanometre,
    mile, yard, foot, inch, mil, degree, radian, km, cm, mm, um, nm,
)
from . import batch, random, interp, polyroots

__all__ = [
    "Vector3D", "Point3D", "Normal3D", "Vector2D", "Point2D",
    "AffineMatrix3D", "Quaternion",
    "translate", "rotate_x", "rotate_y", "rotate_z", "rotate_vector",
    "rotate", "rotate_basis", "to_cylindrical", "from_cylindrical",
    "extract_rotation", "extract_translation",
    "StatsBin", "StatsArray1D", "StatsArray2D", "StatsArray3D",
    "SolidAngleSampler", "SphereSampler", "HemisphereUniformSampler",
    "HemisphereCosineSampler", "ConeUniformSampler",
    "DiskSampler3D", "RectangleSampler3D", "TriangleSampler3D",
    "TargetedHemisphereSampler", "TargetedSphereSampler",
    "kilometre", "metre", "centimetre", "millimetre", "micrometre",
    "nanometre", "mile", "yard", "foot", "inch", "mil", "degree", "radian",
    "km", "cm", "mm", "um", "nm",
    "batch", "random", "interp", "polyroots",
]
