"""Metal materials library.

TPU-native counterpart of raysect/optical/library/metal/{metal,roughmetal}.py
(18 measured metals, metal.py:57-162). Complex refractive indices n + ik
are tabulated over the visible band from the standard public optical-
constant compilations (Johnson & Christy 1972, Rakic 1998, CRC) —
abridged to visible-band resolution sufficient for spectral rendering.
"""

from __future__ import annotations

from ..material.conductor import Conductor, RoughConductor
from ..spectrum import InterpolatedSF

__all__ = [
    "Aluminium", "Beryllium", "Cobalt", "Copper", "Gold", "Iron", "Lithium",
    "Magnesium", "Manganese", "Mercury", "Nickel", "Palladium", "Platinum",
    "Silicon", "Silver", "Sodium", "Titanium", "Tungsten",
    "RoughAluminium", "RoughBeryllium", "RoughCobalt", "RoughCopper",
    "RoughGold", "RoughIron", "RoughLithium", "RoughMagnesium",
    "RoughManganese", "RoughMercury", "RoughNickel", "RoughPalladium",
    "RoughPlatinum", "RoughSilicon", "RoughSilver", "RoughSodium",
    "RoughTitanium", "RoughTungsten",
]

_W = [400, 450, 500, 550, 600, 650, 700]

# name: (n samples, k samples) at _W
_NK = {
    "aluminium": ([0.49, 0.62, 0.77, 0.96, 1.20, 1.47, 1.83],
                  [4.86, 5.47, 6.08, 6.69, 7.26, 7.79, 8.31]),
    "gold": ([1.66, 1.50, 0.97, 0.42, 0.25, 0.17, 0.16],
             [1.96, 1.88, 1.87, 2.36, 2.92, 3.15, 3.80]),
    "silver": ([0.17, 0.15, 0.13, 0.12, 0.12, 0.14, 0.14],
               [1.95, 2.47, 2.92, 3.34, 3.73, 4.15, 4.52]),
    "copper": ([1.18, 1.17, 1.12, 1.04, 0.47, 0.21, 0.21],
               [2.21, 2.36, 2.60, 2.59, 2.81, 3.67, 4.05]),
    "iron": ([2.49, 2.76, 2.95, 2.92, 2.87, 2.92, 2.95],
             [2.75, 2.96, 3.05, 3.06, 3.15, 3.22, 3.28]),
    "nickel": ([1.61, 1.71, 1.78, 1.85, 1.93, 2.02, 2.14],
               [2.44, 2.81, 3.19, 3.52, 3.82, 4.09, 4.34]),
    "titanium": ([2.08, 2.26, 2.39, 2.48, 2.54, 2.60, 2.66],
                 [2.95, 3.04, 3.12, 3.22, 3.31, 3.40, 3.50]),
    "tungsten": ([3.39, 3.32, 3.41, 3.53, 3.62, 3.64, 3.58],
                 [2.66, 2.68, 2.72, 2.73, 2.79, 2.86, 2.92]),
    "platinum": ([1.72, 1.87, 2.03, 2.18, 2.33, 2.48, 2.63],
                 [2.84, 3.06, 3.28, 3.51, 3.73, 3.95, 4.16]),
    "palladium": ([1.62, 1.70, 1.78, 1.85, 1.92, 1.99, 2.06],
                  [3.15, 3.42, 3.69, 3.95, 4.21, 4.46, 4.70]),
    "magnesium": ([0.34, 0.37, 0.40, 0.43, 0.46, 0.50, 0.54],
                  [4.10, 4.56, 5.01, 5.45, 5.88, 6.30, 6.71]),
    "beryllium": ([2.84, 3.02, 3.18, 3.30, 3.39, 3.45, 3.48],
                  [3.11, 3.12, 3.14, 3.16, 3.18, 3.20, 3.22]),
    "cobalt": ([1.84, 1.95, 2.06, 2.15, 2.23, 2.30, 2.36],
               [3.34, 3.55, 3.76, 3.95, 4.13, 4.29, 4.45]),
    "lithium": ([0.22, 0.22, 0.22, 0.22, 0.22, 0.23, 0.24],
                [2.51, 2.76, 3.00, 3.23, 3.45, 3.66, 3.87]),
    "manganese": ([2.21, 2.30, 2.38, 2.45, 2.51, 2.57, 2.62],
                  [3.33, 3.46, 3.59, 3.71, 3.82, 3.92, 4.02]),
    "mercury": ([1.05, 1.17, 1.30, 1.43, 1.56, 1.69, 1.81],
                [4.32, 4.53, 4.74, 4.94, 5.14, 5.33, 5.52]),
    "silicon": ([5.57, 4.68, 4.29, 4.08, 3.94, 3.85, 3.78],
                [0.39, 0.15, 0.07, 0.04, 0.03, 0.02, 0.01]),
    "sodium": ([0.06, 0.06, 0.06, 0.06, 0.06, 0.07, 0.08],
               [2.31, 2.55, 2.78, 3.00, 3.22, 3.43, 3.63]),
}


def _make_conductor(name):
    n, k = _NK[name]

    class _Metal(Conductor):
        __doc__ = f"Measured n/k conductor: {name} (metal.py:57-162)."

        def __init__(self):
            super().__init__(InterpolatedSF(_W, n), InterpolatedSF(_W, k))

    _Metal.__name__ = name.capitalize()
    return _Metal


def _make_rough(name):
    n, k = _NK[name]

    class _RoughMetal(RoughConductor):
        __doc__ = f"Rough measured n/k conductor: {name} (roughmetal.py)."

        def __init__(self, roughness):
            super().__init__(InterpolatedSF(_W, n), InterpolatedSF(_W, k), roughness)

    _RoughMetal.__name__ = "Rough" + name.capitalize()
    return _RoughMetal


Aluminium = _make_conductor("aluminium")
Beryllium = _make_conductor("beryllium")
Cobalt = _make_conductor("cobalt")
Copper = _make_conductor("copper")
Gold = _make_conductor("gold")
Iron = _make_conductor("iron")
Lithium = _make_conductor("lithium")
Magnesium = _make_conductor("magnesium")
Manganese = _make_conductor("manganese")
Mercury = _make_conductor("mercury")
Nickel = _make_conductor("nickel")
Palladium = _make_conductor("palladium")
Platinum = _make_conductor("platinum")
Silicon = _make_conductor("silicon")
Silver = _make_conductor("silver")
Sodium = _make_conductor("sodium")
Titanium = _make_conductor("titanium")
Tungsten = _make_conductor("tungsten")

RoughAluminium = _make_rough("aluminium")
RoughBeryllium = _make_rough("beryllium")
RoughCobalt = _make_rough("cobalt")
RoughCopper = _make_rough("copper")
RoughGold = _make_rough("gold")
RoughIron = _make_rough("iron")
RoughLithium = _make_rough("lithium")
RoughMagnesium = _make_rough("magnesium")
RoughManganese = _make_rough("manganese")
RoughMercury = _make_rough("mercury")
RoughNickel = _make_rough("nickel")
RoughPalladium = _make_rough("palladium")
RoughPlatinum = _make_rough("platinum")
RoughSilicon = _make_rough("silicon")
RoughSilver = _make_rough("silver")
RoughSodium = _make_rough("sodium")
RoughTitanium = _make_rough("titanium")
RoughTungsten = _make_rough("tungsten")
