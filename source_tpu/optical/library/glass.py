"""Schott glass catalog.

TPU-native counterpart of raysect/optical/library/glass/schott.py:51-94.
``schott(name)`` returns a Dielectric built from the glass's Sellmeier
dispersion coefficients and internal transmission curve.

The catalog here is a curated subset of the published Schott 2000 optical
glass datasheets (public manufacturer data) covering the glasses used by
the reference demos and common lens-design work. Transmission curves are
abridged few-point approximations of the datasheet internal transmittance
(25 mm reference thickness, converted to per-metre).
"""

from __future__ import annotations

import numpy as np

from ..material.dielectric import Dielectric, Sellmeier
from ..spectrum import ConstantSF, InterpolatedSF

__all__ = ["schott", "schott_catalog"]

# name: (B1, B2, B3, C1, C2, C3) — Sellmeier2 coefficients, lambda in um
_SELLMEIER = {
    "N-BK7": (1.03961212, 0.231792344, 1.01046945,
              0.00600069867, 0.0200179144, 103.560653),
    "BK7": (1.03961212, 0.231792344, 1.01046945,
            0.00600069867, 0.0200179144, 103.560653),
    "F2": (1.34533359, 0.209073176, 0.937357162,
           0.00997743871, 0.0470450767, 111.886764),
    "SF5": (1.52481889, 0.187085527, 1.42729015,
            0.011254756, 0.0588995392, 129.141675),
    "N-SF5": (1.52481889, 0.187085527, 1.42729015,
              0.011254756, 0.0588995392, 129.141675),
    "SF10": (1.62153902, 0.256287842, 1.64447552,
             0.0122241457, 0.0595736775, 147.468793),
    "N-SF10": (1.62153902, 0.256287842, 1.64447552,
               0.0122241457, 0.0595736775, 147.468793),
    "SF11": (1.73759695, 0.313747346, 1.89878101,
             0.013188707, 0.0623068142, 155.23629),
    "N-SF11": (1.73759695, 0.313747346, 1.89878101,
               0.013188707, 0.0623068142, 155.23629),
    "N-BAF10": (1.5851495, 0.143559385, 1.08521269,
                0.00926681282, 0.0424489805, 105.613573),
    "N-BAK4": (1.28834642, 0.132817724, 0.945395373,
               0.00779980626, 0.0315631177, 105.965875),
    "N-FK51A": (0.971247817, 0.216901417, 0.904651666,
                0.00472301995, 0.0153575612, 168.68133),
    "N-LAK22": (1.14229781, 0.535138441, 1.04088385,
                0.00585778594, 0.0198546147, 100.834017),
    "N-SK11": (1.17963631, 0.229817295, 0.935789652,
               0.00680282081, 0.0219737205, 101.513232),
    "N-SSK8": (1.44857867, 0.117965926, 1.06937528,
               0.00869310149, 0.0421566593, 111.300666),
    "LF5": (1.28035628, 0.163505973, 0.893930112,
            0.00929854416, 0.0449135769, 110.493685),
    "K10": (1.15687082, 0.0642625444, 0.872376139,
            0.0080942425, 0.0386051284, 104.74773),
    "F4": (1.33905825, 0.205224318, 0.897859758,
           0.0099222011, 0.0470000918, 107.93675),
    "F5": (1.3104463, 0.19603426, 0.96612977,
           0.0095863305, 0.0457627627, 115.011883),
}

# few-point internal transmittance over the visible band (per 25 mm),
# abridged from the datasheets: (wavelengths nm, tau_25mm)
_TRANSMISSION = {
    "default": ([370, 400, 450, 500, 600, 700, 800],
                [0.90, 0.985, 0.995, 0.997, 0.998, 0.998, 0.998]),
    "SF11": ([400, 420, 450, 500, 600, 700, 800],
             [0.78, 0.92, 0.975, 0.993, 0.997, 0.998, 0.998]),
    "SF10": ([400, 420, 450, 500, 600, 700, 800],
             [0.83, 0.94, 0.98, 0.994, 0.997, 0.998, 0.998]),
    "F2": ([380, 400, 450, 500, 600, 700, 800],
           [0.963, 0.984, 0.995, 0.996, 0.997, 0.998, 0.998]),
}


def schott_catalog():
    """Available glass names."""
    return sorted(_SELLMEIER.keys())


def schott(name):
    """Build a Dielectric for the named Schott glass (schott.py:51-94).

    :param str name: Glass name, e.g. "N-BK7".
    """
    key = name.upper()
    if key not in _SELLMEIER:
        raise ValueError(
            f"Unknown Schott glass '{name}'. Available: {', '.join(schott_catalog())}"
        )
    b1, b2, b3, c1, c2, c3 = _SELLMEIER[key]
    w, tau25 = _TRANSMISSION.get(key.replace("N-", ""), _TRANSMISSION["default"])
    # convert 25 mm internal transmittance to per-metre: tau_m = tau_25mm^(1/0.025)
    tau_m = np.asarray(tau25, dtype=np.float64) ** (1.0 / 0.025)
    transmission = InterpolatedSF(w, tau_m)
    return Dielectric(Sellmeier(b1, b2, b3, c1, c2, c3), transmission)
