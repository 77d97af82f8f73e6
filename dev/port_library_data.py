"""Port the public optical-constant datasets into repo data files.

The glass catalog is Schott's published 2000 optical-glass datasheet
constants (manufacturer datasheet data); the metal n/k tables are the
public-domain (CC0) refractiveindex.info compilations (Rakic 1998,
Johnson & Christy 1972, ...). The reference ships these as
glass/data/schott_catalog_2000.csv and metal/data/*.json
(raysect/optical/library/); we re-serialize them into two compact JSON
bundles under source_tpu/optical/library/data/.

Run once: python dev/port_library_data.py
"""

import csv
import json
from pathlib import Path

REF = Path("/root/reference/raysect/optical/library")
OUT = Path(__file__).resolve().parent.parent / "source_tpu/optical/library/data"

# TAUI25 measurement wavelengths (nm), matching the catalog columns
# (schott.py:43-45)
TAUI_WAVELENGTHS = [
    2500, 2325, 1970, 1530, 1060, 700, 660, 620, 580, 546, 500, 460, 436,
    420, 405, 400, 390, 380, 370, 365, 350, 334, 320, 310, 300, 290, 280,
    270, 260, 250,
]


def port_glass():
    rows = list(csv.reader(open(REF / "glass/data/schott_catalog_2000.csv")))
    header = rows[0]
    assert header[1:7] == ["B1", "B2", "B3", "C1", "C2", "C3"]
    catalog = {}
    for row in rows[1:]:
        name = row[0]
        sellmeier = [float(v) for v in row[1:7]]
        # keep only measured transmission points (reference drops empties
        # AND zeros: schott.py:80 `if data[1]`)
        tau_w, tau_v = [], []
        for w, v in zip(TAUI_WAVELENGTHS, row[7:37]):
            if v != "" and float(v) != 0.0:
                tau_w.append(w)
                tau_v.append(float(v))
        catalog[name] = {"sellmeier": sellmeier,
                         "tau25_wavelengths": tau_w, "tau25": tau_v}
    OUT.mkdir(parents=True, exist_ok=True)
    with open(OUT / "schott_2000.json", "w") as f:
        json.dump(catalog, f, separators=(",", ":"))
    print(f"glass: {len(catalog)} entries -> {OUT/'schott_2000.json'}")


def port_metals():
    bundle = {}
    for p in sorted((REF / "metal/data").glob("*.json")):
        data = json.load(open(p))
        bundle[p.stem] = {
            "wavelength": data["wavelength"],
            "index": data["index"],
            "extinction": data["extinction"],
            "reference": data.get("reference", ""),
        }
    with open(OUT / "metals_nk.json", "w") as f:
        json.dump(bundle, f, separators=(",", ":"))
    print(f"metals: {len(bundle)} entries -> {OUT/'metals_nk.json'}")


if __name__ == "__main__":
    port_glass()
    port_metals()
