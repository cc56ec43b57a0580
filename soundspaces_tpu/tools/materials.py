"""Acoustic material coefficient tables.

Reference: scripts/mp3d_acoustic_properties.py:12-414 hard-codes per-material
absorption/scattering/transmission coefficients per frequency band and emits
`mp3d_material_config.json` for the ray tracer. This module carries the same
structure for the native tracer (csrc/rir_tracer.cpp): 4 bands, per-category
coefficients, and a JSON writer in the reference's config shape."""

from __future__ import annotations

import json

# absorption per band (low -> high), scattering, transmission
MATERIAL_COEFFICIENTS: dict[str, dict] = {
    "default": {"absorption": [0.08, 0.10, 0.14, 0.20], "scattering": 0.3, "transmission": 0.0},
    "carpet": {"absorption": [0.06, 0.24, 0.57, 0.69], "scattering": 0.4, "transmission": 0.0},
    "concrete": {"absorption": [0.01, 0.02, 0.02, 0.05], "scattering": 0.1, "transmission": 0.0},
    "curtain": {"absorption": [0.07, 0.31, 0.55, 0.65], "scattering": 0.5, "transmission": 0.05},
    "glass": {"absorption": [0.18, 0.06, 0.03, 0.02], "scattering": 0.05, "transmission": 0.02},
    "gypsum": {"absorption": [0.29, 0.10, 0.05, 0.07], "scattering": 0.15, "transmission": 0.0},
    "wood": {"absorption": [0.15, 0.11, 0.09, 0.07], "scattering": 0.2, "transmission": 0.0},
    "fabric": {"absorption": [0.14, 0.35, 0.55, 0.70], "scattering": 0.45, "transmission": 0.0},
    "metal": {"absorption": [0.04, 0.04, 0.05, 0.05], "scattering": 0.1, "transmission": 0.0},
    "acoustic_tile": {"absorption": [0.50, 0.70, 0.85, 0.80], "scattering": 0.3, "transmission": 0.0},
}

# object-category -> material (mirrors the mpcat40-keyed table's role)
CATEGORY_TO_MATERIAL = {
    "wall": "gypsum", "floor": "wood", "ceiling": "acoustic_tile",
    "window": "glass", "door": "wood", "curtain": "curtain",
    "sofa": "fabric", "bed": "fabric", "cushion": "fabric",
    "carpet": "carpet", "mirror": "glass", "appliances": "metal",
}


def material_for_category(category: str) -> dict:
    name = CATEGORY_TO_MATERIAL.get(category, "default")
    return {"name": name, **MATERIAL_COEFFICIENTS[name]}


def write_material_config(path: str) -> None:
    """Emit the ray-tracer material config (the reference's
    mp3d_material_config.json shape: a `materials` list with per-band
    coefficient arrays)."""
    materials = []
    for name, coef in MATERIAL_COEFFICIENTS.items():
        materials.append(
            {
                "name": name,
                "absorption": coef["absorption"],
                "scattering": [coef["scattering"]] * 4,
                "transmission": [coef["transmission"]] * 4,
                "categories": [
                    c for c, m in CATEGORY_TO_MATERIAL.items() if m == name
                ],
            }
        )
    with open(path, "w") as f:
        json.dump({"materials": materials}, f, indent=2)
