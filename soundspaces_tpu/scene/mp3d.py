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

# task category -> mpcat40 id (the MPCAT40Index / SemanticObjectSensor
# mapping, soundspaces/tasks/nav.py:539-560,614-637)
CATEGORY_TO_MPCAT40 = {
    "chair": 3, "table": 5, "picture": 6, "cabinet": 7, "cushion": 8,
    "sofa": 10, "bed": 11, "chest_of_drawers": 13, "plant": 14, "sink": 15,
    "toilet": 18, "stool": 19, "towel": 20, "tv_monitor": 22, "shower": 23,
    "bathtub": 25, "counter": 26, "fireplace": 27, "gym_equipment": 33,
    "seating": 34, "clothes": 38,
}

# [21] task id -> mpcat40 id, ordered by CATEGORY_INDEX_MAPPING
TASK_ID_TO_MPCAT40 = np.array(
    [CATEGORY_TO_MPCAT40[name] for name in CATEGORY_INDEX_MAPPING],
    np.int32,
)

NUM_TASK_CATEGORIES = len(CATEGORY_INDEX_MAPPING)


def mpcat40_to_task_id_table(size: int = 200) -> np.ndarray:
    """[size] mpcat40 id -> task id; unknown classes map to the extra
    category NUM_TASK_CATEGORIES (nav.py:641-651)."""
    table = np.full(size, NUM_TASK_CATEGORIES, np.int64)
    for name, task_id in CATEGORY_INDEX_MAPPING.items():
        table[CATEGORY_TO_MPCAT40[name]] = task_id
    return table.astype(np.int32)


def semantic_palette(num: int = NUM_TASK_CATEGORIES + 1) -> np.ndarray:
    """[num, 3] uint8 distinct colors for task-id maps (the reference
    colorizes with d3 40-colors, nav.py:696; any fixed palette serves)."""
    hues = (np.arange(num) * 0.61803398875) % 1.0  # golden-ratio spacing
    h6 = hues * 6.0
    x = 1.0 - np.abs(h6 % 2 - 1.0)
    zeros = np.zeros_like(x)
    sector = h6.astype(np.int64) % 6
    rgb_by_sector = np.stack([
        np.stack([np.ones_like(x), x, zeros], -1),
        np.stack([x, np.ones_like(x), zeros], -1),
        np.stack([zeros, np.ones_like(x), x], -1),
        np.stack([zeros, x, np.ones_like(x)], -1),
        np.stack([x, zeros, np.ones_like(x)], -1),
        np.stack([np.ones_like(x), zeros, x], -1),
    ])
    rgb = rgb_by_sector[sector, np.arange(num)]
    rgb = 0.25 + 0.75 * rgb  # keep colors bright
    return (rgb * 255).astype(np.uint8)


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
    leading token (`O` = object, `C` = category, `R` = region). Column
    layout per the format doc quoted in mp3d_utils.py:86-112:
    `C category_index category_mapping_index category_mapping_name
    mpcat40_index mpcat40_name 0...` and
    `O object_index region_index category_index px py pz a0x a0y a0z
    a1x a1y a1z r0 r1 r2 0...` (radii at tokens 13:16)."""

    def __init__(self, path: str):
        self.objects: list[HouseObject] = []
        self.categories: dict[int, str] = {}
        self.category_to_mpcat40: dict[int, int] = {}
        with open(path) as f:
            for line in f:
                parts = line.split()
                if not parts:
                    continue
                if parts[0] == "C" and len(parts) >= 6:
                    self.categories[int(parts[1])] = parts[3]
                    self.category_to_mpcat40[int(parts[1])] = int(parts[4])
                elif parts[0] == "O" and len(parts) >= 16:
                    self.objects.append(
                        HouseObject(
                            index=int(parts[1]),
                            region=int(parts[2]),
                            category=int(parts[3]),
                            position=np.array(parts[4:7], np.float32),
                            bbox_radius=np.array(parts[13:16], np.float32),
                        )
                    )

    def compute_object_to_category_index_mapping(self) -> dict[int, int]:
        return {o.index: o.category for o in self.objects}

    def instance_to_mpcat40_table(self) -> np.ndarray:
        """[max_object_index + 2] raster instance id -> mpcat40 id, where
        instance id = object index + 1 and 0 = background/void (the
        SemanticObjectSensor's object->category remap, nav.py:675-681)."""
        size = max((o.index for o in self.objects), default=0) + 2
        table = np.zeros(size, np.int32)
        for o in self.objects:
            table[o.index + 1] = self.category_to_mpcat40.get(o.category, 0)
        return table

    def objects_in_category(self, category: int) -> list[HouseObject]:
        return [o for o in self.objects if o.category == category]

    def nearest_object(self, position) -> HouseObject | None:
        if not self.objects:
            return None
        pos = np.asarray(position, np.float32)
        d = [float(np.linalg.norm(o.position - pos)) for o in self.objects]
        return self.objects[int(np.argmin(d))]
