"""Scene assets as device-resident tensor stores (tier 1).

The reference keeps scene structure in host objects: a networkx navigation
graph per scene (soundspaces/utils.py:15-39), per-pose binaural RIR wav files
on disk (soundspaces/simulator.py:614-616), and a pickle cache of rendered
frames (scripts/cache_observations.py). Here each becomes a fixed-shape array
bank living in HBM, so the whole environment step is a gather + kernel call:

- `SceneGraph`: dense node table with per-heading forward-neighbor indices and
  precomputed all-pairs geodesic hop counts (replaces networkx shortest-path
  calls at runtime, simulator.py:703-712).
- `AcousticBank`: zero-padded RIR tensor [angle, node, goal_slot, 2, L] plus
  precomputed source-segment spectra.
- `FrameBank`: cached visual observations [node, angle, H, W, C] (the
  USE_RENDERED_OBSERVATIONS=True path, simulator.py:143-150).
"""

from soundspaces_tpu.scene.graph import SceneGraph
from soundspaces_tpu.scene.banks import AcousticBank, FrameBank, SceneAssets
from soundspaces_tpu.scene.synthetic import (
    make_synthetic_assets,
    synth_rir_bank,
    synth_source_sounds,
)

__all__ = [
    "AcousticBank",
    "FrameBank",
    "SceneAssets",
    "SceneGraph",
    "make_synthetic_assets",
    "synth_rir_bank",
    "synth_source_sounds",
]
