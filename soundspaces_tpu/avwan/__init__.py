"""AV-WaN: audio-visual waypoint navigation (ICLR'21 baseline family).

The reference (ss_baselines/av_wan/) runs a hierarchical loop: the policy
picks a waypoint on a 9x9 action map; a host-side Planner maintains a
networkx navigability graph over accumulating geometric maps and emits
low-level actions until the waypoint is reached (mapnav_env.py:56-106,
models/planner.py:19-209).

TPU-native redesign:
- geometric/acoustic maps are carried env-state arrays updated by pure
  scatter/rotate ops (models/mapper.py:27-346's register/rotate logic as
  array programs);
- the inner plan-and-walk loop is a fixed-length `lax.scan` with
  reached/done masking (no data-dependent trip counts under jit);
- low-level planning uses the scene's precomputed next-hop tables plus a
  waypoint->node cell table instead of editing a dynamic host graph — on the
  discrete sim the walkable graph is exactly the simulator's own graph, so
  online edge deletion (planner.py:151-162) is the reference's workaround
  for not having it, not a behavior to replicate;
- waypoint navigability masks the 81-way categorical head exactly like
  CategoricalNetWithMask (ss_baselines/common/utils.py:72-87).
"""

from soundspaces_tpu.avwan.maps import MapperConfig, MapperState
from soundspaces_tpu.avwan.env import WaypointNavEnv, WaypointConfig
from soundspaces_tpu.avwan.policy import AVWanNet

__all__ = [
    "AVWanNet",
    "MapperConfig",
    "MapperState",
    "WaypointConfig",
    "WaypointNavEnv",
]
