"""PanoIR batch renderer: panoramic visual + IR + source polar coordinate
dataset generation.

Reference: PanoIR/render_panoIR.py:26-235 renders panoramic RGB/depth by
stitching per-angle renders with a per-fov view table
(get_res_angles_for, render_panoIR.py:80-96: fov 20 -> 18 views at 384x64,
30 -> 12, 60 -> 6, 90 -> 4) and pairs them with a mono IR and the source's
polar coordinates, across mp3d/gibson/hm3d scenes. Two paths here:

- `render_panoir_batch`: panoramas from the 4-heading frame bank (one
  batched gather per chunk — the cached-observation fast path);
- `panorama_depth` / `render_panoir_live`: the reference's actual fov-table
  stitching over the LIVE on-device raycaster (ops/raycast.py), any of the
  four fov configurations, pose-exact.
"""

from __future__ import annotations

import numpy as np

from soundspaces_tpu.scene.banks import SceneAssets

# the reference's fov -> ((height, width), rotation angles) view table
# (render_panoIR.py:80-96); angles stitch the panorama left-to-right
FOV_TABLE: dict[int, tuple[tuple[int, int], list[int]]] = {
    20: ((384, 64), [170, 150, 130, 110, 90, 70, 50, 30, 10, 350, 330, 310,
                     290, 270, 250, 230, 210, 190]),
    30: ((384, 128), [0, 330, 300, 270, 240, 210, 180, 150, 120, 90, 60, 30]),
    60: ((256, 128), [0, 300, 240, 180, 120, 60]),
    90: ((256, 256), [0, 270, 180, 90]),
}


def panorama_depth(
    occupancy, x: float, z: float, fov: int = 90, resolution: float = 0.1
) -> np.ndarray:
    """Stitch the fov table's per-angle depth renders into one panorama
    [H, W * n_views, 1] (visual_render's concatenation,
    render_panoIR.py:99-110) using the live raycaster."""
    import jax.numpy as jnp

    from soundspaces_tpu.ops.raycast import render_depth

    (h, w), angles = FOV_TABLE[fov]
    strips = []
    for angle in angles:
        heading = np.deg2rad(270.0 - angle)
        strips.append(
            np.asarray(
                render_depth(
                    occupancy, jnp.float32(x), jnp.float32(z),
                    jnp.float32(heading), height=h, width=w,
                    fov_deg=float(fov), resolution=resolution,
                )
            )
        )
    return np.concatenate(strips, axis=1)


def render_panoir_live(
    assets: SceneAssets,
    receiver_nodes: np.ndarray,
    source_slots: np.ndarray,
    fov: int = 90,
) -> dict[str, np.ndarray]:
    """Pose-exact PanoIR samples via the raycaster: {pano [B, H, W*V, 1],
    ir [B, L], polar [B, 2]}."""
    from soundspaces_tpu.env.structs import _occupancy_grid

    g, ac = assets.graph, assets.acoustics
    occ, node_xz = _occupancy_grid(g)
    import jax.numpy as jnp

    occ_j = jnp.asarray(occ)
    receiver_nodes = np.asarray(receiver_nodes)
    source_slots = np.asarray(source_slots)
    panos = np.stack(
        [
            panorama_depth(
                occ_j, node_xz[n, 0] * 0.1, node_xz[n, 1] * 0.1, fov
            )
            for n in receiver_nodes
        ]
    )
    rir = ac.rir[0, receiver_nodes, source_slots]
    src_nodes = ac.goal_nodes[source_slots]
    delta = g.points[src_nodes] - g.points[receiver_nodes]
    polar = np.stack(
        [np.hypot(delta[:, 0], delta[:, 2]),
         np.arctan2(delta[:, 2], delta[:, 0])], axis=-1
    ).astype(np.float32)
    return {
        "pano": panos,
        "ir": rir.mean(axis=1).astype(np.float32),
        "polar": polar,
    }


def render_panoir_batch(
    assets: SceneAssets,
    receiver_nodes: np.ndarray,
    source_slots: np.ndarray,
    modality: str = "depth",
) -> dict[str, np.ndarray]:
    """Returns {pano [B, H, 4W, C], ir [B, L], polar [B, 2]} for each
    (receiver, source-slot) pair. Panorama = headings stitched left-to-right
    (the fov-table stitching of render_panoIR.py:80-96 for 90-degree fovs)."""
    g, ac = assets.graph, assets.acoustics
    frames = assets.frames.modalities[modality]  # [N, 4, H, W, C]
    receiver_nodes = np.asarray(receiver_nodes)
    source_slots = np.asarray(source_slots)

    # stitch heading order: left(90), front(0), right(270), back(180) in
    # rotation-angle terms; use rot indices [1, 0, 3, 2]
    order = [1, 0, 3, 2]
    pano = np.concatenate(
        [frames[receiver_nodes, r] for r in order], axis=2
    )

    # mono IR: average the binaural channels at azimuth 0
    rir = ac.rir[0, receiver_nodes, source_slots]  # [B, 2, L]
    ir = rir.mean(axis=1)

    src_nodes = ac.goal_nodes[source_slots]
    delta = g.points[src_nodes] - g.points[receiver_nodes]
    rho = np.hypot(delta[:, 0], delta[:, 2])
    phi = np.arctan2(delta[:, 2], delta[:, 0])
    polar = np.stack([rho, phi], axis=-1).astype(np.float32)
    return {"pano": pano, "ir": ir.astype(np.float32), "polar": polar}
