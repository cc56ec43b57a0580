"""PanoIR batch renderer: panoramic visual + IR + source polar coordinate
dataset generation.

Reference: PanoIR/render_panoIR.py:26-235 renders panoramic RGB/depth by
stitching multi-view renders per pose and pairs them with a mono IR and the
source's polar coordinates. Here panoramas stitch from the 4-heading frame
bank and IRs come from the RIR bank (or native tracer) — one batched gather
per dataset chunk instead of per-pose renderer calls.
"""

from __future__ import annotations

import numpy as np

from soundspaces_tpu.scene.banks import SceneAssets


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
