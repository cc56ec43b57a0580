"""Tools layer: native C++ ray tracer build + physical sanity, ambisonic
decode, PanoIR batch rendering."""

import numpy as np
import pytest

from soundspaces_tpu.scene import SceneGraph, make_synthetic_assets
from soundspaces_tpu.tools import (
    ambisonic_to_binaural,
    build_native_tracer,
    hrtf_decode_matrix,
    render_panoir_batch,
    synth_rir_bank_native,
)


@pytest.fixture(scope="module")
def traced_bank():
    g = SceneGraph.grid(8, 8, obstacle_fraction=0.15, seed=2)
    goals = np.array([0, g.num_nodes // 2], np.int32)
    bank = synth_rir_bank_native(
        g, goals, sampling_rate=8000, rir_max_len=2000, num_rays=200, seed=3
    )
    return g, goals, bank


def test_native_tracer_builds_and_runs(traced_bank):
    g, goals, bank = traced_bank
    assert bank.shape == (4, g.num_nodes, 2, 2, 2000)
    assert np.isfinite(bank).all()
    assert np.abs(bank).sum() > 0


def test_native_tracer_physical_structure(traced_bank):
    """Energy decreases with distance; direct-path onset time matches
    distance/c; binaural ILD favors the ear facing the source."""
    g, goals, bank = traced_bank
    goal = int(goals[1])
    gi = 1
    energy = (bank[0, :, gi] ** 2).sum(axis=(-2, -1))  # [N]
    d = np.asarray(g.geodesic_hops[:, goal], float)
    near = energy[(d > 0) & (d <= 2)].mean()
    far = energy[d >= max(d[d < 30000].max() - 1, 3)].mean()
    assert near > far

    # onset sample ~ euclid distance / c for a line-of-sight neighbor
    neighbors = [n for n in g.forward_neighbor[goal] if n >= 0]
    r = neighbors[0]
    ir = bank[0, r, gi, 0]
    onset = np.argmax(np.abs(ir) > 0.5 * np.abs(ir).max())
    dist = np.linalg.norm(g.points[r] - g.points[goal])
    expect = dist / 343.0 * 8000
    assert abs(onset - expect) < 80  # within 10 ms


def test_native_tracer_deterministic(traced_bank):
    g, goals, bank = traced_bank
    bank2 = synth_rir_bank_native(
        g, goals, sampling_rate=8000, rir_max_len=2000, num_rays=200, seed=3
    )
    np.testing.assert_array_equal(bank, bank2)


def test_ambisonic_decode_directionality():
    """A source encoded from the left must decode louder into the left ear."""
    n = 512
    impulse = np.zeros(n, np.float32)
    impulse[10] = 1.0
    # first-order encode at azimuth +90 deg (left of heading 0): Y = sin az
    ambi = np.zeros((4, n), np.float32)
    ambi[0] = impulse  # W
    ambi[1] = impulse * np.sin(np.pi / 2)  # Y
    ambi[3] = impulse * np.cos(np.pi / 2)  # X
    dec = hrtf_decode_matrix(0)
    out = np.asarray(ambisonic_to_binaural(ambi, dec))
    left, right = np.abs(out[0]).sum(), np.abs(out[1]).sum()
    assert left != right
    energies = {(-1): left, (1): right}
    # decode matrix rows: ch0=left ear at -90... verify ordering is consistent
    assert max(left, right) > 1.9 * min(left, right)


def test_panoir_batch():
    assets = make_synthetic_assets(num_nodes_hint=20, sampling_rate=4000,
                                   rir_max_len=800, image_size=16)
    out = render_panoir_batch(
        assets, receiver_nodes=np.array([0, 1, 2]),
        source_slots=np.array([0, 0, 1]),
    )
    h = 16
    assert out["pano"].shape == (3, h, 4 * h, 1)
    assert out["ir"].shape == (3, 800)
    assert out["polar"].shape == (3, 2)
    assert (out["polar"][:, 0] >= 0).all()


def test_download_manifest(tmp_path, capsys):
    """URL construction + skip-existing logic of the dataset downloader
    (scripts/download_data.py:13-40), manifest (offline) mode."""
    import os

    from soundspaces_tpu.tools.download import main, missing_urls, scene_urls

    meta = tmp_path / "metadata" / "replica"
    for scene in ("apartment_0", "office_1"):
        (meta / scene).mkdir(parents=True)
    urls = scene_urls(str(tmp_path / "metadata"), "replica", "binaural_rirs")
    assert urls == [
        "http://dl.fbaipublicfiles.com/SoundSpaces/binaural_rirs/replica/apartment_0.tar.gz",
        "http://dl.fbaipublicfiles.com/SoundSpaces/binaural_rirs/replica/office_1.tar.gz",
    ]
    # a scene already on disk is skipped
    (tmp_path / "data" / "binaural_rirs" / "replica" / "apartment_0").mkdir(
        parents=True
    )
    todo = missing_urls(urls, str(tmp_path / "data"), "replica", "binaural_rirs")
    assert [os.path.basename(u) for u in todo] == ["office_1.tar.gz"]

    out = main([
        "--manifest", "--metadata-dir", str(tmp_path / "metadata"),
        "--output-dir", str(tmp_path / "data"), "--dataset", "replica",
    ])
    assert out == todo


def test_download_unpack_places_scene(tmp_path):
    """Tarballs land at output_dir/rir_type/dataset/scene whether the
    archive embeds the full prefix or just the scene directory."""
    import io
    import os
    import tarfile

    from soundspaces_tpu.tools.download import download_and_unpack, missing_urls

    def make_tar(path, member_dir):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with tarfile.open(path, "w:gz") as tf:
            data = b"rir"
            info = tarfile.TarInfo(f"{member_dir}/0/0_1.wav")
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))

    out = tmp_path / "data"
    # scene-only layout
    make_tar(str(out / "apartment_0.tar.gz"), "apartment_0")
    download_and_unpack("file://ignored/apartment_0.tar.gz", str(out),
                        "replica", "binaural_rirs")
    assert (out / "binaural_rirs" / "replica" / "apartment_0" / "0" /
            "0_1.wav").exists()
    # full-prefix layout
    make_tar(str(out / "office_1.tar.gz"), "binaural_rirs/replica/office_1")
    download_and_unpack("file://ignored/office_1.tar.gz", str(out),
                        "replica", "binaural_rirs")
    assert (out / "binaural_rirs" / "replica" / "office_1" / "0" /
            "0_1.wav").exists()
    # skip-existing now agrees with where files were placed
    urls = ["http://x/binaural_rirs/replica/apartment_0.tar.gz",
            "http://x/binaural_rirs/replica/office_1.tar.gz"]
    assert missing_urls(urls, str(out), "replica", "binaural_rirs") == []


def test_panoir_fov_table_live_stitching():
    """The reference's per-fov view tables (render_panoIR.py:80-96) drive
    the live-raycaster panorama: width = W * n_views for every fov."""
    import numpy as np

    from soundspaces_tpu.scene import make_synthetic_assets
    from soundspaces_tpu.tools.panoir import FOV_TABLE, render_panoir_live

    assets = make_synthetic_assets(num_nodes_hint=20, sampling_rate=2000,
                                   rir_max_len=300, image_size=8, seed=21)
    for fov in (90, 60):
        (h, w), angles = FOV_TABLE[fov]
        out = render_panoir_live(
            assets, np.asarray([0, 3]), np.asarray([0, 1]), fov=fov
        )
        assert out["pano"].shape == (2, h, w * len(angles), 1)
        assert np.isfinite(out["pano"]).all()
        assert out["ir"].shape[0] == 2 and out["polar"].shape == (2, 2)
    # fov-20 table: 18 views (the mp3d PanoIR setting)
    assert len(FOV_TABLE[20][1]) == 18
