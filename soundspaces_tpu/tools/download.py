"""Dataset download manager (scripts/download_data.py:13-40 equivalent).

Builds the per-scene RIR tarball URL set from the public release root and a
metadata directory, skips scenes already on disk, and fetches + unpacks the
rest. `--manifest` prints the URL list without touching the network (this
build environment has no egress; the manifest doubles as an audit artifact).

Usage:
    python -m soundspaces_tpu.tools.download --dataset replica \
        --rir-type binaural_rirs --output-dir data [--manifest]
"""

from __future__ import annotations

import argparse
import os
import tarfile
import urllib.request

RELEASE_ROOT = "http://dl.fbaipublicfiles.com/SoundSpaces/"


def scene_urls(
    metadata_dir: str, dataset: str, rir_type: str,
    root: str = RELEASE_ROOT,
) -> list[str]:
    """One tarball URL per scene listed in the metadata directory."""
    scenes = sorted(os.listdir(os.path.join(metadata_dir, dataset)))
    return [f"{root}{rir_type}/{dataset}/{scene}.tar.gz" for scene in scenes]


def missing_urls(
    urls: list[str], output_dir: str, dataset: str, rir_type: str
) -> list[str]:
    out = []
    base = os.path.join(output_dir, rir_type, dataset)
    for url in urls:
        scene = os.path.basename(url)[: -len(".tar.gz")]
        if not os.path.exists(os.path.join(base, scene)):
            out.append(url)
    return out


def download_and_unpack(
    url: str, output_dir: str, dataset: str, rir_type: str
) -> str:
    """Fetch one scene tarball and place its contents at
    output_dir/rir_type/dataset/scene — the location missing_urls checks
    and the scene loaders read — regardless of whether the tarball embeds
    the full prefix or just the scene directory."""
    import shutil
    import tempfile

    name = os.path.basename(url)
    scene = name[: -len(".tar.gz")]
    target = os.path.join(output_dir, rir_type, dataset, scene)
    os.makedirs(output_dir, exist_ok=True)
    tar_path = os.path.join(output_dir, name)
    if not os.path.exists(tar_path):
        urllib.request.urlretrieve(url, tar_path)
    with tempfile.TemporaryDirectory(dir=output_dir) as tmp:
        with tarfile.open(tar_path, "r:gz") as tf:
            tf.extractall(tmp, filter="data")
        # locate the scene directory wherever the archive put it
        src = None
        for root, dirs, _files in os.walk(tmp):
            if os.path.basename(root) == scene:
                src = root
                break
        if src is None:
            raise RuntimeError(f"{name}: no '{scene}/' directory in archive")
        os.makedirs(os.path.dirname(target), exist_ok=True)
        shutil.move(src, target)
    os.remove(tar_path)
    return target


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--output-dir", default="data")
    parser.add_argument("--metadata-dir", default="data/metadata")
    parser.add_argument("--dataset", default="replica",
                        choices=["mp3d", "replica"])
    parser.add_argument("--rir-type", default="binaural_rirs",
                        choices=["binaural_rirs", "ambisonic_rirs"])
    parser.add_argument("--manifest", action="store_true",
                        help="print URLs to fetch; do not download")
    args = parser.parse_args(argv)

    urls = scene_urls(args.metadata_dir, args.dataset, args.rir_type)
    todo = missing_urls(urls, args.output_dir, args.dataset, args.rir_type)
    if args.manifest:
        for url in todo:
            print(url)
        return todo
    for url in todo:
        print(f"downloading {url} ...")
        download_and_unpack(url, args.output_dir, args.dataset, args.rir_type)
    return todo


if __name__ == "__main__":
    main()
