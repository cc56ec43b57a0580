"""Commit in-flight chip-queue artifacts (idempotent, run from cron).

The queue commits artifacts only when a step ENDS; if the round is cut
mid-step, hours of training curve would sit uncommitted in /tmp (the
round-3 failure mode: claimed artifacts that never landed). This copies
every model dir's train/val/test logs into results/ under their queue
artifact names and commits when anything changed.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from chip_queue_r4 import STEPS as STEPS_R4
    from chip_queue_r5 import STEPS as STEPS_R5

    # one artifact name per SOURCE file, r5 taking precedence: the r5
    # savi extension steps APPEND to the same model-dir logs the r4 steps
    # mapped to the (already-committed, frozen) r4 artifact names — using
    # both mappings would silently overwrite the cited r4 curves with the
    # extended 4000-update logs
    by_src: dict[str, str] = {}
    for _, _, artifacts, _ in list(STEPS_R4) + list(STEPS_R5):
        for src, dst in artifacts.items():
            by_src[src] = dst

    copied = []
    for src, dst in by_src.items():
            if src == "__json_stdout__":
                continue
            out = os.path.join(REPO, "results", dst)
            if not (os.path.exists(src) and os.path.getsize(src) > 0):
                continue
            if os.path.exists(out) and (
                os.path.getsize(out) == os.path.getsize(src)
                and os.path.getmtime(out) >= os.path.getmtime(src)
            ):
                continue
            shutil.copyfile(src, out)
            copied.append(f"results/{dst}")
    if not copied:
        print("nothing new")
        return
    subprocess.run(["git", "add"] + copied, cwd=REPO, check=True)
    r = subprocess.run(
        ["git", "diff", "--cached", "--quiet"], cwd=REPO
    )
    if r.returncode != 0:
        subprocess.run(
            ["git", "commit", "-q", "-m",
             "Realistic chip queue: periodic in-flight artifact snapshot"],
            cwd=REPO, check=True,
        )
        print("committed", copied)
    else:
        print("no content change")


if __name__ == "__main__":
    main()
