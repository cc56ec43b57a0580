"""Chip-queue plumbing guards: the setup heartbeat and the snapshot
source-precedence rule (the r4→r5 artifact-clobber bug)."""

import io
import sys
import time


def test_setup_heartbeat_prints_and_stops():
    from soundspaces_tpu.utils.jobs import start_setup_heartbeat

    buf = io.StringIO()
    stop = start_setup_heartbeat("t", period_s=0.05, cap_s=60, stream=buf)
    time.sleep(0.2)
    stop.set()
    time.sleep(0.1)
    n = buf.getvalue().count("setup heartbeat")
    assert n >= 2
    time.sleep(0.15)
    assert buf.getvalue().count("setup heartbeat") == n  # stopped


def test_snapshot_prefers_r5_artifact_names_per_source():
    """The r5 savi extension appends to the same model-dir logs the r4
    steps mapped to the (frozen, committed) r4 artifact names; the
    snapshot must write each SOURCE file to exactly one artifact, with
    the r5 name winning — or a periodic snapshot after the extension
    silently overwrites the cited round-4 curves."""
    sys.path.insert(0, "/root/repo/tools")
    from chip_queue_r4 import STEPS as R4
    from chip_queue_r5 import STEPS as R5

    by_src = {}
    for _, _, artifacts, _ in list(R4) + list(R5):
        for src, dst in artifacts.items():
            by_src[src] = dst
    assert by_src["/tmp/models/savi_r4/train.log"] == (
        "realistic_savi_r4b_train.jsonl"
    )
    assert by_src["/tmp/models/savi_r4_ablate/val.log"] == (
        "realistic_savi_r4b_ablate_val.jsonl"
    )
    # sources unique to r4 keep their r4 names
    assert by_src["/tmp/models/cont_r4/train.log"] == (
        "realistic_continuous_r4_train.jsonl"
    )
