"""Docs must only cite result artifacts that actually exist.

Round-3 lesson (VERDICT.md Weak #1): STATUS.md cited
``results/realistic_savi_r3_train.jsonl`` before the chip run produced it,
and the run then OOMed — leaving a citation to a file that never existed.
This test makes the reconciliation mechanical: every ``results/*.json[l]``
path mentioned in the top-level docs must exist, be non-empty, and parse
as JSON / JSONL.
"""
import json
import re
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
DOCS = ["STATUS.md", "README.md", "REALISTIC.md", "BASELINE.md"]
CITE = re.compile(r"results/[A-Za-z0-9_.\-]+\.(?:jsonl|json)\b")


def _cited_paths():
    seen = set()
    for doc in DOCS:
        p = REPO / doc
        if not p.exists():
            continue
        for m in CITE.finditer(p.read_text()):
            seen.add((doc, m.group(0)))
    return sorted(seen)


def test_some_citations_exist():
    # Sanity: the scan itself works (README/STATUS cite committed curves).
    assert _cited_paths(), "doc scan found no results/ citations at all"


# Round-4 lesson (VERDICT-r4 Weak #1/#6): the forward check above catches
# phantom citations, but not the inverse — an artifact that HAS landed while
# the prose still calls it "in flight". Flag any stale-status phrase whose
# surrounding context (±3 lines) names a results/ artifact that exists.
STALE = re.compile(
    r"in.flight|will be cited|once committed|has not (?:yet )?run|never ran",
    re.IGNORECASE,
)


def _stale_claims():
    claims = []
    for doc in DOCS:
        p = REPO / doc
        if not p.exists():
            continue
        lines = p.read_text().splitlines()
        for i, line in enumerate(lines):
            if not STALE.search(line):
                continue
            ctx = "\n".join(lines[max(0, i - 3):i + 4])
            for m in CITE.finditer(ctx):
                if (REPO / m.group(0)).exists():
                    claims.append((doc, i + 1, m.group(0)))
    return claims


def test_no_stale_in_flight_prose():
    claims = _stale_claims()
    assert not claims, (
        "docs describe committed artifacts as in-flight/pending: "
        + "; ".join(f"{d}:{ln} near {rel}" for d, ln, rel in claims)
    )


@pytest.mark.parametrize("doc,rel", _cited_paths(), ids=lambda x: str(x))
def test_cited_artifact_exists_and_parses(doc, rel):
    path = REPO / rel
    assert path.exists(), f"{doc} cites {rel} which does not exist"
    data = path.read_bytes()
    assert data.strip(), f"{doc} cites {rel} which is empty"
    for i, line in enumerate(data.decode().splitlines()):
        if not line.strip():
            continue
        try:
            json.loads(line)
        except json.JSONDecodeError as e:
            raise AssertionError(f"{rel} line {i + 1} is not JSON: {e}") from e
