"""Frozen-golden drift tests: live kernel output must match
tests/goldens/ byte-for-byte (the engine's 'byte-identical extracted
text per url' contract, north rule). A deliberate spec change runs
`python tests/make_fixtures.py` and commits the new goldens."""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from make_fixtures import GOLDEN_DIR, extract_all, fixtures

pytestmark = pytest.mark.skipif(
    not GOLDEN_DIR.exists(), reason="goldens not generated")


@pytest.mark.parametrize("fid", sorted(fixtures().keys()))
def test_fixture_matches_frozen_golden(fid):
    res = extract_all()[fid]
    text = res.pop("text")
    golden_txt = GOLDEN_DIR / f"{fid}.txt"
    if golden_txt.exists():
        assert text is not None, f"{fid}: text became None"
        assert text.encode("utf-8") == golden_txt.read_bytes(), (
            f"{fid}: extracted text drifted from frozen golden")
    else:
        assert text is None, f"{fid}: unexpectedly produced text"
    golden = json.loads((GOLDEN_DIR / f"{fid}.json").read_text())
    assert res == golden, f"{fid}: result fields drifted from frozen golden"


def test_golden_files_exist_for_every_fixture():
    for fid in fixtures():
        assert (GOLDEN_DIR / f"{fid}.json").exists(), f"missing golden for {fid}"
