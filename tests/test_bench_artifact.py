"""bench.py round-artifact persistence policy (ADVICE r8 + round-10
clobber): subset runs never persist, a full run never shrinks an
existing r{N}.json, and a full run at a different scale factor diverts
to a suffixed sibling instead of replacing the round artifact."""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import _artifact_target  # noqa: E402


def test_subset_run_never_persists(tmp_path):
    assert _artifact_target(tmp_path, 9, 3, subset=True, sf=0.1) is None


def test_full_run_writes_round_file(tmp_path):
    assert _artifact_target(tmp_path, 9, 120, subset=False, sf=0.1) == (
        tmp_path / "r9.json"
    )


def test_smaller_rerun_diverts_to_partial(tmp_path):
    (tmp_path / "r9.json").write_text(
        json.dumps({"sf": 0.1, "queries": {f"q{i}": 1.0 for i in range(120)}})
    )
    assert _artifact_target(tmp_path, 9, 40, subset=False, sf=0.1) == (
        tmp_path / "r9.partial.json"
    )
    # equal-or-larger rerun may overwrite (fresher numbers win)
    assert _artifact_target(tmp_path, 9, 120, subset=False, sf=0.1) == (
        tmp_path / "r9.json"
    )


def test_different_sf_diverts_even_when_larger(tmp_path):
    (tmp_path / "r9.json").write_text(
        json.dumps({"sf": 0.1, "queries": {f"q{i}": 1.0 for i in range(120)}})
    )
    # the round-10 incident: a full run at a debug SF has as many entries
    # as the round artifact, so the size rule alone lets it clobber
    assert _artifact_target(tmp_path, 9, 120, subset=False, sf=0.001) == (
        tmp_path / "r9.sf0.001.json"
    )


def test_corrupt_existing_artifact_is_overwritable(tmp_path):
    (tmp_path / "r9.json").write_text("not json")
    # unreadable artifact: sf is unknowable, treat as mismatched and keep it
    assert _artifact_target(tmp_path, 9, 1, subset=False, sf=0.1) == (
        tmp_path / "r9.sf0.1.json"
    )
