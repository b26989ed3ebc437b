"""bench.py round-artifact persistence policy (ADVICE r8): subset runs
never persist, and a full run never shrinks an existing r{N}.json."""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import _artifact_target  # noqa: E402


def test_subset_run_never_persists(tmp_path):
    assert _artifact_target(tmp_path, 9, 3, subset=True) is None


def test_full_run_writes_round_file(tmp_path):
    assert _artifact_target(tmp_path, 9, 120, subset=False) == (
        tmp_path / "r9.json"
    )


def test_smaller_rerun_diverts_to_partial(tmp_path):
    (tmp_path / "r9.json").write_text(
        json.dumps({"queries": {f"q{i}": 1.0 for i in range(120)}})
    )
    assert _artifact_target(tmp_path, 9, 40, subset=False) == (
        tmp_path / "r9.partial.json"
    )
    # equal-or-larger rerun may overwrite (fresher numbers win)
    assert _artifact_target(tmp_path, 9, 120, subset=False) == (
        tmp_path / "r9.json"
    )


def test_corrupt_existing_artifact_is_overwritable(tmp_path):
    (tmp_path / "r9.json").write_text("not json")
    assert _artifact_target(tmp_path, 9, 1, subset=False) == (
        tmp_path / "r9.json"
    )
