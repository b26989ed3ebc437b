"""CLI parity with the reference apps (file-maker / template-maker)."""

from __future__ import annotations

import json

import numpy as np

from kafka_to_nexus_spark.__main__ import main
from kafka_to_nexus_spark.sinks import hdf5lib

TEMPLATES = "/root/reference/domain-tests/nexus_templates"
DATA = "/root/reference/domain-tests/data_files"


def test_file_maker_end_to_end(tmp_path, capsys):
    out = tmp_path / "out.nxs"
    rc = main([
        "file-maker",
        "-f", f"{TEMPLATES}/writer_modules_template.json",
        "-d", f"{DATA}/writer_modules_data.json",
        "-o", str(out),
        "--staging", str(tmp_path / "staging"),
        "--start-ms", "10000", "--stop-ms", "15000",
        "--master", "local[4]",
    ])
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["metrics"]["messages_received"] > 0
    with hdf5lib.File(str(out), "r") as f:
        assert np.array_equal(
            f["/entry/instrument/chopper/rotation_speed/value"][:], [10.0, 15.0]
        )


def test_template_maker_statics_only(tmp_path, capsys):
    out = tmp_path / "tpl.nxs"
    rc = main([
        "template-maker",
        "-f", f"{TEMPLATES}/static_information_template.json",
        "-o", str(out),
        "--staging", str(tmp_path / "staging"),
        "--master", "local[4]",
    ])
    assert rc == 0
    with hdf5lib.File(str(out), "r") as f:
        assert f["/entry"] is not None
