"""Gated h5py NeXus packer: staged parquet directory → one HDF5 file.

Single-threaded by design — HDF5 is not thread-safe and the reference
funnels every append through one writer thread
(src/Stream/MessageWriter.cpp:31-141). Here the parallel work (scan,
filter, transform, columnar staging) has already happened in Spark; this
pack step is a sequential column copy, the same amount of single-threaded
HDF5 I/O the reference performs.

Import requires h5py (NOT installed in the dev container — the staging
sink is the tested path; this module is exercised only where h5py exists).

Covers: K1 single-writer, K3 chunking, T2 static datasets (shape from JSON
nesting), T3 attributes (incl. auto NX_class/topic/source/writer_module,
JobCreator.cpp:277-312), T4 hard links at finalize (HDFFile.cpp:238-247),
T5 file-level metadata (HDFFile.cpp:129-181), unsigned-dtype narrowing
(SURVEY.md §1.5).
"""

from __future__ import annotations

from pathlib import Path

import h5py  # noqa: F401  (gated: ImportError caught by package __init__)
import numpy as np

from . import staging

NUMPY_DTYPES = {
    "int8": np.int8,
    "uint8": np.uint8,
    "int16": np.int16,
    "uint16": np.uint16,
    "int32": np.int32,
    "uint32": np.uint32,
    "int64": np.int64,
    "uint64": np.uint64,
    "float32": np.float32,
    "float": np.float32,
    "float64": np.float64,
    "double": np.float64,
}


def _write_attrs(node, attrs: list[dict]) -> None:
    for a in attrs:
        values = a["values"]
        if a.get("dtype") in NUMPY_DTYPES:
            values = np.asarray(values, dtype=NUMPY_DTYPES[a["dtype"]])
        node.attrs[a["name"]] = values


def pack(out_dir: str | Path, hdf_path: str | Path, chunk_size: int = 1024) -> None:
    """Materialize a staged job directory as a NeXus HDF5 file."""
    import pyarrow.parquet as pq

    meta = staging.read_meta(out_dir)
    with h5py.File(hdf_path, "w") as f:
        # T5 file-level metadata
        f.attrs["file_name"] = str(hdf_path)
        f.attrs["creator"] = "kafka_to_nexus_spark"

        for group_path in meta["groups"]:
            f.require_group(group_path)
        for a in meta["group_attributes"]:
            _write_attrs(f[a["path"]], [a])

        # T2 static datasets
        for d in meta["static_datasets"]:
            dtype = NUMPY_DTYPES.get(d.get("dtype") or "")
            data = (
                np.asarray(d["values"], dtype=dtype)
                if dtype
                else d["values"]
            )
            ds = f.create_dataset(d["path"], data=data)
            _write_attrs(ds, d.get("attributes", []))

        # stream datasets from staged parquet (sequential single writer)
        for s in meta["streams"]:
            grp = f.require_group(s["path"])
            grp.attrs.setdefault("topic", s["topic"])
            grp.attrs.setdefault("source", s["source"])
            grp.attrs.setdefault("writer_module", s["module"])
            for dataset in s["datasets"]:
                table = pq.read_table(
                    staging.dataset_dir(out_dir, s["path"], dataset)
                )
                for col in table.column_names:
                    arr = table.column(col).to_numpy(zero_copy_only=False)
                    dtype = NUMPY_DTYPES.get(s["config"].get("dtype", ""), None)
                    if dtype is not None and col == "value":
                        arr = arr.astype(dtype)  # narrow widened unsigned
                    name = col if len(table.column_names) > 1 else dataset
                    grp.create_dataset(
                        f"{dataset}/{col}" if len(table.column_names) > 1 else name,
                        data=arr,
                        chunks=(min(chunk_size, max(len(arr), 1)),) if len(arr) else None,
                    )

        # job-summary metadata values (T6)
        for path, value in meta.get("metadata_values", {}).items():
            if path not in f:
                f.create_dataset(path, data=value)

        # T4 hard links at finalize
        for link in meta["links"]:
            parent = str(Path(link["path"]).parent)
            target = str((Path(parent) / link["target"]).resolve())
            if target in f:
                f[link["path"]] = f[target]
