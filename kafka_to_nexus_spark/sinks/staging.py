"""Parquet-staging sink (primary): the Spark-native analog of the
reference's single-writer HDF5 path (K1–K5).

Executors write per-dataset parquet in parallel (columnar, chunked ≈ HDF5
chunking, row-group stats ≈ cue index); the hierarchical/NeXus part —
groups, attributes, links, static datasets, job metadata — is pure
driver-side JSON (`_nexus_meta.json`). A gated h5py packer
(``sinks.hdf5``) can turn a staged directory into a real NeXus HDF5 file
single-threaded, exactly matching the reference's "never write HDF5 from
more than one thread" rule (src/Stream/MessageWriter.cpp:31-141).

Layout:
    out_dir/
      _nexus_meta.json          # groups, attrs, links, statics, stream map
      data/<escaped group path>/<dataset name>/   (parquet)

Scale: each dataset write is a plain distributed parquet write — no
driver-side collect anywhere in the data path.
"""

from __future__ import annotations

import json
from dataclasses import asdict
from pathlib import Path

from pyspark.sql import DataFrame

from ..plan.model import Plan

META_FILE = "_nexus_meta.json"


def escape_path(group_path: str) -> str:
    return group_path.strip("/").replace("/", "__") or "_root"


def dataset_dir(out_dir: str | Path, group_path: str, dataset: str) -> Path:
    return Path(out_dir) / "data" / escape_path(group_path) / dataset


def write_dataset(
    df: DataFrame,
    out_dir: str | Path,
    group_path: str,
    dataset: str,
    order_by: list[str] | None = None,
    single_file: bool = False,
) -> None:
    """Append-order columnar write. ``order_by`` reproduces the reference's
    arrival-order guarantee (per-partition offset order); ``single_file``
    coalesces for small metadata-ish datasets."""
    target = dataset_dir(out_dir, group_path, dataset)
    if order_by:
        df = df.orderBy(*order_by)
    if single_file:
        df = df.coalesce(1)
    df.write.mode("overwrite").parquet(str(target))


def write_meta(
    out_dir: str | Path,
    plan: Plan,
    job: dict,
    stream_outputs: dict[str, list[str]],
    metadata_values: dict[str, object],
    extra_group_attributes: list[dict] | None = None,
) -> None:
    """Driver-side hierarchical metadata: the T1–T6 surface.
    ``extra_group_attributes``: module-synthesized attrs (da00 NXdata
    signal/axes) appended after the plan's own."""
    meta = {
        "job": job,
        "groups": plan.groups,
        "group_attributes": [asdict(a) for a in plan.group_attributes]
        + list(extra_group_attributes or []),
        "static_datasets": [asdict(d) for d in plan.static_datasets],
        "links": [asdict(link) for link in plan.links],
        "streams": [
            {
                "path": s.path,
                "module": s.module,
                "topic": s.topic,
                "source": s.source,
                "config": s.config,
                "datasets": stream_outputs.get(f"{s.path}:{s.module}:{s.source}", []),
            }
            for s in plan.streams
        ],
        "mdat": [asdict(m) for m in plan.mdat],
        "metadata_values": metadata_values,
    }
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    (out / META_FILE).write_text(json.dumps(meta, indent=2, default=str))


def read_meta(out_dir: str | Path) -> dict:
    return json.loads((Path(out_dir) / META_FILE).read_text())


def approximate_size_mb(out_dir: str | Path) -> int:
    """K6 — staged output size gauge, the analog of the reference's
    approx_file_size_mb metric/metadata (FileWriterTask.h:103-111)."""
    total = 0
    for p in Path(out_dir).rglob("*"):
        if p.is_file():
            total += p.stat().st_size
    return round(total / (1024 * 1024))
