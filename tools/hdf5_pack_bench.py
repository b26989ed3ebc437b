"""HDF5 pack throughput at volume (VERDICT r12 #4).

Usage: python tools/hdf5_pack_bench.py [N_EVENTS] [N_FRAMES] [FRAME_SIDE]
                                       [CHUNK_ELEMS]

K1 parity is met (stage → single-writer pack, the reference's "never
write HDF5 from more than one thread" rule,
/root/reference/src/Stream/MessageWriter.cpp:31-141), but at 100× the
pack is the serial tail of every job — this measures it at job scale:
a wide ev44 stream (event_time_offset int64 + event_id int32, plus the
pulse index) and an ad00 image stream (FRAME_SIDE² int32 frames),
staged exactly as the runner stages them (sorted parquet, no Spark
needed for the measurement — pack() is driver-only by design), then
packed with the in-repo pure-python hdf5lib backend.

Reports wall seconds per phase and MB/s against the LOGICAL dataset
bytes (what the HDF5 file must contain), split into parquet-read,
and total pack. Run with different CHUNK_ELEMS to see the chunking
overhead curve (default pack chunk_size=1024 elements = 8 KB chunks
for int64 — HDF5 practice is ~1 MB chunks).
"""

from __future__ import annotations

import json
import pathlib
import sys
import tempfile
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from kafka_to_nexus_spark.sinks import hdf5 as sink_hdf5

N_EVENTS = int(sys.argv[1]) if len(sys.argv) > 1 else 120_000_000
N_FRAMES = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
FRAME_SIDE = int(sys.argv[3]) if len(sys.argv) > 3 else 512
CHUNK_ELEMS = int(sys.argv[4]) if len(sys.argv) > 4 else 1024

EV_PATH = "/entry/instrument/detector/events"
AD_PATH = "/entry/instrument/camera/data"


def stage(out: pathlib.Path) -> int:
    """Build the staged job dir; returns logical dataset bytes."""
    data = out / "data"
    ev = data / "entry__instrument__detector__events"
    ad = data / "entry__instrument__camera__data"
    (ev / "events").mkdir(parents=True)
    (ev / "pulses").mkdir(parents=True)
    (ad / "frames").mkdir(parents=True)

    logical = 0
    # events in sorted part files (the runner's batch staging shape)
    per_part = 10_000_000
    rng = np.random.default_rng(7)
    for p, lo in enumerate(range(0, N_EVENTS, per_part)):
        n = min(per_part, N_EVENTS - lo)
        tof = (np.arange(lo, lo + n, dtype=np.int64) * 131) % 71_000_000
        pix = rng.integers(0, 1 << 20, size=n, dtype=np.int64).astype("int32")
        pq.write_table(
            pa.table(
                {"event_time_offset": tof, "event_id": pix}
            ),
            ev / "events" / f"part-{p:05d}.snappy.parquet",
        )
        logical += n * (8 + 4)
    n_pulses = max(N_EVENTS // 10_000, 1)
    pq.write_table(
        pa.table({
            "event_time_zero": np.arange(n_pulses, dtype=np.int64) * 71_000_000,
            "event_index": np.arange(n_pulses, dtype=np.int64) * 10_000,
        }),
        ev / "pulses" / "part-00000.snappy.parquet",
    )
    logical += n_pulses * 16

    # ad00 frames: data is list<double> in staging (MESSAGE_SCHEMA), the
    # packer casts to the configured dtype — stage in slabs
    side = FRAME_SIDE
    per_slab = max(1, (64 << 20) // (side * side * 8))
    for p, lo in enumerate(range(0, N_FRAMES, per_slab)):
        n = min(per_slab, N_FRAMES - lo)
        flat = (
            np.add.outer(
                np.arange(lo, lo + n, dtype=np.int64) * 97,
                np.arange(side * side, dtype=np.int64),
            )
            % 65_536
        ).astype(np.float64)
        pq.write_table(
            pa.table({
                "time": pa.array(
                    (np.arange(lo, lo + n, dtype=np.int64) + 1) * 1_000_000
                ),
                "shape": pa.array([[side, side]] * n,
                                  type=pa.list_(pa.int64())),
                "data": pa.array(list(flat), type=pa.list_(pa.float64())),
            }),
            ad / "frames" / f"part-{p:05d}.snappy.parquet",
        )
    logical += N_FRAMES * side * side * 4  # int32 on disk

    meta = {
        "job": {"job_id": "pack-bench"},
        "groups": [EV_PATH, AD_PATH],
        "group_attributes": [],
        "static_datasets": [],
        "links": [],
        "metadata_values": {},
        "streams": [
            {
                "path": EV_PATH, "module": "ev44", "topic": "t",
                "source": "s", "config": {},
                "datasets": ["events", "pulses"],
            },
        ] + ([
            {
                "path": AD_PATH, "module": "ad00", "topic": "t",
                "source": "cam", "config": {"dtype": "int32"},
                "datasets": ["frames"],
            },
        ] if N_FRAMES else []),
        "mdat": [],
    }
    (out / "_nexus_meta.json").write_text(json.dumps(meta))
    return logical


def main() -> None:
    tmp = pathlib.Path(tempfile.mkdtemp(prefix="k2n_packbench_"))
    staged = tmp / "staged"
    t0 = time.monotonic()
    logical = stage(staged)
    t_stage = time.monotonic() - t0

    hdf = tmp / "out.nxs"
    t0 = time.monotonic()
    sink_hdf5.pack(staged, hdf, chunk_size=CHUNK_ELEMS)
    t_pack = time.monotonic() - t0

    out_bytes = hdf.stat().st_size
    staged_bytes = sum(
        f.stat().st_size for f in staged.rglob("*") if f.is_file()
    )
    print(json.dumps({
        "n_events": N_EVENTS,
        "n_frames": N_FRAMES,
        "frame_side": FRAME_SIDE,
        "chunk_elems": CHUNK_ELEMS,
        "logical_mb": round(logical / 1e6, 1),
        "staged_parquet_mb": round(staged_bytes / 1e6, 1),
        "hdf5_mb": round(out_bytes / 1e6, 1),
        "stage_sec": round(t_stage, 2),
        "pack_sec": round(t_pack, 2),
        "pack_mb_per_sec": round(logical / 1e6 / t_pack, 1),
        "backend": sink_hdf5._h5.__name__,
    }))
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
