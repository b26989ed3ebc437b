"""CLI mirroring the reference's app surface (apps/ directory):

- ``file-maker``     — offline batch: template JSON + data JSON → staged
  output → NeXus file (apps/file-maker.cpp:83-130: -f/--file, -o/--output-
  file, -d/--data-file, -i/--instrument with the ``{prefix}/{i}/{i}.hdf``
  template convention);
- ``template-maker`` — structure only, no stream data
  (apps/template-maker.cpp:40-46);
- ``kafka-to-nexus`` — live worker: claim jobs from a pool transport and
  run them as streaming queries (apps/kafka-to-nexus.cpp).

``python -m kafka_to_nexus_spark file-maker -f tpl.json -d data.json -o out.nxs``
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
from pathlib import Path


def _add_common(p: argparse.ArgumentParser) -> None:
    p.add_argument("-f", "--file", required=True, help="nexus-structure template JSON")
    p.add_argument("-o", "--output-file", required=True, help="output NeXus file")
    p.add_argument("-i", "--instrument", default="", help="instrument name")
    p.add_argument(
        "--template-prefix",
        default="nexus",
        help="instrument template root: {prefix}/{instrument}/{instrument}.hdf",
    )
    p.add_argument("--staging", default="", help="keep staging at this directory")
    p.add_argument("--master", default="local[*]")


def _spark(master: str):
    from .session import get_spark

    return get_spark(
        master=master, extra_conf={"spark.ui.showConsoleProgress": "false"}
    )


def _template_file(args) -> str | None:
    if not args.instrument:
        return None
    from .sinks.hdf5 import template_path

    p = template_path(args.template_prefix, args.instrument)
    return str(p) if p.exists() else None


def file_maker(args) -> int:
    from .plan import StartMessage
    from .runner import run_job
    from .sinks import hdf5
    from .sources.fixtures import messages_from_file, messages_from_json

    spark = _spark(args.master)
    structure = json.loads(Path(args.file).read_text())
    if args.data_file:
        messages = messages_from_file(spark, args.data_file)
        raw = json.loads(Path(args.data_file).read_text())
        times = [m["kafka_timestamp"] for m in raw if "kafka_timestamp" in m]
    else:
        messages, times = messages_from_json(spark, []), []
    start_ms = args.start_ms if args.start_ms is not None else (min(times) if times else 0)
    stop_ms = args.stop_ms if args.stop_ms is not None else (max(times) if times else None)
    start = StartMessage(
        job_id="file-maker-job",
        filename=str(args.output_file),
        nexus_structure=structure,
        start_time_ms=start_ms,
        stop_time_ms=stop_ms,
        instrument_name=args.instrument,
    )
    staging_dir = args.staging or tempfile.mkdtemp(prefix="k2n_staging_")
    result = run_job(spark, start, messages, staging_dir)
    hdf5.pack(staging_dir, args.output_file, template_file=_template_file(args))
    print(
        json.dumps(
            {
                "output": str(args.output_file),
                "staging": staging_dir,
                "metrics": result.metrics,
                "elapsed_sec": round(result.elapsed_sec, 3),
            }
        )
    )
    return 0


def template_maker(args) -> int:
    args.data_file = ""
    args.start_ms, args.stop_ms = 0, None
    return file_maker(args)


def worker(args) -> int:
    """Live worker loop: poll the pool transport, claim, run, report."""
    from .control.commands import JobController
    from .control.transport import make_transport
    from .streaming.job import run_streaming_job, run_streaming_job_from_files

    spark = _spark(args.master)
    transport = make_transport(
        args.transport,
        **(
            {"pool_dir": args.pool_dir, "worker_id": args.worker_id}
            if args.transport == "file"
            else {
                "brokers": args.brokers,
                "pool_topic": args.pool_topic,
                "worker_id": args.worker_id,
            }
        ),
    )
    controller = JobController(service_id=args.worker_id)
    import time as _time

    # x5f2 heartbeat cadence (StatusMasterInterval default 2 s, MainOpt.h:76)
    last_status = 0.0

    def heartbeat(force: bool = False) -> None:
        nonlocal last_status
        now = _time.monotonic()
        if force or now - last_status >= args.status_interval_s:
            transport.send_status(controller.status())
            last_status = now

    while True:
        heartbeat()  # idle heartbeats too (integration test :61)
        resp = transport.claim_into(controller)
        if resp is None:
            _time.sleep(args.poll_interval_s)
            continue
        if not resp.accepted:
            continue
        start = controller.current_job
        # C5: a start with control_topic redirects status until idle
        # (Master.cpp:74-76; reverted at setToIdle)
        if getattr(start, "control_topic", ""):
            transport.use_alternative_status_channel(start.control_topic)
        heartbeat(force=True)  # announce writing state immediately
        out_dir = str(Path(args.out_root) / start.job_id)
        ckpt = str(Path(args.out_root) / f"{start.job_id}_ckpt")
        # A failed job reports wrdn with error_encountered and returns the
        # worker to the pool (Master catches startWriting/run errors and
        # stays alive; FeedbackProducer publishStoppedMsg carries the
        # error) — one bad job never kills the worker.
        error_message = ""
        final_path = ""
        try:
            # HDF output prefix semantics (MainOpt.h hdf_output_prefix):
            # the pl72 filename is relative to out_root — an absolute
            # filename is re-rooted, and any directory components are
            # created. The filename is a Kafka-controlled field, so
            # containment is CHECKED, not assumed: a path that escapes
            # the prefix (e.g. via '..') is a job error reported in wrdn,
            # inside this try so one bad job never kills the worker.
            rel = Path(start.filename)
            if rel.is_absolute():
                rel = Path(*rel.parts[1:])
            out_root = Path(args.out_root).resolve()
            resolved = (out_root / rel).resolve()
            if not resolved.is_relative_to(out_root):
                raise ValueError(
                    f"pl72 filename {start.filename!r} escapes hdf_output_prefix"
                )
            resolved.parent.mkdir(parents=True, exist_ok=True)
            final_path = str(resolved)
            snap = (
                {"snapshot_path": final_path,
                 "snapshot_every": args.live_snapshot_interval}
                if args.live_snapshot_interval > 0
                else {}
            )
            if args.fixture_dir:
                # broker-free mode: JSON-lines directory source, AvailableNow
                query, job = run_streaming_job_from_files(
                    spark, start, args.fixture_dir, out_dir, ckpt, **snap
                )
                query.awaitTermination()
            else:
                query, job = run_streaming_job(
                    spark, start, args.brokers, out_dir, checkpoint_dir=ckpt,
                    **snap,
                )
                while query.isActive and not job.state.finished:
                    heartbeat()
                    _time.sleep(1.0)
                query.stop()
            job.finalize()
            from .sinks import hdf5

            # Pack to a sibling temp file and atomically publish, like the
            # mid-run snapshot() path: with live snapshots armed, external
            # readers may be polling final_path — a direct mode-'w' pack
            # would truncate the last published snapshot in place and show
            # them a torn file (and lose it if the pack crashed midway).
            tmp_pack = final_path + ".packing"
            # file_name must record the PUBLISHED path, not the temp name
            # the bytes are staged under.
            hdf5.pack(out_dir, tmp_pack, file_name=final_path)
            os.replace(tmp_pack, final_path)
        except Exception as exc:  # noqa: BLE001 - worker must survive bad jobs
            error_message = str(exc) or exc.__class__.__name__
        # wrdn carries the FULL written path and the pl72 metadata string
        # (Master.cpp:144-153 passes writtenFilePath +
        # metadata_from_start_msg into publishStoppedMsg)
        wrdn = controller.finished_writing(
            error_message, metadata=start.metadata or "{}"
        )
        wrdn["file_name"] = final_path
        transport.send_finished(wrdn)
        controller.set_idle()
        transport.revert_status_channel()
        heartbeat(force=True)  # idle state announced on the default channel
        if args.once:
            return 0 if not error_message else 1


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="kafka_to_nexus_spark")
    sub = parser.add_subparsers(dest="cmd", required=True)

    fm = sub.add_parser("file-maker", help="offline batch write (file-maker.cpp)")
    _add_common(fm)
    fm.add_argument("-d", "--data-file", default="", help="message data JSON")
    fm.add_argument("--start-ms", type=int, default=None)
    fm.add_argument("--stop-ms", type=int, default=None)
    fm.set_defaults(fn=file_maker)

    tm = sub.add_parser("template-maker", help="structure only (template-maker.cpp)")
    _add_common(tm)
    tm.set_defaults(fn=template_maker)

    wk = sub.add_parser("kafka-to-nexus", help="live worker (kafka-to-nexus.cpp)")
    wk.add_argument("--transport", choices=("file", "kafka"), default="kafka")
    wk.add_argument("--pool-dir", default="", help="file transport pool directory")
    wk.add_argument("--brokers", default="")
    wk.add_argument("--pool-topic", default="job_pool")
    wk.add_argument("--worker-id", default="kafka-to-nexus-spark")
    wk.add_argument("--out-root", default=".")
    wk.add_argument("--poll-interval-s", type=float, default=1.0)
    wk.add_argument("--status-interval-s", type=float, default=2.0,
                    help="x5f2 heartbeat interval (StatusMasterInterval)")
    wk.add_argument("--master", default="local[*]")
    wk.add_argument("--once", action="store_true", help="exit after one job")
    wk.add_argument("--fixture-dir", default="",
                    help="broker-free: stream JSON-lines fixtures from this dir")
    wk.add_argument("--live-snapshot-interval", type=int, default=0,
                    help="K5 SWMR analog: republish a readable HDF5 file at "
                         "the output path every N micro-batches (0 = off)")
    wk.set_defaults(fn=worker)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
