"""Batch job runner — the ``file-maker`` equivalent (SURVEY.md §3.2).

Executes a full job: StartMessage → plan → one filtered scan → per-stream
module transforms → staged columnar output + hierarchical metadata.

Execution shape (Spark-first):
- ONE windowed/validated DataFrame is built and persisted per job, then
  every stream binding filters from it — the F8/F9 shared-scan multiplexing
  the reference gets from its per-topic consumer sets
  (src/Stream/Partition.cpp:15-48, StreamController.cpp:109-151).
- All plan work is driver-side Python; all data movement is DataFrames;
  nothing in the data path collects to the driver. Job-summary aggregates
  (T6) are tiny per-source rows and are the only collected values.
"""

from __future__ import annotations

import time
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .modules import REGISTRY as MODULE_REGISTRY
from .modules import accepts_repeated_timestamps, get_module, group_streams
from .operators import filters, quality
from .plan import Plan, StartMessage, build_plan
from .plan.model import StreamBinding
from .modules import mdat as mdat_module
from .sinks import staging

MS_TO_NS = 1_000_000

# Arrival-order column per (module, dataset) — reproduces the reference's
# per-partition consumption-order append (SURVEY.md §7 "arrival-order
# output"); helper columns are dropped after ordering.
ORDER_COLS: dict[tuple[str, str], list[str]] = {
    ("f144", "log"): ["time"],
    ("ev44", "events"): ["_global_index"],
    ("ev44", "pulses"): ["event_time_zero"],
    ("se00", "log"): ["time"],
    ("tdct", "tdc"): ["time"],
    ("ad00", "frames"): ["time"],
    ("da00", "frames"): ["time"],
    ("al00", "alarms"): ["alarm_time"],
    ("ep01", "status"): ["connection_status_time"],
}
HELPER_COLS = ("_global_index", "row_index")


@dataclass
class JobResult:
    out_dir: str
    plan: Plan
    metrics: dict = field(default_factory=dict)
    metadata_values: dict = field(default_factory=dict)
    elapsed_sec: float = 0.0


def _stream_key(s: StreamBinding) -> str:
    return f"{s.path}:{s.module}:{s.source}"


def run_job(
    spark: SparkSession,
    start: StartMessage,
    messages: DataFrame,
    out_dir: str,
    registrar=None,
) -> JobResult:
    """``registrar``: optional ``metrics.Registrar`` — the job's folded
    counters are published under ``writer.<job_id>.*`` for the C6
    reporting surface (log/Carbon/file sinks)."""
    t0 = time.perf_counter()
    plan = build_plan(start.nexus_structure)

    # Plan-time validation, like the reference's JobCreator (unknown module
    # → job rejected before any work starts, JobCreator.cpp:148-189).
    unknown = sorted({s.module for s in plan.streams} - set(MODULE_REGISTRY))
    if unknown:
        raise ValueError(f"unknown writer module id(s) in nexus_structure: {unknown}")

    start_ns = start.start_time_ms * MS_TO_NS
    stop_ns = None if start.stop_time_ms is None else start.stop_time_ms * MS_TO_NS

    # D1–D4 validation with observable error counters, then the job window
    # with as-of buffering — one shared scan for every stream (F8/F9).
    observed, obs = quality.observe_stream_metrics(messages)
    valid = quality.valid_only(observed)
    windowed = filters.with_asof_buffer(valid, start_ns, stop_ns).persist()
    # Materialize the shared scan ONCE before fanning out: the observe
    # metrics node must be traversed by exactly one deterministic action —
    # concurrent first-touch from the binding pool races the cache and can
    # skip it.
    windowed.count()

    stream_outputs: dict[str, list[str]] = {}
    metadata_values: dict[str, object] = {}

    def process_binding(binding: StreamBinding) -> tuple[str, list[str], dict]:
        module = get_module(binding.module)
        src = filters.source_filter(windowed, binding.module, binding.source)
        if not accepts_repeated_timestamps(binding.module):
            src = filters.drop_repeated_timestamps(src)

        outputs = module.transform(src, binding.config)
        written: list[str] = []
        for dataset, df in outputs.items():
            order = [c for c in ORDER_COLS.get((binding.module, dataset), []) if c in df.columns]
            if order:
                df = df.orderBy(*order)
            df = df.drop(*[c for c in HELPER_COLS if c in df.columns])
            staging.write_dataset(df, out_dir, binding.path, dataset)
            written.append(dataset)

        # T6 job-summary aggregates (e.g. f144 min/max/mean, ev44 counts);
        # "meta_data": false suppresses them (f144_Writer.cpp:264,282)
        values: dict[str, object] = {}
        if hasattr(module, "aggregates") and (binding.config or {}).get(
            "meta_data", True
        ):
            agg_input = outputs.get("log", src)
            agg_row = module.aggregates(agg_input, binding.config).collect()
            if agg_row:
                for name, value in agg_row[0].asDict().items():
                    values[f"{binding.path}/{name}"] = value
        # write-once statics (da00 constants) + synthesized group attrs
        if hasattr(module, "statics"):
            for name, value in module.statics(src, binding.config).items():
                values[f"{binding.path}/{name}"] = value
        attrs = [
            {"path": binding.path, **a}
            for a in (
                module.group_attributes(binding.config)
                if hasattr(module, "group_attributes")
                else []
            )
        ]
        return _stream_key(binding), written, values, attrs

    def process_group(module_id: str, group: list[StreamBinding]):
        """1000-source fast path: same-module same-config row-wise bindings
        run as ONE filter + transform + partitionBy write (plus one grouped
        aggregate job), instead of one Spark job pipeline per source. The
        per-source path degrades linearly in job-scheduler overhead; this
        path is O(modules) per job regardless of source count."""
        module = get_module(module_id)
        config = group[0].config
        sources = [b.source for b in group]
        src = windowed.filter(
            (F.col("schema") == module_id) & F.col("source_name").isin(sources)
        )
        if not accepts_repeated_timestamps(module_id):
            # already partitions by (schema, source) internally
            src = filters.drop_repeated_timestamps(src)
        keyed = src.withColumn("__source", F.col("source_name"))
        outputs = module.transform(keyed, config)
        path_by_source = {b.source: b.path for b in group}
        written: list[str] = []
        for dataset, df in outputs.items():
            order = [c for c in ORDER_COLS.get((module_id, dataset), []) if c in df.columns]
            if order:
                # repartition BY SOURCE first: each source then lands whole
                # in one task, so sortWithinPartitions gives the same
                # per-source global order the per-binding path gets from
                # orderBy (and one ordered part file per source dir) —
                # without it, a source spanning tasks concatenates part
                # files in task order and the packed time axis is not
                # monotone
                df = df.repartition("__source").sortWithinPartitions(
                    "__source", *order
                )
            df = df.drop(*[c for c in HELPER_COLS if c in df.columns])
            staging.write_dataset_grouped(df, out_dir, path_by_source, dataset)
            written.append(dataset)
        values: dict[str, object] = {}
        if hasattr(module, "aggregates") and (config or {}).get("meta_data", True):
            agg_input = outputs.get("log", keyed)
            rows = module.aggregates(agg_input, config, group_key="__source").collect()
            by_source = {r["__source"]: r.asDict() for r in rows}
            # groupBy drops zero-row sources, but the per-binding path's
            # global aggregate still yields one row for them (None min/max,
            # 0 counts). Emit the identical row for parity — computed once
            # from an empty slice and shared by every empty source.
            empty_row: dict[str, object] | None = None
            for b in group:
                got = by_source.get(b.source)
                if got is None:
                    if empty_row is None:
                        empty_row = (
                            module.aggregates(agg_input.limit(0), config)
                            .collect()[0]
                            .asDict()
                        )
                    got = empty_row
                for name, value in got.items():
                    if name != "__source":
                        values[f"{b.path}/{name}"] = value
        attrs = [
            {"path": b.path, **a}
            for b in group
            for a in (
                module.group_attributes(config)
                if hasattr(module, "group_attributes")
                else []
            )
        ]
        # group-wide values/attrs ride on the first tuple only
        return [
            (_stream_key(b), written, values if i == 0 else {}, attrs if i == 0 else [])
            for i, b in enumerate(group)
        ]

    # Group same-module, same-shape, row-wise bindings into one pass each
    # (modules.group_streams); everything else takes the per-binding path.
    # Per-stream jobs are submitted CONCURRENTLY so the scheduler
    # interleaves their tasks instead of leaving slots idle between serial
    # actions — the reference gets the same effect from its per-partition
    # threads feeding one writer.
    groups, singles = group_streams(plan.streams)

    extra_group_attrs: list[dict] = []
    if plan.streams:
        with ThreadPoolExecutor(
            max_workers=min(8, max(len(singles) + len(groups), 1))
        ) as pool:
            futures = [pool.submit(process_binding, b) for b in singles]
            gfutures = [
                pool.submit(process_group, mod, grp)
                for (mod, _cfg), grp in groups.items()
            ]
            results = [f.result() for f in futures]
            for gf in gfutures:
                results.extend(gf.result())
        for key, written, values, attrs in results:
            stream_outputs[key] = written
            metadata_values.update(values)
            extra_group_attrs.extend(attrs)

    # W9 mdat run metadata (plan-level constants)
    for m in plan.mdat:
        for name, value in mdat_module.values(
            {"items": m.items}, start.start_time_ms, start.stop_time_ms
        ).items():
            metadata_values[f"{m.path.rstrip('/')}/{name}"] = value

    windowed.unpersist()

    job_info = {
        "job_id": start.job_id,
        "filename": start.filename,
        "start_time_ms": start.start_time_ms,
        "stop_time_ms": start.stop_time_ms,
        "instrument_name": start.instrument_name,
    }
    staging.write_meta(
        out_dir, plan, job_info, stream_outputs, metadata_values,
        extra_group_attributes=extra_group_attrs,
    )

    try:
        metrics = dict(obs.get)
    except Exception:
        # Catalyst's empty-relation propagation can eliminate the observe
        # node entirely (e.g. zero-message job) — report zero counters.
        metrics = dict(quality.ZERO_METRICS)
    # K6 — approximate output size gauge (FileWriterTask.h:103-111
    # approx_file_size_mb, recomputed periodically by StreamController)
    metrics["approx_file_size_mb"] = staging.approximate_size_mb(out_dir)
    if registrar is not None:
        from .metrics import registrar_from_counts

        registrar_from_counts(
            metrics, f"writer.{start.job_id}", registrar
        )
    return JobResult(
        out_dir=out_dir,
        plan=plan,
        metrics=metrics,
        metadata_values=metadata_values,
        elapsed_sec=round(time.perf_counter() - t0, 3),
    )
