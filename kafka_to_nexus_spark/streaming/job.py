"""Streaming mode: the same job DAG on Structured Streaming (SURVEY.md §7.5).

Shape:
- source: ``readStream.format("kafka")`` with time→offset pushdown
  (``startingOffsetsByTimestamp`` — the reference's
  ``offsetsForTimes(start - BeforeStartTime)``, src/Stream/Topic.cpp:109-155)
  and backpressure via ``maxOffsetsPerTrigger`` (F10 analog of
  MaxQueuedWrites throttling, src/StreamController.cpp:186-201);
- decode: envelope columns from the Kafka value (JSON payload decoder
  built-in; a FlatBuffers decoder slots in behind the same interface when
  the ``flatbuffers`` package is present);
- sink: ``foreachBatch`` → the SAME per-stream filter+transform pipeline as
  the batch runner, plus the two pieces of genuinely cross-batch state the
  reference keeps (SURVEY.md §7 "hard parts"):
    * F3 as-of buffer — latest pre-start message per source, emitted when
      the first in-window message arrives or at stop
      (src/Stream/SourceFilter.cpp:61-66);
    * W2 cumulative event index — events written so far per source
      (src/WriterModule/ev44/ev44_Writer.cpp:107-117).
  Both are tiny (one row / one counter per source) and live on the driver,
  exactly like the reference's single-writer state; everything bulky stays
  distributed.
- stop: driver watchdog ends the query once a batch shows event times past
  ``stop + AfterStopTime`` leeway on every partition (F6/F7,
  src/Stream/PartitionFilter.cpp:46-68) — Spark has no per-partition stop,
  so the watchdog mirrors the reference's topic-level check.

Tested Kafka-free by feeding ``process_batch`` a sequence of batch
DataFrames (micro-batch contract is identical); the Kafka wiring itself is
config assembly, exercised wherever a broker exists.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Row, SparkSession, Window
from pyspark.sql import functions as F

from ..modules import accepts_repeated_timestamps, get_module
from ..operators import filters, quality
from ..plan import Plan, StartMessage, build_plan
from ..schemas import MESSAGE_SCHEMA
from ..sinks import staging

MS_TO_NS = 1_000_000
DEFAULT_TRIGGER = "10 seconds"  # reference DataFlushInterval (StreamerOptions.h:20)
AFTER_STOP_LEEWAY_NS = 10_000_000_000  # AfterStopTime (StreamerOptions.h:25)
BEFORE_START_LEEWAY_NS = 10_000_000_000  # BeforeStartTime (StreamerOptions.h:24)


# --------------------------------------------------------------------------
# Kafka source assembly (S1–S3)
# --------------------------------------------------------------------------

def kafka_stream_reader(
    spark: SparkSession,
    brokers: str,
    topics: list[str],
    start_time_ms: int | None = None,
    max_offsets_per_trigger: int | None = 100_000,
):
    """readStream with time→offset pushdown and backpressure.

    startingOffsetsByTimestamp applies start - BeforeStartTime per topic —
    the planner-side predicate pushdown of S2 (no history scan)."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", ",".join(topics))
        .option("failOnDataLoss", "false")
    )
    if start_time_ms is not None:
        lookback_ms = max(start_time_ms - BEFORE_START_LEEWAY_NS // MS_TO_NS, 0)
        reader = reader.option(
            "startingOffsetsByTimestamp",
            json.dumps({t: {"-1": lookback_ms} for t in topics}),
        )
    if max_offsets_per_trigger:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    return reader


def kafka_batch_reader(
    spark: SparkSession,
    brokers: str,
    topics: list[str],
    start_time_ms: int | None = None,
    stop_time_ms: int | None = None,
):
    """Batch Kafka read with BOTH bounds pushed down
    (endingOffsetsByTimestamp = early-termination F7 as a scan bound)."""
    reader = (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", ",".join(topics))
    )
    if start_time_ms is not None:
        lookback = max(start_time_ms - BEFORE_START_LEEWAY_NS // MS_TO_NS, 0)
        reader = reader.option(
            "startingOffsetsByTimestamp",
            json.dumps({t: {"-1": lookback} for t in topics}),
        )
    if stop_time_ms is not None:
        leeway = stop_time_ms + AFTER_STOP_LEEWAY_NS // MS_TO_NS
        reader = reader.option(
            "endingOffsetsByTimestamp",
            json.dumps({t: {"-1": leeway} for t in topics}),
        )
    return reader


def envelope_from_kafka_json(kafka_df: DataFrame) -> DataFrame:
    """Decode Kafka rows whose value is a JSON-encoded message fixture into
    the engine envelope (D1–D3). A FlatBuffers decoder implements the same
    contract via mapInPandas when the ``flatbuffers`` package exists."""
    parsed = kafka_df.select(
        F.col("topic"),
        F.col("partition"),
        F.col("offset"),
        (F.col("timestamp").cast("double") * 1000).cast("long").alias("kafka_timestamp"),
        F.from_json(F.col("value").cast("string"), MESSAGE_SCHEMA).alias("m"),
    )
    payload_cols = [c for c in MESSAGE_SCHEMA.fieldNames() if c not in
                    ("topic", "partition", "offset", "kafka_timestamp")]
    return parsed.select("topic", "partition", "offset", "kafka_timestamp",
                         *[F.col(f"m.{c}").alias(c) for c in payload_cols])


# --------------------------------------------------------------------------
# Cross-batch state + micro-batch processor (K1 analog)
# --------------------------------------------------------------------------

@dataclass
class StreamingJobState:
    """The only cross-batch state the reference keeps, one entry per source:
    the buffered pre-start message and the cumulative event count."""

    asof_buffer: dict[tuple[str, str], Row] = field(default_factory=dict)
    asof_emitted: set = field(default_factory=set)
    events_written: dict[tuple[str, str], int] = field(default_factory=dict)
    # F4 across micro-batches: ts of the last row written per dedup'ing
    # source — the reference's SourceFilter keeps this across polls
    # (SourceFilter.cpp:90-95), so a repeat straddling a batch boundary
    # must still be dropped.
    last_written_ts: dict[tuple[str, str], int] = field(default_factory=dict)
    batches_processed: int = 0
    max_event_time_ns: int = 0
    finished: bool = False


class StreamingJob:
    """foreachBatch processor executing the job plan per micro-batch."""

    def __init__(
        self,
        spark: SparkSession,
        start: StartMessage,
        out_dir: str,
    ) -> None:
        self.spark = spark
        self.start = start
        self.out_dir = out_dir
        self.plan: Plan = build_plan(start.nexus_structure)
        self.state = StreamingJobState()
        self.start_ns = start.start_time_ms * MS_TO_NS
        self.stop_ns = (
            None if start.stop_time_ms is None else start.stop_time_ms * MS_TO_NS
        )

    # -- control-plane hooks ------------------------------------------------

    def retarget_stop(self, stop_time_ms: int) -> None:
        """6s4t stop retarget on a RUNNING job (Commands.h:32-37,
        Master.cpp stop-time update): subsequent micro-batches filter
        against the new stop; the watchdog re-arms against it. Stop-now =
        retarget to the current wall clock."""
        self.stop_ns = stop_time_ms * MS_TO_NS
        self.state.finished = (
            self.state.max_event_time_ns > self.stop_ns + AFTER_STOP_LEEWAY_NS
        )

    # -- helpers -----------------------------------------------------------

    def _update_asof_buffer(self, batch: DataFrame) -> None:
        """Fold this batch's pre-start rows into the per-source buffer
        (latest wins). Pre-start data is bounded by the 10 s leeway, so
        this collect is a handful of rows, like the reference's one
        buffered message per source."""
        pre = filters.last_before_start(
            batch, self.start_ns, filters.SOURCE_COLS, filters.TS, filters.ORDER_COLS
        ).collect()
        for row in pre:
            key = (row["schema"], row["source_name"])
            cur = self.state.asof_buffer.get(key)
            if cur is None or (row["timestamp"], row["offset"]) > (
                cur["timestamp"],
                cur["offset"],
            ):
                self.state.asof_buffer[key] = row

    def _buffered_df(self, keys: set[tuple[str, str]]) -> DataFrame | None:
        rows = [
            self.state.asof_buffer[k]
            for k in keys
            if k in self.state.asof_buffer and k not in self.state.asof_emitted
        ]
        if not rows:
            return None
        df = self.spark.createDataFrame(rows, MESSAGE_SCHEMA)
        return df.withColumn("is_buffered_message", F.lit(True))

    # -- the micro-batch hook ---------------------------------------------

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        st = self.state
        if st.finished:
            return
        batch = quality.valid_only(quality.with_error_code(batch))
        batch = batch.persist()
        try:
            self._update_asof_buffer(batch)

            in_window = filters.window_filter(batch, self.start_ns, self.stop_ns)
            in_window = in_window.withColumn("is_buffered_message", F.lit(False))

            # sources with in-window data this batch get their buffered
            # row emitted first (SourceFilter: emit on first accepted msg)
            present = {
                (r["schema"], r["source_name"])
                for r in in_window.select("schema", "source_name").distinct().collect()
            }
            buffered = self._buffered_df(present)
            if buffered is not None:
                in_window = buffered.unionByName(in_window)
                st.asof_emitted.update(present)

            self._write_streams(in_window)

            # stop watchdog input: max event time seen (F6/F7)
            mx = batch.agg(F.max("timestamp")).collect()[0][0]
            if mx is not None:
                st.max_event_time_ns = max(st.max_event_time_ns, int(mx))
            if (
                self.stop_ns is not None
                and st.max_event_time_ns > self.stop_ns + AFTER_STOP_LEEWAY_NS
            ):
                st.finished = True
            st.batches_processed += 1
        finally:
            batch.unpersist()

    def _write_streams(self, windowed: DataFrame) -> None:
        st = self.state
        for binding in self.plan.streams:
            module = get_module(binding.module)
            src = filters.source_filter(windowed, binding.module, binding.source)
            key = (binding.module, binding.source)
            if not accepts_repeated_timestamps(binding.module):
                src = filters.drop_repeated_timestamps(src)
                # cross-batch repeat: the batch's FIRST row (lag == null,
                # so the window op keeps it) still repeats if its ts equals
                # the last ts written in an earlier batch
                last = self.state.last_written_ts.get(key)
                if last is not None:
                    w = Window.orderBy("partition", "offset")
                    src = (
                        src.withColumn("_rn", F.row_number().over(w))
                        .filter(~((F.col("_rn") == 1) & (F.col("timestamp") == F.lit(last))))
                        .drop("_rn")
                    )
                tail = (
                    src.agg(
                        F.max_by(
                            "timestamp", F.struct("partition", "offset")
                        ).alias("ts")
                    ).collect()[0]["ts"]
                )
                if tail is not None:
                    self.state.last_written_ts[key] = int(tail)
            outputs = module.transform(src, binding.config)
            for dataset, df in outputs.items():
                # W2: shift this batch's indices by the cumulative count
                if binding.module == "ev44" and dataset == "pulses":
                    df = df.withColumn(
                        "event_index",
                        F.col("event_index") + F.lit(st.events_written.get(key, 0)),
                    )
                df = df.drop(*[c for c in ("_global_index", "row_index") if c in df.columns])
                target = staging.dataset_dir(self.out_dir, binding.path, dataset)
                df.write.mode("append").parquet(str(target))
            if binding.module == "ev44":
                n = module.aggregates(src, binding.config).collect()[0]["events"]
                st.events_written[key] = st.events_written.get(key, 0) + int(n)

    def finalize(self) -> None:
        """At stop: emit still-unconsumed buffered rows (SourceFilter
        flushes its buffer at finish, SourceFilter.cpp:53,61-66)."""
        remaining = set(self.state.asof_buffer) - self.state.asof_emitted
        buffered = self._buffered_df(remaining)
        if buffered is not None:
            self._write_streams(buffered)
            self.state.asof_emitted.update(remaining)


def run_streaming_job(
    spark: SparkSession,
    start: StartMessage,
    brokers: str,
    out_dir: str,
    checkpoint_dir: str,
    trigger: str = DEFAULT_TRIGGER,
    available_now: bool = False,
):
    """Wire Kafka source → decode → foreachBatch(StreamingJob). Returns
    (StreamingQuery, StreamingJob); caller awaits + finalizes."""
    plan = build_plan(start.nexus_structure)
    job = StreamingJob(spark, start, out_dir)
    source = kafka_stream_reader(spark, brokers, plan.topics, start.start_time_ms).load()
    envelope = envelope_from_kafka_json(source)
    writer = envelope.writeStream.option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=trigger)
    query = writer.foreachBatch(job.process_batch).start()
    return query, job
