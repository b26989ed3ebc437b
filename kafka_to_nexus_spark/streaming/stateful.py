"""Custom stateful streaming operators via ``applyInPandasWithState``.

The batch runner computes W1/T6 running aggregates with hash aggregation;
in live streaming mode the same running min/max/mean/count per source is a
classic keyed-state operator. This is the Spark-native replacement for the
reference's writer-side accumulators (f144 min/max/mean metadata,
src/WriterModule/f144/f144_Writer.cpp:265-287; event counts,
ev44_Writer.cpp:139-143): state is one tiny tuple per (schema, source) key
held by the state store — checkpointed, partitioned, and scalable to
millions of sources, unlike driver-side dicts.

Works on any streaming DataFrame with the engine envelope columns; each
trigger emits the updated running aggregate per key ("update" output mode
semantics).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

RUNNING_STATS_SCHEMA = StructType(
    [
        StructField("schema", StringType()),
        StructField("source_name", StringType()),
        StructField("minimum_value", DoubleType()),
        StructField("maximum_value", DoubleType()),
        StructField("average_value", DoubleType()),
        StructField("n_values", LongType()),
    ]
)

# state tuple: (min, max, sum, count)
_STATE_SCHEMA = "min double, max double, sum double, count long"


def _update_running_stats(
    key: tuple[str, str],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        mn, mx, sm, cnt = state.get
    else:
        mn, mx, sm, cnt = (None, None, 0.0, 0)
    for pdf in pdfs:
        vals = pdf["value"].dropna()
        if len(vals) == 0:
            continue
        b_min, b_max = float(vals.min()), float(vals.max())
        mn = b_min if mn is None else min(mn, b_min)
        mx = b_max if mx is None else max(mx, b_max)
        sm += float(vals.sum())
        cnt += int(len(vals))
    state.update((mn, mx, sm, cnt))
    if cnt:
        yield pd.DataFrame(
            {
                "schema": [key[0]],
                "source_name": [key[1]],
                "minimum_value": [mn],
                "maximum_value": [mx],
                "average_value": [sm / cnt],
                "n_values": [cnt],
            }
        )


def running_stats(stream: DataFrame) -> DataFrame:
    """Keyed running min/max/mean/count per (schema, source_name).

    State store keeps one 4-tuple per source; Arrow batches carry the data.
    Use with ``outputMode("update")``.
    """
    return stream.groupBy("schema", "source_name").applyInPandasWithState(
        _update_running_stats,
        outputStructType=RUNNING_STATS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def batch_equivalent(df: DataFrame) -> DataFrame:
    """The batch-mode plan of the same aggregate (for test parity)."""
    from pyspark.sql import functions as F

    return df.groupBy("schema", "source_name").agg(
        F.min("value").alias("minimum_value"),
        F.max("value").alias("maximum_value"),
        (F.sum("value") / F.count("value")).alias("average_value"),
        F.count("value").alias("n_values"),
    )


def _with_event_time(stream: DataFrame, ts_col: str, watermark: str) -> DataFrame:
    """Project the engine's int64-ns timestamp to a µs ``event_time``
    column and attach the watermark — the shared front door of every
    event-time operator here. Integer division (``div``): double division
    loses precision at ~1.7e18 ns."""
    from pyspark.sql import functions as F

    return stream.withColumn(
        "event_time", F.timestamp_micros(F.expr(f"`{ts_col}` div 1000"))
    ).withWatermark("event_time", watermark)


# ---------------------------------------------------------------------------
# Watermarked windowed aggregation — the built-in late-data path.
# ---------------------------------------------------------------------------

def windowed_counts(
    stream: DataFrame,
    window: str = "1 minute",
    watermark: str = "30 seconds",
    ts_col: str = "timestamp",
) -> DataFrame:
    """Per-source tumbling-window counts/sums with a watermark bounding
    late data. In append output mode a window is emitted exactly once,
    when the watermark passes its end; data arriving after that
    finalization is discarded and never re-emitted. (The guarantee is
    one-directional: a late-but-pre-eviction row may still aggregate.)
    The state store holds only open windows, so state is
    O(open windows × sources) regardless of stream length.

    The engine analog of the reference's leeway handling
    (BeforeStartTime/AfterStopTime, src/StreamerOptions.h:24-25): late
    arrivals inside the leeway participate, older ones are dropped —
    except Spark applies it per window instead of only at the job edge.
    """
    from pyspark.sql import functions as F

    with_time = _with_event_time(stream, ts_col, watermark)
    return (
        with_time.groupBy(
            F.window("event_time", window).alias("win"), F.col("source_name")
        )
        .agg(
            F.count(F.lit(1)).alias("n_messages"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "source_name",
            "n_messages",
            "sum_value",
        )
    )


# ---------------------------------------------------------------------------
# Stateful session windows — applyInPandasWithState + event-time timeout.
# ---------------------------------------------------------------------------

SESSION_SCHEMA = StructType(
    [
        StructField("source_name", StringType()),
        StructField("session_start_ns", LongType()),
        StructField("session_end_ns", LongType()),
        StructField("n_events", LongType()),
    ]
)

# state: open session (start, end, count) in ns
_SESSION_STATE = "start long, end long, n long"


def _set_clamped_timeout(state: GroupState, ts_ms: int) -> None:
    """Arm an event-time timeout, clamped above the current watermark — a
    micro-batch can deliver rows whose horizon the watermark has already
    passed, and Spark rejects a stamp at/before the watermark
    (INVALID_TIMEOUT_TIMESTAMP); the clamp finalizes such state at the
    next timeout sweep instead of failing the batch."""
    state.setTimeoutTimestamp(max(ts_ms, state.getCurrentWatermarkMs() + 1))


def _make_session_fn(gap_ns: int):
    def update(
        key: tuple[str],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        # Event-time timeout: the watermark passed the open session's
        # gap horizon with no new data → the session is final.
        if state.hasTimedOut:
            s, e, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "source_name": [key[0]],
                    "session_start_ns": [s],
                    "session_end_ns": [e],
                    "n_events": [n],
                }
            )
            return
        cur = state.get if state.exists else None
        closed: list[tuple[int, int, int]] = []
        ts_all = (
            pd.concat([pdf["timestamp"] for pdf in pdfs]).dropna().sort_values()
        )
        for t in ts_all:
            t = int(t)
            if cur is None:
                cur = (t, t, 1)
            elif t - cur[1] <= gap_ns:
                # min() on the start: a cross-batch out-of-order row inside
                # the watermark can precede the open session's first event
                cur = (min(cur[0], t), max(cur[1], t), cur[2] + 1)
            else:  # intra-batch gap: previous session is definitively over
                closed.append(cur)
                cur = (t, t, 1)
        if cur is not None:
            state.update(cur)
            # wake when the watermark passes end + gap (ms precision)
            _set_clamped_timeout(state, (cur[1] + gap_ns) // 1_000_000)
        if closed:
            yield pd.DataFrame(
                {
                    "source_name": [key[0]] * len(closed),
                    "session_start_ns": [c[0] for c in closed],
                    "session_end_ns": [c[1] for c in closed],
                    "n_events": [c[2] for c in closed],
                }
            )

    return update


def session_windows(
    stream: DataFrame,
    gap: str = "1 minute",
    watermark: str = "30 seconds",
    ts_col: str = "timestamp",
) -> DataFrame:
    """Event-time session windows per source with a custom stateful
    operator: rows within ``gap`` of the open session extend it; a gap
    inside a batch closes the previous session immediately; an idle
    session closes when the watermark passes its gap horizon
    (``GroupStateTimeout.EventTimeTimeout``). State is one (start, end,
    count) tuple per source in the checkpointed state store — the shape
    ``applyInPandasWithState`` exists for: semantics the built-in
    ``session_window`` aggregation can't express per-key (e.g. emitting
    intra-batch closures eagerly, or extending to per-session payloads).
    """
    from pyspark.sql import functions as F

    gap_ns = _parse_duration_ns(gap)
    with_time = _with_event_time(stream, ts_col, watermark)
    return with_time.groupBy("source_name").applyInPandasWithState(
        _make_session_fn(gap_ns),
        outputStructType=SESSION_SCHEMA,
        stateStructType=_SESSION_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def _parse_duration_ns(text: str) -> int:
    qty, unit = text.split()
    mult = {
        "second": 1_000_000_000, "seconds": 1_000_000_000,
        "minute": 60_000_000_000, "minutes": 60_000_000_000,
        "hour": 3_600_000_000_000, "hours": 3_600_000_000_000,
    }[unit]
    return int(qty) * mult


# ---------------------------------------------------------------------------
# Streaming deduplication — the streaming complement of the batch dedup
# family (llm/dedup.py L1): first occurrence passes through, duplicates are
# suppressed across micro-batches, and the census variant reports copy
# counts when a fingerprint's watermark horizon passes.
# ---------------------------------------------------------------------------


def dedup_stream(
    stream: DataFrame,
    fingerprint_col: str = "fingerprint",
    watermark: str = "10 minutes",
    ts_col: str = "timestamp",
) -> DataFrame:
    """First-occurrence pass-through dedup over a streaming DataFrame.

    Built-in operators all the way: ``dropDuplicatesWithinWatermark`` on
    the fingerprint passes exactly ONE copy per fingerprint within the
    watermark window AND evicts each entry once the watermark passes it —
    plain ``dropDuplicates`` would keep streaming-dedup state forever when
    the event-time column is not part of the subset. Which intra-batch
    copy survives follows Spark's arrival order (partition-race, not
    globally deterministic) — rows from LATER in-horizon batches are
    always suppressed; use ``dedup_census`` when the deterministic
    first-seen timestamp matters. State-store footprint = one entry per
    DISTINCT fingerprint younger than the watermark; a duplicate arriving
    after its original's eviction is treated as new (the price of bounded
    state, same trade the batch MinHash/LSH pipeline makes by banding).

    The caller derives ``fingerprint_col`` (e.g. ``md5(text)`` — the same
    fingerprint the batch ``dedup_exact`` census groups on)."""
    from pyspark.sql import functions as F

    with_time = _with_event_time(stream, ts_col, watermark)
    return with_time.dropDuplicatesWithinWatermark([fingerprint_col]).drop(
        "event_time"
    )


DEDUP_CENSUS_SCHEMA = StructType(
    [
        StructField("fingerprint", StringType()),
        StructField("first_seen_ns", LongType()),
        StructField("n_copies", LongType()),
    ]
)

# state per distinct fingerprint: (first_seen_ns, count, last_seen_ns) —
# last is persisted so an out-of-order in-horizon duplicate can never move
# the event-time timeout EARLIER than an already-armed one
_DEDUP_STATE = "first long, n long, last long"


def _dedup_census_update(
    key: tuple[str],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    # horizon passed: the census row for this fingerprint is final
    if state.hasTimedOut:
        first, n, _last = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "fingerprint": [key[0]],
                "first_seen_ns": [first],
                "n_copies": [n],
            }
        )
        return
    first, n, last = state.get if state.exists else (None, 0, 0)
    for pdf in pdfs:
        ts = pdf["timestamp"].dropna()
        if len(ts) == 0:
            continue
        b_min, b_max = int(ts.min()), int(ts.max())
        first = b_min if first is None else min(first, b_min)
        last = max(last, b_max)
        n += int(len(ts))
    if first is not None:
        state.update((first, n, last))
        # finalize once the watermark passes the latest copy (ms)
        _set_clamped_timeout(state, last // 1_000_000 + 1)


def dedup_census(
    stream: DataFrame,
    fingerprint_col: str = "fingerprint",
    watermark: str = "30 seconds",
    ts_col: str = "timestamp",
) -> DataFrame:
    """Streaming exact-dedup census: one (fingerprint, first_seen_ns,
    n_copies) row per distinct fingerprint, emitted when the watermark
    passes its last copy (``GroupStateTimeout.EventTimeTimeout``) — the
    streaming analog of the batch ``dedup_exact`` groupBy. State is one
    (first, n) tuple per in-horizon fingerprint in the checkpointed state
    store; emitted fingerprints are evicted, so state stays TTL-bounded on
    unbounded streams."""
    from pyspark.sql import functions as F

    with_time = _with_event_time(stream, ts_col, watermark)
    # canonical column names: the state function reads "fingerprint" and
    # "timestamp" (custom ts_col/fingerprint_col names are remapped here)
    keyed = with_time.select(
        F.col(fingerprint_col).alias("fingerprint"),
        F.col(ts_col).alias("timestamp"),
        "event_time",
    )
    return keyed.groupBy("fingerprint").applyInPandasWithState(
        _dedup_census_update,
        outputStructType=DEDUP_CENSUS_SCHEMA,
        stateStructType=_DEDUP_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming near-duplicate candidates — LSH bucket state with TTL.
# The streaming analog of the batch minhash → band → bucket-join pipeline
# (llm/dedup.py L2/L3): bucket membership lives in the state store instead
# of a self-join, so candidates stream out as soon as both docs have
# arrived, and state stays TTL-bounded on unbounded streams.
# ---------------------------------------------------------------------------

# state per source: rows admitted so far (one long — O(sources) state,
# like session_windows)
_QUOTA_STATE = "admitted long"

# state per shard when sharding: parallel arrays of in-shard sources and
# their admitted counts (the quota twin of _SHARD_STATE)
_QUOTA_SHARD_STATE = "sources array<string>, admitted array<long>"


def _nsmallest_chunks(
    cand: "pd.DataFrame | None", chunk: pd.DataFrame, ts_col: str, budget: int
) -> pd.DataFrame:
    """Running nsmallest-by-ts candidate frame across Arrow chunks
    (memory bound = budget rows). Stable mergesorts compose: ties keep
    arrival order, and earlier chunks' ties beat later chunks' because
    the running candidates are concatenated AHEAD of the new chunk."""
    chunk = chunk.sort_values(ts_col, kind="mergesort").iloc[:budget]
    if cand is None:
        return chunk
    return (
        pd.concat([cand, chunk])
        .sort_values(ts_col, kind="mergesort")
        .iloc[:budget]
    )


def _make_quota_fn(quota: int, cols: list, ts_col: str):
    """Per-source quota state function (one long per source)."""

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        before = state.get[0] if state.exists else 0
        budget = quota - before
        # applyInPandasWithState splits one group across multiple Arrow
        # chunks (spark.sql.execution.arrow.maxRecordsPerBatch rows
        # each), so event-time order must be decided across the WHOLE
        # iterator, not per chunk: emit ONCE after it drains.
        cand = None
        for pdf in pdfs:
            if budget <= 0 or not len(pdf):
                continue  # keep draining; budget exhausted or empty chunk
            cand = _nsmallest_chunks(cand, pdf, ts_col, budget)
        if cand is not None and len(cand):
            out = cand[cols].copy()
            out["quota_rank"] = range(before + 1, before + 1 + len(cand))
            # exhausted sources keep receiving rows every batch; skipping
            # the no-op commit keeps the state-store delta at O(sources
            # that admitted) instead of O(sources with data) (same lesson
            # as the near-dup sharded state: unchanged entries must not
            # rewrite)
            state.update((before + len(cand),))
            yield out

    return update


def _quota_state_key(src) -> str:
    """State-array key for a source value. The state schema stores string
    keys, but ``str(src)`` alone would collide a NULL source with a
    literal ``"None"`` source string (or NaN with ``"nan"``); tag real
    values with a prefix and reserve an untypeable key for null.

    .. warning:: **state-key format version 2.** Keys were raw
       ``str(src)`` before the null-collision fix added the ``"="``
       prefix / ``"\\x00null"`` sentinel: a sharded-quota streaming query
       restarted from a checkpoint written by the old format finds no
       matching counts and silently re-admits every source up to quota
       again. Restart from a fresh checkpoint when upgrading (same
       contract as the minhash hash-family v2 note in
       :mod:`kafka_to_nexus_spark.llm.dedup`); the unsharded per-source
       form keys state by the grouping column itself and is unaffected."""
    if src is None or (isinstance(src, float) and src != src) or src is pd.NA:
        return "\x00null"
    return "=" + str(src)


def _make_quota_shard_fn(quota: int, cols: list, ts_col: str, source_col: str):
    """Sharded twin of :func:`_make_quota_fn`: ONE state entry holds every
    in-shard source's admitted count as parallel arrays. Per-source
    admission semantics are identical (property-tested against the
    per-source form); what changes is the state-store unit — millions of
    one-long entries become O(shards) entries, so a micro-batch costs
    O(shards) group invocations + commits instead of O(sources with
    data) (the near-dup shard packing's lesson: at 50k sources the
    per-group Arrow exchange WAS the batch cost). Sources are keyed by
    :func:`_quota_state_key` in the state arrays (null-safe, no
    ``"None"``-string collision); rows pass through unchanged."""

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        counts: dict[str, int] = {}
        if state.exists:
            srcs, adm = state.get
            counts = dict(zip(srcs, adm))
        # per-source running candidates across chunks; memory bound =
        # (distinct in-batch sources in this shard) × quota rows
        cands: dict = {}
        budgets: dict = {}
        for pdf in pdfs:
            if not len(pdf):
                continue
            for src, grp in pdf.groupby(source_col, sort=False, dropna=False):
                b = budgets.get(src)
                if b is None:
                    b = budgets[src] = quota - counts.get(
                        _quota_state_key(src), 0
                    )
                if b <= 0:
                    continue
                cands[src] = _nsmallest_chunks(
                    cands.get(src), grp, ts_col, b
                )
        outs = []
        for src, cand in cands.items():
            if not len(cand):
                continue
            skey = _quota_state_key(src)
            before = counts.get(skey, 0)
            out = cand[cols].copy()
            out["quota_rank"] = range(before + 1, before + 1 + len(cand))
            counts[skey] = before + len(cand)
            outs.append(out)
        if outs:  # no-op commit skipped when nothing was admitted
            state.update((list(counts), list(counts.values())))
            yield pd.concat(outs)

    return update


def _resolve_shards(stream: DataFrame, shards) -> int | None:
    """Shared ``shards`` argument contract: ``"auto"`` → 4 × the stateful
    exchange's partition count (SCALE.md round-6 rule: ≥1 group per state
    partition, 4× for skew headroom, over-provision measured free on the
    8–512 plateau); int passes through; None keeps the finest-grained
    per-key state; any other string is a hard error."""
    if shards == "auto":
        return 4 * int(
            stream.sparkSession.conf.get("spark.sql.shuffle.partitions")
        )
    if shards is None:
        return None
    # a typo like "Auto" (or shards=0, which would make pmod(hash, 0)
    # null and collapse every source into one state entry — or hard-fail
    # under ANSI) must fail fast here, not as an obscure analysis error
    if isinstance(shards, bool) or not isinstance(shards, int) or shards < 1:
        raise ValueError(
            f"shards must be an int >= 1, None, or 'auto', got {shards!r}"
        )
    return shards


def source_quota_stream(
    stream: DataFrame,
    quota: int,
    source_col: str = "source_name",
    ts_col: str = "timestamp",
    shards: int | str | None = None,
) -> DataFrame:
    """Per-source admission quota: pass through at most ``quota`` rows per
    source over the stream's lifetime, dropping the rest — the streaming
    admission twin of the batch ``source_cap_sample`` (L44). The batch
    form picks a deterministic md5-uniform subset because it sees the
    whole corpus; an ingest pipeline cannot, so the streaming form admits
    the FIRST ``quota`` rows per source in event-time order within each
    micro-batch (cross-batch: earlier batches always win — admission is
    monotone). Equal event times fall back to micro-batch arrival order
    (partition-race, same caveat :func:`dedup_stream` documents).

    Output = the input rows that clear the quota, plus ``quota_rank``
    (1-based admission index per source). State is ONE long per source
    with no timeout: a quota is a lifetime budget, and O(sources) state
    matches the engine's per-source envelope elsewhere (session windows,
    running stats). At 100 TB / millions of sources the state store
    shards the counters across executors; each micro-batch group ships
    only that batch's rows for the source.

    ``shards`` opts into the packed state layout (contract as
    :func:`near_dup_candidates`): group by ``hash(source) % shards``
    instead of the source itself, one state entry per shard holding
    every in-shard source's counter. Admission semantics are identical;
    what drops is the per-micro-batch state-machine cost — O(shards)
    group invocations + commits instead of O(sources with data), which
    the 50k-source measurement showed was ~the entire batch cost at
    high source cardinality. ``"auto"`` = 4 × shuffle partitions.
    """
    if quota < 1:
        raise ValueError(f"quota must be >= 1, got {quota}")
    fields = list(stream.schema.fields)
    if any(f.name == "quota_rank" for f in fields):
        raise ValueError("input already has a quota_rank column")
    out_schema = StructType(fields + [StructField("quota_rank", LongType())])
    cols = [f.name for f in fields]
    shards = _resolve_shards(stream, shards)
    if shards is None:
        return stream.groupBy(source_col).applyInPandasWithState(
            _make_quota_fn(quota, cols, ts_col),
            out_schema,
            _QUOTA_STATE,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    sharded = stream.withColumn(
        "__quota_shard", F.pmod(F.xxhash64(source_col), F.lit(shards))
    )
    return sharded.groupBy("__quota_shard").applyInPandasWithState(
        _make_quota_shard_fn(quota, cols, ts_col, source_col),
        out_schema,
        _QUOTA_SHARD_STATE,
        "append",
        GroupStateTimeout.NoTimeout,
    )


NEAR_DUP_SCHEMA = StructType(
    [
        StructField("id_a", LongType()),
        StructField("id_b", LongType()),
        StructField("band", LongType()),
    ]
)

# state per (band, band_key) bucket: member doc ids + last event time (ns)
_BUCKET_STATE = "docs array<long>, last long"


def _make_bucket_fn(max_bucket: int, horizon_ms: int):
    def update(
        key: tuple[int, str],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:  # idle bucket past its horizon: evict
            state.remove()
            return
        docs, last = (state.get if state.exists else ([], 0))
        docs = list(docs)
        prev_last, changed = last, False
        rows: list[tuple[int, int]] = []  # (timestamp, doc_id)
        for pdf in pdfs:
            rows.extend(
                (int(t), int(d))
                for t, d in zip(pdf["timestamp"], pdf["doc_id"])
                if not (pd.isna(t) or pd.isna(d))
            )
        if not rows and not state.exists:
            # nothing valid ever seen for this bucket: creating state here
            # would leave an entry with no armed timeout — never evictable
            return
        rows.sort()
        pairs: list[tuple[int, int]] = []
        seen = set(docs)
        for t, d in rows:
            last = max(last, t)
            if d in seen:  # duplicate arrival of the same doc in the bucket
                continue
            # each arrival pairs against at most max_bucket members and
            # membership is trimmed INSIDE the loop — a burst delivering a
            # hot bucket in one micro-batch emits O(max_bucket * batch)
            # pairs, never batch² (the cap exists exactly for that burst).
            pairs.extend((min(d, o), max(d, o)) for o in docs)
            docs.append(d)
            seen.add(d)
            changed = True
            if len(docs) > max_bucket:
                # keep the most recent members (the batch pipeline's
                # analog is the lsh_candidate_pairs star cap)
                del docs[0]
        # skip the state-store write for batches that changed nothing
        # (every arrival was a duplicate of an in-state member and the
        # horizon clock didn't move): an unchanged bucket re-committed
        # per batch is pure state-store churn
        if changed or last != prev_last or not state.exists:
            state.update((docs, last))
            if last:
                _set_clamped_timeout(state, last // 1_000_000 + horizon_ms)
        if pairs:
            yield pd.DataFrame(
                {
                    "id_a": [a for a, _ in pairs],
                    "id_b": [b for _, b in pairs],
                    "band": [int(key[0])] * len(pairs),
                }
            )

    return update


# state per (band, shard) when sharding: parallel arrays of in-shard
# buckets — band_key, member doc ids, last event time (ns) per bucket
_SHARD_STATE = (
    "keys array<string>, members array<array<long>>, lasts array<long>"
)


def _make_shard_fn(max_bucket: int, horizon_ms: int):
    """Sharded twin of ``_make_bucket_fn``: ONE state entry holds every
    in-shard bucket. Per-bucket pairing/cap/dedup semantics are identical
    (property-tested against the per-bucket form); what changes is the
    state-store unit — thousands of tiny per-bucket entries become
    O(shards) entries, so the per-micro-batch cost is O(shards) group
    invocations instead of O(active buckets) (measured 6458 buckets →
    ~1 ms of per-group overhead each at sf0.1: the dominant e2e cost).
    Eviction trades the per-bucket EventTimeTimeout for sweep-on-call:
    expired buckets are dropped AFTER arrivals are processed (matching
    the per-bucket form, where a batch that delivers data suppresses the
    timeout and still pairs against the outgoing members), plus a shard
    timeout at the earliest in-shard expiry for idle shards."""

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        wm = state.getCurrentWatermarkMs()

        def sweep(buckets: dict[str, tuple[list[int], int]]) -> None:
            for bk in [
                k for k, (_m, l) in buckets.items()
                if l // 1_000_000 + horizon_ms <= wm
            ]:
                del buckets[bk]

        def commit(buckets: dict[str, tuple[list[int], int]]) -> None:
            if not buckets:
                if state.exists:
                    state.remove()
                return
            state.update((
                list(buckets),
                [m for m, _l in buckets.values()],
                [l for _m, l in buckets.values()],
            ))
            earliest = min(l for _m, l in buckets.values())
            _set_clamped_timeout(state, earliest // 1_000_000 + horizon_ms)

        buckets: dict[str, tuple[list[int], int]] = {}
        if state.exists:
            keys, members, lasts = state.get
            buckets = {
                k: (list(m), l) for k, m, l in zip(keys, members, lasts)
            }
        if state.hasTimedOut:  # idle shard: evict expired buckets only
            sweep(buckets)
            commit(buckets)
            return
        rows: list[tuple[int, str, int]] = []  # (timestamp, band_key, doc)
        for pdf in pdfs:
            rows.extend(
                (int(t), str(bk), int(d))
                for t, bk, d in zip(
                    pdf["timestamp"], pdf["band_key"], pdf["doc_id"]
                )
                if not (pd.isna(t) or pd.isna(d))
            )
        if not rows and not state.exists:
            return
        rows.sort()
        pairs: list[tuple[int, int]] = []
        # per-bucket batch-scoped seen sets, seeded from state members,
        # matching _make_bucket_fn's dedup exactly: a doc evicted by the
        # max_bucket cap that RE-ARRIVES later in the same micro-batch is
        # still a duplicate (membership-scan `d in docs` would re-pair and
        # re-append it after eviction — the one intra-batch divergence the
        # per-bucket form does not have)
        seen: dict[str, set[int]] = {}
        for t, bk, d in rows:
            docs, last = buckets.get(bk, ([], 0))
            sn = seen.setdefault(bk, set(docs))
            last = max(last, t)
            if d in sn:  # duplicate arrival, incl. post-eviction re-arrival
                buckets[bk] = (docs, last)
                continue
            pairs.extend((min(d, o), max(d, o)) for o in docs)
            docs.append(d)
            sn.add(d)
            if len(docs) > max_bucket:
                del docs[0]
            buckets[bk] = (docs, last)
        sweep(buckets)
        commit(buckets)
        if pairs:
            yield pd.DataFrame(
                {
                    "id_a": [a for a, _ in pairs],
                    "id_b": [b for _, b in pairs],
                    "band": [int(key[0])] * len(pairs),
                }
            )

    return update


def near_dup_candidates(
    stream: DataFrame,
    id_col: str = "doc_id",
    horizon: str = "10 minutes",
    watermark: str = "30 seconds",
    ts_col: str = "timestamp",
    bands: int = 4,
    rows_per_band: int = 2,
    max_bucket: int = 64,
    shards: int | str | None = None,
) -> DataFrame:
    """Streaming LSH near-dup candidate pairs.

    Input: a streaming frame with ``id_col``, ``ts_col`` and MinHash
    signature columns (``llm.dedup.minhash_signatures`` — a narrow map, so
    it composes with readStream). Signatures are banded
    (``llm.dedup.banded_signatures``) and keyed by (band, band_key); each
    bucket's membership is an applyInPandasWithState entry, so a new doc
    pairs immediately with every in-horizon member of its buckets —
    exactly the batch bucket-join's candidates, emitted incrementally.
    Downstream dedups (id_a, id_b) across bands, as the batch pipeline
    does with ``distinct()``.

    Scale: state = member ids per ACTIVE bucket, evicted ``horizon`` after
    the bucket's last arrival; hot buckets are capped at ``max_bucket``
    most-recent members (candidate recall inside a pathological bucket is
    traded for bounded state, the streaming analog of skew handling).

    ``shards``: when set, buckets are packed ``shards``-to-a-state-entry
    per band (grouping key = (band, hash(band_key) % shards)) instead of
    one state entry per bucket. Pair semantics are identical
    (property-tested); the per-micro-batch cost drops from O(active
    buckets) state-group invocations (~1 ms each measured) to O(bands ×
    shards) — the scale default for corpora whose active-bucket count is
    much larger than the core count. ``"auto"`` resolves to 4 × the
    stateful exchange's partition count (``spark.sql.shuffle.partitions``
    at query start) — the SCALE.md round-6 rule: ≥1 group per state
    partition for parallelism, 4× for skew headroom, and the measured
    8–512 plateau (19.4–19.7 s at 84k active buckets) makes
    over-provision free. None keeps the per-bucket form (finest-grained
    eviction; the right shape for sparse key spaces — active buckets
    comparable to the core count)."""
    from pyspark.sql import functions as F

    from ..llm.dedup import banded_signatures

    # canonical column names: the state function reads "doc_id" and
    # "timestamp" (custom id_col/ts_col names are remapped here)
    sig_cols = [c for c in stream.columns if c not in (id_col, ts_col)]
    canon = stream.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(ts_col).alias("timestamp"),
        *sig_cols,
    )
    keyed = banded_signatures(
        canon, "doc_id", bands, rows_per_band, keep_cols=("timestamp",)
    )
    with_time = _with_event_time(keyed, "timestamp", watermark)
    horizon_ms = _parse_duration_ns(horizon) // 1_000_000
    shards = _resolve_shards(stream, shards)
    if shards is None:
        return with_time.groupBy("band", "band_key").applyInPandasWithState(
            _make_bucket_fn(max_bucket, horizon_ms),
            outputStructType=NEAR_DUP_SCHEMA,
            stateStructType=_BUCKET_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    sharded = with_time.withColumn(
        "shard", F.pmod(F.xxhash64("band_key"), F.lit(shards))
    )
    return sharded.groupBy("band", "shard").applyInPandasWithState(
        _make_shard_fn(max_bucket, horizon_ms),
        outputStructType=NEAR_DUP_SCHEMA,
        stateStructType=_SHARD_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def curation_stream(
    stream: DataFrame,
    quality_tau: float,
    pii_cap: int,
    id_col: str = "doc_id",
    ts_col: str = "timestamp",
    watermark: str = "10 minutes",
    quota: int | None = None,
    source_col: str = "source_name",
    shards: int | str | None = None,
) -> DataFrame:
    """Streaming twin of the batch composed curation pipeline (L54,
    ``curation_pipeline``) — the reference's own shape (continuous
    ingest, one pass per message) applied to the curation surface.

    Stages, in the batch pipeline's order:

    1. **scrub → quality → lang-ID → fingerprint** — the batch library
       transforms (:mod:`..llm.text`) compose UNCHANGED onto the
       streaming frame: they are narrow whole-stage-codegen maps, so the
       micro-batch planner runs them exactly as batch does.
    2. **watermarked exact-dedup** (:func:`dedup_stream`): first ARRIVAL
       per fingerprint survives within the watermark horizon — the
       streaming stand-in for the batch ``rk == 1`` min-doc_id rule,
       identical whenever arrival order follows doc_id order (the parity
       test feeds batches that way; an ingest pipeline gets Kafka-offset
       order, the same contract).
    3. **selection** (lang / quality / PII cap) — narrow filter on the
       dedup survivor, mirroring the batch predicate exactly.
    4. optional **per-source quota** (:func:`source_quota_stream`):
       lifetime admission budget per source, ``quota_rank`` appended.

    Output schema matches the batch pipeline (doc_id, quality, n_pii,
    n_tokens, bpe_tokens — the BPE count is the same codegen replace
    chain), plus (source, quota_rank) when ``quota`` is set. State =
    one fingerprint entry per in-horizon distinct doc (TTL-evicted by
    the watermark) + one counter per source — both bounded on unbounded
    streams; everything else is stateless maps."""
    from ..llm import text as llm_text
    from ..llm.bpe import bpe_count_expr

    enriched = llm_text.lang_id(
        llm_text.quality_score(
            llm_text.scrub_pii(stream), text_col="scrubbed_text"
        ),
        text_col="scrubbed_text",
    ).withColumn(
        # the batch pipeline's fingerprint normalization, inline on the
        # same narrow map
        "fp",
        F.md5(
            F.regexp_replace(F.lower(F.col("scrubbed_text")), "[^a-z ]", "")
        ),
    )
    deduped = dedup_stream(enriched, "fp", watermark, ts_col)
    n_pii = (
        F.col("n_email") + F.col("n_phone") + F.col("n_ipv4") + F.col("n_url")
    )
    kept = deduped.filter(
        (F.col("predicted_lang") == "en")
        & (F.round(F.col("quality"), 6) >= quality_tau)
        & (n_pii <= pii_cap)
    )
    out_cols = [
        F.col(id_col),
        F.round(F.col("quality"), 6).alias("quality"),
        n_pii.cast("long").alias("n_pii"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.expr(bpe_count_expr("scrubbed_text")).cast("long").alias(
            "bpe_tokens"
        ),
    ]
    if quota is None:
        return kept.select(*out_cols)
    admitted = source_quota_stream(kept, quota, source_col, ts_col, shards)
    return admitted.select(
        *out_cols, F.col(source_col), F.col("quota_rank")
    )


# ---------------------------------------------------------------------------
# Streaming Bloom admission (L78): constant-size dedup state
# ---------------------------------------------------------------------------
# The streaming face of the L73 admission gate, and the state-size
# counterpoint to dedup_stream: dropDuplicatesWithinWatermark holds ONE
# STATE ENTRY PER DISTINCT in-horizon fingerprint (unbounded in corpus
# richness), while the Bloom holds a FIXED bitmap — m_bits/63 longs
# total, forever, at the price of a bounded false-drop rate and no
# eviction (a Bloom can't forget; rotating to a fresh filter is a
# restart-time decision, like resizing the batch layout). Partitioned-
# bloom sharding: a fingerprint routes BY HASH to one of `shards`
# independent sub-filters of m_bits/shards bits each — all k probes of a
# doc live in one state group, so admission is decided (and the bits
# inserted) in a single stateful pass with no cross-group join; the
# aggregate FPR equals a monolithic m-bit filter's. In-batch order is
# pinned (sort by timestamp, fingerprint), so an exact duplicate can
# NEVER be admitted twice — within a batch, across batches, forever.

BLOOM_ADMIT_SCHEMA = StructType(
    [
        StructField("fingerprint", StringType()),
        StructField("timestamp", LongType()),
        StructField("bloom_admitted", BooleanType()),
    ]
)

# dense sub-filter: one long per 63 bits (the L73 word layout), plus the
# geometry it was laid out under — (m_sub, k) ride along in the state so
# a resumed checkpoint can PROVE the constructor args still match the
# stored bits (reinterpreting a bitmap under different positions/widths
# would silently re-admit duplicates; see bloom_admission_stream).
#
# MIGRATION (ADVICE r11): this schema widened from the r10 'bits
# array<long>' — a checkpoint written under the 1-field schema fails
# Structured Streaming's state-store schema-compatibility check at
# resume (before any user code runs, so an in-code legacy backfill is
# unreachable). Pre-widening checkpoints must be ROTATED: start a fresh
# checkpoint and, if continuity matters, replay the standing
# fingerprints through it first — the same rotate-to-resize discipline
# the geometry ValueError below prescribes.
_BLOOM_STATE = "bits array<long>, m_sub long, k long"


def _bloom_positions_py(fp: str, k: int, m_bits: int) -> list[int]:
    """Python twin of llm.dedup.bloom_positions (Kirsch-Mitzenmaier off
    one md5: h1 = hex[0:15], h2 = hex[16:31] forced into [1, m-1]) —
    pinned equal to the Spark expression by a unit test so the streaming
    and batch gates can never drift."""
    import hashlib

    h = hashlib.md5(fp.encode()).hexdigest()
    h1 = int(h[0:15], 16) % m_bits
    h2 = int(h[16:31], 16) % (m_bits - 1) + 1
    return [(h1 + i * h2) % m_bits for i in range(k)]


def _make_bloom_admit_fn(m_sub: int, k: int):
    n_words = (m_sub + 62) // 63

    def update(
        key: tuple[int],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            bits, stored_m, stored_k = state.get
            if stored_m != m_sub or stored_k != k:
                raise ValueError(
                    f"bloom_admission_stream checkpoint was laid out with "
                    f"(m_sub={stored_m}, k={stored_k}) but was resumed with "
                    f"(m_sub={m_sub}, k={k}); reinterpreting the stored "
                    "bitmap under different positions/widths would admit "
                    "duplicates — rotate to a fresh checkpoint to resize"
                )
        else:
            bits = [0] * n_words
        bits = list(bits)
        rows = pd.concat(list(pdfs), ignore_index=True)
        if len(rows) == 0:
            return
        rows = rows.sort_values(["timestamp", "fingerprint"])
        out = []
        for fp, ts in zip(rows["fingerprint"], rows["timestamp"]):
            seen = True
            for pos in _bloom_positions_py(str(fp), k, m_sub):
                w, b = divmod(pos, 63)
                mask = 1 << b
                if not (bits[w] & mask):
                    seen = False
                    bits[w] |= mask
            out.append((fp, ts, not seen))
        state.update((bits, m_sub, k))
        yield pd.DataFrame(
            out, columns=["fingerprint", "timestamp", "bloom_admitted"]
        )

    return update


def bloom_admission_stream(
    stream: DataFrame,
    m_bits: int,
    k: int = 4,
    shards: int = 8,
    fingerprint_col: str = "fingerprint",
    ts_col: str = "timestamp",
) -> DataFrame:
    """First-occurrence admission with CONSTANT state: emits every row
    with ``bloom_admitted`` = False iff all k probed bits were already
    set before this row's insertion (bits are inserted for every row,
    admitted or not — idempotent, and what keeps later copies of a
    false-positive arrival consistent). Size ``m_bits`` for the expected
    DISTINCT fingerprint count (6-10 bits per key), and round the
    per-shard width up to whole 63-bit words. The state rows carry their
    own (m_sub, k); resuming an existing checkpoint with different
    ``m_bits``/``shards``/``k`` fails loudly instead of silently
    reinterpreting the stored bitmap — resizing means rotating to a
    fresh checkpoint (and, if continuity matters, replaying the standing
    fingerprints through the new geometry first)."""
    from pyspark.sql import functions as F

    m_sub = ((m_bits // shards + 62) // 63) * 63
    canon = stream.select(
        F.col(fingerprint_col).cast("string").alias("fingerprint"),
        F.col(ts_col).cast("long").alias("timestamp"),
        F.pmod(F.xxhash64(F.col(fingerprint_col).cast("string")),
               F.lit(shards)).alias("shard"),
    )
    return canon.groupBy("shard").applyInPandasWithState(
        _make_bloom_admit_fn(m_sub, k),
        outputStructType=BLOOM_ADMIT_SCHEMA,
        stateStructType=_BLOOM_STATE,
        outputMode="append",  # each decision emits once, final
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- L87: streaming composed admission against the STORED layouts -----------
# The L79 batch pipeline, run per micro-batch (VERDICT r10 #5): exact
# gate = the stored Bloom bitmap, near-dup gate = the stored banding
# layout, quota = per-source rank within the batch — and the admitted
# docs FOLD BACK into both layouts in-stream (append_bloom /
# append_neardup_banding), so a later micro-batch's duplicate of an
# earlier admission is rejected without the corpus ever being rescanned.
# The reference analog is its standing per-stream state advanced per
# message (Stream/Partition.cpp:174-223); this is that contract for
# content-defined identity over stored state.


def admit_batch(
    spark,
    batch: DataFrame,
    bloom_layout: str,
    neardup_layout: str,
    quota: int,
    tau: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """One arrival batch through the three stored-layout admission
    stages → (doc_id, source, stage) with stage ∈ exact_dup | near_dup |
    quota | admitted. This function IS the streaming gate's body
    (:func:`admission_stream` calls it per micro-batch) and its batch
    twin — stream ≡ batch on identical batch splits holds by
    construction, which is what the parity pytest pins.

    The exact stage is the Bloom membership verdict: in-stream there is
    no corpus relation to re-join, so a bloom-positive arrival is
    treated as an exact duplicate — false positives at the filter's
    measured FPR (the L73 certificate) cost a dropped novel doc, never
    an admitted duplicate (the conservative direction for dedup). The
    quota is per source PER BATCH in doc_id order (deterministic);
    lifetime budgets are :func:`source_quota_stream`'s contract."""
    state = _read_admission_state(spark, bloom_layout, neardup_layout)
    return _admit_batch_against(
        state, batch, quota, tau, text_col, id_col, source_col
    )


def _read_admission_state(spark, bloom_layout: str, neardup_layout: str) -> dict:
    """One read of every layout relation the admission gate probes —
    :func:`admit_batch` builds it fresh per call (the batch twin);
    :class:`AdmissionSession` builds it ONCE, persists the relations,
    and advances them incrementally per fold (VERDICT r11 #5)."""
    from ..llm import dedup as llm_dedup

    meta, params, words = llm_dedup.read_bloom_layout(spark, bloom_layout)
    nd_p, band, fp, sh = llm_dedup._read_neardup_layout(spark, neardup_layout)
    return {
        "bloom_meta": meta, "bloom_params": params, "words": words,
        "nd_params": nd_p, "band": band, "fp": fp, "sh": sh,
    }


def _admit_batch_against(
    state: dict,
    batch: DataFrame,
    quota: int,
    tau: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """:func:`admit_batch`'s body over caller-held layout relations."""
    from pyspark.sql import Window

    from ..llm import dedup as llm_dedup

    meta = state["bloom_meta"]
    fp = batch.select(
        id_col, source_col, F.md5(F.col(text_col)).alias("_fp")
    )
    member = llm_dedup.bloom_membership(
        fp, state["bloom_params"], state["words"], "_fp", id_col,
        k=meta["k"], hash_engine=meta["hash_engine"],
    )
    nd = llm_dedup._neardup_admission_body(
        state["nd_params"], state["band"], state["fp"], state["sh"],
        batch, tau=tau, text_col=text_col, id_col=id_col,
    ).select(id_col, F.col("admitted").alias("_nd_ok"))
    # r13: pass2 feeds two plan legs (quota ranking + final stage join).
    # Deliberately NOT checkpointed here: leg-timing showed the decide
    # ≈ the sum of its single-evaluation legs (exchange reuse already
    # dedupes the repeated subtree), and a per-batch localCheckpoint
    # would pin a block the session's close() doesn't own (the
    # checkpoint-release test catches exactly that leak).
    pass2 = fp.select(id_col, source_col).join(member, id_col).join(nd, id_col)
    survivors = pass2.filter(~F.col("bloom_positive") & F.col("_nd_ok"))
    ranked = survivors.withColumn(
        "_rk",
        F.row_number().over(Window.partitionBy(source_col).orderBy(id_col)),
    ).select(id_col, "_rk")
    return pass2.join(ranked, id_col, "left").select(
        id_col,
        source_col,
        F.when(F.col("bloom_positive"), F.lit("exact_dup"))
        .when(~F.col("_nd_ok"), F.lit("near_dup"))
        .when(F.col("_rk") > quota, F.lit("quota"))
        .otherwise(F.lit("admitted"))
        .alias("stage"),
    )


def admit_and_fold(
    spark,
    batch: DataFrame,
    batch_id: int,
    bloom_layout: str,
    neardup_layout: str,
    decisions_path: str,
    quota: int = 10,
    tau: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> None:
    """One micro-batch's full admission transaction, REPLAY-SAFE
    (ADVICE r11): decisions land in the batch-keyed dir
    ``decisions_path/batch=<id>`` with OVERWRITE, and a replayed batch
    that finds that dir already committed (_SUCCESS) REUSES the stored
    decisions instead of re-deriving them. The committed decision file
    IS the pinned pre-fold snapshot: the first attempt derived it before
    any fold mutated the layouts, so re-deriving on replay — after the
    previous attempt already folded admitted fingerprints — would
    re-classify admitted docs as exact_dup/near_dup and log
    contradictory rows; reuse makes the replay byte-identical and the
    log append-free. Crash windows: (a) before the decision commit — no
    folds have happened, recompute is pre-fold by construction; (b)
    after the commit, anywhere among the folds — decisions reuse, and
    the folds re-run idempotently (bloom re-OR of the same bits;
    banding re-capped against existing occupancy so nothing exceeds
    max_bucket; fingerprint/shingle re-appends are bounded at one extra
    copy of the one crash-window batch and never change decisions —
    the exact gate is the Bloom bitmap, and the Jaccard verify is a
    max over candidates).

    The admitted id set is PINNED on the driver between the decision
    write and the folds (O(admitted-per-batch) rows — micro-batch-
    bounded, the runner-style driver-collect budget): the decision plan
    reads the layout LAZILY, so re-deriving 'admitted' from it after
    append_bloom has mutated the words relation re-scores the batch
    against its own appends (caught by the stream≡twin parity test;
    persist() alone does not reliably fence a foreachBatch plan from a
    mid-batch filesystem append)."""
    import os

    from ..llm import dedup as llm_dedup

    dec_dir = os.path.join(decisions_path, f"batch={batch_id}")
    admitted_ids = _decide_or_reuse(
        spark, dec_dir, id_col,
        lambda: admit_batch(
            spark, batch, bloom_layout, neardup_layout, quota, tau,
            text_col, id_col, source_col,
        ),
    )
    if not admitted_ids:
        return
    admitted = batch.filter(F.col(id_col).isin(admitted_ids))
    with _no_aqe(spark):  # r14: arrival-bounded fold plans (see _no_aqe)
        llm_dedup.append_bloom(
            spark, bloom_layout,
            admitted.select(F.md5(F.col(text_col)).alias("_fp")),
            "_fp",
        )
        llm_dedup.append_neardup_banding(
            spark, neardup_layout, admitted,
            text_col=text_col, id_col=id_col,
        )


from contextlib import contextmanager


@contextmanager
def _no_aqe(spark):
    """AQE off for one micro-batch transaction (r14, guide §1.2): the
    admission decide AND fold plans are arrival-BOUNDED by the family
    contract — standing relations are streamed scans into broadcast-
    hash joins and every shuffle's input is arrival-sized (the r14
    occupancy fix closed the last standing-wide shuffle) — so AQE has
    nothing to re-optimize at any corpus size, while its per-exchange
    stage materialization charged every micro-batch a dozen extra
    scheduler round-trips (measured: decide 21 jobs → 7, −0.7–1.4
    s/batch warm at sf0.1; fold legs −0.2–0.3 s)."""
    prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)


def _decide_or_reuse(spark, dec_dir: str, id_col: str, derive) -> list:
    """The replay-safe decision transaction shared by the per-batch-read
    path and the cached session: committed decisions (``_SUCCESS``
    present) are REUSED — the pinned pre-fold snapshot — otherwise
    ``derive()`` builds them, they land with overwrite, and the admitted
    ids ride an :class:`~pyspark.sql.Observation` attached to the SAME
    write action (r14, guide §1.2): the decide used to be two jobs per
    micro-batch — the decision write plus a filtered collect off a
    persisted copy — and the observation folds the id pickup into the
    write, so one job computes the decisions once, writes them, and
    hands back the admitted set (the driver pin that fences the folds
    from lazily re-scoring the batch against its own appends is now the
    collected observation row instead of a persisted frame)."""
    import os

    if os.path.exists(os.path.join(dec_dir, "_SUCCESS")):
        return [
            r[0]
            for r in spark.read.parquet(dec_dir)
            .filter(F.col("stage") == "admitted")
            .select(id_col)
            .collect()
        ]
    from pyspark.sql import Observation

    with _no_aqe(spark):
        obs = Observation()
        dec = derive().observe(
            obs,
            # collect_list skips NULLs: non-admitted rows contribute
            # nothing
            F.collect_list(
                F.when(F.col("stage") == "admitted", F.col(id_col))
            ).alias("_admitted_ids"),
        )
        dec.write.mode("overwrite").parquet(dec_dir)
    return list(obs.get["_admitted_ids"])


class AdmissionSession:
    """Cross-batch cache for the streaming admission gate's per-batch
    FIXED costs (VERDICT r11 #5): a 100 TB ingest runs thousands of
    small micro-batches, and with :func:`admit_and_fold` each one
    re-lists and re-reads every layout dir (bloom meta/params/words
    ×2 — probe and append — plus the three near-dup relations ×2) and
    re-aggregates bucket occupancy from parquet. This session reads the
    layouts ONCE, persists the relations, and advances them
    INCREMENTALLY: each fold materializes the increment frames
    (``_bloom_append_frames`` / ``_neardup_append_frames``), appends
    them to the layout dirs (disk stays the source of truth — a
    restarted session rebuilds from the dirs and sees every fold), and
    unions the SAME materialized frames into the in-memory view, so
    memory and disk can never diverge.

    Consistency: the current view = persisted base ∪ checkpointed
    increments — union is lazy metadata, so probes scan only cached
    pieces and the old base is never unpersisted mid-plan. Increments
    are lineage-TRUNCATED (localCheckpoint), never merely persisted: a
    persisted increment keeps its logical plan, which nests the union
    of every earlier piece, and the analyzer walks that exponentially
    nested tree even when execution hits the cache (measured: 4.3 →
    58.5 s/batch by fold 9). Piece count is bounded two ways: every
    ``COMPACT_EVERY`` increments a relation's tail unions into one
    checkpointed piece IN MEMORY (one batch-sized pass, no disk
    re-read), and every ``consolidate_every`` folds the session
    re-bases from the layout dirs (where a ``compact_bloom_layout``
    pass would slot in on a real cluster). Decisions stay
    replay-safe via :func:`_decide_or_reuse`; a sink retry re-runs the
    folds idempotently under the SAME bounds as the disk path (bloom
    re-OR exact; banding re-capped against current occupancy;
    fingerprint/shingle re-appends bounded at one extra copy of the one
    crash-window batch, which can only raise a duplicate's max-jaccard
    candidate count, never change a verdict)."""

    def __init__(
        self,
        spark,
        bloom_layout: str,
        neardup_layout: str,
        quota: int = 10,
        tau: float = 0.5,
        text_col: str = "text",
        id_col: str = "doc_id",
        source_col: str = "source",
        consolidate_every: int = 64,
    ) -> None:
        self.spark = spark
        self.bloom_layout = bloom_layout
        self.neardup_layout = neardup_layout
        self.quota, self.tau = quota, tau
        self.text_col, self.id_col, self.source_col = (
            text_col, id_col, source_col,
        )
        self.consolidate_every = consolidate_every
        self._pieces: list[DataFrame] = []  # every currently-persisted frame
        self._folds_since_base = 0
        self._load_base()

    # -- state management ---------------------------------------------------

    def _load_base(self) -> None:
        base = _read_admission_state(
            self.spark, self.bloom_layout, self.neardup_layout
        )
        self.bloom_meta = base["bloom_meta"]
        self.nd_params = base["nd_params"]
        self.bloom_params = base["bloom_params"].persist()
        # one list per mutable relation: [base, increment, increment, ...]
        self._words = [base["words"].persist()]
        self._band = [base["band"].persist()]
        self._fp = [base["fp"].persist()]
        self._sh = [base["sh"].persist()]
        self._pieces = [
            self.bloom_params, self._words[0], self._band[0],
            self._fp[0], self._sh[0],
        ]
        self._folds_since_base = 0

    @staticmethod
    def _union(pieces: list[DataFrame]) -> DataFrame:
        out = pieces[0]
        for p in pieces[1:]:
            out = out.unionByName(p)
        return out

    def _state(self) -> dict:
        # words increments may repeat word_idx across pieces — re-fold
        # with the same associative bit_or the parquet read side uses
        words = self._union(self._words)
        if len(self._words) > 1:
            words = words.groupBy("word_idx").agg(
                F.bit_or("word").alias("word")
            )
        return {
            "bloom_meta": self.bloom_meta,
            "bloom_params": self.bloom_params,
            "words": words,
            "nd_params": self.nd_params,
            "band": self._union(self._band),
            "fp": self._union(self._fp),
            "sh": self._union(self._sh),
        }

    def _persist_via_write(self, df: DataFrame, write) -> DataFrame:
        """Materialize an increment ONCE (eager localCheckpoint), append
        the SAME materialization to the layout dir, and register it as a
        cached piece. localCheckpoint — not persist() — because a
        persisted DataFrame keeps its full LOGICAL plan, and each fold's
        increment plan nests the union of every earlier piece (occupancy
        → union → pieces → …): by batch 9 the analyzer was walking an
        exponentially nested tree (4.3 s → 58.5 s/batch, measured solo)
        even though execution hit the cache. The checkpoint truncates
        the plan to the pinned RDD, so batch N's plan is O(pieces), and
        consolidation bounds pieces. Executor-pinned blocks are fine
        here: disk stays the source of truth — a failed/restarted
        session rebuilds from the layout dirs."""
        df = df.localCheckpoint()  # eager: one computation, tiny plan
        write(df)
        self._pieces.append(df)
        return df

    @staticmethod
    def _release(df: DataFrame) -> None:
        """Deterministically free a localCheckpoint-ed piece (ADVICE
        r12): checkpointed blocks are pinned at the RDD level OUTSIDE
        the cache manager, so ``DataFrame.unpersist()`` alone leaves the
        release to ContextCleaner GC — an unbounded executor-storage
        tail in a session built for thousands of micro-batches
        (measured: the blocks stay in getRDDStorageInfo after
        df.unpersist(); the LogicalRDD release removes them). Best
        effort through the internal plan handle — a failure degrades to
        the GC path, never raises into the batch transaction."""
        try:
            df._jdf.queryExecution().analyzed().rdd().unpersist(False)
        except Exception:
            pass
        try:
            df.unpersist()
        except Exception:
            pass

    def close(self) -> None:
        for df in self._pieces:
            self._release(df)
        self._pieces = []

    #: in-memory piece compaction cadence: above this many increments a
    #: relation's tail unions into ONE localCheckpoint-ed piece (one
    #: pass over batch-sized rows, no disk re-read) — per-probe task
    #: count stays O(compact_every) instead of growing with every fold
    #: (measured: ~70 ms/batch of creep per uncompacted piece at sf0.1)
    COMPACT_EVERY = 8

    def _compact(self, pieces: list[DataFrame]) -> list[DataFrame]:
        if len(pieces) - 1 <= self.COMPACT_EVERY:
            return pieces
        tail = pieces[1:]
        merged = self._union(tail).localCheckpoint()
        self._pieces.append(merged)
        for p in tail:
            self._release(p)  # merged is eager — parents can free now
            if p in self._pieces:
                self._pieces.remove(p)
        return [pieces[0], merged]

    def _maybe_consolidate(self) -> None:
        self._words = self._compact(self._words)
        self._band = self._compact(self._band)
        self._fp = self._compact(self._fp)
        self._sh = self._compact(self._sh)
        if self._folds_since_base < self.consolidate_every:
            return
        old = self._pieces
        self._load_base()  # disk has every fold; fresh base, depth 1
        for df in old:
            self._release(df)

    # -- the per-batch transaction -------------------------------------------

    def admit_and_fold(
        self, batch: DataFrame, batch_id: int, decisions_path: str
    ) -> None:
        """:func:`admit_and_fold` against the cached state — same
        decision log, same layout-dir appends, same replay contract."""
        import os

        from ..llm import dedup as llm_dedup

        dec_dir = os.path.join(decisions_path, f"batch={batch_id}")
        admitted_ids = _decide_or_reuse(
            self.spark, dec_dir, self.id_col,
            lambda: _admit_batch_against(
                self._state(), batch, self.quota, self.tau,
                self.text_col, self.id_col, self.source_col,
            ),
        )
        if not admitted_ids:
            return
        admitted = batch.filter(F.col(self.id_col).isin(admitted_ids))
        # bloom fold: one write action materializes disk AND cache
        new_words, new_params = llm_dedup._bloom_append_frames(
            admitted.select(F.md5(F.col(self.text_col)).alias("_fp")),
            "_fp", self.bloom_meta, self.bloom_params,
        )
        bloom_dir = llm_dedup.resolve_bloom_generation(self.bloom_layout)
        # near-dup fold: the pre-batch cached banding view (the _band
        # union snapshots the piece list HERE, before any append, so the
        # cap sees the pre-batch bucket population exactly as the serial
        # fold did); occupancy itself is built arrival-bounded inside
        # _neardup_append_frames (r14 — no standing-wide agg per batch)
        capped_new, fp_new, sh_new = llm_dedup._neardup_append_frames(
            self.nd_params, self._union(self._band), admitted,
            self.text_col, self.id_col,
        )
        # r13 (guide §2.6): the five append jobs are independent —
        # different target dirs, all derived from the persisted state +
        # this batch — so overlap them from a small pool instead of
        # paying five job latencies serially (~1.1 s/batch measured →
        # the slowest single job). State-list mutation stays on THIS
        # thread, after every job has finished; _pieces.append from the
        # workers is a GIL-atomic list append used only for release.
        from concurrent.futures import ThreadPoolExecutor

        # r14: AQE off for the fold legs too — after the arrival-bounded
        # occupancy fix every fold shuffle is arrival-sized (see _no_aqe)
        with _no_aqe(self.spark), ThreadPoolExecutor(max_workers=5) as pool:
            f_words = pool.submit(
                self._persist_via_write,
                new_words,
                lambda df: df.write.mode("append").parquet(
                    os.path.join(bloom_dir, "words")
                ),
            )
            f_params = pool.submit(
                lambda: new_params.write.mode("append").parquet(
                    os.path.join(bloom_dir, "params")
                )
            )
            f_capped = pool.submit(
                self._persist_via_write,
                capped_new,
                lambda df: df.write.mode("append").partitionBy("band").parquet(
                    os.path.join(self.neardup_layout, "banding")
                ),
            )
            f_fp = pool.submit(
                self._persist_via_write,
                fp_new,
                lambda df: df.write.mode("append").parquet(
                    os.path.join(self.neardup_layout, "fingerprints")
                ),
            )
            f_sh = pool.submit(
                self._persist_via_write,
                sh_new,
                lambda df: df.write.mode("append").parquet(
                    os.path.join(self.neardup_layout, "shingle_hashes")
                ),
            )
            new_words = f_words.result()
            f_params.result()
            capped_new, fp_new, sh_new = (
                f_capped.result(), f_fp.result(), f_sh.result(),
            )
        self._words.append(new_words)
        self._band.append(capped_new)
        self._fp.append(fp_new)
        self._sh.append(sh_new)
        self._folds_since_base += 1
        self._maybe_consolidate()


def admission_stream(
    stream: DataFrame,
    bloom_layout: str,
    neardup_layout: str,
    decisions_path: str,
    checkpoint: str,
    quota: int = 10,
    tau: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    cache_layouts: bool = True,
    consolidate_every: int = 64,
):
    """foreachBatch admission over the stored layouts: each micro-batch
    runs the admit-and-fold transaction — decisions land in
    ``decisions_path/batch=<id>`` (a partitioned decision log; read the
    root to get a ``batch`` column), and the ADMITTED docs' fingerprints
    and banding rows fold back into the layouts so the standing state
    advances in-stream. Quota- and dup-rejected docs are NOT folded (a
    rejected doc never becomes corpus). Failure-recovery replays reuse
    the batch's committed decisions instead of re-deriving them against
    the already-folded layouts — see :func:`admit_and_fold` for the
    crash-window analysis.

    ``cache_layouts=True`` (the steady-state default) runs the batches
    through one :class:`AdmissionSession` — layout dirs are read once
    and advanced incrementally in memory, instead of re-read per batch;
    decisions are identical (the parity pytest runs the stream against
    the per-batch-reread twin). The session rides the returned query as
    ``query._admission_session`` so callers can ``close()`` it after
    ``stop()``."""
    session = None
    if cache_layouts:
        session = AdmissionSession(
            stream.sparkSession, bloom_layout, neardup_layout,
            quota, tau, text_col, id_col, source_col, consolidate_every,
        )

    def sink(batch: DataFrame, batch_id: int) -> None:
        if session is not None:
            session.admit_and_fold(batch, batch_id, decisions_path)
        else:
            admit_and_fold(
                batch.sparkSession, batch, batch_id,
                bloom_layout, neardup_layout, decisions_path,
                quota, tau, text_col, id_col, source_col,
            )

    query = (
        stream.writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .start()
    )
    query._admission_session = session
    return query


def video_admit_and_fold(
    spark,
    batch: DataFrame,
    batch_id: int,
    layout: str,
    decisions_path: str,
    hash_col: str = "dhash",
    id_col: str = "media_id",
    frame_col: str = "frame_idx",
    nf_col: str = "n_frames",
) -> None:
    """One micro-batch's VIDEO admission transaction over the stored
    frame-aware fingerprint layout (L94) — the :func:`admit_and_fold`
    contract for multi-frame media: decisions land batch-keyed and
    replay-safe (committed decisions REUSE — the pinned pre-fold
    snapshot), the admitted id set pins on the driver before any fold,
    and admitted videos fold back cap-aware
    (:func:`~..llm.multimodal.append_video_phash_layout`), so a later
    micro-batch's re-encode of an earlier admission is rejected without
    the corpus ever being re-decoded. Crash-window idempotency is the
    image family's: a replayed fold re-appends at most one extra copy
    of the crash-window batch's banded rows, which can never change a
    decision — the candidate join is DISTINCT over (pair, frame, hash)
    and the vote reads max() aggregates. ``batch`` carries the
    per-frame hash rows (the :func:`~..llm.multimodal.video_frames`
    output shape); decode happens upstream where the payload lives."""
    import os

    from ..llm import multimodal as mm

    dec_dir = os.path.join(decisions_path, f"batch={batch_id}")
    admitted_ids = _decide_or_reuse(
        spark, dec_dir, id_col,
        lambda: mm.video_phash_admission(
            spark, layout, batch, hash_col, id_col, frame_col, nf_col
        ).select(
            F.col("media_id").alias(id_col) if id_col != "media_id"
            else F.col("media_id"),
            F.when(F.col("admitted"), F.lit("admitted"))
            .otherwise(F.lit("video_dup"))
            .alias("stage"),
            "best_match_frames",
        ),
    )
    if not admitted_ids:
        return
    with _no_aqe(spark):  # r14: arrival-bounded fold plans (see _no_aqe)
        mm.append_video_phash_layout(
            spark, layout, batch.filter(F.col(id_col).isin(admitted_ids)),
            hash_col, id_col, frame_col, nf_col,
        )
