"""Paired (Spark, DuckDB-oracle) queries over the driver's synthetic tables.

Each entry maps a SURVEY.md §2 operator (or a scale extra: dedup, similarity
search, text analysis) onto the testdata tables:

- ``events`` stands in for the message-envelope stream (FIXTURES.md §5):
  user_id ~ source, event_id ~ offset, ts ~ event time, value ~ payload.
- TPC-H-ish tables exercise join/agg/top-k plans at bench scale.
- ``documents`` / ``embeddings`` carry the LLM-pipeline operators.

Determinism rules (driver hashes values after sorting columns by name):
- double sums go through DECIMAL casts (exact, order-independent), then CAST
  back to DOUBLE — identical bits in both engines;
- every ratio/avg is ``round(x, 6)``;
- top-k queries order by (rounded metric, unique id) so ties are stable;
- integer outputs are CAST to BIGINT (Spark row_number is INT, DuckDB's is
  BIGINT);
- both engines hash/min md5 hex strings, never engine-specific hashes.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Job window over the events stream (events span 2024-01-01 .. ~2024-01-12).
T_START = "2024-01-03 00:00:00"
T_STOP = "2024-01-10 00:00:00"

STOPWORDS = "'the','a','of','and','is'"


def _ns_ge(t: str) -> str:
    """Foldable ns lower bound for `col >= TIMESTAMP t` (also safe-wider for >)."""
    return f"unix_micros(TIMESTAMP '{t}') * 1000"


def _ns_le(t: str) -> str:
    """Foldable ns upper bound for `col <= TIMESTAMP t`.

    EXACT, no widening: every bound in this file is a whole-second
    literal, so stop_ns is a multiple of 1000 and `ts_ns <= stop_ns` is
    the ns-precision semantics the DuckDB oracle applies. The previous
    +999 widening admitted rows up to 999 ns past T_STOP on ns-encoded
    fixtures (where Spark's derived `ts` is µs-truncated and passes the
    timestamp conjunct too) — a silent divergence on exactly the
    encoding the conjunct exists for. For µs-encoded fixtures ts_ns is a
    multiple of 1000, so the exact bound is equivalent to the old one."""
    return f"unix_micros(TIMESTAMP '{t}') * 1000"


def _ns_lt(t: str) -> str:
    """Foldable ns bound for `col < TIMESTAMP t` (exact for whole-µs bounds)."""
    return f"unix_micros(TIMESTAMP '{t}') * 1000"


# Event-time columns are normalized to a canonical pair regardless of the
# fixture's physical parquet encoding (this has drifted between rounds —
# TIMESTAMP(NANOS) in r1/r2, timestamp[us] TIMESTAMP_NTZ now):
#   <c>     TIMESTAMP (session-TZ µs; session is pinned UTC) — what queries
#           compare/emit, and what DuckDB sees as its native TIMESTAMP.
#   <c>_ns  BIGINT ns since epoch — the pushdown/arithmetic twin.
# Which physical predicate reaches PushedFilters depends on the encoding:
#   * ns-as-long files: the <c>_ns range conjunct IS the raw long column →
#     plain long comparison → row-group pruning. The timestamp conjunct
#     stays a post-scan filter (Catalyst won't invert timestamp_micros).
#   * µs-timestamp files: the timestamp conjunct lands on the raw column —
#     UnwrapCastInBinaryComparison folds the NTZ→TZ cast into the literal,
#     so PushedFilters gets the native µs range; the <c>_ns conjunct is
#     redundant-but-harmless post-scan. Asserted for the current encoding
#     by tests/test_plan_quality.py, and for both encodings by
#     tests/test_event_time_encoding.py.
TIMESTAMP_COLS = {
    "events": ("ts",),
    "lineitem": ("l_shipdate",),
    "orders": ("o_orderdate",),
}


def normalize_event_time(df: DataFrame, c: str):
    """Normalize event-time column ``c`` to the (`c` TIMESTAMP, `c`_ns BIGINT)
    pair for any physical encoding (see TIMESTAMP_COLS note). Idempotent on
    already-normalized frames."""
    from pyspark.sql import functions as F

    dtype = dict(df.dtypes).get(c)
    if dtype == "bigint":
        # ns-as-long (legacy TIMESTAMP(NANOS) via nanosAsLong). Integer div:
        # double division loses precision at ~1.7e18 ns.
        return df.withColumn(f"{c}_ns", F.col(c)).withColumn(
            c, F.timestamp_micros(F.expr(f"{c} div 1000"))
        )
    if dtype in ("timestamp_ntz", "timestamp"):
        # µs-resolution timestamp. Session TZ is pinned UTC, so the NTZ→TZ
        # cast is instant-preserving and unwrap-cast keeps pushdown alive.
        ts = F.col(c).cast("timestamp")
        return df.withColumn(f"{c}_ns", F.unix_micros(ts) * F.lit(1000)).withColumn(
            c, ts
        )
    raise TypeError(f"unsupported event-time encoding for {c!r}: {dtype}")


# Memoize the ACTIVE sf_dir per (session, table): schema inference costs a
# driver-side parquet footer read per call — registering only a query's
# dependencies, once, keeps repeated invocations scan-only. Keyed by the
# currently-registered dir (not a seen-set): a temp view holds ONE binding,
# so a session that alternates sf dirs must re-register on every switch —
# a seen-set would skip the re-bind and silently serve the LAST dir's data.
_ACTIVE_DIR: dict[tuple[str, str], str] = {}


def register_views(spark: SparkSession, sf_dir: str, tables=TABLES) -> None:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    from pyspark.sql import functions as F

    app_id = spark.sparkContext.applicationId
    for t in tables:
        key = (app_id, t)
        # the memo alone is not proof: a caller can drop/replace the temp
        # view behind our back (the property suite does), and a cloned
        # session (foreachBatch) shares app_id but not the temp catalog —
        # trust the memo only when the catalog still holds the view
        if _ACTIVE_DIR.get(key) == sf_dir and spark.catalog.tableExists(t):
            continue
        df = spark.read.parquet(f"{sf_dir}/{t}.parquet")
        for c in TIMESTAMP_COLS.get(t, ()):
            df = normalize_event_time(df, c)
        # The driver-generated parquet is one row group per table → one
        # scan split. For the CPU-bound map tables (documents: per-shingle
        # md5/regex work; embeddings: per-vector fold chains) that means
        # the whole narrow stage runs on a single core, so spread the scan
        # once with an explicit repartition (REPARTITION_BY_NUM — AQE
        # never coalesces it; filters still push below the exchange).
        # Production inputs are many files/row groups and split naturally.
        # The relational tables (TPC-H, events) are NOT repartitioned:
        # their work parallelizes at the first aggregation/join shuffle
        # anyway, and the extra Exchange would pollute every join plan.
        if t in ("documents", "embeddings"):
            parallelism = spark.sparkContext.defaultParallelism
            # inputFiles() is a pure file-index lookup (no RDD conversion);
            # under-counts splits vs row-groups, but the only decision here
            # is "single-file fixture vs many-file production input".
            if len(df.inputFiles()) < parallelism:
                df = df.repartition(parallelism)
        df.createOrReplaceTempView(t)
        _ACTIVE_DIR[key] = sf_dir


def _sql(name: str) -> Callable[[SparkSession, str], DataFrame]:
    # word-boundary match, not raw substring: 'part' occurs inside
    # 'l_partkey' and 'nation' inside 'c_nationkey' (underscore is a word
    # char, so \\b excludes those), and over-registering costs a parquet
    # footer read per phantom table on every first call
    import re as _re

    deps = tuple(
        t
        for t in TABLES
        if _re.search(rf"\b{t}\b", SPARK_SQL[name]) is not None
    )

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        register_views(spark, sf_dir, deps)
        return spark.sql(SPARK_SQL[name])

    run.__name__ = f"query_{name}"
    return run


def _run_sql_materialized(
    spark: SparkSession, sql: str, cte_names: Sequence[str], tag: str
) -> DataFrame:
    """Execute a CTE query with the named CTEs materialized ONCE each
    (r13, guide §2.4): Spark inlines deterministic CTEs at every
    reference site, so a CTE referenced N times re-runs its whole
    subtree N times in the physical plan (the DuckDB oracle, by
    contrast, shares CTE results — the engines were not even running
    the same amount of work). Each named CTE is evaluated in its
    definition order, localCheckpoint-ed (these are the narrow
    AGGREGATED relations — doc-term / bigram-type rows, far smaller
    than the corpus text they derive from), registered as a temp view,
    and its definition body swapped for a view read; the surrounding
    SQL text — the cross-engine certificate — is untouched.
    Bit-identical by construction: the view holds exactly the rows the
    inlined subtree produces and every downstream operator consumes the
    same relation. Paren matching is textual but QUOTE-AWARE (r14,
    ADVICE r13 #1): parens inside single-quoted SQL string literals are
    skipped (with '' escape handling), and a scanner that walks off the
    end of the text raises a loud ValueError instead of mis-splicing
    the query into wrong-but-parseable SQL."""
    import re as _re

    for nm in cte_names:
        m = _re.search(rf"(?m)^\s*{nm} AS \(", sql)
        if m is None:
            raise ValueError(f"CTE {nm!r} not found in query text")
        start = sql.index("(", m.start())
        depth, i = 0, start
        n = len(sql)
        while True:
            if i >= n:
                raise ValueError(
                    f"unbalanced parentheses scanning CTE {nm!r} body"
                )
            ch = sql[i]
            if ch == "'":
                # skip the quoted literal; '' inside is an escaped quote
                i += 1
                while True:
                    if i >= n:
                        raise ValueError(
                            f"unterminated string literal in CTE {nm!r}"
                        )
                    if sql[i] == "'":
                        if i + 1 < n and sql[i + 1] == "'":
                            i += 2
                            continue
                        break
                    i += 1
            elif ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    break
            i += 1
        view = f"_mat_{tag}_{nm}"
        _fresh_ckpt(
            spark, spark.sql(sql[: i + 1] + f" SELECT * FROM {nm}")
        ).createOrReplaceTempView(view)
        sql = sql[: start + 1] + f"SELECT * FROM {view}" + sql[i:]
    return spark.sql(sql)


# ---------------------------------------------------------------------------
# Spark SQL texts (dialect: Spark). DuckDB oracles below mirror each.
# ---------------------------------------------------------------------------

SPARK_SQL: dict[str, str] = {}
ORACLE: dict[str, str] = {}

# --- F1 source filter (SourceFilter.cpp:73-78) ------------------------------
SPARK_SQL["f1_source_filter"] = ORACLE["f1_source_filter"] = f"""
SELECT event_id, user_id, ts, value
FROM events WHERE event_type = 'purchase'
"""

# --- F2 time-window predicate (SourceFilter.cpp:101-118) --------------------
# Spark variant carries a redundant ns-long conjunct so the range reaches
# the parquet scan (row-group pruning); the timestamp predicate stays for
# exactness. Oracle sees native TIMESTAMP_NS — no conjunct needed.
SPARK_SQL["f2_time_window"] = f"""
SELECT event_id, ts, value
FROM events
WHERE ts >= TIMESTAMP '{T_START}' AND ts <= TIMESTAMP '{T_STOP}'
  AND ts_ns >= {_ns_ge(T_START)} AND ts_ns <= {_ns_le(T_STOP)}
"""
ORACLE["f2_time_window"] = f"""
SELECT event_id, ts, value
FROM events
WHERE ts >= TIMESTAMP '{T_START}' AND ts <= TIMESTAMP '{T_STOP}'
"""

# --- F3 as-of buffering: window rows + latest pre-start row per source ------
# (SourceFilter.cpp:61-66,101-116)
def _asof_body(spark_side: bool) -> str:
    pre_push = f" AND ts_ns < {_ns_lt(T_START)}" if spark_side else ""
    win_push = (
        f" AND ts_ns >= {_ns_ge(T_START)} AND ts_ns <= {_ns_le(T_STOP)}"
        if spark_side
        else ""
    )
    return f"""
WITH pre AS (
  SELECT event_id, user_id, ts, value FROM (
    SELECT e.event_id, e.user_id, e.ts, e.value,
           row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
    FROM events e WHERE ts < TIMESTAMP '{T_START}'{pre_push}
  ) WHERE rn = 1
)
SELECT event_id, user_id, ts, value, TRUE AS is_buffered FROM pre
UNION ALL
SELECT event_id, user_id, ts, value, FALSE AS is_buffered FROM events
WHERE ts >= TIMESTAMP '{T_START}' AND ts <= TIMESTAMP '{T_STOP}'{win_push}
"""


_ASOF_BODY = _asof_body(spark_side=True)
SPARK_SQL["f3_asof_buffer"] = _ASOF_BODY
ORACLE["f3_asof_buffer"] = _asof_body(spark_side=False)

# --- F4 repeated-timestamp dedup (SourceFilter.cpp:90-95) -------------------
SPARK_SQL["f4_dedup_repeated"] = ORACLE["f4_dedup_repeated"] = """
SELECT event_id FROM (
  SELECT event_id, ts, lag(ts) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_ts
  FROM events
) WHERE prev_ts IS NULL OR ts <> prev_ts
"""

# --- F5 out-of-order detection (SourceFilter.cpp:96-98) ---------------------
SPARK_SQL["f5_out_of_order"] = ORACLE["f5_out_of_order"] = """
SELECT user_id, CAST(count(*) AS BIGINT) AS n_out_of_order FROM (
  SELECT user_id, ts, lag(ts) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_ts
  FROM events
) WHERE prev_ts IS NOT NULL AND ts < prev_ts
GROUP BY user_id
"""

# --- D5 offset-gap detection (Partition.cpp:226-230) ------------------------
SPARK_SQL["d5_offset_gaps"] = ORACLE["d5_offset_gaps"] = """
SELECT event_type, CAST(count(*) AS BIGINT) AS n_gaps FROM (
  SELECT event_type, event_id,
         lag(event_id) OVER (PARTITION BY event_type ORDER BY event_id) AS prev_id
  FROM events
) WHERE prev_id IS NOT NULL AND event_id <> prev_id + 1
GROUP BY event_type
"""

# --- W1 f144 running aggregates (f144_Writer.cpp:265-287) -------------------
SPARK_SQL["w1_f144_stats"] = ORACLE["w1_f144_stats"] = """
SELECT user_id,
       min(value) AS minimum_value,
       max(value) AS maximum_value,
       round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(value), 6) AS average_value,
       CAST(count(value) AS BIGINT) AS n_values
FROM events GROUP BY user_id
"""

# --- K4 cue (skip) index (f144_Writer.cpp:259-263) --------------------------
SPARK_SQL["k4_cue_index"] = ORACLE["k4_cue_index"] = """
SELECT event_type, CAST(rn - 1 AS BIGINT) AS cue_index, event_id, ts AS cue_timestamp_zero
FROM (
  SELECT event_type, event_id, ts,
         row_number() OVER (PARTITION BY event_type ORDER BY event_id) AS rn
  FROM events
) WHERE rn % 100 = 0
"""

# --- W2 ev44 cumulative event_index (ev44_Writer.cpp:107-117) ---------------
SPARK_SQL["w2_event_index"] = ORACLE["w2_event_index"] = """
SELECT event_id,
       CAST(coalesce(sum(n) OVER (PARTITION BY event_type ORDER BY event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS event_index
FROM (SELECT event_type, event_id, CAST(floor(value) AS BIGINT) AS n FROM events)
"""

# --- W3 se00 timestamp synthesis (se00_Writer.cpp:82-90) --------------------
SPARK_SQL["w3_timestamp_synthesis"] = """
SELECT event_id, CAST(pos AS BIGINT) AS pos,
       unix_micros(ts) + pos * 1000 AS synth_us
FROM events LATERAL VIEW explode(sequence(0, 3)) t AS pos
"""
ORACLE["w3_timestamp_synthesis"] = """
SELECT event_id, CAST(t.i AS BIGINT) AS pos,
       epoch_us(ts) + t.i * 1000 AS synth_us
FROM events, unnest(range(0, 4)) AS t(i)
"""

# --- W6 al00 severity coding + message default (al00_Writer.cpp:57-70) ------
SPARK_SQL["w6_severity_code"] = ORACLE["w6_severity_code"] = """
SELECT event_id,
       CAST(CASE event_type WHEN 'error' THEN 3 WHEN 'purchase' THEN 2
            WHEN 'signup' THEN 1 ELSE 0 END AS SMALLINT) AS severity,
       coalesce(nullif(props, ''), 'NO ALARM MESSAGE') AS message
FROM events
"""

# --- T6 job-summary metadata (MetaData::Tracker) ----------------------------
SPARK_SQL["t6_job_summary"] = ORACLE["t6_job_summary"] = """
SELECT CAST(count(*) AS BIGINT) AS n_messages,
       min(ts) AS start_ts, max(ts) AS stop_ts,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
"""

# --- W4 ad00 trailing-dim zero-fill (ExtensibleDataset.h:412-441) -----------
# Each message carries its own frame width; the dataset extends to the max
# observed width and smaller slabs are zero-filled. Declared vs padded
# width + fill count per frame, slab checksum = value × declared width.
SPARK_SQL["w4_ad00_zero_fill"] = ORACLE["w4_ad00_zero_fill"] = """
WITH f AS (
  SELECT event_type, event_id, value, 1 + event_id % 3 AS w FROM events
),
m AS (SELECT event_type, max(w) AS maxw FROM f GROUP BY event_type)
SELECT event_id,
       CAST(w AS BIGINT) AS declared_width,
       CAST(maxw AS BIGINT) AS padded_width,
       CAST(maxw - w AS BIGINT) AS n_zero_fill,
       round(value * w, 6) AS slab_sum
FROM f JOIN m USING (event_type)
"""

# --- W5 da00 constants: write-once + consistency check (da00_Writer.cpp:65-130)
SPARK_SQL["w5_da00_constants"] = ORACLE["w5_da00_constants"] = """
SELECT user_id,
       min_by(event_type, event_id) AS constant_value,
       CAST(count(DISTINCT event_type) AS BIGINT) AS n_variants,
       count(DISTINCT event_type) = 1 AS consistent
FROM events GROUP BY user_id
"""

# --- W7 ep01 connection-status change log (ep01_Writer.cpp:38-46) -----------
# EPICS writes only state CHANGES: run-length dedup of consecutive equal
# statuses per source in consumption order.
SPARK_SQL["w7_ep01_state_changes"] = ORACLE["w7_ep01_state_changes"] = """
SELECT user_id, event_id, ts AS connection_status_time,
       CAST(CASE event_type WHEN 'error' THEN 2 WHEN 'purchase' THEN 1 ELSE 0 END AS SMALLINT) AS status
FROM (
  SELECT user_id, event_id, ts, event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_type
  FROM events
) WHERE prev_type IS NULL OR event_type <> prev_type
"""

# --- W8 tdct per-chunk cue: (cumulative element count, chunk ts) ------------
# (tdct_Writer.cpp:67-83: cue pair appended per timestamps[] chunk)
SPARK_SQL["w8_tdct_chunk_cue"] = ORACLE["w8_tdct_chunk_cue"] = """
SELECT event_id,
       CAST(coalesce(sum(sz) OVER (PARTITION BY event_type ORDER BY event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cue_index,
       ts AS cue_timestamp_zero
FROM (SELECT event_type, event_id, ts, 1 + event_id % 5 AS sz FROM events)
"""

# --- streaming-style ops in batch form --------------------------------------
SPARK_SQL["sessionize"] = """
SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(new_session) AS BIGINT) AS n_sessions
FROM (
  SELECT user_id,
         CASE WHEN prev_ts IS NULL
                   OR unix_micros(ts) - unix_micros(prev_ts) > 1800000000
              THEN 1 ELSE 0 END AS new_session
  FROM (SELECT user_id, ts,
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        FROM events)
) GROUP BY user_id
"""
ORACLE["sessionize"] = """
SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(new_session) AS BIGINT) AS n_sessions
FROM (
  SELECT user_id,
         CASE WHEN prev_ts IS NULL
                   OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
              THEN 1 ELSE 0 END AS new_session
  FROM (SELECT user_id, ts,
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        FROM events)
) GROUP BY user_id
"""

# Spark's built-in session_window (30 min gap); DuckDB mirrors it with
# gap-based session ids (cumsum of new-session flags). Session end =
# last event + gap in both.
SPARK_SQL["session_windows"] = """
SELECT user_id, session_window.start AS session_start,
       session_window.end AS session_end,
       CAST(count(*) AS BIGINT) AS n_events
FROM events
GROUP BY user_id, session_window(ts, '30 minutes')
"""
ORACLE["session_windows"] = """
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
sessions AS (
  SELECT user_id, ts,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM flagged
)
SELECT user_id, min(ts) AS session_start,
       max(ts) + INTERVAL 30 MINUTE AS session_end,
       CAST(count(*) AS BIGINT) AS n_events
FROM sessions GROUP BY user_id, sid
"""

# semi-structured payload extraction (props is a JSON string column)
SPARK_SQL["json_props_extract"] = """
SELECT event_type,
       CAST(sum(CAST(get_json_object(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
       CAST(count(get_json_object(props, '$.k')) AS BIGINT) AS n_with_k
FROM events GROUP BY event_type
"""
ORACLE["json_props_extract"] = """
SELECT event_type,
       CAST(sum(json_extract(props, '$.k')::INT) AS BIGINT) AS sum_k,
       CAST(count(json_extract(props, '$.k')) AS BIGINT) AS n_with_k
FROM events GROUP BY event_type
"""

SPARK_SQL["tumbling_window"] = ORACLE["tumbling_window"] = """
SELECT date_trunc('day', ts) AS window_start, event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events GROUP BY date_trunc('day', ts), event_type
"""

SPARK_SQL["sliding_window"] = """
SELECT window_start, CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM (
  SELECT explode(sequence(date_trunc('day', ts) - INTERVAL 1 DAY,
                          date_trunc('day', ts), INTERVAL 1 DAY)) AS window_start,
         value
  FROM events
) GROUP BY window_start
"""
ORACLE["sliding_window"] = """
SELECT t.ws AS window_start, CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events,
     unnest(generate_series(date_trunc('day', ts) - INTERVAL 1 DAY,
                            date_trunc('day', ts), INTERVAL 1 DAY)) AS t(ws)
GROUP BY t.ws
"""

SPARK_SQL["topk_per_group"] = ORACLE["topk_per_group"] = """
SELECT event_type, event_id, value FROM (
  SELECT event_type, event_id, value,
         row_number() OVER (PARTITION BY event_type ORDER BY value DESC, event_id) AS rn
  FROM events
) WHERE rn <= 3
"""

# --- TPC-H-ish plans (join/agg/top-k coverage at bench scale) ---------------
# (l_shipdate / o_orderdate are native timestamp_ntz parquet columns — the
# date predicates reach PushedFilters as-is; only events.ts needs the _ns
# conjunct treatment, see f2.)
SPARK_SQL["q1_pricing_summary"] = ORACLE["q1_pricing_summary"] = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
       round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_qty,
       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_price,
       round(CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_disc,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""

SPARK_SQL["q3_shipping_priority"] = ORACLE["q3_shipping_priority"] = """
SELECT l_orderkey,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
       o_orderdate
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate > TIMESTAMP '1997-01-01 00:00:00'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""

SPARK_SQL["q5_local_supplier"] = ORACLE["q5_local_supplier"] = """
SELECT n_name,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
"""

# q7 volume shipping: bilateral trade volume between two nations by year.
# Full TPC-H shape (two nation aliases, 5-way join, year grouping); the
# reduced schema carries every needed column.
SPARK_SQL["q7_volume_shipping"] = ORACLE["q7_volume_shipping"] = """
SELECT supp_nation, cust_nation, l_year,
       CAST(sum(volume) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         year(l_shipdate) AS l_year,
         CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS volume
  FROM supplier
  JOIN lineitem ON s_suppkey = l_suppkey
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    AND l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""

# q8 national market share: share of one nation's suppliers in a region's
# order volume for one part type, by year.
SPARK_SQL["q8_market_share"] = ORACLE["q8_market_share"] = """
SELECT o_year,
       round(CAST(sum(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END) AS DOUBLE)
             / CAST(sum(volume) AS DOUBLE), 6) AS mkt_share
FROM (
  SELECT year(o_orderdate) AS o_year,
         CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS volume,
         n2.n_name AS nation
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region ON n1.n_regionkey = r_regionkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'AMERICA'
    AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
    AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    AND p_type IN ('PROMO', 'ECONOMY')
) all_nations
GROUP BY o_year
ORDER BY o_year
"""

# q9 product-type profit: TPC-H computes amount from ps_supplycost; the
# reduced schema has no partsupp, so cost is proxied by p_retailprice
# (deterministic, same join/agg shape: 4-way join, LIKE filter on p_name,
# group by nation and year).
SPARK_SQL["q9_product_profit"] = ORACLE["q9_product_profit"] = """
SELECT nation, o_year, CAST(sum(amount) AS DOUBLE) AS sum_profit
FROM (
  SELECT n_name AS nation, year(o_orderdate) AS o_year,
         CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))
         - CAST(p_retailprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2)) * CAST(0.1 AS DECIMAL(3,1)) AS amount
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders ON o_orderkey = l_orderkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE p_name LIKE '%bolt%'
) profit
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
"""

# q12 shipping delay by priority: the reduced schema has no l_shipmode /
# commit/receipt dates, so "late" = shipped more than 90 days after the
# order date; the CASE-split priority counting is the q12 shape.
SPARK_SQL["q12_late_shipping"] = ORACLE["q12_late_shipping"] = """
SELECT year(l_shipdate) AS ship_year,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
GROUP BY year(l_shipdate)
ORDER BY ship_year
"""

# q20 potential part promotion: suppliers who shipped more than 1.1x the
# per-supplier average quantity of 'forest'-prefixed parts (partsupp-free
# adaptation keeping the nested-aggregate + semi-join shape).
SPARK_SQL["q20_part_promotion"] = ORACLE["q20_part_promotion"] = """
WITH forest_ship AS (
  SELECT l_suppkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS qty
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE 'small%'
  GROUP BY l_suppkey
)
SELECT s_name, CAST(qty AS DOUBLE) AS forest_qty
FROM supplier JOIN forest_ship ON s_suppkey = l_suppkey
WHERE qty > (SELECT avg(qty) * 1.1 FROM forest_ship)
ORDER BY s_name
"""

SPARK_SQL["q6_forecast_revenue"] = ORACLE["q6_forecast_revenue"] = """
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""

# q18 pre-aggregates lineitem BEFORE the join (the canonical q18 plan):
# the groupBy collapses map-side to one row per orderkey, HAVING cuts the
# survivors to a sliver, and the join input shrinks from the full fact
# table to that sliver — so the orders join stays broadcast-able at any
# corpus size, where the join-then-aggregate form shuffles every joined
# lineitem row. Every lineitem has an order, so inner-join semantics are
# unchanged.
SPARK_SQL["q18_large_orders"] = ORACLE["q18_large_orders"] = """
WITH big AS (
  SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS qty
  FROM lineitem
  GROUP BY l_orderkey
  HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 150
)
SELECT o_orderkey, o_orderdate, round(o_totalprice, 2) AS o_totalprice,
       CAST(qty AS DOUBLE) AS total_qty
FROM orders JOIN big ON o_orderkey = l_orderkey
ORDER BY total_qty DESC, o_orderkey
LIMIT 100
"""

SPARK_SQL["q4_priority_exists"] = ORACLE["q4_priority_exists"] = """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_quantity > 45)
GROUP BY o_orderpriority
"""

SPARK_SQL["q10_returned_revenue"] = ORACLE["q10_returned_revenue"] = """
SELECT c_custkey, c_name, n_name,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""

SPARK_SQL["q13_order_distribution"] = ORACLE["q13_order_distribution"] = """
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (
  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
) GROUP BY c_count
"""

SPARK_SQL["q14_promo_ratio"] = ORACLE["q14_promo_ratio"] = """
SELECT round(
  100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
                        THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))
                        ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
  / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE),
  6) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-06-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1996-07-01 00:00:00'
"""

SPARK_SQL["q16_brand_suppliers"] = ORACLE["q16_brand_suppliers"] = """
SELECT p_brand, p_size, CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1' AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
GROUP BY p_brand, p_size
"""

SPARK_SQL["q19_disjunctive_pred"] = ORACLE["q19_disjunctive_pred"] = """
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 10)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity >= 5)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity >= 1)
"""

SPARK_SQL["q22_idle_customers"] = ORACLE["q22_idle_customers"] = """
SELECT c_nationkey, CAST(count(*) AS BIGINT) AS numcust,
       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '1997-06-01 00:00:00')
GROUP BY c_nationkey
"""

SPARK_SQL["q2_min_cost_supplier"] = ORACLE["q2_min_cost_supplier"] = """
SELECT p_partkey, p_brand, s_suppkey, round(l_extendedprice, 2) AS price
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
WHERE p_size = 10
  AND l_extendedprice = (SELECT min(l2.l_extendedprice) FROM lineitem l2
                         WHERE l2.l_partkey = part.p_partkey)
ORDER BY p_partkey, s_suppkey
LIMIT 50
"""

SPARK_SQL["q11_important_stock"] = ORACLE["q11_important_stock"] = """
SELECT l_partkey,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS stock_value
FROM lineitem
GROUP BY l_partkey
HAVING sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) >
       (SELECT sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) * 0.0005
        FROM lineitem)
ORDER BY stock_value DESC, l_partkey
LIMIT 100
"""

SPARK_SQL["q15_top_supplier"] = ORACLE["q15_top_supplier"] = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""

SPARK_SQL["q17_small_quantity_revenue"] = ORACLE["q17_small_quantity_revenue"] = """
SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0, 6) AS avg_yearly
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#3'
  AND l_quantity < (SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2
                    WHERE l2.l_partkey = p_partkey)
"""

SPARK_SQL["q21_waiting_orders"] = ORACLE["q21_waiting_orders"] = """
SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
WHERE o_orderstatus = 'F'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > l1.l_shipdate)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 25
"""

# --- grouping sets / rollup --------------------------------------------------
SPARK_SQL["rollup_daily_totals"] = ORACLE["rollup_daily_totals"] = """
SELECT event_type, date_trunc('day', ts) AS day,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events
GROUP BY ROLLUP (event_type, date_trunc('day', ts))
"""

# --- hypertable-style two-level rollup ---------------------------------------
# Continuous-aggregate pattern: daily totals computed FROM hourly partials
# (sum of sums, min of mins) — at scale the hourly layer is materialized
# once and every coarser resolution reaggregates it instead of the raw
# stream.
SPARK_SQL["hypertable_rollup"] = ORACLE["hypertable_rollup"] = """
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS hour, event_type,
         count(*) AS n, sum(CAST(value AS DECIMAL(18,2))) AS sv,
         min(value) AS mn, max(value) AS mx
  FROM events GROUP BY date_trunc('hour', ts), event_type
)
SELECT date_trunc('day', hour) AS day, event_type,
       CAST(sum(n) AS BIGINT) AS n_events,
       CAST(sum(sv) AS DOUBLE) AS sum_value,
       min(mn) AS min_value, max(mx) AS max_value
FROM hourly GROUP BY date_trunc('day', hour), event_type
"""

SPARK_SQL["cube_type_user_totals"] = ORACLE["cube_type_user_totals"] = """
SELECT event_type, user_id % 10 AS user_bucket,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events
GROUP BY CUBE (event_type, user_id % 10)
"""

# --- set operations ----------------------------------------------------------
SPARK_SQL["set_intersect_users"] = ORACLE["set_intersect_users"] = """
SELECT user_id FROM events WHERE event_type = 'purchase'
INTERSECT
SELECT user_id FROM events WHERE event_type = 'error'
"""

SPARK_SQL["set_except_users"] = ORACLE["set_except_users"] = """
SELECT user_id FROM events WHERE event_type = 'purchase'
EXCEPT
SELECT user_id FROM events WHERE event_type = 'error'
"""

# --- window-function battery -------------------------------------------------
SPARK_SQL["window_rank_battery"] = ORACLE["window_rank_battery"] = """
SELECT event_id,
       CAST(dense_rank() OVER (PARTITION BY event_type ORDER BY value DESC, event_id) AS BIGINT) AS dr,
       CAST(ntile(4) OVER (PARTITION BY event_type ORDER BY value DESC, event_id) AS BIGINT) AS quartile,
       round(percent_rank() OVER (PARTITION BY event_type ORDER BY value DESC, event_id), 6) AS pr,
       round(CAST(avg(value) OVER (PARTITION BY user_id ORDER BY event_id
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE), 6) AS moving_avg3
FROM events
"""

# --- exact ordered statistics ------------------------------------------------
# percentile() (Spark) and quantile_cont() (DuckDB) both compute the exact
# interpolated quantile — ordered-statistics coverage with exact parity.
SPARK_SQL["value_quantiles"] = """
SELECT event_type,
       round(percentile(value, 0.5), 6) AS p50,
       round(percentile(value, 0.9), 6) AS p90,
       round(percentile(value, 0.99), 6) AS p99
FROM events GROUP BY event_type
"""
ORACLE["value_quantiles"] = """
SELECT event_type,
       round(quantile_cont(value, 0.5), 6) AS p50,
       round(quantile_cont(value, 0.9), 6) AS p90,
       round(quantile_cont(value, 0.99), 6) AS p99
FROM events GROUP BY event_type
"""

# --- TF-IDF top term per document --------------------------------------------
# Classic text weighting: tf(term, doc) × ln(N / df(term)); top-1 term per
# doc with stable ties. The corpus is exploded ONCE: df(term) is a window
# count over tf (tf holds one row per (doc, term), so count(*) per term ==
# count(DISTINCT doc_id) over raw terms) — no tf⋈df self-join, so the
# explode subtree appears once in the plan instead of twice (the round-3
# plan re-ran the explode for df: 8 exchanges, 2 corpus scans). N is a
# separate metadata-cheap count job folded in as a literal, keeping the
# main plan at one corpus scan and three shuffles: Exchange(doc_id,term)
# for tf, Exchange(term) for the df window, Exchange(doc_id) for top-1.
_TFIDF_MAIN_SQL = """
WITH terms AS (
  SELECT doc_id, term FROM (
    SELECT doc_id, explode(split(lower(text), ' ')) AS term FROM documents
  ) WHERE term <> ''
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY doc_id, term),
scored AS (
  SELECT tf.doc_id, tf.term,
         round(tf.tf * ln(CAST({n} AS DOUBLE)
                          / count(*) OVER (PARTITION BY tf.term)), 6) AS tfidf
  FROM tf
)
SELECT doc_id, term, tfidf FROM (
  SELECT doc_id, term, tfidf,
         row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rn
  FROM scored
) WHERE rn = 1
"""


def _q_tfidf_top_term(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF top-1 term per doc; single corpus explode, df via window
    count over tf. N comes from a separate count(*) job (parquet
    metadata count — no row materialization) so the main plan carries no
    second corpus scan and no single-row cross join."""
    register_views(spark, sf_dir, ("documents",))
    n_docs = spark.table("documents").count()
    return spark.sql(_TFIDF_MAIN_SQL.format(n=n_docs))


ORACLE["tfidf_top_term"] = """
WITH terms AS (
  SELECT doc_id, term FROM (
    SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term FROM documents
  ) WHERE term <> ''
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY doc_id, term),
n AS (SELECT count(*) AS n FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term,
         round(tf.tf * ln(CAST(n.n AS DOUBLE)
                          / count(*) OVER (PARTITION BY tf.term)), 6) AS tfidf
  FROM tf CROSS JOIN n
)
SELECT doc_id, term, tfidf FROM (
  SELECT doc_id, term, tfidf,
         row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rn
  FROM scored
) WHERE rn = 1
"""

# --- BM25 top-k retrieval ----------------------------------------------------
# Okapi BM25 (k1=1.2, b=0.75) for a literal query-term set over the
# documents corpus — the retrieval primitive a decontamination / data-mix
# pipeline runs against its training corpus. Inverted-index shape: the
# term explode is filtered to the query set immediately (the IN
# predicate prunes the posting list before any aggregation, so tf/df
# work is O(matching postings), never O(corpus vocabulary)); doc length
# is a codegen higher-order `size(filter(split(...)))` — no explode at
# all. df is written over tf, but Catalyst inlines the CTE into two
# subtrees, so the plan tokenizes the corpus twice — deliberate: the
# alternative (df as a window count over tf, tfidf-style) funnels every
# posting row into |query| reducer partitions, a hotspot at 100 TB,
# while both inlined subtrees keep map-side partial aggregation. An
# indexed deployment would persist tf once (see SCALE.md persist note)
# — for an ad-hoc scan query the second tokenize pass is the honest
# scalable floor. Corpus constants (N, total token count) come from one
# narrow pre-pass; avgdl is injected as the exact expression
# sum/count so BOTH engines execute the identical double division.
# Per-term scores are rounded then summed in a FIXED textual order
# (conditional aggregation, one non-null row per term), so float
# addition order cannot differ between engines. The final top-k is
# ORDER BY + LIMIT — Spark compiles it to TakeOrderedAndProject
# (per-partition top-k, k-row merge), never a single-partition sort.
_BM25_TERMS = ("join", "window", "filter", "vector")
_BM25_K = 10


def _bm25_sql(n_docs: int, total_tokens: int, dialect: str) -> str:
    if dialect == "spark":
        split_len = "size(filter(split(lower(text), ' '), x -> x <> ''))"
    else:
        split_len = (
            "len(list_filter(string_split(lower(text), ' '), x -> x <> ''))"
        )
    terms = ", ".join(f"'{t}'" for t in _BM25_TERMS)
    unnest = (
        "explode(split(lower(text), ' '))"
        if dialect == "spark"
        else "unnest(string_split(lower(text), ' '))"
    )
    case_sum = "\n       + ".join(
        f"coalesce(sum(CASE WHEN term = '{t}' THEN s END), 0)"
        for t in _BM25_TERMS
    )
    return f"""
WITH base AS (
  SELECT doc_id, CAST({split_len} AS DOUBLE) AS dl FROM documents
),
terms AS (
  SELECT doc_id, term FROM (
    SELECT doc_id, {unnest} AS term FROM documents
  ) t WHERE term IN ({terms})
),
tf AS (SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf
       FROM terms GROUP BY doc_id, term),
df AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id, tf.term,
         round(ln((CAST({n_docs} AS DOUBLE) - df.df + 0.5) / (df.df + 0.5) + 1.0)
               * tf.tf * 2.2
               / (tf.tf + 1.2 * (0.25 + 0.75 * base.dl
                  / (CAST({total_tokens} AS DOUBLE) / CAST({n_docs} AS DOUBLE)))),
               6) AS s
  FROM tf JOIN df ON tf.term = df.term JOIN base ON tf.doc_id = base.doc_id
),
agg AS (
  SELECT doc_id,
         {case_sum} AS score
  FROM scored GROUP BY doc_id
)
SELECT doc_id, round(score, 6) AS score
FROM agg ORDER BY score DESC, doc_id LIMIT {_BM25_K}
"""


def _duckdb_corpus_stats(sf_dir: str) -> tuple[int, int]:
    """Corpus constants (n_docs, total_tokens) via DuckDB — ONLY for
    :func:`_lazy_oracles`, which legitimately has no Spark session (the
    oracle string is built at oracle_sql() time). The Spark query path
    uses :func:`_spark_corpus_stats`; both are exact BIGINT aggregates,
    so the two engines embed bit-identical literals. Memoized per sf_dir
    (shared cache — whichever engine derives first serves both)."""
    cached = _CORPUS_STATS_CACHE.get(sf_dir)
    if cached is None:
        import os

        import duckdb

        path = f"{sf_dir}/documents.parquet"
        if os.path.isdir(path):  # Spark-written dataset dir (synth tiers)
            path = f"{path}/*.parquet"
        n, tot = duckdb.sql(
            "SELECT count(*), "
            "sum(len(list_filter(string_split(lower(text), ' '), "
            "x -> x <> ''))) FROM "
            f"read_parquet('{path}')"
        ).fetchone()
        cached = _CORPUS_STATS_CACHE[sf_dir] = (int(n), int(tot))
    return cached


def _spark_corpus_stats(spark: SparkSession, sf_dir: str) -> tuple[int, int]:
    """Corpus constants (n_docs, total_tokens) via a DISTRIBUTED Spark
    aggregate — the query-path derivation. A one-row action (count +
    sum-of-token-counts, partial-agged and scan-bound), so at 100 TB it
    is a normal cluster pass, not the single-node DuckDB scan the oracle
    builder uses on the driver. Exact BIGINT arithmetic → bit-identical
    to :func:`_duckdb_corpus_stats` on any corpus; memoized per sf_dir
    in the shared cache."""
    cached = _CORPUS_STATS_CACHE.get(sf_dir)
    if cached is None:
        register_views(spark, sf_dir, ("documents",))
        n, tot = spark.sql(
            "SELECT count(*), "
            "sum(size(filter(split(lower(text), ' '), x -> x <> ''))) "
            "FROM documents"
        ).first()
        cached = _CORPUS_STATS_CACHE[sf_dir] = (int(n), int(tot))
    return cached


_CORPUS_STATS_CACHE: dict[str, tuple[int, int]] = {}


def _q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("documents",))
    n_docs, total_tokens = _spark_corpus_stats(spark, sf_dir)
    return spark.sql(_bm25_sql(n_docs, total_tokens, "spark"))


# The oracle embeds the same corpus constants as the Spark side, derived
# lazily for the sf_dir the oracle will run against (the driver compares
# at sf0.01; tools/check_oracle.py overrides via env for other tiers) —
# resolved in oracle_sql(), not at import, so importing this module does
# no I/O.
_ORACLE_SF_DIR_ENV = "SPARK_GRAFT_ORACLE_SF_DIR"
_ORACLE_SF_DIR_DEFAULT = "/root/testdata/sf0.01"


def _lazy_oracles(sf_dir: str | None = None) -> dict[str, str]:
    """Oracles whose SQL embeds corpus constants for a SPECIFIC tier.

    ``sf_dir`` names the tier the oracle will run against — pass it
    explicitly when comparing at a non-default tier (tools/check_oracle.py
    does); the ``SPARK_GRAFT_ORACLE_SF_DIR`` env var is the fallback, then
    the driver's sf0.01 default. An oracle built for one tier is WRONG at
    any other (the N/total literals differ), which is why the tier is a
    parameter rather than ambient state."""
    import os
    import warnings

    if sf_dir is None:
        sf_dir = os.environ.get(_ORACLE_SF_DIR_ENV, _ORACLE_SF_DIR_DEFAULT)
    if not os.path.exists(f"{sf_dir}/documents.parquet"):
        # no corpus at the configured tier: omit the two corpus-constant
        # oracles (driver records rows-only for them) instead of making
        # every oracle_sql() caller crash in a data-less environment —
        # but say so loudly, or oracle-coverage checks silently become
        # environment-dependent
        warnings.warn(
            f"no documents corpus at {sf_dir!r}: omitting the "
            "bm25_topk/unigram_logprob_score/bigram_logprob_score oracles "
            "(rows-only check)",
            stacklevel=2,
        )
        return {}
    n_docs, total_tokens = _duckdb_corpus_stats(sf_dir)
    return {
        "bm25_topk": _bm25_sql(n_docs, total_tokens, "duck"),
        "unigram_logprob_score": _UNIGRAM_SQL["duck"].format(total=total_tokens),
        "bigram_logprob_score": _BIGRAM_SQL["duck"].format(total=total_tokens),
        "rrf_fusion": _rrf_sql(n_docs, total_tokens, "duck"),
    }


# --- L81: Reciprocal Rank Fusion (hybrid lexical + vector retrieval) ----------
# The standard way production search fuses a BM25 list with an embedding
# list (Cormack et al. 2009; what Elasticsearch/Vespa/OpenSearch ship):
# score(d) = Σ_lists 1/(RRF_K + rank_d), rank-based so the two scoring
# scales never need calibration. Composes the engine's own BM25 top-k
# and exact cosine top-k (doc_id and vec_id are the fixture's shared
# key); ranks are deterministic (score desc, id asc), the fused score is
# a sum of at most two exact rationals — no float-portability hazard.
# Scale: both input lists are top-k relations (k rows), so the fusion
# itself is O(k) regardless of corpus size; the cost IS the two
# retrieval legs, each already measured.
_RRF_K = 60


def _rrf_sql(n_docs: int, total_tokens: int, dialect: str) -> str:
    bm = _bm25_sql(n_docs, total_tokens, dialect)
    co = (
        SPARK_SQL["ann_cosine_topk"]
        if dialect == "spark"
        else ORACLE["ann_cosine_topk"]
    )
    return f"""
WITH bm AS ({bm}),
co AS ({co}),
bmr AS (SELECT doc_id,
               row_number() OVER (ORDER BY score DESC, doc_id) AS r
        FROM bm),
cor AS (SELECT vec_id AS doc_id,
               row_number() OVER (ORDER BY cosine DESC, vec_id) AS r
        FROM co),
fused AS (
  SELECT coalesce(bmr.doc_id, cor.doc_id) AS doc_id,
         round(coalesce(CAST(1.0 AS DOUBLE) / ({_RRF_K} + bmr.r),
                        CAST(0 AS DOUBLE))
               + coalesce(CAST(1.0 AS DOUBLE) / ({_RRF_K} + cor.r),
                          CAST(0 AS DOUBLE)), 6) AS rrf_score
  FROM bmr FULL OUTER JOIN cor ON bmr.doc_id = cor.doc_id
)
SELECT doc_id, rrf_score
FROM fused ORDER BY rrf_score DESC, doc_id LIMIT 10
"""


def _q_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("documents", "embeddings"))
    n_docs, total_tokens = _spark_corpus_stats(spark, sf_dir)
    return spark.sql(_rrf_sql(n_docs, total_tokens, "spark"))

# --- unigram LM negative log-likelihood --------------------------------------
# The perplexity-filter stand-in (CCNet / RedPajama pipelines score docs
# with a KenLM over the target distribution and drop the tails): a
# unigram LM self-trained on the corpus, each doc scored by mean
# negative log-likelihood nll = -Σ tf·ln(tf_corpus/total) / Σ tf. High
# nll = rare/surprising tokens (boilerplate and gibberish both surface).
# Shape: one explode → per-(doc, term) tf; corpus term frequencies are a
# second aggregation of tf joined back on term (map-side partials both
# sides; AQE handles hot-stopword skew; the vocab side broadcasts while
# it fits). Like bm25_topk, Catalyst inlines the tf CTE into both
# consumers — two tokenize passes, each scan-bound and partial-agged,
# rather than a term-partitioned window that would pile every posting of
# a hot term into one reducer.
# Float portability: per-term contributions are rounded to 6 dp and
# summed as DECIMAL(28,6) — decimal sums are EXACT and therefore
# order-independent, so both engines produce identical sums regardless
# of aggregation order (the same decimal trick the TPC-H battery uses).
# Emits the exact decimal TOTAL (cast to double, correctly rounded in
# both engines) + the position count, NOT round(total/count, 6): the
# divide-then-round mean has a cross-engine tie hazard when it lands
# exactly halfway at the 6th decimal — it bit the bigram twin at sf0.01
# during r8 development (see _BIGRAM_TAIL's note); consumers derive the
# mean. Backported r9 (VERDICT r8 "what's wrong" #1).
_UNIGRAM_SQL = {
    "spark": """
WITH terms AS (
  SELECT doc_id, term FROM (
    SELECT doc_id, explode(split(lower(text), ' ')) AS term FROM documents
  ) t WHERE term <> ''
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY doc_id, term),
freq AS (SELECT term, CAST(sum(tf) AS DOUBLE) AS cf FROM tf GROUP BY term),
contrib AS (
  SELECT tf.doc_id, tf.tf,
         CAST(round(tf.tf * ln(freq.cf / {total}), 6) AS DECIMAL(28, 6)) AS c
  FROM tf JOIN freq ON tf.term = freq.term
)
SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
       CAST(-sum(c) AS DOUBLE) AS nll_total
FROM contrib GROUP BY doc_id
""",
    "duck": """
WITH terms AS (
  SELECT doc_id, term FROM (
    SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term FROM documents
  ) t WHERE term <> ''
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY doc_id, term),
freq AS (SELECT term, CAST(sum(tf) AS DOUBLE) AS cf FROM tf GROUP BY term),
contrib AS (
  SELECT tf.doc_id, tf.tf,
         CAST(round(tf.tf * ln(freq.cf / {total}), 6) AS DECIMAL(28, 6)) AS c
  FROM tf JOIN freq ON tf.term = freq.term
)
SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
       CAST(-sum(c) AS DOUBLE) AS nll_total
FROM contrib GROUP BY doc_id
""",
}


def _q_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("documents",))
    _, total_tokens = _spark_corpus_stats(spark, sf_dir)
    return spark.sql(_UNIGRAM_SQL["spark"].format(total=total_tokens))


# --- L66: incremental NEAR-dup merge (admission against a standing corpus) ----
# The near-dup companion of L40's exact-hash admission: a batch of
# arrivals (doc_id % 10 == 0 — the continuously-ingesting slice) is
# admitted only if NO standing-corpus document verifies as a near-dup
# (banded minhash candidates between the two relations, exact n-gram
# Jaccard on candidates only, τ = 0.5). Composes the L2/L3/L4 library
# stages ACROSS two relations instead of within one: candidate
# generation is an equi-join on (band, band_key) with the SMALL arrival
# side broadcast — at 100 TB the standing corpus' banded relation
# streams by while each arrival batch ships to every executor; the
# verify join is candidate-bounded, never corpus × corpus.
#
# The standing side's bucket membership is CAPPED at _INC_ND_CAP per
# (band, band_key) (lowest doc_ids kept): the uncapped cross-relation
# join MEASURED quadratic on crowded buckets (the ×100 synth corpus'
# replica buckets filled the disk with shuffle spill — SCALE.md r9), the
# same hazard the within-corpus family caps. Capping makes near-dup
# admission best-effort past the cap, so EXACT duplicates get a
# guaranteed backstop: a fingerprint-equality candidate leg (md5(text)
# join — the L40 check) unions in, and an identical arrival always
# verifies at jaccard 1 regardless of bucket crowding — the same
# exact-dups-are-cap-proof contract chain_col gives the batch pipeline.
# Emits every arrival with its admission verdict and best
# standing-corpus jaccard (null = no candidate met any bucket).
_INC_ND_TAU = 0.5
_INC_ND_CAP = 8


def _q_incremental_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from .llm import dedup as llm_dedup

    register_views(spark, sf_dir, ("documents",))
    docs = spark.table("documents")
    is_new = F.col("doc_id") % 10 == 0
    sig = llm_dedup.minhash_signatures(
        docs, num_hashes=8, shingle_k=5, hash_engine="md5"
    )
    banded = llm_dedup.banded_signatures(sig, bands=4, rows_per_band=2)
    new_b = banded.filter(is_new).alias("n").hint("broadcast")
    old_b = (
        banded.filter(~is_new)
        .withColumn(
            "_rk",
            F.row_number().over(
                Window.partitionBy("band", "band_key").orderBy("doc_id")
            ),
        )
        .filter(F.col("_rk") <= _INC_ND_CAP)
        .alias("o")
    )
    cand_lsh = new_b.join(
        old_b,
        (F.col("n.band") == F.col("o.band"))
        & (F.col("n.band_key") == F.col("o.band_key")),
    ).select(F.col("n.doc_id").alias("id_a"), F.col("o.doc_id").alias("id_b"))
    fp = docs.select(
        "doc_id", F.md5(F.col("text").cast("binary")).alias("_fp")
    )
    cand_fp = (
        fp.filter(is_new)
        .alias("n")
        .hint("broadcast")
        .join(fp.filter(~is_new).alias("o"), F.col("n._fp") == F.col("o._fp"))
        .select(
            F.col("n.doc_id").alias("id_a"), F.col("o.doc_id").alias("id_b")
        )
    )
    cand = cand_lsh.unionByName(cand_fp).distinct()
    ver = llm_dedup.ngram_jaccard(docs, cand)
    best = ver.groupBy("id_a").agg(
        F.max(F.round("jaccard", 6)).alias("best_jaccard")
    )
    arrivals = docs.filter(is_new).select("doc_id")
    return arrivals.join(
        best, arrivals.doc_id == best.id_a, "left"
    ).select(
        "doc_id",
        F.coalesce(
            F.col("best_jaccard") < _INC_ND_TAU, F.lit(True)
        ).alias("admitted"),
        "best_jaccard",
    )


ORACLE["incremental_neardup_merge"] = f"""
WITH sh AS (
  SELECT doc_id,
         list_distinct([substr(text, i, 5)
              for i in range(1, greatest(length(text) - 4, 1) + 1)]) AS sh
  FROM documents
),
hx AS (
  SELECT doc_id,
         [md5(s) for s in sh] AS h0,
         [md5(s || '1') for s in sh] AS h1
  FROM sh
),
hn AS (
  SELECT doc_id,
         [('0x' || substr(h, 1, 15))::BIGINT for h in h0] AS hashes,
         len([('0x' || substr(h, 1, 15))::BIGINT for h in h0]) AS n
  FROM hx
),
sig AS (
  SELECT doc_id,
         list_min([substr(h, 1, 8) for h in h0]) AS m0,
         list_min([substr(h, 9, 8) for h in h0]) AS m1,
         list_min([substr(h, 17, 8) for h in h0]) AS m2,
         list_min([substr(h, 25, 8) for h in h0]) AS m3,
         list_min([substr(h, 1, 8) for h in h1]) AS m4,
         list_min([substr(h, 9, 8) for h in h1]) AS m5,
         list_min([substr(h, 17, 8) for h in h1]) AS m6,
         list_min([substr(h, 25, 8) for h in h1]) AS m7
  FROM hx
),
banded AS (
  SELECT doc_id, 0 AS band, m0 || '|' || m1 AS band_key FROM sig
  UNION ALL SELECT doc_id, 1, m2 || '|' || m3 FROM sig
  UNION ALL SELECT doc_id, 2, m4 || '|' || m5 FROM sig
  UNION ALL SELECT doc_id, 3, m6 || '|' || m7 FROM sig
),
oldb AS (
  SELECT doc_id, band, band_key FROM (
    SELECT *, row_number() OVER (PARTITION BY band, band_key
                                 ORDER BY doc_id) AS rk
    FROM banded WHERE doc_id % 10 <> 0)
  WHERE rk <= {_INC_ND_CAP}
),
fp AS (SELECT doc_id, md5(text) AS fp FROM documents),
cand AS (
  SELECT DISTINCT id_a, id_b FROM (
    SELECT n.doc_id AS id_a, o.doc_id AS id_b
    FROM (SELECT * FROM banded WHERE doc_id % 10 = 0) n
    JOIN oldb o ON n.band = o.band AND n.band_key = o.band_key
    UNION ALL
    SELECT n.doc_id, o.doc_id
    FROM (SELECT * FROM fp WHERE doc_id % 10 = 0) n
    JOIN (SELECT * FROM fp WHERE doc_id % 10 <> 0) o ON n.fp = o.fp
  )
),
jac AS (
  SELECT id_a,
         round(CAST(len(list_intersect(x.hashes, y.hashes)) AS DOUBLE)
               / (x.n + y.n - len(list_intersect(x.hashes, y.hashes))),
               6) AS j
  FROM cand JOIN hn x ON id_a = x.doc_id JOIN hn y ON id_b = y.doc_id
),
best AS (SELECT id_a, max(j) AS best_jaccard FROM jac GROUP BY id_a)
SELECT d.doc_id,
       coalesce(best.best_jaccard < {_INC_ND_TAU}, TRUE) AS admitted,
       best.best_jaccard
FROM (SELECT doc_id FROM documents WHERE doc_id % 10 = 0) d
LEFT JOIN best ON d.doc_id = best.id_a
"""


# --- L68: STORED standing-corpus banding + admission probe -------------------
# The build-once/probe-forever form of L66 (VERDICT r9 #1): the standing
# corpus's capped banding, fingerprints, and shingle sets persist as a
# layout (llm/dedup.py write_neardup_banding_layout — the L61 stored-
# index move applied to the dedup family); per admission batch only the
# ARRIVAL side is computed and broadcast against the stored relations.
# Admissions are IDENTICAL to the inline twin by construction (same
# signatures, same cap rule, same verify), so it reuses L66's
# full-replay oracle — and the plan-quality pin asserts the admission
# plan is Window-free (no per-batch re-capping) and scans the layout.


#: Eager localCheckpoints created inside registry query builders, keyed
#: by applicationId (ADVICE r13 #3): checkpointed blocks pin executor
#: storage OUTSIDE the cache manager, so they are registered here and
#: released when the NEXT registry query builds (_with_ckpt_release) —
#: the _PIPELINE_PERSIST lifecycle extended to checkpoints.
_CKPT_PERSIST: dict[str, list] = {}


def _release_ckpt(df: DataFrame) -> None:
    """Deterministically free a localCheckpoint-ed frame (the
    AdmissionSession._release recipe): the LogicalRDD unpersist removes
    the pinned blocks that DataFrame.unpersist alone leaves to
    ContextCleaner GC. Best effort — a failure degrades to the GC path."""
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        pass
    try:
        df.unpersist()
    except Exception:
        pass


def _fresh_ckpt(spark: SparkSession, df: DataFrame) -> DataFrame:
    """localCheckpoint with tracked release (see _CKPT_PERSIST)."""
    ck = df.localCheckpoint()
    _CKPT_PERSIST.setdefault(spark.sparkContext.applicationId, []).append(ck)
    return ck


def _release_prior_ckpts(spark: SparkSession) -> None:
    for df in _CKPT_PERSIST.pop(spark.sparkContext.applicationId, []):
        _release_ckpt(df)


#: Audit log for the write-if-absent stored layouts (VERDICT r13 #5):
#: whenever a builder actually BUILDS (the markers were absent), it
#: records the build seconds here under the layout's name. bench.py
#: surfaces the map as a ``layout_built`` field in the round artifact so
#: stored-probe timings are auditable — an entry present means that run
#: paid the build; absent means the probe hit a standing layout.
LAYOUT_BUILD_LOG: dict[str, float] = {}


def _neardup_layout_path(sf_dir: str) -> str:
    import hashlib
    import os
    import tempfile

    src = os.path.join(sf_dir, "documents.parquet")
    try:
        st = os.stat(src)
        ident = f"{sf_dir}|{int(st.st_mtime)}|{st.st_size}"
    except OSError:
        ident = sf_dir
    from .llm.dedup import NEARDUP_LAYOUT_PARAMS as _P

    ident += f"|{_INC_ND_CAP}|" + "|".join(
        f"{k}={_P[k]}" for k in sorted(_P)
    )
    tag = hashlib.md5(ident.encode()).hexdigest()[:10]
    return os.path.join(tempfile.gettempdir(), f"k2n_neardup_layout_v1_{tag}")


_NEARDUP_LAYOUT_MARKERS = (
    "_meta.json",
    "banding/_SUCCESS",
    "fingerprints/_SUCCESS",
    "shingle_hashes/_SUCCESS",
)


def _neardup_layout(spark: SparkSession, sf_dir: str) -> str:
    """Standing-corpus (doc_id % 10 != 0) banding layout, built
    write-if-absent and published atomically (same contract as the
    IVF-PQ layout: a complete winner is never deleted)."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    from .llm import dedup as llm_dedup

    layout = _neardup_layout_path(sf_dir)
    if all(
        os.path.exists(os.path.join(layout, m))
        for m in _NEARDUP_LAYOUT_MARKERS
    ):
        return layout
    register_views(spark, sf_dir, ("documents",))
    standing = spark.table("documents").filter(F.col("doc_id") % 10 != 0)
    import time as _time

    t0 = _time.perf_counter()
    tmp = tempfile.mkdtemp(prefix="k2n_neardup_build_")
    build = os.path.join(tmp, "layout")
    llm_dedup.write_neardup_banding_layout(
        standing, build, params={"max_bucket": _INC_ND_CAP}
    )
    _publish_layout(tmp, build, layout, _NEARDUP_LAYOUT_MARKERS)
    LAYOUT_BUILD_LOG["neardup"] = round(_time.perf_counter() - t0, 3)
    return layout


def _q_incremental_neardup_stored(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import functions as F

    from .llm import dedup as llm_dedup

    layout = _neardup_layout(spark, sf_dir)
    register_views(spark, sf_dir, ("documents",))
    arrivals = spark.table("documents").filter(F.col("doc_id") % 10 == 0)
    return llm_dedup.neardup_admission(
        spark, layout, arrivals, tau=_INC_ND_TAU
    )


# identical admissions to the inline per-batch recompute by construction
# (same signature family, same cap ordering, same fingerprint backstop,
# same verify) — certified by reusing its full-replay oracle
ORACLE["incremental_neardup_stored_probe"] = ORACLE[
    "incremental_neardup_merge"
]


# --- L73: Bloom-filter membership admission -----------------------------------
# The cheapest standing-corpus admission gate: the corpus collapses to a
# ~6-bits-per-key bitmap (words relation), arrivals probe k=4 bits each —
# zero false negatives structurally (every bit a standing key set IS in
# the filter), false positives bounded and MEASURED by the certificate
# query. At 100 TB: 10^10 fingerprints ≈ 7.5 GB of filter vs terabytes of
# fingerprint relation; admission never rescans the corpus (the exact_dup
# column here is the certificate's ground-truth leg, not the production
# path — production routes only the tiny bloom-positive subset to an
# exact check). Same standing/arrival split as L66/L68 so the three
# admission gates certify on one fixture.
_BLOOM_K = 4
_BLOOM_BITS_PER_KEY = 6

_BLOOM_LAYOUT_MARKERS = (
    "_meta.json",
    "words/_SUCCESS",
    "params/_SUCCESS",
)


def _bloom_layout_path(sf_dir: str) -> str:
    import hashlib
    import os
    import tempfile

    src = os.path.join(sf_dir, "documents.parquet")
    try:
        st = os.stat(src)
        ident = f"{sf_dir}|{int(st.st_mtime)}|{st.st_size}"
    except OSError:
        ident = sf_dir
    ident += f"|k={_BLOOM_K}|bpk={_BLOOM_BITS_PER_KEY}"
    tag = hashlib.md5(ident.encode()).hexdigest()[:10]
    return os.path.join(tempfile.gettempdir(), f"k2n_bloom_layout_v1_{tag}")


def _bloom_layout(spark: SparkSession, sf_dir: str) -> str:
    """Standing-corpus (doc_id % 10 != 0) Bloom filter, built
    write-if-absent and published atomically (the ``_ivf_layout``
    contract, VERDICT r12 #1): the three bloom-gated certificates
    (`bloom_admission_filter`, `bloom_fpr_certificate`,
    `admission_pipeline`) previously each rebuilt the corpus-sized
    distinct + bit_or aggregation inline per run; now the bitmap is the
    stored layout it is at 100 TB and every probe pays only the
    arrival-side work."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    from .llm import dedup as llm_dedup

    layout = _bloom_layout_path(sf_dir)
    if all(
        os.path.exists(os.path.join(layout, m))
        for m in _BLOOM_LAYOUT_MARKERS
    ):
        return layout
    register_views(spark, sf_dir, ("documents",))
    standing = (
        spark.table("documents")
        .filter(F.col("doc_id") % 10 != 0)
        .select(F.md5(F.col("text")).alias("_fp"))
    )
    import time as _time

    t0 = _time.perf_counter()
    tmp = tempfile.mkdtemp(prefix="k2n_bloom_build_")
    build = os.path.join(tmp, "layout")
    llm_dedup.write_bloom_layout(
        standing, build, "_fp", k=_BLOOM_K, bits_per_key=_BLOOM_BITS_PER_KEY
    )
    _publish_layout(tmp, build, layout, _BLOOM_LAYOUT_MARKERS)
    LAYOUT_BUILD_LOG["bloom"] = round(_time.perf_counter() - t0, 3)
    return layout


def _bloom_decisions(spark: SparkSession, sf_dir: str):
    from pyspark.sql import functions as F

    from .llm import dedup as llm_dedup

    layout = _bloom_layout(spark, sf_dir)
    register_views(spark, sf_dir, ("documents",))
    fp = spark.table("documents").select(
        "doc_id", F.md5(F.col("text")).alias("_fp")
    )
    standing = fp.filter(F.col("doc_id") % 10 != 0)
    arrivals = fp.filter(F.col("doc_id") % 10 == 0)
    _meta, params, words = llm_dedup.read_bloom_layout(spark, layout)
    member = llm_dedup.bloom_membership(
        arrivals, params, words, "_fp", "doc_id", k=_BLOOM_K
    )
    # r13: the broadcast hint used to sit on the ARRIVALS (left,
    # stream-preserved) side, which a left outer join can never build —
    # Spark logged "Hint (strategy=broadcast) is not supported" and fell
    # back to a shuffle join on every evaluation. Hint the build side
    # (distinct standing fingerprints) instead. This leg is the exact
    # ground-truth cross-check of the FPR certificate, not the production
    # admission gate (that is the constant-size Bloom layout): at 100 TB
    # the distinct-fp relation would not broadcast and this certificate
    # would run on a sample — documented in SCALE.md.
    exact = (
        arrivals.alias("a")
        .join(
            standing.select("_fp").distinct().alias("s").hint("broadcast"),
            F.col("a._fp") == F.col("s._fp"),
            "left",
        )
        .select(
            F.col("a.doc_id").alias("doc_id"),
            F.col("s._fp").isNotNull().alias("exact_dup"),
        )
    )
    return member.join(exact, "doc_id"), params


def _q_bloom_admission(spark: SparkSession, sf_dir: str) -> DataFrame:
    dec, _ = _bloom_decisions(spark, sf_dir)
    return dec.select("doc_id", "bloom_positive", "exact_dup")


def _q_bloom_fpr_certificate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    dec, params = _bloom_decisions(spark, sf_dir)
    agg = dec.agg(
        F.count("*").alias("n_arrivals"),
        F.sum(F.col("exact_dup").cast("long")).alias("n_exact_dup"),
        F.sum(F.col("bloom_positive").cast("long")).alias("n_bloom_positive"),
        F.sum(
            (F.col("bloom_positive") & ~F.col("exact_dup")).cast("long")
        ).alias("n_false_positive"),
        F.sum(
            (~F.col("bloom_positive") & F.col("exact_dup")).cast("long")
        ).alias("n_false_negative"),
    )
    novel = F.col("n_arrivals") - F.col("n_exact_dup")
    return agg.crossJoin(F.broadcast(params)).select(
        "n_keys",
        "m_bits",
        F.lit(_BLOOM_K).cast("long").alias("k"),
        "n_arrivals",
        "n_exact_dup",
        "n_bloom_positive",
        "n_false_positive",
        "n_false_negative",
        F.round(
            F.col("n_false_positive") / F.when(novel != 0, novel), 6
        ).alias("fpr_measured"),
    )


_BLOOM_DEC_CTE = f"""
fp AS (SELECT doc_id, md5(text) AS f, doc_id % 10 = 0 AS is_new
       FROM documents),
std AS (SELECT DISTINCT f FROM fp WHERE NOT is_new),
p AS (SELECT CAST(count(*) AS BIGINT) AS n_keys,
             greatest(63, CAST(ceil(count(*) * {_BLOOM_BITS_PER_KEY}.0 / 63)
                               AS BIGINT) * 63) AS m_bits
      FROM std),
sh2 AS (SELECT ('0x' || substr(md5(f), 1, 15))::BIGINT % p.m_bits AS h1,
               ('0x' || substr(md5(f), 17, 15))::BIGINT % (p.m_bits - 1) + 1
                 AS h2, p.m_bits AS m
        FROM std, p),
spos AS (SELECT (h1 + i * h2) % m AS pos
         FROM sh2, range({_BLOOM_K}) t(i)),
words AS (SELECT pos // 63 AS word_idx,
                 bit_or(1::BIGINT << CAST(pos % 63 AS INT)) AS word
          FROM spos GROUP BY 1),
arr AS (SELECT doc_id, f FROM fp WHERE is_new),
ah2 AS (SELECT doc_id,
               ('0x' || substr(md5(f), 1, 15))::BIGINT % p.m_bits AS h1,
               ('0x' || substr(md5(f), 17, 15))::BIGINT % (p.m_bits - 1) + 1
                 AS h2, p.m_bits AS m
        FROM arr, p),
apos AS (SELECT doc_id, (h1 + i * h2) % m AS pos
         FROM ah2, range({_BLOOM_K}) t(i)),
hits AS (SELECT a.doc_id,
                bool_and(coalesce(
                  (w.word & (1::BIGINT << CAST(a.pos % 63 AS INT))) <> 0,
                  FALSE)) AS bloom_positive
         FROM apos a LEFT JOIN words w ON a.pos // 63 = w.word_idx
         GROUP BY a.doc_id),
dec AS (SELECT arr.doc_id, hits.bloom_positive, s.f IS NOT NULL AS exact_dup
        FROM arr JOIN hits ON arr.doc_id = hits.doc_id
        LEFT JOIN std s ON arr.f = s.f)
"""

ORACLE["bloom_admission_filter"] = f"""
WITH {_BLOOM_DEC_CTE}
SELECT doc_id, bloom_positive, exact_dup FROM dec
"""

ORACLE["bloom_fpr_certificate"] = f"""
WITH {_BLOOM_DEC_CTE}
SELECT p.n_keys,
       p.m_bits,
       CAST({_BLOOM_K} AS BIGINT) AS k,
       CAST(count(*) AS BIGINT) AS n_arrivals,
       CAST(sum(CASE WHEN exact_dup THEN 1 ELSE 0 END) AS BIGINT)
         AS n_exact_dup,
       CAST(sum(CASE WHEN bloom_positive THEN 1 ELSE 0 END) AS BIGINT)
         AS n_bloom_positive,
       CAST(sum(CASE WHEN bloom_positive AND NOT exact_dup THEN 1 ELSE 0 END)
            AS BIGINT) AS n_false_positive,
       CAST(sum(CASE WHEN NOT bloom_positive AND exact_dup THEN 1 ELSE 0 END)
            AS BIGINT) AS n_false_negative,
       round(CAST(sum(CASE WHEN bloom_positive AND NOT exact_dup
                           THEN 1 ELSE 0 END) AS DOUBLE)
             / nullif(count(*) - sum(CASE WHEN exact_dup THEN 1 ELSE 0 END),
                      0),
             6) AS fpr_measured
FROM dec, p
GROUP BY p.n_keys, p.m_bits
"""


# --- L79: composed admission pipeline (bloom → stored near-dup → quota) ------
# The round's build-once/probe-forever pieces as ONE end-to-end gate —
# the decision a continuously-ingesting 100 TB corpus actually makes per
# arrival batch: (1) the Bloom bitmap screens for exact membership
# (constant-size standing state; only bloom-POSITIVES pay the exact
# verify, and a false positive costs a check, never a wrong drop);
# (2) survivors probe the STORED near-dup banding (L68: arrival side
# broadcast, zero corpus recompute); (3) survivors take a per-source
# admission quota (doc_id order, the L44 cap rule). Every arrival gets a
# labeled verdict — 'exact_dup' / 'near_dup' / 'quota' / 'admitted' — so
# the driver hash pins the COMPOSITION, not just the stages: a wrong
# stage order or a dropped leg relabels rows and flips the hash. The
# oracle replays all three stages (the bloom + banding CTEs composed
# with the quota window).
_ADMIT_QUOTA = 20


def _q_admission_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from .llm import dedup as llm_dedup

    dec, _ = _bloom_decisions(spark, sf_dir)
    layout = _neardup_layout(spark, sf_dir)
    register_views(spark, sf_dir, ("documents",))
    arrivals = spark.table("documents").filter(F.col("doc_id") % 10 == 0)
    nd = llm_dedup.neardup_admission(
        spark, layout, arrivals, tau=_INC_ND_TAU
    ).select("doc_id", F.col("admitted").alias("_nd_ok"))
    # r13: pass2 feeds TWO plan legs (the quota ranking and the final
    # stage join) and Spark replans repeated references — both probe
    # DAGs (bloom membership + exact check + near-dup admission) ran
    # twice. Materialize the arrival-sized decision relation once
    # (4 narrow columns per arrival doc); plan: 92 Exchanges → the
    # single probe pass.
    pass2 = _fresh_ckpt(
        spark,
        arrivals.select("doc_id", "source")
        .join(dec, "doc_id")
        .join(nd, "doc_id"),
    )
    survivors = pass2.filter(~F.col("exact_dup") & F.col("_nd_ok"))
    ranked = survivors.withColumn(
        "_rk",
        F.row_number().over(Window.partitionBy("source").orderBy("doc_id")),
    ).select("doc_id", F.col("_rk"))
    # broadcast the arrival-sized rank relation: the checkpointed inputs
    # carry no size statistics, so the planner would otherwise SMJ two
    # relations that are both arrival-sized (2 extra exchanges + sorts)
    return (
        pass2.join(F.broadcast(ranked), "doc_id", "left")
        .select(
            "doc_id",
            "source",
            F.when(F.col("exact_dup"), F.lit("exact_dup"))
            .when(~F.col("_nd_ok"), F.lit("near_dup"))
            .when(F.col("_rk") > _ADMIT_QUOTA, F.lit("quota"))
            .otherwise(F.lit("admitted"))
            .alias("stage"),
        )
    )


ORACLE["admission_pipeline"] = f"""
WITH bloomdec AS ({ORACLE["bloom_admission_filter"]}),
nd AS ({ORACLE["incremental_neardup_merge"]}),
src AS (SELECT doc_id, source FROM documents WHERE doc_id % 10 = 0),
pass2 AS (
  SELECT s.doc_id, s.source, b.exact_dup, nd.admitted AS nd_ok
  FROM src s JOIN bloomdec b ON s.doc_id = b.doc_id
             JOIN nd ON s.doc_id = nd.doc_id
),
ranked AS (
  SELECT doc_id,
         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rk
  FROM pass2 WHERE NOT exact_dup AND nd_ok
)
SELECT p.doc_id, p.source,
       CASE WHEN p.exact_dup THEN 'exact_dup'
            WHEN NOT p.nd_ok THEN 'near_dup'
            WHEN r.rk > {_ADMIT_QUOTA} THEN 'quota'
            ELSE 'admitted' END AS stage
FROM pass2 p LEFT JOIN ranked r ON p.doc_id = r.doc_id
"""


# --- L80: Zipf-slope corpus diagnostic ----------------------------------------
# The classic corpus-health check: natural text's term frequencies follow
# freq ∝ rank^s with s ≈ −1; machine-generated spam, boilerplate floods,
# and template corpora bend the curve, so the fitted slope per language
# slice is a cheap whole-corpus quality telescope (and the kind of number
# a 100 TB ingest dashboard tracks per shard). Least squares of
# ln(freq) on ln(rank) with EXACT cross-engine portability: the ln
# values AND their products round once to 6 dp and sum as
# DECIMAL(28,6) (the L45/L55 discipline — order-independent, so the
# four regression sums are bit-identical in both engines; the final
# slope is one double expression over exact inputs). Scale shape: term
# counting is the one corpus-sized shuffle; ranking and the regression
# run over the VOCABULARY relation (≪ corpus), partitioned by lang.
_ZIPF_TAIL = """
cf AS (SELECT lang, term, count(*) AS c FROM terms GROUP BY lang, term),
ranked AS (SELECT lang, c,
                  row_number() OVER (PARTITION BY lang
                                     ORDER BY c DESC, term) AS r
           FROM cf),
pts AS (SELECT lang,
               CAST(round(ln(r), 6) AS DECIMAL(28, 6)) AS x,
               CAST(round(ln(c), 6) AS DECIMAL(28, 6)) AS y,
               CAST(round(round(ln(r), 6) * round(ln(c), 6), 6)
                    AS DECIMAL(28, 6)) AS xy,
               CAST(round(round(ln(r), 6) * round(ln(r), 6), 6)
                    AS DECIMAL(28, 6)) AS xx
        FROM ranked),
agg AS (SELECT lang, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
               sum(xy) AS sxy, sum(xx) AS sxx
        FROM pts GROUP BY lang)
SELECT lang, CAST(n AS BIGINT) AS n_types,
       round((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)),
             6) AS zipf_slope
FROM agg WHERE n >= 10
"""

SPARK_SQL["zipf_slope"] = """
WITH terms AS (
  SELECT lang, term FROM (
    SELECT lang, explode(split(lower(text), ' ')) AS term FROM documents
  ) t WHERE term <> ''
),
""" + _ZIPF_TAIL

ORACLE["zipf_slope"] = """
WITH terms AS (
  SELECT lang, term FROM (
    SELECT lang, unnest([x for x in string_split(lower(text), ' ')
                         if x <> '']) AS term
    FROM documents
  ) t
),
""" + _ZIPF_TAIL


# --- L82: Jensen-Shannon source-drift monitor ----------------------------------
# The drift number a 100 TB ingest dashboard tracks per shard/source:
# JS divergence between each source's term distribution P_s and the
# corpus distribution Q — symmetric, bounded (≤ ln 2 nats), defined even
# where supports differ (the reason it beats raw KL for monitoring).
# JS = ½·Σ p·ln(p/m) + ½·Σ q·ln(q/m), m = (p+q)/2, the q-leg summed over
# the FULL vocabulary per source (a source missing a hot corpus term IS
# drift). Portability: per-term contributions round once to 6 dp and sum
# as DECIMAL(28,6) (order-independent, bit-identical both engines).
# Scale: term counting is the corpus shuffle; the source×vocab grid is
# |sources|·|vocab| rows of the REDUCED relations (vocab ≪ corpus),
# built from one cross join of two aggregates.
_JS_TAIL = """
tf AS (SELECT source, term, count(*) AS c FROM terms GROUP BY source, term),
stot AS (SELECT source, CAST(sum(c) AS DOUBLE) AS sn FROM tf GROUP BY source),
vtot AS (SELECT term, CAST(sum(c) AS DOUBLE) AS cv FROM tf GROUP BY term),
tot AS (SELECT CAST(sum(c) AS DOUBLE) AS tn FROM tf),
grid AS (
  SELECT s.source, v.term,
         CAST(coalesce(tf.c, 0) AS DOUBLE) / s.sn AS p,
         v.cv / tot.tn AS q
  FROM stot s CROSS JOIN vtot v CROSS JOIN tot
  LEFT JOIN tf ON tf.source = s.source AND tf.term = v.term
),
contrib AS (
  SELECT source,
         CAST(round(CASE WHEN p > 0
                         THEN 0.5 * p * ln(p / ((p + q) / 2)) ELSE 0 END
                    + 0.5 * q * ln(q / ((p + q) / 2)), 6)
              AS DECIMAL(28, 6)) AS c
  FROM grid
)
SELECT source, CAST(count(*) AS BIGINT) AS n_terms,
       CAST(sum(c) AS DOUBLE) AS js_nats
FROM contrib GROUP BY source
"""

SPARK_SQL["js_source_drift"] = """
WITH terms AS (
  SELECT source, term FROM (
    SELECT source, explode(split(lower(text), ' ')) AS term FROM documents
  ) t WHERE term <> ''
),
""" + _JS_TAIL

ORACLE["js_source_drift"] = """
WITH terms AS (
  SELECT source, term FROM (
    SELECT source, unnest([x for x in string_split(lower(text), ' ')
                           if x <> '']) AS term
    FROM documents
  ) t
),
""" + _JS_TAIL


# --- L65: DSIR hashed n-gram importance weights --------------------------------
# Data Selection via Importance Resampling (Xie et al. 2023): score every
# raw-corpus doc by how target-like its hashed n-gram feature profile is
# — per-doc weight = Σ_buckets tf_b · ln(p_target(b) / p_raw(b)), with
# word unigrams+bigrams hashed to 1024 buckets (the paper's hashed
# generative model) and add-one smoothing per bucket. Target = the
# corpus's lang='en' slice (DSIR's target is any trusted corpus; both
# distributions derive IN-QUERY so the oracle replays everything with
# zero literals). Scale shape: grams → bucket tf is one map-side-combined
# shuffle; both distributions are 1024-row aggregations that BROADCAST
# back; the per-doc weight is one more partial-agged shuffle. Float
# portability: per-bucket log-ratios are rounded once to 6 dp as
# DECIMAL(28,6), multiplied by integer tf (exact) and DECIMAL-summed —
# bit-identical totals in both engines.
_DSIR_BUCKETS = 1024


def _dsir_sql(bucket_expr: str) -> str:
    return f"""
bk AS (SELECT doc_id, lang, {bucket_expr} AS b, count(*) AS tf
       FROM grams GROUP BY doc_id, lang, {bucket_expr}),
-- raw and target distributions in ONE aggregation (r13): tc's
-- conditional sum is NULL exactly when the old WHERE lang='en' leg had
-- no row for the bucket, so coalesce(tc, 0) reproduces the LEFT JOIN
-- byte-for-byte at half the exchanges
dist AS (SELECT b, CAST(sum(tf) AS DOUBLE) AS rc,
                CAST(sum(CASE WHEN lang = 'en' THEN tf END) AS DOUBLE) AS tc
         FROM bk GROUP BY b),
tot AS (SELECT CAST(sum(tf) AS DOUBLE) AS rt,
               CAST(sum(CASE WHEN lang = 'en' THEN tf ELSE 0 END) AS DOUBLE)
                 AS tt
        FROM bk),
lr AS (
  SELECT r.b,
         CAST(round(ln(((coalesce(r.tc, 0) + 1) / (tot.tt + {_DSIR_BUCKETS}.0))
                       / ((r.rc + 1) / (tot.rt + {_DSIR_BUCKETS}.0))), 6)
              AS DECIMAL(28, 6)) AS lr
  FROM dist r CROSS JOIN tot
)
SELECT bk.doc_id,
       CAST(sum(bk.tf) AS BIGINT) AS n_features,
       CAST(sum(bk.tf * lr.lr) AS DOUBLE) AS dsir_logweight
FROM bk JOIN lr ON bk.b = lr.b
GROUP BY bk.doc_id
"""


SPARK_SQL["dsir_importance_weights"] = """
WITH w AS (
  SELECT doc_id, lang, filter(split(lower(text), ' '), x -> x <> '') AS ws
  FROM documents
),
grams AS (
  SELECT doc_id, lang, g FROM w LATERAL VIEW explode(ws) t AS g
  UNION ALL
  SELECT doc_id, lang, concat(b.w1, ' ', b.w2) AS g
  FROM (SELECT * FROM w WHERE size(ws) >= 2) t
  LATERAL VIEW inline(transform(sequence(1, size(ws) - 1),
       i -> struct(element_at(ws, i) AS w1, element_at(ws, i + 1) AS w2)))
       b AS w1, w2
),
""" + _dsir_sql(
    f"CAST(conv(substr(md5(g), 1, 15), 16, 10) AS BIGINT) % {_DSIR_BUCKETS}"
)

ORACLE["dsir_importance_weights"] = """
WITH w AS (
  SELECT doc_id, lang,
         [x for x in string_split(lower(text), ' ') if x <> ''] AS ws
  FROM documents
),
grams AS (
  SELECT doc_id, lang, unnest(ws) AS g FROM w
  UNION ALL
  SELECT doc_id, lang, w1 || ' ' || w2 AS g
  FROM (SELECT doc_id, lang, unnest(ws[1:len(ws) - 1]) AS w1,
               unnest(ws[2:len(ws)]) AS w2
        FROM w WHERE len(ws) >= 2)
),
""" + _dsir_sql(
    f"('0x' || substr(md5(g), 1, 15))::BIGINT % {_DSIR_BUCKETS}"
)


# --- DSIR production-engine parity (VERDICT r9 #3, the L53 pattern) ----------
# At 100 TB an md5 per uni+bigram occurrence is a real constant-factor
# tax; the production bucket hash is xxhash64 (JVM-native, the dedup
# family's engine). Different hash families partition grams into
# DIFFERENT buckets, so 1024-bucket weights are not comparable across
# engines — the parity certificate therefore runs both engines in
# COLLISION-FREE bucket space (bucket id = the raw hash value, no
# modulo; both 60-bit md5 slices and xxhash64 are injective on any
# practical gram vocabulary): with singleton buckets the gram→bucket
# PARTITION is identical under any injective engine, so per-doc weights
# must agree EXACTLY (per-bucket counts identical, same ln/round/DECIMAL
# arithmetic), and the smoothing constant B only shifts both legs
# identically. The query emits both engines' weights side by side; the
# DuckDB oracle replays the md5 leg and emits it as BOTH columns — any
# xxhash64-leg defect (hash misuse, join slip, sum drift) hash-mismatches
# the driver compare. One gram→tf shuffle feeds both legs (bucketing is
# injective, so tf-by-gram IS tf-by-bucket); each leg is then a
# 2×vocab-row distribution join — the certificate costs two small joins,
# not two corpus passes.
_DSIR_PARITY_B = 1 << 60


def _dsir_parity_leg(alias: str, bucket_expr: str, src: str = "bk_g") -> str:
    b = f"{_DSIR_PARITY_B}.0"
    return f"""
{alias}_bk AS (SELECT doc_id, lang, {bucket_expr} AS b, tf FROM {src}),
{alias}_rd AS (SELECT b, CAST(sum(tf) AS DOUBLE) AS rc FROM {alias}_bk GROUP BY b),
{alias}_td AS (SELECT b, CAST(sum(tf) AS DOUBLE) AS tc FROM {alias}_bk
               WHERE lang = 'en' GROUP BY b),
{alias}_lr AS (
  SELECT r.b,
         CAST(round(ln(((coalesce(t.tc, 0) + 1) / (tot.tt + {b}))
                       / ((r.rc + 1) / (tot.rt + {b}))), 6)
              AS DECIMAL(28, 6)) AS lr
  FROM {alias}_rd r LEFT JOIN {alias}_td t ON r.b = t.b CROSS JOIN tot
),
{alias}_w AS (
  SELECT k.doc_id,
         CAST(sum(k.tf) AS BIGINT) AS n_features,
         CAST(sum(k.tf * l.lr) AS DOUBLE) AS w
  FROM {alias}_bk k JOIN {alias}_lr l ON k.b = l.b
  GROUP BY k.doc_id
)"""


# The shared gram→tf relation is built ONCE and persisted (the
# minhash_engine_parity precedent): inlined CTEs re-execute per
# reference, and the two legs reference it 7× between them — the
# un-persisted form measured 16 documents scans / 32 exchanges / 4.1 s
# at sf0.1 vs 2.2 s persisted. r13: BOTH engines' bucket hashes are
# computed here, once per gram row, and the gram STRING is dropped from
# the persisted relation — the tail's repeated references used to
# recompute md5(g)/xxhash64(g) on each of their three reads (and cache
# the heaviest column for nothing). Injective bucket space is
# unchanged; only where the hash is evaluated moves.
_DSIR_PARITY_BKG_SQL = """
WITH w AS (
  SELECT doc_id, lang, filter(split(lower(text), ' '), x -> x <> '') AS ws
  FROM documents
),
grams AS (
  SELECT doc_id, lang, g FROM w LATERAL VIEW explode(ws) t AS g
  UNION ALL
  SELECT doc_id, lang, concat(b.w1, ' ', b.w2) AS g
  FROM (SELECT * FROM w WHERE size(ws) >= 2) t
  LATERAL VIEW inline(transform(sequence(1, size(ws) - 1),
       i -> struct(element_at(ws, i) AS w1, element_at(ws, i + 1) AS w2)))
       b AS w1, w2
)
SELECT doc_id, lang,
       CAST(conv(substr(md5(g), 1, 15), 16, 10) AS BIGINT) AS b_m,
       xxhash64(g) AS b_x,
       count(*) AS tf
FROM grams GROUP BY doc_id, lang, g
"""

# r13 tail rework (same values, fewer passes): each engine's raw and
# target distributions fuse into ONE aggregation (the conditional sum is
# NULL exactly when the old WHERE lang='en' leg had no bucket row, so
# coalesce reproduces the LEFT JOIN); both legs' per-doc weights come
# from ONE group-by-doc over bk_g joined to both lr relations — the
# per-bucket DECIMAL products are unchanged and DECIMAL sums are
# order-independent, so totals are bit-identical to the old
# two-leg-join form. Exchanges: 2×(rd+td+group-by-doc)+final join = 8
# → 2×(dist)+1 group-by-doc = 3.
_DSIR_PARITY_TAIL = f"""
WITH tot AS (SELECT CAST(sum(tf) AS DOUBLE) AS rt,
               CAST(sum(CASE WHEN lang = 'en' THEN tf ELSE 0 END) AS DOUBLE) AS tt
        FROM dsir_parity_bk_g),
m_dist AS (SELECT b_m AS b, CAST(sum(tf) AS DOUBLE) AS rc,
                  CAST(sum(CASE WHEN lang = 'en' THEN tf END) AS DOUBLE) AS tc
           FROM dsir_parity_bk_g GROUP BY b_m),
m_lr AS (
  SELECT r.b,
         CAST(round(ln(((coalesce(r.tc, 0) + 1) / (tot.tt + {_DSIR_PARITY_B}.0))
                       / ((r.rc + 1) / (tot.rt + {_DSIR_PARITY_B}.0))), 6)
              AS DECIMAL(28, 6)) AS lr
  FROM m_dist r CROSS JOIN tot
),
x_dist AS (SELECT b_x AS b, CAST(sum(tf) AS DOUBLE) AS rc,
                  CAST(sum(CASE WHEN lang = 'en' THEN tf END) AS DOUBLE) AS tc
           FROM dsir_parity_bk_g GROUP BY b_x),
x_lr AS (
  SELECT r.b,
         CAST(round(ln(((coalesce(r.tc, 0) + 1) / (tot.tt + {_DSIR_PARITY_B}.0))
                       / ((r.rc + 1) / (tot.rt + {_DSIR_PARITY_B}.0))), 6)
              AS DECIMAL(28, 6)) AS lr
  FROM x_dist r CROSS JOIN tot
)
SELECT k.doc_id,
       CAST(sum(k.tf) AS BIGINT) AS n_features,
       CAST(sum(k.tf * lm.lr) AS DOUBLE) AS dsir_logweight_md5,
       CAST(sum(k.tf * lx.lr) AS DOUBLE) AS dsir_logweight_xx
FROM dsir_parity_bk_g k
JOIN m_lr lm ON k.b_m = lm.b
JOIN x_lr lx ON k.b_x = lx.b
GROUP BY k.doc_id
"""

# one-slot per-session cache of the parity gram pass (own slot: sharing
# _PARITY_PERSIST could unpersist a frame the other parity query's
# not-yet-collected plan still references)
_DSIR_PARITY_PERSIST: dict[str, DataFrame] = {}


def _q_dsir_engine_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("documents",))
    app_id = spark.sparkContext.applicationId
    prev = _DSIR_PARITY_PERSIST.pop(app_id, None)
    if prev is not None:
        prev.unpersist()
    bk_g = spark.sql(_DSIR_PARITY_BKG_SQL).persist()
    # lazy persist, deliberately: eager count() measured SLOWER (5.1 s vs
    # 4.3 s at sf0.1 — the cache write is charged before any work it
    # saves), and local-mode ReusedExchange already shares most subtrees;
    # what the persist buys is the STRUCTURAL guarantee that the corpus
    # gram pass is one pass at any scale (the inline-CTE form planned 16
    # documents scans)
    _DSIR_PARITY_PERSIST[app_id] = bk_g
    bk_g.createOrReplaceTempView("dsir_parity_bk_g")
    return spark.sql(_DSIR_PARITY_TAIL)

ORACLE["dsir_engine_parity"] = """
WITH w AS (
  SELECT doc_id, lang,
         [x for x in string_split(lower(text), ' ') if x <> ''] AS ws
  FROM documents
),
grams AS (
  SELECT doc_id, lang, unnest(ws) AS g FROM w
  UNION ALL
  SELECT doc_id, lang, w1 || ' ' || w2 AS g
  FROM (SELECT doc_id, lang, unnest(ws[1:len(ws) - 1]) AS w1,
               unnest(ws[2:len(ws)]) AS w2
        FROM w WHERE len(ws) >= 2)
),
bk_g AS (SELECT doc_id, lang, g, count(*) AS tf FROM grams GROUP BY doc_id, lang, g),
tot AS (SELECT CAST(sum(tf) AS DOUBLE) AS rt,
               CAST(sum(CASE WHEN lang = 'en' THEN tf ELSE 0 END) AS DOUBLE) AS tt
        FROM bk_g),""" + _dsir_parity_leg(
    "m", "('0x' || substr(md5(g), 1, 15))::BIGINT"
) + """
SELECT doc_id, n_features,
       w AS dsir_logweight_md5,
       w AS dsir_logweight_xx
FROM m_w
"""


# --- L63: multinomial Naive Bayes language classifier -------------------------
# Model-based filtering, the curation stage CCNet/RefinedWeb run with
# fastText classifiers: a supervised multinomial NB trained IN-QUERY on
# the corpus's own lang labels (add-one smoothing), each doc scored
# against every class and assigned the argmax — the trainable upgrade of
# the L8 stopword heuristic. Everything (class priors, per-class token
# log-likelihoods, vocab size) derives from the corpus inside the query,
# so the DuckDB oracle replays TRAINING AND INFERENCE with zero literals.
# Float portability: per-(doc, term, class) contributions are rounded to
# 6 dp and summed as DECIMAL(28,6) (exact, order-independent — the
# L45/L55 pattern), priors likewise; the argmax compares exact DECIMALs
# with a class-ascending tie-break, so both engines pick identical
# winners. Scale shape: tf is one map-side-combined shuffle; the model
# relations (classes × vocab, classes) are aggregations of tf that
# BROADCAST at any realistic class count; scoring is tf × n_classes rows
# through hash joins; the final argmax is a 5-row-per-doc window.
_NB_TAIL = """
tf AS (SELECT doc_id, lang, term, count(*) AS tf
       FROM terms GROUP BY doc_id, lang, term),
cls AS (SELECT lang AS c, CAST(count(DISTINCT doc_id) AS DOUBLE) AS n_docs,
               CAST(sum(tf) AS DOUBLE) AS total
        FROM tf GROUP BY lang),
cw AS (SELECT lang AS c, term, CAST(sum(tf) AS DOUBLE) AS cnt
       FROM tf GROUP BY lang, term),
v AS (SELECT CAST(count(DISTINCT term) AS DOUBLE) AS vs FROM tf),
nd AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS n FROM tf),
contrib AS (
  SELECT t.doc_id, t.lang, cls.c,
         CAST(round(t.tf * ln((coalesce(cw.cnt, 0) + 1)
                              / (cls.total + v.vs)), 6)
              AS DECIMAL(28, 6)) AS s
  FROM tf t CROSS JOIN v CROSS JOIN cls
  LEFT JOIN cw ON cw.c = cls.c AND cw.term = t.term
),
body AS (SELECT doc_id, lang, c, sum(s) AS body
         FROM contrib GROUP BY doc_id, lang, c),
scored AS (
  SELECT b.doc_id, b.lang, b.c,
         b.body + CAST(round(ln(cls.n_docs / nd.n), 6) AS DECIMAL(28, 6))
           AS score
  FROM body b JOIN cls ON b.c = cls.c CROSS JOIN nd
)
SELECT doc_id, lang, c AS nb_pred, CAST(score AS DOUBLE) AS nb_logprob
FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY score DESC, c) AS rn
      FROM scored)
WHERE rn = 1
"""

SPARK_SQL["nb_lang_classifier"] = """
WITH terms AS (
  SELECT doc_id, lang, term FROM (
    SELECT doc_id, lang, explode(split(lower(text), ' ')) AS term
    FROM documents
  ) t WHERE term <> ''
),
""" + _NB_TAIL

ORACLE["nb_lang_classifier"] = """
WITH terms AS (
  SELECT doc_id, lang, term FROM (
    SELECT doc_id, lang, unnest(string_split(lower(text), ' ')) AS term
    FROM documents
  ) t WHERE term <> ''
),
""" + _NB_TAIL


# --- L55: bigram LM negative log-likelihood ----------------------------------
# The next rung above L45 on the perplexity-filter ladder: a self-trained
# BIGRAM LM with fixed-weight interpolation against the unigram
# distribution (Jelinek-Mercer, λ=0.7 — the classic smoothing every
# n-gram LM course derives), each doc scored by mean NLL over its bigram
# positions. p(w2|w1) = 0.7·c(w1,w2)/c(w1·) + 0.3·cf(w2)/N. Scale shape:
# bigram extraction is a narrow map (parallel zip of the token array
# against its own tail — no self-join), counts are map-side-combined
# hash aggs keyed by word pairs, scoring joins are hash equi-joins on
# those keys, and per-position contributions are rounded then summed as
# DECIMAL(28,6) — exact, order-independent, bit-identical across engines
# regardless of partitioning (the L45 pattern). The shared tail is the
# SAME string in both dialects; only tokenization differs.
_BIGRAM_TAIL = """
bgf AS (SELECT doc_id, w1, w2, count(*) AS tf FROM bg GROUP BY doc_id, w1, w2),
bc AS (SELECT w1, w2, CAST(sum(tf) AS DOUBLE) AS cb FROM bgf GROUP BY w1, w2),
cc AS (SELECT w1, CAST(sum(tf) AS DOUBLE) AS cw FROM bgf GROUP BY w1),
freq AS (SELECT term, CAST(count(*) AS DOUBLE) AS cf FROM terms GROUP BY term),
contrib AS (
  SELECT bgf.doc_id, bgf.tf,
         CAST(round(bgf.tf * ln(0.7 * bc.cb / cc.cw
                                + 0.3 * freq.cf / {total}), 6)
              AS DECIMAL(28, 6)) AS c
  FROM bgf JOIN bc ON bgf.w1 = bc.w1 AND bgf.w2 = bc.w2
           JOIN cc ON bgf.w1 = cc.w1
           JOIN freq ON bgf.w2 = freq.term
)
SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_bigrams,
       CAST(-sum(c) AS DOUBLE) AS nll_total
FROM contrib GROUP BY doc_id
"""
# nll_total + n_bigrams, NOT a rounded mean: round(sum/count, 6) has a
# tie hazard — at sf0.01 one doc's mean landed EXACTLY halfway at the
# 6th decimal (…0015) and the engines' double-division-then-round
# disagreed by 1 ulp of the last digit. The decimal sum is exact and its
# double conversion correctly rounded in both engines; consumers derive
# the mean. (L45's unigram query uses the same shape since r9.)

_BIGRAM_SQL = {
    "spark": """
WITH w AS (
  SELECT doc_id, filter(split(lower(text), ' '), x -> x <> '') AS ws
  FROM documents
),
terms AS (SELECT explode(ws) AS term FROM w),
bg AS (
  SELECT doc_id, b.w1, b.w2
  FROM (SELECT * FROM w WHERE size(ws) >= 2) t
  LATERAL VIEW inline(transform(sequence(1, size(ws) - 1),
       i -> struct(element_at(ws, i) AS w1, element_at(ws, i + 1) AS w2)))
       b AS w1, w2
),
""" + _BIGRAM_TAIL,
    "duck": """
WITH w AS (
  SELECT doc_id, [x for x in string_split(lower(text), ' ') if x <> ''] AS ws
  FROM documents
),
terms AS (SELECT unnest(ws) AS term FROM w),
bg AS (
  SELECT doc_id, unnest(ws[1:len(ws) - 1]) AS w1, unnest(ws[2:len(ws)]) AS w2
  FROM w WHERE len(ws) >= 2
),
""" + _BIGRAM_TAIL,
}


def _q_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("documents",))
    _, total_tokens = _spark_corpus_stats(spark, sf_dir)
    # bgf (the doc-bigram tf relation) is referenced by bc, cc AND the
    # contrib join — inlined, the tokenize→bigram→groupBy subtree ran
    # 3× (plus freq's own terms pass). Materialize it once (r13).
    return _run_sql_materialized(
        spark,
        _BIGRAM_SQL["spark"].format(total=total_tokens),
        ("bgf",),
        "bigram",
    )


# --- L75: interpolated Kneser-Ney bigram LM ----------------------------------
# The production-standard n-gram smoothing (Kneser & Ney 1995; what
# KenLM ships and CCNet-style perplexity filters actually run):
# P(w2|w1) = max(c(w1w2)−D, 0)/c(w1·) + D·N1+(w1,·)/c(w1·) · P_cont(w2),
# with the CONTINUATION distribution P_cont(w2) = N1+(·,w2)/N1+(·,·) —
# "how many contexts does w2 complete", not "how often does w2 occur" —
# the correction that stops high-frequency-but-context-bound words
# ("francisco") from leaking probability into unseen contexts, which is
# exactly the failure mode of L55's count-interpolated smoothing. D is
# the classic 0.75. ALL model statistics derive in-query from the same
# bigram-type relation (bc): c(w1·) and N1+(w1,·) are one GROUP BY w1
# over it, N1+(·,w2) one GROUP BY w2, N1+(·,·) its row count — zero
# literals, so the oracle replays training AND inference. Scale shape:
# one doc-bigram tf shuffle, then type-keyed aggregations of the (much
# smaller) type relation that broadcast back; DECIMAL(28,6) per-bigram
# contributions give order-independent, engine-identical totals
# (nll_total + n_bigrams, never a rounded mean — the L55 tie lesson).
_KN_TAIL = """
bgf AS (SELECT doc_id, w1, w2, count(*) AS tf FROM bg GROUP BY doc_id, w1, w2),
bc AS (SELECT w1, w2, CAST(sum(tf) AS DOUBLE) AS cb FROM bgf GROUP BY w1, w2),
cc AS (SELECT w1, CAST(sum(cb) AS DOUBLE) AS cw,
              CAST(count(*) AS DOUBLE) AS n1f
       FROM bc GROUP BY w1),
cont AS (SELECT w2, CAST(count(*) AS DOUBLE) AS n1p FROM bc GROUP BY w2),
tot AS (SELECT CAST(count(*) AS DOUBLE) AS nbt FROM bc),
contrib AS (
  SELECT bgf.doc_id, bgf.tf,
         CAST(round(bgf.tf * ln(greatest(bc.cb - 0.75, 0) / cc.cw
                                + 0.75 * cc.n1f / cc.cw
                                  * cont.n1p / tot.nbt), 6)
              AS DECIMAL(28, 6)) AS c
  FROM bgf JOIN bc ON bgf.w1 = bc.w1 AND bgf.w2 = bc.w2
           JOIN cc ON bgf.w1 = cc.w1
           JOIN cont ON bgf.w2 = cont.w2
           CROSS JOIN tot
)
SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_bigrams,
       CAST(-sum(c) AS DOUBLE) AS nll_total
FROM contrib GROUP BY doc_id
"""

SPARK_SQL["kneser_ney_bigram_score"] = """
WITH w AS (
  SELECT doc_id, filter(split(lower(text), ' '), x -> x <> '') AS ws
  FROM documents
),
bg AS (
  SELECT doc_id, b.w1, b.w2
  FROM (SELECT * FROM w WHERE size(ws) >= 2) t
  LATERAL VIEW inline(transform(sequence(1, size(ws) - 1),
       i -> struct(element_at(ws, i) AS w1, element_at(ws, i + 1) AS w2)))
       b AS w1, w2
),
""" + _KN_TAIL


def _q_nb_lang_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    # tf (doc-lang-term counts) is referenced by cls, cw, v, nd and the
    # contrib join — inlined, the tokenize→groupBy subtree ran 5×.
    register_views(spark, sf_dir, ("documents",))
    return _run_sql_materialized(
        spark, SPARK_SQL["nb_lang_classifier"], ("tf",), "nb"
    )


def _q_kneser_ney_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    # bgf feeds bc + the contrib join; bc feeds cc, cont, tot + the
    # contrib join — inlined, the corpus tokenization ran 5× and the
    # doc-bigram shuffle 5×. Materialize both relations once, in order
    # (bc's pass reads the bgf view, not the corpus).
    register_views(spark, sf_dir, ("documents",))
    return _run_sql_materialized(
        spark, SPARK_SQL["kneser_ney_bigram_score"], ("bgf", "bc"), "kn"
    )


def _q_js_source_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    # tf (source-term counts) is referenced by stot, vtot, tot and the
    # grid join — inlined, the corpus tokenization ran 4×.
    register_views(spark, sf_dir, ("documents",))
    return _run_sql_materialized(
        spark, SPARK_SQL["js_source_drift"], ("tf",), "js"
    )


ORACLE["kneser_ney_bigram_score"] = """
WITH w AS (
  SELECT doc_id, [x for x in string_split(lower(text), ' ') if x <> ''] AS ws
  FROM documents
),
bg AS (
  SELECT doc_id, unnest(ws[1:len(ws) - 1]) AS w1, unnest(ws[2:len(ws)]) AS w2
  FROM w WHERE len(ws) >= 2
),
""" + _KN_TAIL


# --- per-dimension embedding moments -----------------------------------------
# The oracle-checkable face of L41 (embedding moments / whitening): the
# full covariance needs matrix algebra DuckDB can't replay, but the
# per-dimension count/mean/population-variance — the diagonal a
# quantizer or per-dimension codebook actually consumes — is pure SQL.
# One posexplode + one hash agg keyed by dim (64 groups, map-side
# partials). Float portability: elements are cast float→double (exact)
# then rounded to 6 dp and summed as DECIMAL(28,6) — exact and
# order-independent, so mean and E[x²] (and the variance derived from
# them) are bit-identical in both engines under any partitioning.
SPARK_SQL["embedding_dim_moments"] = """
SELECT CAST(dim AS BIGINT) AS dim,
       CAST(count(*) AS BIGINT) AS n,
       round(CAST(sum(xr) AS DOUBLE) / count(*), 6) AS mean,
       round(CAST(sum(x2r) AS DOUBLE) / count(*)
             - pow(CAST(sum(xr) AS DOUBLE) / count(*), 2), 6) AS var_pop
FROM (
  SELECT dim,
         CAST(round(CAST(x AS DOUBLE), 6) AS DECIMAL(28, 6)) AS xr,
         CAST(round(CAST(x AS DOUBLE) * CAST(x AS DOUBLE), 6)
              AS DECIMAL(28, 6)) AS x2r
  FROM embeddings LATERAL VIEW posexplode(embedding) t AS dim, x
)
GROUP BY dim
"""
ORACLE["embedding_dim_moments"] = """
SELECT CAST(dim AS BIGINT) AS dim,
       CAST(count(*) AS BIGINT) AS n,
       round(CAST(sum(xr) AS DOUBLE) / count(*), 6) AS mean,
       round(CAST(sum(x2r) AS DOUBLE) / count(*)
             - pow(CAST(sum(xr) AS DOUBLE) / count(*), 2), 6) AS var_pop
FROM (
  SELECT generate_subscripts(embedding, 1) - 1 AS dim,
         CAST(round(CAST(unnest(embedding) AS DOUBLE), 6)
              AS DECIMAL(28, 6)) AS xr,
         CAST(round(CAST(unnest(embedding) AS DOUBLE)
                    * CAST(unnest(embedding) AS DOUBLE), 6)
              AS DECIMAL(28, 6)) AS x2r
  FROM embeddings
) t
GROUP BY dim
"""

# --- document chunking (L42 as an oracle-checked query) ----------------------
# chunk_documents (llm/text.py) was pytest-only (python-model parity);
# this registry entry drives it end-to-end against a DuckDB replay —
# generate_series reproduces Spark's `sequence` start grid and
# list_slice the codegen `slice`, so chunk boundaries, tail handling,
# and the one-chunk-for-short-docs rule are all cross-engine-checked.
# chunk=32/overlap=8 (not the 128/16 default) so the synthetic corpus
# (~30–80 tokens/doc) actually produces multi-chunk documents.
_CHUNK_TOKENS, _CHUNK_OVERLAP = 32, 8


def _q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from .llm import text as llm_text

    register_views(spark, sf_dir, ("documents",))
    out = llm_text.chunk_documents(
        spark.table("documents"),
        chunk_tokens=_CHUNK_TOKENS,
        overlap_tokens=_CHUNK_OVERLAP,
    )
    return out.select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        "token_offset",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        "chunk_text",
    )


ORACLE["doc_chunks"] = f"""
WITH base AS (
  SELECT doc_id, regexp_split_to_array(text, '\\s+') AS toks FROM documents
),
grid AS (
  SELECT doc_id, toks,
         CAST(unnest(range(
           0,
           CAST(floor(greatest((len(toks) - {_CHUNK_OVERLAP + 1})
                               / {_CHUNK_TOKENS - _CHUNK_OVERLAP}.0, 0)) AS BIGINT)
             * {_CHUNK_TOKENS - _CHUNK_OVERLAP} + 1,
           {_CHUNK_TOKENS - _CHUNK_OVERLAP})) AS BIGINT) AS token_offset
  FROM base
)
SELECT doc_id,
       token_offset // {_CHUNK_TOKENS - _CHUNK_OVERLAP} AS chunk_id,
       token_offset,
       CAST(len(list_slice(toks, token_offset + 1,
                           token_offset + {_CHUNK_TOKENS})) AS BIGINT) AS n_tokens,
       array_to_string(list_slice(toks, token_offset + 1,
                                  token_offset + {_CHUNK_TOKENS}), ' ') AS chunk_text
FROM grid
"""


# --- L95: cross-document boilerplate LINE removal (RefinedWeb/CCNet) ---------
# The other famous line rule: a line occurring in >= min_docs DISTINCT
# documents is template (nav menus, cookie banners, shared footers) and
# ALL copies drop — unlike L56's keep-first chunk rule. The corpus has
# no newlines, so the fixture synthesizes the web-page shape in pure
# SQL: a global header line (always boilerplate), a per-source footer
# (df = docs-per-source — KEPT at sf0.01 where sources hold 25 docs,
# DROPPED at sf0.1 where they hold 250: the threshold boundary is
# exercised both ways across tiers), and two content slices of the real
# text. Scale shape: one line-hash df aggregation (map-side combine) →
# the frequent set is small by construction → broadcast anti-join back
# → one per-doc rebuild groupBy with an order-restoring array_sort (no
# window, no second corpus shuffle).
_BOILERPLATE_MIN_DOCS = 30
_BOILERPLATE_HEADER = "site navigation home about contact cookie notice"


def _q_line_boilerplate_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from .llm import text as llm_text

    register_views(spark, sf_dir, ("documents",))
    d = spark.table("documents").select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.lit(_BOILERPLATE_HEADER),
            F.substring("text", 1, 40),
            F.concat(F.lit("source footer "), F.col("source")),
            F.substring("text", 41, 40),
        ).alias("text"),
    )
    out = llm_text.remove_boilerplate_lines(
        d, min_docs=_BOILERPLATE_MIN_DOCS
    )
    return out.select(
        "doc_id",
        "n_lines",
        "n_dropped",
        "n_chars_kept",
        F.md5("kept_text").alias("kept_hash"),
    )


ORACLE["line_boilerplate_removal"] = f"""
WITH d AS (
  SELECT doc_id,
         '{_BOILERPLATE_HEADER}' AS h,
         substr(text, 1, 40) AS la,
         'source footer ' || source AS fo,
         substr(text, 41, 40) AS lb
  FROM documents
),
lines AS (
  SELECT doc_id, 0 AS pos, h AS line FROM d
  UNION ALL SELECT doc_id, 1, la FROM d
  UNION ALL SELECT doc_id, 2, fo FROM d
  UNION ALL SELECT doc_id, 3, lb FROM d
),
freq AS (
  SELECT line FROM lines
  GROUP BY line HAVING count(DISTINCT doc_id) >= {_BOILERPLATE_MIN_DOCS}
),
flag AS (
  SELECT l.doc_id, l.pos, l.line, f.line IS NOT NULL AS bp
  FROM lines l LEFT JOIN freq f ON l.line = f.line
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(CASE WHEN bp THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
       CAST(length(coalesce(
         string_agg(CASE WHEN NOT bp THEN line END, chr(10) ORDER BY pos),
         '')) AS BIGINT) AS n_chars_kept,
       md5(coalesce(
         string_agg(CASE WHEN NOT bp THEN line END, chr(10) ORDER BY pos),
         '')) AS kept_hash
FROM flag GROUP BY doc_id
"""


# --- L96: cross-document exact duplicate-SPAN removal (Lee et al. 2022) ------
# The substring-dedup REWRITE stage (dup_span_coverage only measures): token
# 8-grams shared by >= 2 distinct docs mark positions, marked intervals merge
# into runs, runs >= min_run tokens are excised and the doc is rejoined. The
# fixture synthesizes the wrapped-license shape in pure SQL: every doc is
# unique filler around (doc_id%3) a 12-token license block — ABOVE the 10-token
# run threshold, removed — and (doc_id%5) a 9-token newsletter blurb — BELOW
# it, kept: both sides of the run boundary are driver-certified, plus %7 short
# docs exercising the <k passthrough. Scale shape: narrow gram map → ONE
# (gram, doc) map-side-combined agg → count window over COLLAPSED rows → run
# windows on the tiny duplicated-starts relation → doc-level join + pure
# codegen higher-order rewrite (no token-level shuffle).
_DUPSPAN_K = 8
_DUPSPAN_MIN_RUN = 10
_DUPSPAN_A = (  # 12 tokens: above the run threshold -> removed
    "terms of service all rights reserved unauthorized reproduction "
    "strictly prohibited contact legal"
)
_DUPSPAN_B = (  # 9 tokens: below the run threshold -> kept
    "subscribe to our newsletter for weekly updates free today"
)


def _dupspan_fixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The wrapped-license corpus shared by the L96/L99 certificates."""
    from pyspark.sql import functions as F

    register_views(spark, sf_dir, ("documents",))

    def uniq(prefix: str, cnt: int):
        return F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(1), F.lit(cnt)),
                lambda j: F.concat(
                    F.lit(prefix),
                    F.col("doc_id").cast("string"),
                    F.lit("x"),
                    j.cast("string"),
                ),
            ),
        )

    return spark.table("documents").select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(F.lit("tiny doc u"), F.col("doc_id").cast("string")),
        )
        .otherwise(
            F.concat_ws(
                " ",
                uniq("u", 12),
                F.when(F.col("doc_id") % 3 == 0, F.lit(_DUPSPAN_A)),
                uniq("m", 6),
                F.when(F.col("doc_id") % 5 == 0, F.lit(_DUPSPAN_B)),
                uniq("v", 6),
            )
        )
        .alias("text"),
    )


def _q_duplicate_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from .llm import text as llm_text

    d = _dupspan_fixture(spark, sf_dir)
    out = llm_text.remove_duplicate_spans(
        d, k=_DUPSPAN_K, min_docs=2, min_run=_DUPSPAN_MIN_RUN
    )
    return out.select(
        "doc_id",
        "n_tokens",
        "n_removed",
        "n_runs",
        F.md5("kept_text").alias("kept_hash"),
    )


_DUPSPAN_FX_DUCK = f"""
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0 THEN 'tiny doc u' || doc_id
         ELSE concat_ws(' ',
           array_to_string(list_transform(generate_series(1, 12),
             j -> 'u' || doc_id || 'x' || j), ' '),
           CASE WHEN doc_id % 3 = 0 THEN '{_DUPSPAN_A}' END,
           array_to_string(list_transform(generate_series(1, 6),
             j -> 'm' || doc_id || 'x' || j), ' '),
           CASE WHEN doc_id % 5 = 0 THEN '{_DUPSPAN_B}' END,
           array_to_string(list_transform(generate_series(1, 6),
             j -> 'v' || doc_id || 'x' || j), ' '))
         END AS text
  FROM documents
"""

ORACLE["duplicate_span_removal"] = f"""
WITH fx AS ({_DUPSPAN_FX_DUCK}),
toks AS (
  SELECT doc_id, text, string_split(text, ' ') AS w,
         len(string_split(text, ' ')) AS n
  FROM fx
),
grams AS (
  SELECT doc_id, i,
         md5(array_to_string(w[i:i + {_DUPSPAN_K - 1}], ' ')) AS g
  FROM (SELECT doc_id, w,
               unnest(generate_series(1, n - {_DUPSPAN_K - 1})) AS i
        FROM toks WHERE n >= {_DUPSPAN_K}) p
),
gcount AS (
  SELECT g, doc_id, list(i) AS starts FROM grams GROUP BY g, doc_id
),
dstart AS (
  SELECT doc_id, unnest(starts) AS i
  FROM (SELECT doc_id, starts,
               count(*) OVER (PARTITION BY g) AS ndocs
        FROM gcount) q
  WHERE ndocs >= 2
),
runsid AS (
  SELECT doc_id, i,
         sum(CASE WHEN prev IS NULL OR i - prev > {_DUPSPAN_K}
              THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY i
                 ROWS UNBOUNDED PRECEDING) AS run
  FROM (SELECT doc_id, i,
               lag(i) OVER (PARTITION BY doc_id ORDER BY i) AS prev
        FROM dstart) l
),
runs AS (
  SELECT doc_id, run, min(i) AS s, max(i) + {_DUPSPAN_K - 1} AS e
  FROM runsid GROUP BY doc_id, run
  HAVING max(i) + {_DUPSPAN_K - 1} - min(i) + 1 >= {_DUPSPAN_MIN_RUN}
),
perdoc AS (
  SELECT doc_id, count(*) AS n_runs, sum(e - s + 1) AS n_removed
  FROM runs GROUP BY doc_id
),
cov AS (SELECT doc_id, unnest(generate_series(s, e)) AS t FROM runs),
tokrows AS (
  SELECT doc_id, i AS t, w[i] AS word
  FROM (SELECT doc_id, w, unnest(generate_series(1, n)) AS i FROM toks) q
),
rebuilt AS (
  SELECT tr.doc_id, string_agg(tr.word, ' ' ORDER BY tr.t) AS kept_text
  FROM tokrows tr LEFT JOIN cov c ON tr.doc_id = c.doc_id AND tr.t = c.t
  WHERE c.t IS NULL
  GROUP BY tr.doc_id
)
SELECT f.doc_id,
       CAST(tk.n AS BIGINT) AS n_tokens,
       CAST(coalesce(p.n_removed, 0) AS BIGINT) AS n_removed,
       CAST(coalesce(p.n_runs, 0) AS BIGINT) AS n_runs,
       md5(CASE WHEN p.n_removed IS NULL THEN f.text
            ELSE coalesce(r.kept_text, '') END) AS kept_hash
FROM fx f
JOIN toks tk ON f.doc_id = tk.doc_id
LEFT JOIN perdoc p ON f.doc_id = p.doc_id
LEFT JOIN rebuilt r ON f.doc_id = r.doc_id
"""


# --- L99: stored duplicated-gram bank + arrival-side span rewrite ------------
# The stored-layout form of L96 (the L91/L94 discipline for substring
# dedup): the standing half of the wrapped-license corpus (even doc_ids)
# collapses ONCE to its frequent-gram bank; the odd half arrives and is
# rewritten against the bank with zero standing recompute. Grams shared
# only among arrivals must NOT mark (the bank is the template authority) —
# the fixture's per-doc unique filler guarantees the only bank hits are
# the license/newsletter templates, and the oracle replays build + probe.
_DUPGRAM_LAYOUT_CACHE: dict = {}


def _dupgram_layout(spark: SparkSession, sf_dir: str) -> str:
    import tempfile

    from pyspark.sql import functions as F

    from .llm import text as llm_text

    key = (spark.sparkContext.applicationId, sf_dir)
    path = _DUPGRAM_LAYOUT_CACHE.get(key)
    if path is not None:
        return path
    path = tempfile.mkdtemp(prefix="k2n_dupgram_layout_")
    standing = _dupspan_fixture(spark, sf_dir).filter(
        F.col("doc_id") % 2 == 0
    )
    llm_text.write_dupgram_layout(
        standing, path, k=_DUPSPAN_K, min_docs=2
    )
    _DUPGRAM_LAYOUT_CACHE[key] = path
    return path


def _q_span_rewrite_stored(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from .llm import text as llm_text

    layout = _dupgram_layout(spark, sf_dir)
    arrivals = _dupspan_fixture(spark, sf_dir).filter(
        F.col("doc_id") % 2 == 1
    )
    out = llm_text.span_rewrite_admission(
        spark, layout, arrivals, min_run=_DUPSPAN_MIN_RUN
    )
    return out.select(
        "doc_id",
        "n_tokens",
        "n_removed",
        "n_runs",
        F.md5("kept_text").alias("kept_hash"),
    )


ORACLE["span_rewrite_stored"] = f"""
WITH fx AS ({_DUPSPAN_FX_DUCK}),
stoks AS (
  SELECT doc_id, string_split(text, ' ') AS w,
         len(string_split(text, ' ')) AS n
  FROM fx WHERE doc_id % 2 = 0
),
sgrams AS (
  SELECT doc_id,
         md5(array_to_string(w[i:i + {_DUPSPAN_K - 1}], ' ')) AS g
  FROM (SELECT doc_id, w,
               unnest(generate_series(1, n - {_DUPSPAN_K - 1})) AS i
        FROM stoks WHERE n >= {_DUPSPAN_K}) p
),
bank AS (
  SELECT g FROM sgrams GROUP BY g HAVING count(DISTINCT doc_id) >= 2
),
toks AS (
  SELECT doc_id, text, string_split(text, ' ') AS w,
         len(string_split(text, ' ')) AS n
  FROM fx WHERE doc_id % 2 = 1
),
grams AS (
  SELECT doc_id, i,
         md5(array_to_string(w[i:i + {_DUPSPAN_K - 1}], ' ')) AS g
  FROM (SELECT doc_id, w,
               unnest(generate_series(1, n - {_DUPSPAN_K - 1})) AS i
        FROM toks WHERE n >= {_DUPSPAN_K}) p
),
dstart AS (
  SELECT gr.doc_id, gr.i FROM grams gr JOIN bank b ON gr.g = b.g
),
runsid AS (
  SELECT doc_id, i,
         sum(CASE WHEN prev IS NULL OR i - prev > {_DUPSPAN_K}
              THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY i
                 ROWS UNBOUNDED PRECEDING) AS run
  FROM (SELECT doc_id, i,
               lag(i) OVER (PARTITION BY doc_id ORDER BY i) AS prev
        FROM dstart) l
),
runs AS (
  SELECT doc_id, run, min(i) AS s, max(i) + {_DUPSPAN_K - 1} AS e
  FROM runsid GROUP BY doc_id, run
  HAVING max(i) + {_DUPSPAN_K - 1} - min(i) + 1 >= {_DUPSPAN_MIN_RUN}
),
perdoc AS (
  SELECT doc_id, count(*) AS n_runs, sum(e - s + 1) AS n_removed
  FROM runs GROUP BY doc_id
),
cov AS (SELECT doc_id, unnest(generate_series(s, e)) AS t FROM runs),
tokrows AS (
  SELECT doc_id, i AS t, w[i] AS word
  FROM (SELECT doc_id, w, unnest(generate_series(1, n)) AS i FROM toks) q
),
rebuilt AS (
  SELECT tr.doc_id, string_agg(tr.word, ' ' ORDER BY tr.t) AS kept_text
  FROM tokrows tr LEFT JOIN cov c ON tr.doc_id = c.doc_id AND tr.t = c.t
  WHERE c.t IS NULL
  GROUP BY tr.doc_id
)
SELECT tk.doc_id,
       CAST(tk.n AS BIGINT) AS n_tokens,
       CAST(coalesce(p.n_removed, 0) AS BIGINT) AS n_removed,
       CAST(coalesce(p.n_runs, 0) AS BIGINT) AS n_runs,
       md5(CASE WHEN p.n_removed IS NULL THEN tk.text
            ELSE coalesce(r.kept_text, '') END) AS kept_hash
FROM toks tk
LEFT JOIN perdoc p ON tk.doc_id = p.doc_id
LEFT JOIN rebuilt r ON tk.doc_id = r.doc_id
"""


# --- L97: HTML -> text extraction (WET-style, deterministic regex form) ------
# The first stage of every web curation pipeline. The fixture wraps each
# doc's real text in a controlled page: <style> with CSS braces, an HTML
# comment, <script> holding a bare '<' (must vanish BEFORE the generic tag
# strip or it would mangle), block tags that become line boundaries, inline
# tags that become spaces, and all six decoded entities. Pure narrow map —
# every stage is a codegen regexp/string expression, RE2-compatible so the
# oracle replays the chain verbatim (DuckDB needs the 'g' option where Java
# replaces globally by default).
_HTML_FX_SPARK = (
    "concat('<html><head><title>Doc ', CAST(doc_id AS STRING), "
    "'</title><style type=\"text/css\">body { color: red; }</style></head>"
    "<body><!-- generated page --><h1>Heading ', CAST(doc_id AS STRING), "
    "'</h1><p>', substring(text, 1, 60), '</p>"
    "<script>var x = 1 < 2 && doc;</script>"
    "<p>Tom &amp; Jerry &lt;tag&gt; &quot;quoted&quot; it&#39;s A&nbsp;B</p>"
    "<div><a href=\"/l?id=', CAST(doc_id AS STRING), '\">link text</a>"
    "</div></body></html>')"
)
_HTML_FX_DUCK = (
    "'<html><head><title>Doc ' || doc_id || "
    "'</title><style type=\"text/css\">body { color: red; }</style></head>"
    "<body><!-- generated page --><h1>Heading ' || doc_id || "
    "'</h1><p>' || substr(text, 1, 60) || '</p>"
    "<script>var x = 1 < 2 && doc;</script>"
    "<p>Tom &amp; Jerry &lt;tag&gt; &quot;quoted&quot; it&#39;s A&nbsp;B</p>"
    "<div><a href=\"/l?id=' || doc_id || '\">link text</a>"
    "</div></body></html>'"
)


def _q_html_text_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from .llm import text as llm_text

    register_views(spark, sf_dir, ("documents",))
    d = spark.table("documents").select(
        "doc_id", F.expr(_HTML_FX_SPARK).alias("html")
    )
    out = llm_text.extract_html_text(d)
    return out.select(
        "doc_id",
        "n_tags",
        "n_chars_html",
        "n_chars_text",
        "markup_ratio",
        F.md5("text").alias("text_hash"),
    )


_HTML_BLOCK_RE_SQL = (
    "(?i)</(p|div|h1|h2|h3|h4|h5|h6|li|tr|ul|ol|table|blockquote)>"
    "|(?i)<(br|hr)[^>]*>"
)

ORACLE["html_text_extract"] = f"""
WITH fx AS (
  SELECT doc_id, {_HTML_FX_DUCK} AS h FROM documents
),
stripped AS (
  SELECT doc_id, h,
    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      regexp_replace(h,
        '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
        '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
        '(?s)<!--.*?-->', ' ', 'g'),
        '{_HTML_BLOCK_RE_SQL}', chr(10), 'g'),
        '(?s)<[^>]*>', ' ', 'g') AS t
  FROM fx
),
decoded AS (
  SELECT doc_id, h,
    replace(replace(replace(replace(replace(replace(t,
      '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', chr(39)),
      '&nbsp;', ' '), '&amp;', '&') AS t
  FROM stripped
),
collapsed AS (
  SELECT doc_id, h,
    regexp_replace(regexp_replace(regexp_replace(regexp_replace(t,
      '[ ' || chr(9) || ']+', ' ', 'g'),
      '[ ' || chr(9) || ']*' || chr(10) || '[ ' || chr(9) || ']*',
        chr(10), 'g'),
      chr(10) || '+', chr(10), 'g'),
      '^[ ' || chr(10) || ']+|[ ' || chr(10) || ']+$', '', 'g') AS text
  FROM decoded
)
SELECT doc_id,
       CAST(len(regexp_extract_all(h, '<[^>]*>')) AS BIGINT) AS n_tags,
       CAST(length(h) AS BIGINT) AS n_chars_html,
       CAST(length(text) AS BIGINT) AS n_chars_text,
       CASE WHEN length(h) = 0 THEN 0.0
        ELSE round(1.0 - length(text) /
                   CAST(length(h) AS DOUBLE), 6) END AS markup_ratio,
       md5(text) AS text_hash
FROM collapsed
"""


# --- L98: URL canonicalization + crawl-side URL dedup -------------------------
# The normalize-then-keep-lowest step that runs BEFORE content dedup in a
# crawl pipeline. The fixture gives each doc one of four spellings of the
# same logical resource (doc_id % 50 targets): plain, SCHEME/HOST case +
# default :443 + fragment, tracking-only query, and trailing-slash +
# shuffled params + tracking (that one canonicalizes to a distinct
# ?a=1&b=2 resource — sort + strip exercised together); %13 docs are
# non-URL strings that must pass through verbatim and never collide.
_URL_FX_SPARK = (
    "CASE WHEN doc_id % 13 = 0 THEN concat('plain text ref ', CAST(doc_id AS STRING)) "
    "WHEN doc_id % 4 = 0 THEN concat('https://www.example.com/article/', CAST(doc_id % 50 AS STRING)) "
    "WHEN doc_id % 4 = 1 THEN concat('HTTPS://WWW.EXAMPLE.COM:443/article/', CAST(doc_id % 50 AS STRING), '#section2') "
    "WHEN doc_id % 4 = 2 THEN concat('https://www.example.com/article/', CAST(doc_id % 50 AS STRING), '?utm_source=feed&utm_campaign=x') "
    "ELSE concat('https://www.example.com/article/', CAST(doc_id % 50 AS STRING), '/?b=2&a=1&utm_medium=email') END"
)
_URL_FX_DUCK = (
    "CASE WHEN doc_id % 13 = 0 THEN 'plain text ref ' || doc_id "
    "WHEN doc_id % 4 = 0 THEN 'https://www.example.com/article/' || (doc_id % 50) "
    "WHEN doc_id % 4 = 1 THEN 'HTTPS://WWW.EXAMPLE.COM:443/article/' || (doc_id % 50) || '#section2' "
    "WHEN doc_id % 4 = 2 THEN 'https://www.example.com/article/' || (doc_id % 50) || '?utm_source=feed&utm_campaign=x' "
    "ELSE 'https://www.example.com/article/' || (doc_id % 50) || '/?b=2&a=1&utm_medium=email' END"
)


def _q_url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from .llm import text as llm_text

    register_views(spark, sf_dir, ("documents",))
    d = spark.table("documents").select(
        "doc_id", F.expr(_URL_FX_SPARK).alias("url")
    )
    return llm_text.url_canonical_dedup(d).select(
        "doc_id", "canon_url", "is_kept"
    )


ORACLE["url_canonical_dedup"] = r"""
WITH fx AS (
  SELECT doc_id, __URLFX__ AS url FROM documents
),
parts AS (
  SELECT doc_id, url,
         regexp_replace(url, '#.*$', '') AS u
  FROM fx
),
ext AS (
  SELECT doc_id, url,
    lower(regexp_extract(u, '^([a-zA-Z][a-zA-Z0-9+.-]*)://([^/?#]*)([^?#]*)(\?[^#]*)?', 1)) AS scheme,
    lower(regexp_extract(u, '^([a-zA-Z][a-zA-Z0-9+.-]*)://([^/?#]*)([^?#]*)(\?[^#]*)?', 2)) AS host,
    regexp_extract(u, '^([a-zA-Z][a-zA-Z0-9+.-]*)://([^/?#]*)([^?#]*)(\?[^#]*)?', 3) AS path,
    coalesce(regexp_extract(u, '^([a-zA-Z][a-zA-Z0-9+.-]*)://([^/?#]*)([^?#]*)(\?[^#]*)?', 4), '') AS qs
  FROM parts
),
norm AS (
  SELECT doc_id, url,
    scheme,
    CASE WHEN scheme = 'http' AND host LIKE '%:80'
           THEN regexp_replace(host, ':80$', '')
         WHEN scheme = 'https' AND host LIKE '%:443'
           THEN regexp_replace(host, ':443$', '')
         ELSE host END AS host,
    CASE WHEN regexp_replace(path, '/+$', '') = '' THEN '/'
         ELSE regexp_replace(path, '/+$', '') END AS path,
    list_sort(list_filter(
      string_split(regexp_replace(qs, '^\?', ''), '&'),
      x -> x <> '' AND NOT regexp_matches(x,
        '^(utm_[a-z0-9_]*|gclid|fbclid|ref)(=.*)?$')
    )) AS params
  FROM ext
),
canon AS (
  SELECT doc_id, url,
    CASE WHEN regexp_matches(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://')
      THEN scheme || '://' || host || path ||
           CASE WHEN len(params) > 0
                THEN '?' || array_to_string(params, '&') ELSE '' END
      ELSE url END AS canon_url
  FROM norm
)
SELECT doc_id, canon_url,
       doc_id = min(doc_id) OVER (PARTITION BY canon_url) AS is_kept
FROM canon
""".replace("__URLFX__", _URL_FX_DUCK)


# --- L100: the composed WEB-CURATION pipeline ---------------------------------
# The end-to-end chain a web-crawl training pipeline actually runs, as ONE
# certificate: HTML→text (L97) → cross-doc boilerplate LINE removal (L95)
# → cross-doc duplicate SPAN removal (L96) — so the stage CONTRACTS are
# what's certified: the line stage sees the EXTRACTED text, the span stage
# sees the line-survivors flattened on single spaces, and the license
# block (embedded INSIDE a per-doc-unique line: intro<id> … outro<id>)
# demonstrates exactly why both removal stages exist — the line rule can
# never catch it, the span rule excises it. The two all-doc lines (the
# entity sentence, 'link text') prove the line stage; incidental real-text
# 8-gram collisions stress the span stage and the oracle replays whichever
# happen. Scale shape = the three stages' own pinned shapes chained; the
# stage-joins are doc-level.
_WEBPIPE_FX_SPARK = (
    "concat('<html><head><title>Doc ', CAST(doc_id AS STRING), "
    "'</title><style type=\"text/css\">body { color: red; }</style></head>"
    "<body><!-- generated page --><h1>Heading ', CAST(doc_id AS STRING), "
    "'</h1><p>', substring(text, 1, 60), '</p>"
    "<script>var x = 1 < 2 && doc;</script>"
    "<p>Tom &amp; Jerry &lt;tag&gt; &quot;quoted&quot; it&#39;s A&nbsp;B</p>', "
    "CASE WHEN doc_id % 3 = 0 THEN concat('<p>intro', CAST(doc_id AS STRING), "
    f"' {_DUPSPAN_A} outro', CAST(doc_id AS STRING), '</p>') ELSE '' END, "
    "'<div><a href=\"/l?id=', CAST(doc_id AS STRING), '\">link text</a>"
    "</div></body></html>')"
)
_WEBPIPE_FX_DUCK = (
    "'<html><head><title>Doc ' || doc_id || "
    "'</title><style type=\"text/css\">body { color: red; }</style></head>"
    "<body><!-- generated page --><h1>Heading ' || doc_id || "
    "'</h1><p>' || substr(text, 1, 60) || '</p>"
    "<script>var x = 1 < 2 && doc;</script>"
    "<p>Tom &amp; Jerry &lt;tag&gt; &quot;quoted&quot; it&#39;s A&nbsp;B</p>' || "
    "CASE WHEN doc_id % 3 = 0 THEN '<p>intro' || doc_id || "
    f"' {_DUPSPAN_A} outro' || doc_id || '</p>' ELSE '' END || "
    "'<div><a href=\"/l?id=' || doc_id || '\">link text</a>"
    "</div></body></html>'"
)


def _q_web_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from .llm import text as llm_text

    register_views(spark, sf_dir, ("documents",))
    d = spark.table("documents").select(
        "doc_id", F.expr(_WEBPIPE_FX_SPARK).alias("html")
    )
    # Materialize the two narrow per-doc stage boundaries ONCE (r13,
    # guide §2.4/§3.3): each downstream op references its input on
    # several plan legs and Spark replans rather than shares repeated
    # DataFrame references — unchecked, the 9-regex HTML chain ran 9×
    # and the boilerplate explode+aggregate 4× in ONE plan (81
    # regexp_replace nodes, 18 parquet scans). The checkpointed rows
    # are one curated-text copy per doc plus a few longs — the same
    # bytes every stage boundary of a production curation pipeline
    # writes anyway; against 8 recomputes of the full regex chain the
    # trade is one-sided at any scale.
    x = _fresh_ckpt(spark, llm_text.extract_html_text(d))
    b = llm_text.remove_boilerplate_lines(
        x.select("doc_id", "text"), min_docs=_BOILERPLATE_MIN_DOCS
    )
    flat = _fresh_ckpt(
        spark,
        b.select(
            "doc_id",
            F.translate("kept_text", "\n", " ").alias("text"),
            "n_lines",
            F.col("n_dropped").alias("n_dropped_lines"),
        ),
    )
    s = llm_text.remove_duplicate_spans(
        flat, k=_DUPSPAN_K, min_docs=2, min_run=_DUPSPAN_MIN_RUN
    )
    return (
        x.select("doc_id", "n_tags", "markup_ratio")
        .join(flat.select("doc_id", "n_lines", "n_dropped_lines"), "doc_id")
        .join(
            s.select(
                "doc_id",
                "n_tokens",
                F.col("n_removed").alias("n_removed_tokens"),
                "n_runs",
                F.md5("kept_text").alias("final_hash"),
            ),
            "doc_id",
        )
    )


ORACLE["web_curation_pipeline"] = f"""
WITH fx AS (
  SELECT doc_id, {_WEBPIPE_FX_DUCK} AS h FROM documents
),
stripped AS (
  SELECT doc_id, h,
    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      regexp_replace(h,
        '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
        '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
        '(?s)<!--.*?-->', ' ', 'g'),
        '{_HTML_BLOCK_RE_SQL}', chr(10), 'g'),
        '(?s)<[^>]*>', ' ', 'g') AS t
  FROM fx
),
decoded AS (
  SELECT doc_id, h,
    replace(replace(replace(replace(replace(replace(t,
      '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', chr(39)),
      '&nbsp;', ' '), '&amp;', '&') AS t
  FROM stripped
),
sig AS (
  SELECT doc_id,
    CAST(len(regexp_extract_all(h, '<[^>]*>')) AS BIGINT) AS n_tags,
    CASE WHEN length(h) = 0 THEN 0.0
     ELSE round(1.0 - length(regexp_replace(regexp_replace(
            regexp_replace(regexp_replace(t,
              '[ ' || chr(9) || ']+', ' ', 'g'),
              '[ ' || chr(9) || ']*' || chr(10) || '[ ' || chr(9) || ']*',
                chr(10), 'g'),
              chr(10) || '+', chr(10), 'g'),
              '^[ ' || chr(10) || ']+|[ ' || chr(10) || ']+$', '', 'g'))
          / CAST(length(h) AS DOUBLE), 6) END AS markup_ratio,
    regexp_replace(regexp_replace(regexp_replace(regexp_replace(t,
      '[ ' || chr(9) || ']+', ' ', 'g'),
      '[ ' || chr(9) || ']*' || chr(10) || '[ ' || chr(9) || ']*',
        chr(10), 'g'),
      chr(10) || '+', chr(10), 'g'),
      '^[ ' || chr(10) || ']+|[ ' || chr(10) || ']+$', '', 'g') AS text
  FROM decoded
),
lines AS (
  SELECT doc_id, i AS pos, ls[i] AS line
  FROM (SELECT doc_id, string_split(text, chr(10)) AS ls,
               unnest(generate_series(1, len(string_split(text, chr(10)))))
                 AS i
        FROM sig) q
),
freql AS (
  SELECT line FROM lines
  GROUP BY line HAVING count(DISTINCT doc_id) >= {_BOILERPLATE_MIN_DOCS}
),
flagged AS (
  SELECT l.doc_id, l.pos, l.line, f.line IS NOT NULL AS bp
  FROM lines l LEFT JOIN freql f ON l.line = f.line
),
kept AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n_lines,
         CAST(sum(CASE WHEN bp THEN 1 ELSE 0 END) AS BIGINT)
           AS n_dropped_lines,
         coalesce(string_agg(CASE WHEN NOT bp THEN line END,
                             ' ' ORDER BY pos), '') AS text
  FROM flagged GROUP BY doc_id
),
toks AS (
  SELECT doc_id, text, string_split(text, ' ') AS w,
         len(string_split(text, ' ')) AS n
  FROM kept
),
grams AS (
  SELECT doc_id, i,
         md5(array_to_string(w[i:i + {_DUPSPAN_K - 1}], ' ')) AS g
  FROM (SELECT doc_id, w,
               unnest(generate_series(1, n - {_DUPSPAN_K - 1})) AS i
        FROM toks WHERE n >= {_DUPSPAN_K}) p
),
bank AS (
  SELECT g FROM grams GROUP BY g HAVING count(DISTINCT doc_id) >= 2
),
dstart AS (
  SELECT gr.doc_id, gr.i FROM grams gr JOIN bank b ON gr.g = b.g
),
runsid AS (
  SELECT doc_id, i,
         sum(CASE WHEN prev IS NULL OR i - prev > {_DUPSPAN_K}
              THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY i
                 ROWS UNBOUNDED PRECEDING) AS run
  FROM (SELECT doc_id, i,
               lag(i) OVER (PARTITION BY doc_id ORDER BY i) AS prev
        FROM dstart) l
),
runs AS (
  SELECT doc_id, run, min(i) AS s, max(i) + {_DUPSPAN_K - 1} AS e
  FROM runsid GROUP BY doc_id, run
  HAVING max(i) + {_DUPSPAN_K - 1} - min(i) + 1 >= {_DUPSPAN_MIN_RUN}
),
perdoc AS (
  SELECT doc_id, count(*) AS n_runs, sum(e - s + 1) AS n_removed
  FROM runs GROUP BY doc_id
),
cov AS (SELECT doc_id, unnest(generate_series(s, e)) AS t FROM runs),
tokrows AS (
  SELECT doc_id, i AS t, w[i] AS word
  FROM (SELECT doc_id, w, unnest(generate_series(1, n)) AS i FROM toks) q
),
rebuilt AS (
  SELECT tr.doc_id, string_agg(tr.word, ' ' ORDER BY tr.t) AS kept_text
  FROM tokrows tr LEFT JOIN cov c ON tr.doc_id = c.doc_id AND tr.t = c.t
  WHERE c.t IS NULL
  GROUP BY tr.doc_id
)
SELECT s.doc_id, s.n_tags, s.markup_ratio,
       k.n_lines, k.n_dropped_lines,
       CAST(tk.n AS BIGINT) AS n_tokens,
       CAST(coalesce(p.n_removed, 0) AS BIGINT) AS n_removed_tokens,
       CAST(coalesce(p.n_runs, 0) AS BIGINT) AS n_runs,
       md5(CASE WHEN p.n_removed IS NULL THEN tk.text
            ELSE coalesce(r.kept_text, '') END) AS final_hash
FROM sig s
JOIN kept k ON s.doc_id = k.doc_id
JOIN toks tk ON s.doc_id = tk.doc_id
LEFT JOIN perdoc p ON s.doc_id = p.doc_id
LEFT JOIN rebuilt r ON s.doc_id = r.doc_id
"""


# --- L101: CCNet-style normalized-fingerprint dedup ---------------------------
# Fuzzy-exact dedup: the normalization (lowercase, accent fold, digit→0,
# punctuation→space, whitespace collapse) makes trivially-varied copies
# collide without paying MinHash. The fixture writes each group's content
# four ways — pristine, SHOUTED+accented ('CAFÉ RÉSUMÉ'), punctuated, and
# double-spaced, each with a DIFFERENT edition digit — and letter-codes the
# group id (digits in the group key would be erased by digit folding and
# merge unrelated groups, which is exactly the trap the fixture documents);
# %13 punctuation-only docs all normalize to '' and dedup into one group.
_NORM_FX_SPARK = """
CASE WHEN doc_id % 13 = 0 THEN '??!!..'
ELSE CASE CAST(doc_id % 4 AS INT)
 WHEN 0 THEN concat('Sample Text numero ', char(97 + doc_id % 250 % 26),
   char(97 + (doc_id % 250) DIV 26), ' cafe resume corpus edition 3')
 WHEN 1 THEN concat('SAMPLE TEXT NUMERO ', upper(concat(
   char(97 + doc_id % 250 % 26), char(97 + (doc_id % 250) DIV 26))),
   ' CAFÉ RÉSUMÉ CORPUS EDITION 7!!')
 WHEN 2 THEN concat('sample, text; numero: ', char(97 + doc_id % 250 % 26),
   char(97 + (doc_id % 250) DIV 26), ' cafe resume corpus (edition 5)')
 ELSE concat('sample  text  numero ', char(97 + doc_id % 250 % 26),
   char(97 + (doc_id % 250) DIV 26), '  cafe resume corpus edition 9')
END END
"""
_NORM_FX_DUCK = """
CASE WHEN doc_id % 13 = 0 THEN '??!!..'
ELSE CASE CAST(doc_id % 4 AS INT)
 WHEN 0 THEN 'Sample Text numero ' || chr(CAST(97 + doc_id % 250 % 26 AS INT)) ||
   chr(CAST(97 + (doc_id % 250) // 26 AS INT)) || ' cafe resume corpus edition 3'
 WHEN 1 THEN 'SAMPLE TEXT NUMERO ' || upper(chr(CAST(97 + doc_id % 250 % 26 AS INT)) ||
   chr(CAST(97 + (doc_id % 250) // 26 AS INT))) || ' CAFÉ RÉSUMÉ CORPUS EDITION 7!!'
 WHEN 2 THEN 'sample, text; numero: ' || chr(CAST(97 + doc_id % 250 % 26 AS INT)) ||
   chr(CAST(97 + (doc_id % 250) // 26 AS INT)) || ' cafe resume corpus (edition 5)'
 ELSE 'sample  text  numero ' || chr(CAST(97 + doc_id % 250 % 26 AS INT)) ||
   chr(CAST(97 + (doc_id % 250) // 26 AS INT)) || '  cafe resume corpus edition 9'
END END
"""


def _q_normalized_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from .llm import text as llm_text

    register_views(spark, sf_dir, ("documents",))
    d = spark.table("documents").select(
        "doc_id", F.expr(_NORM_FX_SPARK).alias("text")
    )
    return llm_text.normalized_dedup(d)


ORACLE["normalized_dedup"] = """
WITH fx AS (
  SELECT doc_id, __NORMFX__ AS text FROM documents
),
norm AS (
  SELECT doc_id,
    trim(regexp_replace(regexp_replace(
      translate(translate(lower(coalesce(text, '')),
        'áàâäãåéèêëíìîïóòôöõúùûüçñýÿ',
        'aaaaaaeeeeiiiioooooouuuucnyy'),
        '123456789', '000000000'),
      '[.,;:!?"''()\\[\\]{}<>«»_/\\\\|+*=~`@#$%^&-]', ' ', 'g'),
      '[ ' || chr(9) || chr(10) || ']+', ' ', 'g')) AS t
  FROM fx
)
SELECT doc_id, md5(t) AS norm_hash,
       doc_id = min(doc_id) OVER (PARTITION BY t) AS is_kept
FROM norm
""".replace("__NORMFX__", _NORM_FX_DUCK)


# --- L102: Unicode script-mix profile -----------------------------------------
# The unconditional companion to stopword lang-ID (L8): script fractions
# need no language guess and are the only reliable cheap signal for CJK.
# The fixture routes docs through seven shapes — majority-CJK/Cyrillic/
# Greek/Arabic/digit/punctuation docs plus the mixed Latin-dominant rest —
# so every dominance branch and the 'other' fallback are driver-certified.
# Same literal-endpoint character classes in both engines (never
# \p{Script}, which RE2 and Java gate differently).
_SCRIPT_FX_SPARK = """
CASE WHEN doc_id % 11 = 0 THEN repeat('你好世界 ', CAST(1 + doc_id % 3 AS INT))
     WHEN doc_id % 11 = 1 THEN repeat('привет мир ', 2)
     WHEN doc_id % 11 = 2 THEN 'γειά σου κόσμε'
     WHEN doc_id % 11 = 3 THEN 'مرحبا بالعالم'
     WHEN doc_id % 11 = 4 THEN '123 456 789'
     WHEN doc_id % 11 = 5 THEN '?!?!'
     ELSE concat(substring(text, 1, 40), ' тест ', CAST(doc_id AS STRING))
END
"""
_SCRIPT_FX_DUCK = """
CASE WHEN doc_id % 11 = 0 THEN repeat('你好世界 ', CAST(1 + doc_id % 3 AS INT))
     WHEN doc_id % 11 = 1 THEN repeat('привет мир ', 2)
     WHEN doc_id % 11 = 2 THEN 'γειά σου κόσμε'
     WHEN doc_id % 11 = 3 THEN 'مرحبا بالعالم'
     WHEN doc_id % 11 = 4 THEN '123 456 789'
     WHEN doc_id % 11 = 5 THEN '?!?!'
     ELSE substr(text, 1, 40) || ' тест ' || doc_id
END
"""


def _q_script_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from .llm import text as llm_text

    register_views(spark, sf_dir, ("documents",))
    d = spark.table("documents").select(
        "doc_id", F.expr(_SCRIPT_FX_SPARK).alias("text")
    )
    return llm_text.script_profile(d)


ORACLE["script_profile"] = """
WITH fx AS (
  SELECT doc_id, __SCRIPTFX__ AS text FROM documents
),
c AS (
  SELECT doc_id, length(coalesce(text, '')) AS n,
    len(regexp_extract_all(coalesce(text, ''), '[a-zA-Z]')) AS n_latin,
    len(regexp_extract_all(coalesce(text, ''), '[а-яёА-ЯЁ]')) AS n_cyrillic,
    len(regexp_extract_all(coalesce(text, ''), '[一-鿿぀-ゟ゠-ヿ가-힣]')) AS n_cjk,
    len(regexp_extract_all(coalesce(text, ''), '[α-ωΑ-Ωά-ώΆΈΉΊΌΎΏ]')) AS n_greek,
    len(regexp_extract_all(coalesce(text, ''), '[ا-ي]')) AS n_arabic,
    len(regexp_extract_all(coalesce(text, ''), '[0-9]')) AS n_digit
  FROM fx
)
SELECT doc_id,
  CAST(n AS BIGINT) AS n_chars,
  CAST(n_latin AS BIGINT) AS n_latin,
  CAST(n_cyrillic AS BIGINT) AS n_cyrillic,
  CAST(n_cjk AS BIGINT) AS n_cjk,
  CAST(n_greek AS BIGINT) AS n_greek,
  CAST(n_arabic AS BIGINT) AS n_arabic,
  CAST(n_digit AS BIGINT) AS n_digit,
  CASE WHEN n = 0 THEN 0.0 ELSE round(n_latin / CAST(n AS DOUBLE), 6) END AS latin_frac,
  CASE WHEN n = 0 THEN 0.0 ELSE round(n_cyrillic / CAST(n AS DOUBLE), 6) END AS cyrillic_frac,
  CASE WHEN n = 0 THEN 0.0 ELSE round(n_cjk / CAST(n AS DOUBLE), 6) END AS cjk_frac,
  CASE WHEN n = 0 THEN 0.0 ELSE round(n_greek / CAST(n AS DOUBLE), 6) END AS greek_frac,
  CASE WHEN n = 0 THEN 0.0 ELSE round(n_arabic / CAST(n AS DOUBLE), 6) END AS arabic_frac,
  CASE WHEN n = 0 THEN 0.0 ELSE round(n_digit / CAST(n AS DOUBLE), 6) END AS digit_frac,
  CASE WHEN greatest(n_latin, n_cyrillic, n_cjk, n_greek, n_arabic, n_digit) = 0 THEN 'other'
       WHEN n_latin = greatest(n_latin, n_cyrillic, n_cjk, n_greek, n_arabic, n_digit) THEN 'latin'
       WHEN n_cyrillic = greatest(n_latin, n_cyrillic, n_cjk, n_greek, n_arabic, n_digit) THEN 'cyrillic'
       WHEN n_cjk = greatest(n_latin, n_cyrillic, n_cjk, n_greek, n_arabic, n_digit) THEN 'cjk'
       WHEN n_greek = greatest(n_latin, n_cyrillic, n_cjk, n_greek, n_arabic, n_digit) THEN 'greek'
       WHEN n_arabic = greatest(n_latin, n_cyrillic, n_cjk, n_greek, n_arabic, n_digit) THEN 'arabic'
       ELSE 'digit' END AS dominant_script
FROM c
""".replace("__SCRIPTFX__", _SCRIPT_FX_DUCK)


# --- L104: quality-filter battery with per-rule drop attribution -------------
# The Gopher/FineWeb rule set as ONE reportable op: five flags (short,
# stopword-starved, word-repetitive, symbol-heavy, degenerate word length)
# → drop verdict → a 7-row per-rule report. The fixture routes docs
# through one engineered pathology per residue class (plus real-text
# passthrough), so every rule provably fires on a known subset and the
# report's overlap accounting (a doc can trip several rules) is
# certified, not assumed. One narrow flag projection → ONE global
# map-side-combined aggregate → stack.
_QFR_FX_SPARK = """
CASE CAST(doc_id % 6 AS INT)
 WHEN 1 THEN 'tiny doc'
 WHEN 2 THEN repeat('spam ', 30)
 WHEN 3 THEN '!!!! ???? ;;;; ....'
 WHEN 4 THEN concat_ws(' ', transform(sequence(1, 30),
   j -> concat('tok', CAST(doc_id AS STRING), 'x', CAST(j AS STRING))))
 WHEN 5 THEN concat_ws(' ', transform(sequence(1, 30),
   j -> concat('verylongtokenpayload', CAST(j AS STRING), 'qqqqqqq')))
 ELSE substring(text, 1, 120)
END
"""
_QFR_FX_DUCK = """
CASE CAST(doc_id % 6 AS INT)
 WHEN 1 THEN 'tiny doc'
 WHEN 2 THEN repeat('spam ', 30)
 WHEN 3 THEN '!!!! ???? ;;;; ....'
 WHEN 4 THEN array_to_string(list_transform(generate_series(1, 30),
   j -> 'tok' || doc_id || 'x' || j), ' ')
 WHEN 5 THEN array_to_string(list_transform(generate_series(1, 30),
   j -> 'verylongtokenpayload' || j || 'qqqqqqq'), ' ')
 ELSE substr(text, 1, 120)
END
"""


def _q_quality_filter_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from .llm import text as llm_text

    register_views(spark, sf_dir, ("documents",))
    d = spark.table("documents").select(
        "doc_id", F.expr(_QFR_FX_SPARK).alias("text")
    )
    return llm_text.quality_filter_report(d)


ORACLE["quality_filter_report"] = """
WITH fx AS (
  SELECT doc_id, __QFRFX__ AS t FROM documents
),
m AS (
  SELECT doc_id, t, string_split(t, ' ') AS w,
         len(string_split(t, ' ')) AS n, length(t) AS nc
  FROM fx
),
fl AS (
  SELECT doc_id,
    n < 15 AS f_short,
    len(list_filter(string_split(lower(t), ' '),
        x -> x IN ('the','a','of','and','is','to','in')))
      / CAST(greatest(n, 1) AS DOUBLE) < 0.03 AS f_stopword,
    round(1.0 - len(list_distinct(w)) / CAST(n AS DOUBLE), 6) > 0.5
      AS f_repetition,
    length(regexp_replace(t, '[^.,;:!?]', '', 'g'))
      / CAST(greatest(nc, 1) AS DOUBLE) > 0.1 AS f_symbol,
    (nc / CAST(greatest(n, 1) AS DOUBLE) < 3.0)
      OR (nc / CAST(greatest(n, 1) AS DOUBLE) > 12.0) AS f_word_len
  FROM m
),
v AS (
  SELECT *, NOT (f_short OR f_stopword OR f_repetition OR f_symbol
                 OR f_word_len) AS kept
  FROM fl
),
s AS (
  SELECT count(*) AS n_docs,
    sum(CAST(f_short AS INT)) AS ns, sum(CAST(f_stopword AS INT)) AS nw,
    sum(CAST(f_repetition AS INT)) AS nr, sum(CAST(f_symbol AS INT)) AS ny,
    sum(CAST(f_word_len AS INT)) AS nl,
    sum(CAST(NOT kept AS INT)) AS nd, sum(CAST(kept AS INT)) AS nk
  FROM v
)
SELECT 'short' AS rule, CAST(ns AS BIGINT) AS n,
       round(ns / CAST(n_docs AS DOUBLE), 6) AS pct FROM s
UNION ALL SELECT 'stopword', CAST(nw AS BIGINT),
       round(nw / CAST(n_docs AS DOUBLE), 6) FROM s
UNION ALL SELECT 'repetition', CAST(nr AS BIGINT),
       round(nr / CAST(n_docs AS DOUBLE), 6) FROM s
UNION ALL SELECT 'symbol', CAST(ny AS BIGINT),
       round(ny / CAST(n_docs AS DOUBLE), 6) FROM s
UNION ALL SELECT 'word_len', CAST(nl AS BIGINT),
       round(nl / CAST(n_docs AS DOUBLE), 6) FROM s
UNION ALL SELECT 'dropped', CAST(nd AS BIGINT),
       round(nd / CAST(n_docs AS DOUBLE), 6) FROM s
UNION ALL SELECT 'kept', CAST(nk AS BIGINT),
       round(nk / CAST(n_docs AS DOUBLE), 6) FROM s
""".replace("__QFRFX__", _QFR_FX_DUCK)


# --- L56: corpus-level duplicated-chunk removal (C4-style) --------------------
# C4's famous cleanup ("discard all but one of any three-sentence span
# occurring more than once in the corpus"), re-expressed over
# non-overlapping 8-token chunks from the L42 chunker: every chunk whose
# exact text occurs elsewhere in the corpus is dropped EXCEPT the first
# occurrence in (doc_id, token_offset) order. Shape: narrow chunk map →
# ONE md5(chunk)-keyed window (row_number — first occurrence survives;
# no count needed, rn > 1 ⇔ duplicated-and-not-first) → per-doc hash
# agg. Two shuffles, zero joins; the chunk-hash partition skew is
# bounded by the most-duplicated span's occurrence count.
_CHUNK_DEDUP_K = 8


def _q_chunk_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from .llm import text as llm_text

    register_views(spark, sf_dir, ("documents",))
    chunks = llm_text.chunk_documents(
        spark.table("documents"),
        chunk_tokens=_CHUNK_DEDUP_K,
        overlap_tokens=0,
    )
    w = Window.partitionBy(F.md5(F.col("chunk_text"))).orderBy(
        "doc_id", "token_offset"
    )
    flagged = chunks.withColumn("_rn", F.row_number().over(w))
    return flagged.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_chunks"),
        F.sum((F.col("_rn") > 1).cast("int")).cast("long").alias("n_dropped"),
        F.sum(
            F.when(F.col("_rn") > 1, 0).otherwise(F.col("n_tokens"))
        ).cast("long").alias("tokens_kept"),
    )


ORACLE["chunk_dedup_stats"] = f"""
WITH base AS (
  SELECT doc_id, regexp_split_to_array(text, '\\s+') AS toks FROM documents
),
grid AS (
  SELECT doc_id, CAST(unnest(range(0, len(toks), {_CHUNK_DEDUP_K})) AS BIGINT) AS off, toks
  FROM base
),
ch AS (
  SELECT doc_id, off,
         list_slice(toks, off + 1, off + {_CHUNK_DEDUP_K}) AS sl
  FROM grid
),
ranked AS (
  SELECT doc_id, len(sl) AS n_tokens,
         row_number() OVER (PARTITION BY md5(array_to_string(sl, ' '))
                            ORDER BY doc_id, off) AS rn
  FROM ch
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(count(*) FILTER (rn > 1) AS BIGINT) AS n_dropped,
       CAST(sum(CASE WHEN rn > 1 THEN 0 ELSE n_tokens END) AS BIGINT) AS tokens_kept
FROM ranked GROUP BY doc_id
"""

# --- per-source document cap -------------------------------------------------
# The standard pretraining curation op the registry lacked: cap the number
# of documents any one source (domain) contributes, choosing a
# deterministic uniform subset via an md5 priority (reproducible across
# runs and engines, unlike rand()). One window shuffle on `source`;
# Spark's WindowGroupLimit optimizer pushes the rank<=N cap to a partial
# (per-partition) limit BEFORE the exchange, so a hot source ships at most
# N rows per map partition — the skew-safe top-N shape at 100 TB
# (plan-pinned in tests/test_plan_quality.py).
_SOURCE_CAP = 8
SPARK_SQL["source_cap_sample"] = f"""
SELECT doc_id, source, CAST(rk AS BIGINT) AS samp_rank FROM (
  SELECT doc_id, source,
         row_number() OVER (
           PARTITION BY source
           ORDER BY md5(CAST(doc_id AS STRING)), doc_id) AS rk
  FROM documents
) WHERE rk <= {_SOURCE_CAP}
"""
ORACLE["source_cap_sample"] = f"""
SELECT doc_id, source, CAST(rk AS BIGINT) AS samp_rank FROM (
  SELECT doc_id, source,
         row_number() OVER (
           PARTITION BY source
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
  FROM documents
) t WHERE rk <= {_SOURCE_CAP}
"""

# --- scalar expression battery ----------------------------------------------
# The reference has no generic expression library (SURVEY.md §2.8); this
# pins a broad slab of the engine's scalar surface — math, string, date —
# to exact cross-engine parity.
SPARK_SQL["scalar_function_battery"] = """
SELECT event_id,
       round(ln(abs(value) + 1), 6) AS ln_v,
       round(sqrt(abs(value)), 6) AS sqrt_v,
       round(power(value, 2), 6) AS pow_v,
       CAST(floor(value) AS BIGINT) AS floor_v,
       CAST(ceil(value) AS BIGINT) AS ceil_v,
       upper(event_type) AS upper_t,
       substr(event_type, 1, 3) AS sub_t,
       CAST(length(event_type) AS BIGINT) AS len_t,
       concat(event_type, ':', CAST(user_id AS STRING)) AS tagged,
       lpad(CAST(user_id AS STRING), 6, '0') AS padded,
       replace(event_type, 'e', '_') AS replaced,
       CAST(year(ts) AS BIGINT) AS y,
       CAST(month(ts) AS BIGINT) AS m,
       CAST(dayofweek(ts) AS BIGINT) AS dow
FROM events
"""
ORACLE["scalar_function_battery"] = """
SELECT event_id,
       round(ln(abs(value) + 1), 6) AS ln_v,
       round(sqrt(abs(value)), 6) AS sqrt_v,
       round(power(value, 2), 6) AS pow_v,
       CAST(floor(value) AS BIGINT) AS floor_v,
       CAST(ceil(value) AS BIGINT) AS ceil_v,
       upper(event_type) AS upper_t,
       substr(event_type, 1, 3) AS sub_t,
       CAST(length(event_type) AS BIGINT) AS len_t,
       concat(event_type, ':', CAST(user_id AS VARCHAR)) AS tagged,
       lpad(CAST(user_id AS VARCHAR), 6, '0') AS padded,
       replace(event_type, 'e', '_') AS replaced,
       CAST(year(ts) AS BIGINT) AS y,
       CAST(month(ts) AS BIGINT) AS m,
       CAST(dayofweek(ts) + 1 AS BIGINT) AS dow
FROM events
"""

# --- KMV distinct-count sketch ----------------------------------------------
# k-minimum-values estimator: distinct ≈ (k−1)·2^60 / kth-smallest hash.
# KMV over md5 is DETERMINISTIC and engine-portable, so the approximate
# answer itself is oracle-checkable — the shuffle carries k values per
# group instead of the distinct set. (hll_distinct_sketch below is the
# 1-byte-per-register alternative, made portable the same way.)
_KMV_K = 64
SPARK_SQL["kmv_distinct_sketch"] = f"""
WITH h AS (
  SELECT DISTINCT event_type,
         CAST(conv(substr(md5(CAST(user_id AS STRING)), 1, 15), 16, 10) AS BIGINT) AS hv
  FROM events
),
ranked AS (
  SELECT event_type, hv,
         row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n_exact
  FROM h
)
SELECT event_type,
       CAST(CASE WHEN n_exact < {_KMV_K} THEN n_exact
                 ELSE round(({_KMV_K} - 1) * 1152921504606846976.0 / hv)
            END AS BIGINT) AS estimated_distinct,
       CAST(n_exact AS BIGINT) AS exact_distinct
FROM ranked WHERE rn = least(n_exact, {_KMV_K})
"""
ORACLE["kmv_distinct_sketch"] = f"""
WITH h AS (
  SELECT DISTINCT event_type,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS hv
  FROM events
),
ranked AS (
  SELECT event_type, hv,
         row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n_exact
  FROM h
)
SELECT event_type,
       CAST(CASE WHEN n_exact < {_KMV_K} THEN n_exact
                 ELSE round(({_KMV_K} - 1) * 1152921504606846976.0 / hv)
            END AS BIGINT) AS estimated_distinct,
       CAST(n_exact AS BIGINT) AS exact_distinct
FROM ranked WHERE rn = least(n_exact, {_KMV_K})
"""

# --- Count-min sketch heavy hitters ------------------------------------------
# Deterministic CMS (depth 4 × width 256): the 4 per-row hashes are disjoint
# 8-hex (32-bit) slices of ONE md5 per distinct term, so the sketch is
# bit-identical in both engines. Scale shape: the only corpus-sized stage is
# the word count (map-side-combined groupBy); sketch build + point queries
# run over the tiny distinct-term relation (cells = sum(cnt) per bucket;
# estimate = min over the 4 bucket counts, CMS guarantee est >= exact).
_CMS_W = 256
_CMS_SPARK_COUNTS = """
  SELECT term, count(*) AS cnt
  FROM (SELECT explode(split(lower(text), ' ')) AS term FROM documents)
  WHERE term <> '' GROUP BY term
"""
_CMS_DUCK_COUNTS = """
  SELECT term, count(*) AS cnt
  FROM (SELECT unnest(string_split(lower(text), ' ')) AS term FROM documents)
  WHERE term <> '' GROUP BY term
"""
# Single-reference CTE chain (Spark inlines WITH, so every extra reference
# re-runs the whole subtree from the scan — the naive 4-way UNION + self-join
# form cost 8 scans / 17 exchanges): the 4 sketch rows come from ONE explode
# over the counts relation, the cell totals ride a sum() window over (r, b)
# instead of a join back, and the final min-over-rows is a plain groupBy.
_CMS_SPARK_BUCKET = (
    f"CAST(conv(substr(md5(term), 1 + 8 * r, 8), 16, 10) AS BIGINT) % {_CMS_W}"
)
_CMS_DUCK_BUCKET = f"('0x' || substr(md5(term), 1 + 8 * r, 8))::BIGINT % {_CMS_W}"


def _cms_sql(counts_cte: str, rows_expr: str, bucket_expr: str) -> str:
    return f"""
WITH counts AS ({counts_cte}),
hb AS (
  SELECT term, cnt, r, {bucket_expr} AS b
  FROM (SELECT term, cnt, {rows_expr} AS r FROM counts)
),
withcell AS (
  SELECT term, cnt, sum(cnt) OVER (PARTITION BY r, b) AS c FROM hb
),
est AS (
  SELECT term, min(c) AS est, min(cnt) AS exact FROM withcell GROUP BY term
)
SELECT term, CAST(est AS BIGINT) AS cms_count, CAST(exact AS BIGINT) AS exact_count
FROM est ORDER BY cms_count DESC, term LIMIT 20
"""


SPARK_SQL["cms_heavy_hitters"] = _cms_sql(
    _CMS_SPARK_COUNTS, "explode(sequence(0, 3))", _CMS_SPARK_BUCKET
)
ORACLE["cms_heavy_hitters"] = _cms_sql(
    _CMS_DUCK_COUNTS, "unnest(generate_series(0, 3))", _CMS_DUCK_BUCKET
)

# --- HyperLogLog distinct-count sketch ---------------------------------------
# Completes the sketch family (KMV = k values/group, CMS = frequency): HLL
# (Flajolet et al. 2007) carries ONE byte per register per group. The usual
# objection to oracle-checking HLL — engine-specific registers — is removed
# by deriving both the register index and the rank from disjoint 32-bit
# slices of the SAME md5, with the rank computed EXACTLY via the binary
# string length (``33 - length(bin(w))``: no float log anywhere near the
# registers). The 2^-rank indicator sum is exact in IEEE doubles (64 terms,
# each a power of two within a 41-bit exponent window), so the estimate is
# bit-identical in both engines. Scale shape: the only corpus-sized stage is
# the (group, register) max — map-side-combined; everything after runs on
# ≤ m rows per group.
_HLL_M = 64  # registers; alpha_64 = 0.709 (Flajolet et al., fig. 3)


def _hll_sql(slice1: str, slice2: str) -> str:
    return f"""
WITH h AS (
  SELECT event_type, {slice1} AS idx_src, {slice2} AS w
  FROM events
),
regs AS (
  SELECT event_type, idx_src % {_HLL_M} AS idx,
         max(CASE WHEN w = 0 THEN 33 ELSE 33 - length(bin(w)) END) AS r
  FROM h GROUP BY event_type, idx_src % {_HLL_M}
),
sums AS (
  SELECT event_type,
         sum(pow(2.0, -r)) + ({_HLL_M} - count(*)) AS s,
         {_HLL_M} - count(*) AS v
  FROM regs GROUP BY event_type
),
est AS (
  SELECT event_type,
         CASE WHEN 0.709 * {_HLL_M * _HLL_M} / s <= {2.5 * _HLL_M} AND v > 0
              THEN {_HLL_M} * ln({float(_HLL_M)} / v)
              ELSE 0.709 * {_HLL_M * _HLL_M} / s END AS e,
         v
  FROM sums
),
exact AS (
  SELECT event_type, count(DISTINCT event_id) AS n FROM events GROUP BY event_type
)
SELECT est.event_type,
       CAST(round(est.e) AS BIGINT) AS hll_distinct,
       CAST(est.v AS BIGINT) AS empty_registers,
       CAST(exact.n AS BIGINT) AS exact_distinct
FROM est JOIN exact ON est.event_type = exact.event_type
"""


SPARK_SQL["hll_distinct_sketch"] = _hll_sql(
    "CAST(conv(substr(md5(CAST(event_id AS STRING)), 1, 8), 16, 10) AS BIGINT)",
    "CAST(conv(substr(md5(CAST(event_id AS STRING)), 9, 8), 16, 10) AS BIGINT)",
)
ORACLE["hll_distinct_sketch"] = _hll_sql(
    "('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))::BIGINT",
    "('0x' || substr(md5(CAST(event_id AS VARCHAR)), 9, 8))::BIGINT",
)

# --- Temperature-weighted domain mixture -------------------------------------
# The multilingual-LM sampling scheme (mBERT / T5: p_d^alpha re-weighting,
# alpha = 0.7): domain shares are raised to alpha and renormalized, boosting
# low-resource domains; each domain then gets a deterministic md5-gated
# sample at rate min(1, target_total * share_d / n_d). Complements the
# fixed-rate `training_mix_sample` (rates as config) — here the rates are
# DERIVED from the corpus itself in the same query. Scale shape: the counts
# aggregate is map-side-combined to O(domains) rows; the rates relation is
# tiny → broadcast join back; the gate is a narrow per-row map. One corpus
# scan for counts + one for the gated join — no corpus-sized shuffle.
_MIX_ALPHA = 0.7
_MIX_TARGET = 0.5  # target corpus size as a fraction of the input


def _temperature_mix_sql(gate_expr: str) -> str:
    return f"""
WITH counts AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
shares AS (
  SELECT lang, n,
         pow(CAST(n AS DOUBLE), {_MIX_ALPHA}) / sum(pow(CAST(n AS DOUBLE), {_MIX_ALPHA})) OVER () AS share,
         sum(n) OVER () AS total
  FROM counts
),
rates AS (
  SELECT lang, least(1.0, {_MIX_TARGET} * total * share / n) AS rate FROM shares
),
gated AS (
  SELECT doc_id, lang, {gate_expr} % 1000000 AS gate FROM documents
)
SELECT g.doc_id, g.lang, round(rates.rate, 6) AS sample_rate
FROM gated g JOIN rates ON g.lang = rates.lang
WHERE g.gate < CAST(floor(rates.rate * 1000000) AS BIGINT)
"""


SPARK_SQL["temperature_mix_sample"] = _temperature_mix_sql(
    "CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 15), 16, 10) AS BIGINT)"
)
ORACLE["temperature_mix_sample"] = _temperature_mix_sql(
    "('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT"
)

# --- Exact-substring duplicate-span coverage ---------------------------------
# The distributed analog of suffix-array substring dedup (Lee et al. 2022,
# "Deduplicating Training Data Makes Language Models Better"): token 8-gram
# rolling fingerprints, a gram is "duplicated" when it appears in >= 2
# distinct docs; per-doc coverage = duplicated gram positions / positions.
# Scale shape: gram explode is a narrow map emitting one 15-hex md5 key per
# token position; the duplicate set comes from one map-side-combined groupBy
# on that key; no all-pairs comparison anywhere. At 100 TB the gram->count
# shuffle is the standard substring-dedup cost; everything after runs on the
# (much smaller) duplicated-gram relation.
_SPAN_K = 8


def _span_sql(split_fn: str, slice_expr: str, pos_src: str, size_fn: str) -> str:
    # Single-reference chain (no join back to the corpus): gram rows carry
    # the doc's token count n, collapse to one row per (gram, doc) with the
    # position count, a count() window over gram gives the distinct-doc
    # frequency without re-evaluating the explode, and the per-doc rollup is
    # one groupBy. Every doc with n >= K has >= 1 gram, so no docs are lost.
    return f"""
WITH toks AS (
  SELECT doc_id, {split_fn}(text, ' ') AS w FROM documents
),
sized AS (SELECT doc_id, w, {size_fn} AS n FROM toks WHERE {size_fn} >= {_SPAN_K}),
grams AS (
  SELECT doc_id, n, md5({slice_expr}) AS g
  FROM ({pos_src}) p
),
gcount AS (
  SELECT g, doc_id, min(n) AS n, count(*) AS n_pos FROM grams GROUP BY g, doc_id
),
gdup AS (
  SELECT doc_id, n, n_pos, count(*) OVER (PARTITION BY g) AS n_docs FROM gcount
)
SELECT doc_id,
       CAST(min(n) - {_SPAN_K - 1} AS BIGINT) AS total_grams,
       CAST(sum(CASE WHEN n_docs >= 2 THEN n_pos ELSE 0 END) AS BIGINT) AS dup_grams,
       round(sum(CASE WHEN n_docs >= 2 THEN n_pos ELSE 0 END)
             / CAST(min(n) - {_SPAN_K - 1} AS DOUBLE), 6) AS dup_ratio
FROM gdup GROUP BY doc_id
"""


SPARK_SQL["dup_span_coverage"] = _span_sql(
    split_fn="split",
    slice_expr=f"concat_ws(' ', slice(w, i, {_SPAN_K}))",
    pos_src=f"SELECT doc_id, n, w, explode(sequence(1, n - {_SPAN_K - 1})) AS i FROM sized",
    size_fn="size(w)",
)
ORACLE["dup_span_coverage"] = _span_sql(
    split_fn="string_split",
    slice_expr=f"array_to_string(w[i:i + {_SPAN_K - 1}], ' ')",
    pos_src=f"SELECT doc_id, n, w, unnest(generate_series(1, n - {_SPAN_K - 1})) AS i FROM sized",
    size_fn="len(w)",
)

# --- Training-sequence packing -----------------------------------------------
# Greedy sequential packing of documents into fixed-token-budget training
# sequences (GPT-style sequence packing). A global greedy pack would need a
# corpus-wide ordered cumulative sum — one reducer; instead docs are salted
# into shards and packed within each shard (the standard distributed form:
# packing quality is per-shard greedy, parallelism is O(shards)). The window
# is a per-shard running sum — deterministic (ordered by doc_id), no UDF,
# identical in both engines.
_PACK_BUDGET = 512
_PACK_SHARDS = 64


def _pack_sql(tokens_expr: str) -> str:
    return f"""
WITH sized AS (
  SELECT doc_id, doc_id % {_PACK_SHARDS} AS shard, {tokens_expr} AS n_tokens
  FROM documents
),
cum AS (
  SELECT doc_id, shard, n_tokens,
         sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum_tokens
  FROM sized
)
SELECT doc_id,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       -- shard lives in the top bits (2^40 multiplier): a shard would need
       -- >1T sequences (~0.5 PB of tokens) before colliding with the next
       CAST(shard * 1099511627776 + floor((cum_tokens - n_tokens) / {_PACK_BUDGET})
            AS BIGINT) AS sequence_id,
       CAST(cum_tokens - n_tokens
            - floor((cum_tokens - n_tokens) / {_PACK_BUDGET}) * {_PACK_BUDGET}
            AS BIGINT) AS offset_in_sequence
FROM cum
"""


SPARK_SQL["sequence_packing"] = _pack_sql("size(split(text, ' '))")
ORACLE["sequence_packing"] = _pack_sql("len(string_split(text, ' '))")

# --- L52: deterministic BPE token counting -----------------------------------
# Greedy lowest-rank byte-pair merging over a LITERAL merge table (the
# public Sennrich/GPT-2 algorithm), compiled to a chain of replace()
# expressions that BOTH engines run verbatim — whole-stage codegen on the
# Spark side, a bit-identical replay on the DuckDB side (llm/bpe.py has
# the well-formedness argument for why the chain equals the classic
# iterative loop, and the Arrow-batched broadcast-table path for real
# 50k-merge vocabularies). bpe_sequence_packing re-denominates the L33
# packer in BPE tokens: same shard-salted running-sum plan, different
# token measure.
from .llm.bpe import bpe_count_expr as _bpe_expr  # noqa: E402


def _q_bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L52 through the library function (llm/bpe.py bpe_token_counts):
    one Project over the pruned (doc_id, text) scan — no shuffle, no
    Python."""
    from .llm import bpe as llm_bpe

    register_views(spark, sf_dir, ("documents",))
    return llm_bpe.bpe_token_counts(spark.table("documents"))


ORACLE["bpe_token_counts"] = f"""
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
       CAST({_bpe_expr("text", dialect="duckdb")} AS BIGINT) AS bpe_tokens
FROM documents
"""

SPARK_SQL["bpe_sequence_packing"] = _pack_sql(_bpe_expr("text", dialect="spark"))
ORACLE["bpe_sequence_packing"] = _pack_sql(_bpe_expr("text", dialect="duckdb"))


# --- L59: BPE tokenizer TRAINING ----------------------------------------------
# Learning the merge table FROM the corpus (Sennrich et al. 2016 §3.2):
# vocab with word frequencies, then n iterations of take-the-most-
# frequent-adjacent-pair (ties on pair ascending) and merge-everywhere.
# Training runs over the DISTINCT-WORD vocabulary, corpus-size-
# independent after the pre-token count (Heaps' law); each iteration is
# one vocab-sized pair-count shuffle + an O(1) argmax collect. The
# DuckDB oracle replays EVERY iteration: the learned pair is a computed
# VALUE, so each step's replace uses the previous step's argmax row via
# a cross join — no literals, fully data-driven, which makes this the
# registry's only oracle that replays a LEARNING loop end-to-end.
_BPE_TRAIN_MERGES = 8


def _q_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .llm import bpe as llm_bpe

    register_views(spark, sf_dir, ("documents",))
    merges = llm_bpe.bpe_train(
        spark.table("documents"), n_merges=_BPE_TRAIN_MERGES
    )
    return spark.createDataFrame(
        merges, "merge_rank long, merge_left string, merge_right string, pair_count long"
    )


def _bpe_train_oracle(n_merges: int) -> str:
    ctes = [f"""
vocab AS (
  SELECT w, count(*) AS freq FROM (
    SELECT unnest(regexp_extract_all(lower(text), '[a-z]+|[0-9]+', 0)) AS w
    FROM documents) GROUP BY w
),
st0 AS (SELECT regexp_replace(w, '(.)', ',\\1,', 'g') AS s, freq FROM vocab)"""]
    for i in range(n_merges):
        ctes.append(f"""
p{i} AS (
  SELECT t[i] AS a, t[i + 1] AS b, sum(freq) AS c
  FROM (SELECT string_split(trim(s, ','), ',,') AS t, freq FROM st{i}),
       unnest(range(1, len(t))) AS u(i)
  WHERE len(t) >= 2
  GROUP BY t[i], t[i + 1]
),
b{i} AS (SELECT a, b, c FROM p{i} ORDER BY c DESC, a, b LIMIT 1),
st{i + 1} AS (
  SELECT replace(s, ',' || b.a || ',,' || b.b || ',',
                 ',' || b.a || b.b || ',') AS s, freq
  FROM st{i} CROSS JOIN b{i} b
)""")
    selects = " UNION ALL ".join(
        f"SELECT CAST({i} AS BIGINT) AS merge_rank, a AS merge_left, "
        f"b AS merge_right, CAST(c AS BIGINT) AS pair_count FROM b{i}"
        for i in range(n_merges)
    )
    return "WITH " + ",".join(ctes) + f"\n{selects}"


ORACLE["bpe_train_merges"] = _bpe_train_oracle(_BPE_TRAIN_MERGES)


# --- L60: trained-vocabulary BPE encoding (the Arrow production path) --------
# The path a real pipeline runs: the COMMITTED 1024-merge vocabulary
# (llm/bpe_vocab_1024.json, trained from the sf0.1 corpus by bpe_train —
# reproducible, deterministic tie-breaks) drives bpe_token_counts_arrow,
# the mapInPandas classic-BPE encoder with the merge ranks broadcast.
# A 1024-merge table does not compile to a single SQL expression chain
# (both engines cap expression depth well below it), which is exactly
# why the Arrow path exists — so THIS query is its certificate. The
# oracle replays the full 1024-replace chain in DuckDB as 32-deep
# chunked CTE stages (DuckDB's binder caps expression recursion at 128)
# over the DISTINCT-word vocabulary, joined back per doc — valid because
# the trained table is well-formed (checked at oracle build; rank-ordered
# replace passes == classic min-rank loop, the property
# tests/test_llm_properties.py pins on the literal table).


def _q_bpe_trained_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .llm import bpe as llm_bpe

    register_views(spark, sf_dir, ("documents",))
    return llm_bpe.bpe_token_counts_arrow(
        spark.table("documents"), merges=llm_bpe.trained_merges()
    )


def _validated_trained_merges() -> list[tuple[str, str]]:
    import re as _re

    from .llm.bpe import trained_merges, well_formed

    merges = trained_merges()
    if not well_formed(merges):
        raise ValueError(
            "trained merge table is not well-formed: the replace-chain "
            "replay would diverge from the Arrow path's classic loop"
        )
    for a, b in merges:
        if not _re.fullmatch(r"[a-z0-9]+", a + b):
            raise ValueError(f"merge {(a, b)!r}: only [a-z0-9] supported")
    return merges


def _bpe_chain_stages(
    merges: list[tuple[str, str]], chunk: int
) -> tuple[list[str], str]:
    """Chunked replace-chain CTE stages over an ``s0(w, s)`` relation —
    ``chunk`` replaces per stage keeps each expression under DuckDB's
    128-deep binder recursion cap. Returns (ctes, final_stage_name)."""
    ctes = []
    n_stages = 0
    for start in range(0, len(merges), chunk):
        n_stages += 1
        expr = "s"
        for a, b in merges[start : start + chunk]:
            expr = f"replace({expr}, ',{a},,{b},', ',{a}{b},')"
        ctes.append(
            f"s{n_stages} AS (SELECT w, {expr} AS s FROM s{n_stages - 1})"
        )
    return ctes, f"s{n_stages}"


def _bpe_trained_oracle(chunk: int = 32) -> str:
    """Chunked-CTE replay of the trained replace chain over the distinct
    vocab (encode each distinct word once, join counts back per doc —
    the oracle-side analog of the Arrow path's per-word cache)."""
    merges = _validated_trained_merges()
    ctes = [
        r"""
base AS (
  SELECT doc_id,
         regexp_extract_all(lower(text), '[a-z]+|[0-9]+', 0) AS ws,
         coalesce(length(regexp_replace(lower(text),
                                        '[a-z0-9 \x00-\x1f]', '', 'g')),
                  0) AS p
  FROM documents
),
dw AS (SELECT DISTINCT unnest(ws) AS w FROM base),
s0 AS (SELECT w, regexp_replace(w, '(.)', ',\1,', 'g') AS s FROM dw)"""
    ]
    stages, last = _bpe_chain_stages(merges, chunk)
    ctes += stages
    ctes.append(
        f"""
enc AS (SELECT w, len(string_split(s, ',,')) AS n FROM {last}),
expl AS (SELECT doc_id, unnest(ws) AS w FROM base),
wc AS (SELECT e.doc_id, sum(enc.n) AS t
       FROM expl e JOIN enc USING (w) GROUP BY e.doc_id)"""
    )
    return (
        "WITH " + ",".join(ctes) + """
SELECT b.doc_id, CAST(coalesce(wc.t, 0) + b.p AS BIGINT) AS bpe_tokens
FROM base b LEFT JOIN wc ON b.doc_id = wc.doc_id
"""
    )


# --- L67: trained-vocabulary tokenization OUTPUT (the token stream) ----------
# Counts certify an aggregate; this certifies the STREAM a training
# pipeline actually ships — per doc, the md5 of the full token sequence
# (unit-separator-joined) plus its length, from bpe_tokenize_arrow with
# the committed 1024-merge table. The oracle rebuilds the same stream in
# DuckDB: ordered pre-tokens via the range-index unnest idiom, distinct
# letter/digit runs encoded once through the chunked replace chain,
# punctuation riding as itself, string_agg back in pre-token order.
# An aggregate-free certificate: any reordering, dropped token, or merge
# divergence anywhere in the stream flips the hash. The \x1f unit
# separator can never collide with a token: U+001F is a C0 control and
# the pre-tokenizer's explicit zero-token class [ \x00-\x1f] (ADVICE r9;
# llm/bpe.py module docstring) excludes all C0 controls from pre-tokens
# on every path, so the oracle's split-derived n_tokens is exact.


def _q_bpe_trained_tokenization(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from .llm import bpe as llm_bpe

    register_views(spark, sf_dir, ("documents",))
    out = llm_bpe.bpe_tokenize_arrow(
        spark.table("documents"), merges=llm_bpe.trained_merges()
    )
    return out.select(
        "doc_id",
        F.size("tokens").cast("long").alias("n_tokens"),
        F.md5(F.concat_ws("\x1f", "tokens")).alias("stream_md5"),
    )


def _bpe_tokenization_oracle(chunk: int = 32) -> str:
    merges = _validated_trained_merges()
    ctes = [
        r"""
base AS (
  SELECT doc_id,
         regexp_extract_all(lower(text),
                            '[a-z]+|[0-9]+|[^a-z0-9 \x00-\x1f]', 0) AS arr
  FROM documents
),
toks AS (SELECT doc_id, arr[i] AS g, i
         FROM base, unnest(range(1, len(arr) + 1)) AS u(i)),
dw AS (SELECT DISTINCT g AS w FROM toks
       WHERE regexp_matches(g, '^[a-z0-9]')),
s0 AS (SELECT w, regexp_replace(w, '(.)', ',\1,', 'g') AS s FROM dw)"""
    ]
    stages, last = _bpe_chain_stages(merges, chunk)
    ctes += stages
    ctes.append(
        f"""
enc AS (SELECT w, replace(trim(s, ','), ',,', chr(31)) AS piece FROM {last}),
mapped AS (SELECT t.doc_id, t.i, coalesce(e.piece, t.g) AS piece
           FROM toks t LEFT JOIN enc e ON t.g = e.w),
stream AS (SELECT doc_id, string_agg(piece, chr(31) ORDER BY i) AS sstr
           FROM mapped GROUP BY doc_id)"""
    )
    return (
        "WITH " + ",".join(ctes) + """
SELECT b.doc_id,
       CAST(CASE WHEN coalesce(s.sstr, '') = '' THEN 0
                 ELSE len(string_split(s.sstr, chr(31))) END AS BIGINT)
         AS n_tokens,
       md5(coalesce(s.sstr, '')) AS stream_md5
FROM base b LEFT JOIN stream s ON b.doc_id = s.doc_id
"""
    )


def _trained_oracles() -> dict[str, str]:
    """Oracles derived from the committed trained-vocabulary artifact —
    built lazily (oracle_sql(), not import) and memoized, so importing
    this module does no file I/O."""
    cached = getattr(_trained_oracles, "_cache", None)
    if cached is None:
        cached = {
            "bpe_trained_token_counts": _bpe_trained_oracle(),
            "bpe_trained_tokenization": _bpe_tokenization_oracle(),
        }
        _trained_oracles._cache = cached
    return dict(cached)


# --- LLM-pipeline: text analysis --------------------------------------------
SPARK_SQL["doc_fingerprint"] = """
SELECT doc_id, md5(regexp_replace(lower(text), '[^a-z ]', '')) AS fingerprint
FROM documents
"""
# NOTE: DuckDB regexp_replace needs the 'g' flag (replace-all); Spark's
# replaces all matches by default.
ORACLE["doc_fingerprint"] = """
SELECT doc_id, md5(regexp_replace(lower(text), '[^a-z ]', '', 'g')) AS fingerprint
FROM documents
"""

SPARK_SQL["dedup_exact"] = ORACLE["dedup_exact"] = """
SELECT md5(text) AS fingerprint, CAST(count(*) AS BIGINT) AS n_copies,
       min(doc_id) AS keep_id
FROM documents GROUP BY md5(text)
"""

# One md5 per DISTINCT shingle; the 4 per-seed hashes are disjoint 8-hex
# slices of that digest (independent uniform bits — 4× cheaper than 4 md5s,
# identical in both engines).
_MINHASH_SPARK_SHINGLES = """
SELECT doc_id,
       transform(array_distinct(transform(sequence(1, greatest(length(text) - 4, 1)),
                                          i -> substr(text, i, 5))),
                 s -> md5(s)) AS hashes
FROM documents
"""
SPARK_SQL["minhash_signatures"] = f"""
SELECT doc_id,
       array_min(transform(hashes, h -> substr(h, 1, 8))) AS m0,
       array_min(transform(hashes, h -> substr(h, 9, 8))) AS m1,
       array_min(transform(hashes, h -> substr(h, 17, 8))) AS m2,
       array_min(transform(hashes, h -> substr(h, 25, 8))) AS m3
FROM ({_MINHASH_SPARK_SHINGLES})
"""
_MINHASH_DUCK_SHINGLES = """
SELECT doc_id,
       [md5(s) for s in list_distinct([substr(text, i, 5)
            for i in range(1, greatest(length(text) - 4, 1) + 1)])] AS hashes
FROM documents
"""
ORACLE["minhash_signatures"] = f"""
SELECT doc_id,
       list_min([substr(h, 1, 8) for h in hashes]) AS m0,
       list_min([substr(h, 9, 8) for h in hashes]) AS m1,
       list_min([substr(h, 17, 8) for h in hashes]) AS m2,
       list_min([substr(h, 25, 8) for h in hashes]) AS m3
FROM ({_MINHASH_DUCK_SHINGLES})
"""

SPARK_SQL["minhash_lsh_buckets"] = f"""
WITH sig AS ({SPARK_SQL["minhash_signatures"]})
SELECT m0, m1, CAST(count(*) AS BIGINT) AS n_docs, min(doc_id) AS keep_id
FROM sig GROUP BY m0, m1 HAVING count(*) > 1
"""
ORACLE["minhash_lsh_buckets"] = f"""
WITH sig AS ({ORACLE["minhash_signatures"]})
SELECT m0, m1, CAST(count(*) AS BIGINT) AS n_docs, min(doc_id) AS keep_id
FROM sig GROUP BY m0, m1 HAVING count(*) > 1
"""

# Family-wide LSH bucket cap (star+chain in the pair queries, core-only
# here); rationale at its original definition site below.
_JACCARD_MAX_BUCKET = 8

# --- MinHash Jaccard ESTIMATOR over candidate pairs -------------------------
# The classic signature-space estimate (Broder '97): est = matching
# signature components / num_hashes. At petabyte scale the exact-verify
# join (ngram_jaccard) re-reads the corpus text; thresholding the
# estimate instead costs only the tiny signature relation — candidates
# already carry their components, so the estimate is a pure projection
# on the bucket join's output, no extra scan, no shuffle beyond the
# candidate join itself. Bucket-mates share (m0, m1) by construction,
# so est >= 0.5 within this 1-band candidate set — exactly the subset a
# production near-dup pass scores. Buckets are CAPPED at the family's
# max (rank-by-id, core members only): pair output is quadratic in
# bucket size and boilerplate clusters make hot buckets — the registry
# default must survive its own growth curve (the r5 rule; the uncapped
# estimate is what ngram_jaccard_uncapped already cross-checks).
_MINHASH_EST_BODY = f"""
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       round(CAST(2
              + (CASE WHEN a.m2 = b.m2 THEN 1 ELSE 0 END)
              + (CASE WHEN a.m3 = b.m3 THEN 1 ELSE 0 END) AS DOUBLE) / 4.0,
             6) AS est_jaccard
FROM ranked a JOIN ranked b
  ON a.m0 = b.m0 AND a.m1 = b.m1 AND a.doc_id < b.doc_id
 AND a.rk <= {_JACCARD_MAX_BUCKET} AND b.rk <= {_JACCARD_MAX_BUCKET}
"""
_MINHASH_EST_RANKED = """,
ranked AS (
  SELECT doc_id, m0, m1, m2, m3,
         row_number() OVER (PARTITION BY m0, m1 ORDER BY doc_id) AS rk
  FROM sig
)
"""
ORACLE["minhash_jaccard_estimate"] = (
    f"WITH sig AS ({ORACLE['minhash_signatures']})"
    + _MINHASH_EST_RANKED
    + _MINHASH_EST_BODY
)

# one-slot per-session cache of the ranked signature relation, lifecycle
# as _JACCARD_PERSIST: the pure-SQL form's inlined CTE ran the whole
# md5-signature pipeline ONCE PER JOIN SIDE (2 parquet scans, zero
# ReusedExchange under the broadcast join — measured 5.0 s at sf0.1);
# persisting the tiny ranked relation (id + 4 hex strings + rank per
# doc) makes the self-join two in-memory scans (measured 1.3 s).
_EST_PERSIST: dict[str, DataFrame] = {}


def _q_minhash_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    register_views(spark, sf_dir, ("documents",))
    app_id = spark.sparkContext.applicationId
    prev = _EST_PERSIST.pop(app_id, None)
    if prev is not None:
        prev.unpersist()
    ranked = spark.sql(
        f"WITH sig AS ({SPARK_SQL['minhash_signatures']})"
        + _MINHASH_EST_RANKED
        + "SELECT * FROM ranked"
    ).persist()
    _EST_PERSIST[app_id] = ranked
    a, b = ranked.alias("a"), ranked.alias("b")
    cap = F.lit(_JACCARD_MAX_BUCKET)
    return (
        a.join(
            b,
            (F.col("a.m0") == F.col("b.m0"))
            & (F.col("a.m1") == F.col("b.m1"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (F.col("a.rk") <= cap)
            & (F.col("b.rk") <= cap),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.round(
                (
                    F.lit(2)
                    + (F.col("a.m2") == F.col("b.m2")).cast("int")
                    + (F.col("a.m3") == F.col("b.m3")).cast("int")
                ).cast("double")
                / 4.0,
                6,
            ).alias("est_jaccard"),
        )
    )


# --- L74: b-bit MinHash estimator (Li & König 2010) --------------------------
# Signature compression for the 100 TB tier: keep only the low b=8 bits
# of each minhash component and correct the estimate for chance
# collisions — Ĵ_b = (frac_match − C)/(1 − C) with C = 2^-b. The
# signature relation shrinks 4× here (8× with the 64-bit production
# hashes), which is what makes an all-corpus standing signature store
# affordable; the price is variance, not bias, and this certificate
# emits BOTH estimators per candidate pair so the driver hash pins the
# correction math against the full-width estimate on identical pairs.
# Float portability: frac is x/4 (exact), C = 1/256 and 1−C = 255/256
# are binary-exact doubles, so both engines perform the same single
# IEEE division — no rounding-tie hazard.
_BBIT_EST_BODY = f"""
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       round(CAST(2
              + (CASE WHEN a.m2 = b.m2 THEN 1 ELSE 0 END)
              + (CASE WHEN a.m3 = b.m3 THEN 1 ELSE 0 END) AS DOUBLE) / 4.0,
             6) AS est_full_jaccard,
       round(((CAST(2
               + (CASE WHEN substr(a.m2, 7, 2) = substr(b.m2, 7, 2)
                       THEN 1 ELSE 0 END)
               + (CASE WHEN substr(a.m3, 7, 2) = substr(b.m3, 7, 2)
                       THEN 1 ELSE 0 END) AS DOUBLE) / 4.0)
              - 1.0 / 256) / (1 - 1.0 / 256),
             6) AS est_bbit_jaccard
FROM ranked a JOIN ranked b
  ON a.m0 = b.m0 AND a.m1 = b.m1 AND a.doc_id < b.doc_id
 AND a.rk <= {_JACCARD_MAX_BUCKET} AND b.rk <= {_JACCARD_MAX_BUCKET}
"""

ORACLE["bbit_minhash_estimate"] = (
    f"WITH sig AS ({ORACLE['minhash_signatures']})"
    + _MINHASH_EST_RANKED
    + _BBIT_EST_BODY
)

# same persist rationale as _EST_PERSIST (the inlined CTE would run the
# signature pipeline once per join side); own slot so the two estimator
# queries never unpersist each other's relation mid-plan
_BBIT_PERSIST: dict[str, DataFrame] = {}


def _q_bbit_minhash_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("documents",))
    app_id = spark.sparkContext.applicationId
    prev = _BBIT_PERSIST.pop(app_id, None)
    if prev is not None:
        prev.unpersist()
    ranked = spark.sql(
        f"WITH sig AS ({SPARK_SQL['minhash_signatures']})"
        + _MINHASH_EST_RANKED
        + "SELECT * FROM ranked"
    ).persist()
    _BBIT_PERSIST[app_id] = ranked
    ranked.createOrReplaceTempView("ranked")
    return spark.sql(_BBIT_EST_BODY)


# --- deterministic train/val/test split -------------------------------------
# The standard dataset-split op, hash-gated so it is (a) deterministic
# across re-runs and engines, (b) join-free and executor-local (a narrow
# map — no global sort, no row_number over the corpus), and (c) STABLE
# UNDER CORPUS GROWTH: a document's split label depends only on its own
# id, so adding new documents never reassigns existing ones — the
# property that keeps eval sets honest as a 100 TB corpus accretes
# (row_number()/ntile splits reshuffle everything on every ingest).
# 80/10/10 on md5(doc_id) mod 1000.
SPARK_SQL["dataset_split"] = """
SELECT doc_id, lang,
       CASE WHEN gate < 800 THEN 'train'
            WHEN gate < 900 THEN 'val'
            ELSE 'test' END AS split
FROM (
  SELECT doc_id, lang,
         CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 15), 16, 10) AS BIGINT) % 1000 AS gate
  FROM documents
)
"""
ORACLE["dataset_split"] = """
SELECT doc_id, lang,
       CASE WHEN gate < 800 THEN 'train'
            WHEN gate < 900 THEN 'val'
            ELSE 'test' END AS split
FROM (
  SELECT doc_id, lang,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 1000 AS gate
  FROM documents
)
"""

# --- n-gram Jaccard verification on LSH candidate pairs ---------------------
# Exact Jaccard computed ONLY within (m0, m1) buckets — candidate pruning
# keeps the self-join linear in bucket sizes, not O(n²), at 100 TB.
# DataFrame form (see _q_ngram_jaccard): the hash arrays are computed ONCE,
# persisted, and broadcast into both sides of the pair join — the pure-SQL
# form re-evaluated the signature CTE per self-join side (4 full md5
# passes) and shuffled ~3 KB shingle arrays per pair. Jaccard is computed
# over the md5 hash arrays in BOTH engines (md5 is injective on 5-grams).
# Shingle identity = top 60 bits of md5 as a BIGINT: integer arrays make
# the per-pair intersection ~5× cheaper than 32-char string arrays, and
# |A ∪ B| = |A| + |B| − |A ∩ B| halves the set work. Band keys are the
# top-32/next-28 bit slices of the same hash (order-isomorphic to the hex
# prefixes used by minhash_signatures).
#
# The REGISTRY DEFAULT is the capped form (max_bucket=_JACCARD_MAX_BUCKET):
# pair OUTPUT is quadratic in bucket size, and the repo's own 1000×
# growth sweep (SCALE.md) measured the uncapped form spilling >80 GB of
# shuffle at the ×100 tier, so the form a user reaches for must be the
# one that survives its own growth curve. The star+chain cap is
# deterministic (rank by doc_id within each bucket), so the oracle
# replays it exactly; the uncapped form stays as the
# ``ngram_jaccard_uncapped`` cross-check. (Assigned earlier in the file
# — the estimator SQL interpolates it.)


def _jaccard_cand_duck(max_bucket: int | None) -> str:
    """Shared DuckDB CTE chain ``h → hn → sig → [ranked →] pairs`` for the
    shingle-hash/LSH pipeline, replaying ``lsh_candidate_pairs`` with or
    without the star+chain bucket cap. Reused by the pair query and the
    connected-components oracle so both engines see the same graph."""
    base = """
h AS (
  SELECT doc_id,
         [('0x' || substr(md5(s), 1, 15))::BIGINT
          for s in list_distinct([substr(text, i, 5)
               for i in range(1, greatest(length(text) - 4, 1) + 1)])] AS hashes
  FROM documents
),
hn AS (SELECT doc_id, hashes, len(hashes) AS n FROM h),
sig AS (
  SELECT doc_id,
         list_min([x >> 28 for x in hashes]) AS m0,
         list_min([x & 268435455 for x in hashes]) AS m1
  FROM h
)"""
    if max_bucket is None:
        return base + """,
pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM sig a JOIN sig b
    ON a.m0 = b.m0 AND a.m1 = b.m1 AND a.doc_id < b.doc_id
)"""
    # the capped replay: rank within each (m0, m1) bucket by doc_id; the
    # lowest-id max_bucket members pair all-against-all, every member past
    # the cap emits a star edge to the bucket canonical (min id) and a
    # chain edge to its rank-predecessor — identical to
    # llm.dedup.lsh_candidate_pairs(max_bucket=...)
    return base + f""",
ranked AS (
  SELECT doc_id, m0, m1,
         row_number() OVER w AS rk,
         first_value(doc_id) OVER w AS canon,
         lag(doc_id) OVER w AS prev
  FROM sig
  WINDOW w AS (PARTITION BY m0, m1 ORDER BY doc_id)
),
pairs AS (
  SELECT DISTINCT id_a, id_b FROM (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b
    FROM ranked a JOIN ranked b
      ON a.m0 = b.m0 AND a.m1 = b.m1 AND a.doc_id < b.doc_id
     AND a.rk <= {max_bucket} AND b.rk <= {max_bucket}
    UNION ALL
    SELECT canon, doc_id FROM ranked WHERE rk > {max_bucket}
    UNION ALL
    SELECT prev, doc_id FROM ranked WHERE rk > {max_bucket}
  )
)"""


_JACCARD_SELECT_DUCK = """
SELECT id_a, id_b,
       round(CAST(len(list_intersect(x.hashes, y.hashes)) AS DOUBLE)
             / (x.n + y.n - len(list_intersect(x.hashes, y.hashes))), 6) AS jaccard
FROM pairs JOIN hn x ON id_a = x.doc_id JOIN hn y ON id_b = y.doc_id
"""

ORACLE["ngram_jaccard_pairs"] = (
    "WITH " + _jaccard_cand_duck(_JACCARD_MAX_BUCKET) + _JACCARD_SELECT_DUCK
)
ORACLE["ngram_jaccard_uncapped"] = (
    "WITH " + _jaccard_cand_duck(None) + _JACCARD_SELECT_DUCK
)

# minhash_engine_parity: the md5 side's exact-dup pairs over the MIRRORED
# corpus (equal sorted-set fingerprints) with both engine flags literally
# true — the Spark side's xxhash64 pipeline must converge to exactly this
# set (see _q_minhash_engine_parity).
ORACLE["minhash_engine_parity"] = """
WITH aug AS (SELECT doc_id, text FROM documents UNION ALL
             SELECT doc_id + 1000000, text FROM documents),
h AS (
  SELECT doc_id,
         [md5(s) for s in list_distinct([substr(text, i, 5)
              for i in range(1, greatest(length(text) - 4, 1) + 1)])] AS hashes
  FROM aug
),
fp AS (SELECT doc_id, md5(array_to_string(list_sort(hashes), ',')) AS fp FROM h),
sig AS (
  SELECT doc_id,
         list_min([substr(x, 1, 8) for x in hashes]) AS m0,
         list_min([substr(x, 9, 8) for x in hashes]) AS m1,
         list_min([substr(x, 17, 8) for x in hashes]) AS m2,
         list_min([substr(x, 25, 8) for x in hashes]) AS m3
  FROM h
),
pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM sig a JOIN sig b
    ON a.m0 = b.m0 AND a.m1 = b.m1 AND a.m2 = b.m2 AND a.m3 = b.m3
   AND a.doc_id < b.doc_id
)
SELECT id_a, id_b, true AS in_md5, true AS in_xxhash64
FROM pairs JOIN fp x ON id_a = x.doc_id JOIN fp y ON id_b = y.doc_id
WHERE x.fp = y.fp
"""

# --- embedding-cosine near-dup (blocked by label) ----------------------------
# Pairwise cosine only WITHIN label blocks (O(sum block²), not O(n²));
# top-k most-similar pairs with stable tie order. Vectors are L2-normalized
# ONCE in a narrow map stage so the per-pair work is a single dot product —
# each vector sits in ~block_size pairs, so computing its norm per pair
# would redo the same work block_size times.
SPARK_SQL["embedding_cosine_pairs"] = """
WITH e AS (SELECT vec_id, label, CAST(embedding AS ARRAY<DOUBLE>) AS e FROM embeddings),
n AS (
  SELECT vec_id, label,
         transform(e, x -> x / sqrt(aggregate(transform(e, v -> v * v),
                                              CAST(0.0 AS DOUBLE), (s, v) -> s + v))) AS en
  FROM e
),
p AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         aggregate(zip_with(a.en, b.en, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (s, x) -> s + x) AS cos
  FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
)
SELECT id_a, id_b, round(cos, 6) AS cosine
FROM p ORDER BY cosine DESC, id_a, id_b LIMIT 20
"""
ORACLE["embedding_cosine_pairs"] = """
WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
n AS (
  SELECT vec_id, label,
         [x / sqrt(list_dot_product(e, e)) for x in e] AS en
  FROM e
),
p AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         list_dot_product(a.en, b.en) AS cos
  FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
)
SELECT id_a, id_b, round(cos, 6) AS cosine
FROM p ORDER BY cosine DESC, id_a, id_b LIMIT 20
"""

# --- BPE-ish regex token counting --------------------------------------------
# Letter runs / digit runs / single punctuation marks — the pre-tokenizer
# split every BPE vocabulary starts from. Same RE2/Java-safe pattern both
# engines. (This is the PRE-tokenizer count only; true merge-table BPE
# counting is L52 — `bpe_token_counts` / `bpe_sequence_packing`, llm/bpe.py.)
_BPE_PAT = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"
SPARK_SQL["bpe_token_count"] = f"""
SELECT source,
       CAST(sum(size(regexp_extract_all(text, '{_BPE_PAT}', 0))) AS BIGINT) AS total_tokens,
       CAST(max(size(regexp_extract_all(text, '{_BPE_PAT}', 0))) AS BIGINT) AS max_tokens,
       CAST(count(*) AS BIGINT) AS n_docs
FROM documents GROUP BY source
"""
ORACLE["bpe_token_count"] = f"""
SELECT source,
       CAST(sum(len(regexp_extract_all(text, '{_BPE_PAT}'))) AS BIGINT) AS total_tokens,
       CAST(max(len(regexp_extract_all(text, '{_BPE_PAT}'))) AS BIGINT) AS max_tokens,
       CAST(count(*) AS BIGINT) AS n_docs
FROM documents GROUP BY source
"""

# Winnowing-style content-defined sampling: hash every 8-gram, keep
# hashes ≡ 0 (mod 16) — sparse fuzzy-dup fingerprints (llm/text.py uses
# xxhash64; this portable md5-slice form is oracle-checkable).
SPARK_SQL["winnow_fingerprints"] = """
WITH h AS (
  SELECT doc_id,
         filter(transform(sequence(1, greatest(length(text) - 7, 1)),
                          i -> CAST(conv(substr(md5(substr(lower(text), i, 8)), 1, 15), 16, 10) AS BIGINT)),
                x -> x % 16 = 0) AS fp
  FROM documents
)
SELECT doc_id, CAST(size(fp) AS BIGINT) AS n_fp,
       array_min(fp) AS min_fp, array_max(fp) AS max_fp
FROM h
"""
ORACLE["winnow_fingerprints"] = """
WITH h AS (
  SELECT doc_id,
         [x for x in [('0x' || substr(md5(substr(lower(text), i, 8)), 1, 15))::BIGINT
                      for i in range(1, greatest(length(text) - 7, 1) + 1)]
          if x % 16 = 0] AS fp
  FROM documents
)
SELECT doc_id, CAST(len(fp) AS BIGINT) AS n_fp,
       list_min(fp) AS min_fp, list_max(fp) AS max_fp
FROM h
"""

SPARK_SQL["text_quality"] = f"""
SELECT doc_id,
       CAST(size(split(text, ' ')) AS BIGINT) AS n_tokens,
       round(CAST(length(replace(text, ' ', '')) AS DOUBLE) / size(split(text, ' ')), 6) AS avg_token_len,
       CAST(size(filter(split(text, ' '), t -> t IN ({STOPWORDS}))) AS BIGINT) AS n_stopwords,
       round(CAST(size(filter(split(text, ' '), t -> t IN ({STOPWORDS}))) AS DOUBLE)
             / size(split(text, ' ')), 6) AS stopword_ratio
FROM documents
"""
ORACLE["text_quality"] = f"""
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       round(CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(string_split(text, ' ')), 6) AS avg_token_len,
       CAST(len([t for t in string_split(text, ' ') if list_contains([{STOPWORDS}], t)]) AS BIGINT) AS n_stopwords,
       round(CAST(len([t for t in string_split(text, ' ') if list_contains([{STOPWORDS}], t)]) AS DOUBLE)
             / len(string_split(text, ' ')), 6) AS stopword_ratio
FROM documents
"""

SPARK_SQL["token_count_by_source"] = """
SELECT source, CAST(sum(size(split(text, ' '))) AS BIGINT) AS total_tokens,
       CAST(count(*) AS BIGINT) AS n_docs
FROM documents GROUP BY source
"""
ORACLE["token_count_by_source"] = """
SELECT source, CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
       CAST(count(*) AS BIGINT) AS n_docs
FROM documents GROUP BY source
"""

SPARK_SQL["lang_profile"] = ORACLE["lang_profile"] = """
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       round(CAST(sum(CAST(n_chars AS DECIMAL(18,0))) AS DOUBLE) / count(*), 6) AS avg_chars
FROM documents GROUP BY lang
"""

# --- LLM-pipeline: similarity search ----------------------------------------
SPARK_SQL["ann_cosine_topk"] = """
WITH q AS (SELECT CAST(embedding AS ARRAY<DOUBLE>) AS qe FROM embeddings WHERE vec_id = 0),
s AS (
  SELECT vec_id,
         aggregate(zip_with(CAST(embedding AS ARRAY<DOUBLE>), qe, (x, y) -> x * y),
                   CAST(0.0 AS DOUBLE), (a, x) -> a + x) AS dot,
         sqrt(aggregate(transform(CAST(embedding AS ARRAY<DOUBLE>), x -> x * x),
                        CAST(0.0 AS DOUBLE), (a, x) -> a + x)) AS n1,
         sqrt(aggregate(transform(qe, x -> x * x),
                        CAST(0.0 AS DOUBLE), (a, x) -> a + x)) AS n2
  FROM embeddings CROSS JOIN q WHERE vec_id <> 0
)
SELECT vec_id, round(dot / (n1 * n2), 6) AS cosine
FROM s ORDER BY cosine DESC, vec_id LIMIT 10
"""
ORACLE["ann_cosine_topk"] = """
WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0)
SELECT vec_id,
       round(list_dot_product(CAST(embedding AS DOUBLE[]), qe)
             / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])))
                * sqrt(list_dot_product(qe, qe))), 6) AS cosine
FROM embeddings, q WHERE vec_id <> 0
ORDER BY cosine DESC, vec_id LIMIT 10
"""

SPARK_SQL["ivf_bucket_counts"] = """
WITH c AS (SELECT vec_id AS centroid_id, CAST(embedding AS ARRAY<DOUBLE>) AS ce
           FROM embeddings WHERE vec_id < 8),
a AS (
  SELECT e.vec_id,
         max_by(c.centroid_id,
                struct(aggregate(zip_with(CAST(e.embedding AS ARRAY<DOUBLE>), c.ce, (x, y) -> x * y),
                                 CAST(0.0 AS DOUBLE), (s, x) -> s + x),
                       -c.centroid_id)) AS centroid_id
  FROM embeddings e CROSS JOIN c GROUP BY e.vec_id
)
SELECT centroid_id, CAST(count(*) AS BIGINT) AS n_vecs FROM a GROUP BY centroid_id
"""
ORACLE["ivf_bucket_counts"] = """
WITH c AS (SELECT vec_id AS centroid_id, CAST(embedding AS DOUBLE[]) AS ce
           FROM embeddings WHERE vec_id < 8),
scored AS (
  SELECT e.vec_id, c.centroid_id,
         row_number() OVER (PARTITION BY e.vec_id
                            ORDER BY list_dot_product(CAST(e.embedding AS DOUBLE[]), c.ce) DESC,
                                     c.centroid_id) AS rn
  FROM embeddings e, c
)
SELECT centroid_id, CAST(count(*) AS BIGINT) AS n_vecs
FROM scored WHERE rn = 1 GROUP BY centroid_id
"""

# IVF probe: the 100 TB ANN path — assign every vector to its nearest
# centroid (one narrow pass + broadcast of the tiny centroid set), then
# search ONLY the buckets nearest the query vector. Brute force scans all
# N; IVF scans N/n_buckets per probe. The Spark side (_q_ivf_probe_topk)
# probes the stored partition-pruned layout; this oracle keeps the round-1
# re-derivation as the independent cross-check of the same semantics.
ORACLE["ivf_probe_topk"] = """
WITH c AS (SELECT vec_id AS centroid_id, CAST(embedding AS DOUBLE[]) AS ce
           FROM embeddings WHERE vec_id < 8),
v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
scored AS (
  SELECT v.vec_id, c.centroid_id,
         row_number() OVER (PARTITION BY v.vec_id
                            ORDER BY list_dot_product(v.e, c.ce) DESC, c.centroid_id) AS rn
  FROM v, c
),
assign AS (SELECT vec_id, centroid_id FROM scored WHERE rn = 1),
probe AS (SELECT centroid_id FROM assign WHERE vec_id = 0),
q AS (SELECT e AS qe FROM v WHERE vec_id = 0),
cand AS (
  SELECT v.vec_id, v.e FROM v
  JOIN assign a ON v.vec_id = a.vec_id
  JOIN probe p ON a.centroid_id = p.centroid_id
  WHERE v.vec_id <> 0
)
SELECT vec_id,
       round(list_dot_product(e, qe)
             / (sqrt(list_dot_product(e, e)) * sqrt(list_dot_product(qe, qe))), 6) AS cosine
FROM cand, q
ORDER BY cosine DESC, vec_id LIMIT 10
"""

SPARK_SQL["embedding_label_stats"] = """
SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
       round(CAST(sum(CAST(sqrt(aggregate(transform(CAST(embedding AS ARRAY<DOUBLE>), x -> x * x),
                                          CAST(0.0 AS DOUBLE), (a, x) -> a + x)) AS DECIMAL(18,9))) AS DOUBLE)
             / count(*), 6) AS avg_norm
FROM embeddings GROUP BY label
"""
ORACLE["embedding_label_stats"] = """
SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
       round(CAST(sum(CAST(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS DECIMAL(18,9))) AS DOUBLE)
             / count(*), 6) AS avg_norm
FROM embeddings GROUP BY label
"""


# --- int8 scalar quantization (4× embedding storage cut at 100 TB) ----------
# Per-dimension affine params over the corpus: one dim×partitions partial-agg
# shuffle, independent of corpus size.
SPARK_SQL["embedding_quant_params"] = """
SELECT dim_pos, round(dim_min, 6) AS dim_min, round(dim_max, 6) AS dim_max,
       round((dim_max - dim_min) / 255.0, 6) AS dim_scale
FROM (
  SELECT pos AS dim_pos, min(x) AS dim_min, max(x) AS dim_max
  FROM embeddings LATERAL VIEW posexplode(CAST(embedding AS ARRAY<DOUBLE>)) t AS pos, x
  GROUP BY pos
)
"""
ORACLE["embedding_quant_params"] = """
WITH v AS (SELECT CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
idx AS (SELECT unnest(range(1, 65)) AS i)
SELECT i - 1 AS dim_pos,
       round(min(e[i]), 6) AS dim_min, round(max(e[i]), 6) AS dim_max,
       round((max(e[i]) - min(e[i])) / 255.0, 6) AS dim_scale
FROM v, idx GROUP BY i
"""


def _q_quantized_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADC search: int8-quantize the corpus side (floor(x+0.5) affine
    codes), score the float query against the dequantized codes. The
    params are a 64-row driver collect → literals; the search itself is
    one narrow map + TakeOrdered."""
    from pyspark.sql import functions as F

    from .llm import similarity as sim

    register_views(spark, sf_dir, ("embeddings",))
    emb = spark.table("embeddings")
    prows = sorted(
        sim.quantize_params(emb).collect(), key=lambda r: r["dim_pos"]
    )
    mins = [float(r["dim_min"]) for r in prows]
    scales = [(float(r["dim_max"]) - float(r["dim_min"])) / 255.0 for r in prows]
    qv = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0)
        .select(F.col("embedding").cast("array<double>"))
        .collect()[0][0]
    ]
    return sim.adc_topk(
        emb.filter(F.col("vec_id") != 0), qv, mins, scales, k=10
    )


ORACLE["quantized_adc_topk"] = """
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
idx AS (SELECT unnest(range(1, 65)) AS i),
p AS (SELECT i, min(e[i]) AS mn, max(e[i]) AS mx FROM v, idx GROUP BY i),
parr AS (SELECT list(mn ORDER BY i) AS mns,
                list((mx - mn) / 255.0 ORDER BY i) AS scs FROM p),
q AS (SELECT e AS qe FROM v WHERE vec_id = 0),
scored AS (
  SELECT v.vec_id,
         list_sum(list_transform(range(1, 65), i ->
           qe[i] * (CASE WHEN scs[i] > 0
                    THEN mns[i] + (LEAST(127, GREATEST(-128,
                           CAST(floor((v.e[i] - mns[i]) / scs[i] + 0.5) AS BIGINT) - 128))
                         + 128) * scs[i]
                    ELSE mns[i] END))) AS s
  FROM v, parr, q WHERE v.vec_id <> 0
)
SELECT vec_id, round(s, 6) AS adc_score
FROM scored ORDER BY adc_score DESC, vec_id LIMIT 10
"""


# --- IVF partitioned layout + pruned probe (the stored-index ANN shape) -----

def _ivf_layout_path(sf_dir: str) -> str:
    import hashlib
    import os
    import tempfile

    # the tag covers the SOURCE parquet's identity (path + mtime + size),
    # not just the path: fixture data is regenerated between rounds at
    # the same location, and a path-only key would serve the stale
    # materialized layout against a fresh oracle forever
    src = os.path.join(sf_dir, "embeddings.parquet")
    try:
        st = os.stat(src)
        ident = f"{sf_dir}|{int(st.st_mtime)}|{st.st_size}"
    except OSError:
        ident = sf_dir
    tag = hashlib.md5(ident.encode()).hexdigest()[:10]
    return os.path.join(tempfile.gettempdir(), f"k2n_ivf_layout_v1_{tag}")


def _ivf_layout(spark: SparkSession, sf_dir: str):
    """Centroids (= embeddings 0..7) + the materialized partition-by-centroid
    layout directory, built write-if-absent and shared by every IVF probe
    query in the session."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    from .llm import similarity as sim

    register_views(spark, sf_dir, ("embeddings",))
    emb = spark.table("embeddings")
    crows = (
        emb.filter(F.col("vec_id") < 8)
        .select("vec_id", F.col("embedding").cast("array<double>").alias("ce"))
        .collect()
    )
    centroids = sorted((int(r["vec_id"]), list(r["ce"])) for r in crows)
    layout = _ivf_layout_path(sf_dir)
    if not os.path.exists(os.path.join(layout, "_SUCCESS")):
        import time as _time

        t0 = _time.perf_counter()
        tmp = tempfile.mkdtemp(prefix="k2n_ivf_build_")
        build = os.path.join(tmp, "layout")
        sim.write_ivf_layout(emb, centroids, build)
        _publish_layout(tmp, build, layout, ("_SUCCESS",))
        LAYOUT_BUILD_LOG["ivf"] = round(_time.perf_counter() - t0, 3)
    return centroids, layout


def _q_ivf_partitioned_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The stored-IVF probe: the corpus is laid out partitionBy(centroid_id)
    once (write-if-absent, reused across queries); a probe ranks the tiny
    centroid set on the driver and scans ONLY the n_probe winning
    partition directories — PartitionFilters prunes the rest, so the scan
    cost is n_probe/k of the corpus instead of a re-assignment pass.
    Centroids = embeddings 0..7, query = embedding 0 (as ivf_probe_topk)."""
    from pyspark.sql import functions as F

    from .llm import similarity as sim

    centroids, layout = _ivf_layout(spark, sf_dir)
    qv = dict(centroids)[0]
    # k=None: no raw-cosine pre-cut — the final rank is by ROUNDED cosine
    # (the oracle's order), and truncating at k=11 on the raw value could
    # drop a candidate that rounds into the top 10
    out = sim.ivf_partitioned_probe(spark, layout, centroids, qv, k=None, n_probe=2)
    return (
        out.filter(F.col("vec_id") != 0)
        .select("vec_id", F.round("cosine", 6).alias("cosine"))
        .orderBy(F.desc("cosine"), "vec_id")
        .limit(10)
    )


def _q_ivf_probe_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Legacy single-bucket probe, DEMOTED to a semantics cross-check of the
    stored-IVF path: the round-1 form re-assigned the whole corpus per probe
    (6 scans, 10 exchanges, 3 BroadcastNestedLoopJoins — PLANS.md r3); this
    form probes the SAME materialized layout as ivf_partitioned_probe, so
    the plan is one partition-pruned scan. Probe bucket = the bucket vec 0
    is assigned to (argmax dot(centroid, vec0), ties to the lower centroid
    id — exactly the layout's assignment rule, computed driver-side with the
    same sequential fold, so the probe always lands on vec 0's own
    partition). The DuckDB oracle is unchanged from round 1: same candidate
    set, same cosine top-10."""
    from pyspark.sql import functions as F

    from .llm import similarity as sim
    from .llm.similarity import _seq_dot

    centroids, layout = _ivf_layout(spark, sf_dir)
    qv = dict(centroids)[0]
    probe_cid = min(centroids, key=lambda c: (-_seq_dot(c[1], qv), c[0]))[0]
    lay = spark.read.parquet(layout).filter(F.col("centroid_id") == probe_cid)
    out = sim.brute_force_topk(lay, qv, k=None)  # rounded-rank cut below
    return (
        out.filter(F.col("vec_id") != 0)
        .select("vec_id", F.round("cosine", 6).alias("cosine"))
        .orderBy(F.desc("cosine"), "vec_id")
        .limit(10)
    )


ORACLE["ivf_partitioned_probe"] = """
WITH c AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS ce
           FROM embeddings WHERE vec_id < 8),
v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
scored AS (
  SELECT v.vec_id, c.cid,
         row_number() OVER (PARTITION BY v.vec_id
                            ORDER BY list_dot_product(v.e, c.ce) DESC, c.cid) AS rn
  FROM v, c
),
assign AS (SELECT vec_id, cid FROM scored WHERE rn = 1),
q AS (SELECT e AS qe FROM v WHERE vec_id = 0),
cprobe AS (
  SELECT c.cid,
         row_number() OVER (
           ORDER BY list_dot_product(c.ce, q.qe)
                    / (sqrt(list_dot_product(c.ce, c.ce))
                       * sqrt(list_dot_product(q.qe, q.qe))) DESC, c.cid) AS rn
  FROM c, q
),
probe AS (SELECT cid FROM cprobe WHERE rn <= 2),
cand AS (
  SELECT v.vec_id, v.e FROM v
  JOIN assign a USING (vec_id) JOIN probe p ON a.cid = p.cid
  WHERE v.vec_id <> 0
)
SELECT vec_id,
       round(list_dot_product(e, qe)
             / (sqrt(list_dot_product(e, e)) * sqrt(list_dot_product(qe, qe))), 6) AS cosine
FROM cand, q ORDER BY cosine DESC, vec_id LIMIT 10
"""


# ---------------------------------------------------------------------------
# DataFrame-API-backed queries (llm package operators)
# ---------------------------------------------------------------------------

def _q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from .llm import text as llm_text

    register_views(spark, sf_dir, ("documents",))
    docs = spark.table("documents")
    return llm_text.lang_id(docs).select(
        "doc_id", "predicted_lang", F.col("lang_score").cast("long").alias("lang_score")
    )


def _lang_id_oracle() -> str:
    from .llm.text import LANG_STOPWORDS

    score_cols = []
    for lang in sorted(LANG_STOPWORDS):
        words = ", ".join(f"'{w}'" for w in LANG_STOPWORDS[lang])
        score_cols.append(
            f"len([t for t in string_split(lower(text), ' ') "
            f"if list_contains([{words}], t)]) AS s_{lang}"
        )
    langs = sorted(LANG_STOPWORDS)
    cases = []
    for i, lang in enumerate(langs):
        conds = " AND ".join(f"s_{lang} >= s_{other}" for other in langs[i + 1 :])
        cases.append(f"WHEN {conds} THEN '{lang}'" if conds else f"ELSE '{lang}'")
    case_sql = "CASE " + " ".join(cases) + " END"
    greatest = ", ".join(f"s_{lang}" for lang in langs)
    return f"""
    WITH s AS (SELECT doc_id, {', '.join(score_cols)} FROM documents)
    SELECT doc_id, {case_sql} AS predicted_lang,
           CAST(greatest({greatest}) AS BIGINT) AS lang_score
    FROM s
    """


ORACLE["lang_id_heuristic"] = _lang_id_oracle()


def _q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .llm import dedup as llm_dedup

    register_views(spark, sf_dir, ("documents",))
    # Portable md5-based token hash (dedup.simhash(token_hash="md5_60")) so
    # the fold/vote/bit-pack ALGORITHM is exactly oracle-checked; the
    # xxhash64 production engine (engine-specific hash, no DuckDB twin) is
    # covered by tests/test_llm.py instead.
    return llm_dedup.simhash(spark.table("documents"), bits=60, token_hash="md5_60")


ORACLE["simhash_fingerprints"] = """
WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
h AS (SELECT doc_id, ('0x' || substr(md5(t), 1, 15))::BIGINT AS h FROM tok),
votes AS (
  SELECT doc_id, b.b AS b,
         sum(CASE WHEN (h >> b.b) & 1 = 1 THEN 1 ELSE -1 END) AS v
  FROM h, unnest(range(0, 60)) AS b(b)
  GROUP BY doc_id, b.b
)
SELECT doc_id,
       CAST(sum(CASE WHEN v >= 0 THEN (1::BIGINT << b) ELSE 0 END) AS BIGINT) AS simhash
FROM votes GROUP BY doc_id
"""


def _q_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from .llm import text as llm_text

    register_views(spark, sf_dir, ("documents",))
    out = llm_text.quality_score(spark.table("documents"))
    return out.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.round("avg_token_len", 6).alias("avg_token_len"),
        F.round("punct_ratio", 6).alias("punct_ratio"),
        F.round("stopword_ratio", 6).alias("stopword_ratio"),
        F.round("quality", 6).alias("quality"),
    )


_EN_WORDS = ", ".join(f"'{w}'" for w in ["the", "a", "of", "and", "is", "to", "in"])
ORACLE["quality_score"] = f"""
WITH s AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         length(text) AS n_chars,
         length(regexp_replace(text, '[^\\.,;:!\\?]', '', 'g')) AS punct,
         len([t for t in string_split(lower(text), ' ')
              if list_contains([{_EN_WORDS}], t)]) AS stop
  FROM documents)
SELECT doc_id, n_tokens,
       round(CAST(n_chars AS DOUBLE) / greatest(n_tokens, 1), 6) AS avg_token_len,
       round(CAST(punct AS DOUBLE) / greatest(n_chars, 1), 6) AS punct_ratio,
       round(CAST(stop AS DOUBLE) / greatest(n_tokens, 1), 6) AS stopword_ratio,
       round(CASE WHEN n_tokens < 5 THEN 0.0
                  ELSE least(1.0, 0.5 * CAST(stop AS DOUBLE) / greatest(n_tokens, 1)
                                  + 0.5 * (1 - CAST(punct AS DOUBLE) / greatest(n_chars, 1)))
             END, 6) AS quality
FROM s
"""

def _media_frame(spark: SparkSession, sf_dir: str, with_payload: bool = True) -> DataFrame:
    """Synthesize a media table from documents: opaque binary payload +
    typed metadata (MEDIA_SCHEMA shape) — the multimodal column model."""
    from pyspark.sql import functions as F

    register_views(spark, sf_dir, ("documents",))
    docs = spark.table("documents")
    cols = [
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("kind"),
        F.lit("application/octet-stream").alias("mime"),
        (F.col("n_chars") % 640 + 1).cast("int").alias("width"),
        (F.col("n_chars") % 480 + 1).cast("int").alias("height"),
        (F.col("n_chars") * 10).cast("long").alias("duration_ms"),
    ]
    if with_payload:
        cols.append(F.encode("text", "UTF-8").alias("payload"))
    return docs.select(*cols)


def _pii_augmented_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The synthetic corpus carries no PII/URLs, so the PII queries plant
    deterministic spans (keyed on doc_id) before detection — same
    fixture-augmentation pattern as _media_frame."""
    from pyspark.sql import functions as F

    register_views(spark, sf_dir, ("documents",))
    docs = spark.table("documents")
    did = F.col("doc_id")
    return docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                did % 7 == 0,
                F.concat(
                    F.lit(" contact user"), did.cast("string"),
                    F.lit("@example.com now"),
                ),
            ).otherwise(F.lit("")),
            F.when(did % 11 == 0, F.lit(" call 555-867-5309 soon")).otherwise(
                F.lit("")
            ),
            F.when(
                did % 13 == 0,
                F.concat(
                    F.lit(" host 10.0.0."), (did % 255).cast("string"),
                    F.lit(" up"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                did % 5 == 0,
                F.concat(
                    F.lit(" see https://site"), (did % 50).cast("string"),
                    F.lit(".example.org/page-"), did.cast("string"),
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )


# SQL twin of the planted spans above — keep the two in sync.
_PII_AUG_SQL = """
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 7 = 0
                 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now'
                 ELSE '' END
         || CASE WHEN doc_id % 11 = 0 THEN ' call 555-867-5309 soon' ELSE '' END
         || CASE WHEN doc_id % 13 = 0
                 THEN ' host 10.0.0.' || CAST(doc_id % 255 AS VARCHAR) || ' up'
                 ELSE '' END
         || CASE WHEN doc_id % 5 = 0
                 THEN ' see https://site' || CAST(doc_id % 50 AS VARCHAR)
                      || '.example.org/page-' || CAST(doc_id AS VARCHAR)
                 ELSE '' END AS text
  FROM documents
"""


def _q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction signals (llm/text.scrub_pii): one narrow
    codegen map of chained regexp_count/regexp_replace — the pre-training
    hygiene filter that runs before anything expensive at 100 TB."""
    from pyspark.sql import functions as F

    from .llm import text as llm_text

    out = llm_text.scrub_pii(_pii_augmented_docs(spark, sf_dir))
    return out.select(
        "doc_id",
        F.col("n_email").cast("long").alias("n_email"),
        F.col("n_phone").cast("long").alias("n_phone"),
        F.col("n_ipv4").cast("long").alias("n_ipv4"),
        F.col("n_url").cast("long").alias("n_url"),
        (
            F.col("n_email") + F.col("n_phone") + F.col("n_ipv4") + F.col("n_url")
            > 0
        ).alias("has_pii"),
        F.length("scrubbed_text").cast("long").alias("scrubbed_len"),
    )


ORACLE["pii_scrub_signals"] = f"""
WITH aug AS ({_PII_AUG_SQL}),
sig AS (
  SELECT doc_id, text,
         len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}')) AS n_email,
         len(regexp_extract_all(text, '\\+[0-9][0-9()\\- ]{{6,}}[0-9]|\\(?[0-9]{{3,4}}\\)?[ \\-.][0-9]{{3}}[\\-.][0-9]{{4}}|\\b[0-9]{{9,11}}\\b')) AS n_phone,
         len(regexp_extract_all(text, '\\b(?:[0-9]{{1,3}}\\.){{3}}[0-9]{{1,3}}\\b')) AS n_ipv4,
         len(regexp_extract_all(text, 'https?://[^\\s]+')) AS n_url,
         regexp_replace(
           regexp_replace(
             regexp_replace(
               regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}', '[EMAIL]', 'g'),
               '\\+[0-9][0-9()\\- ]{{6,}}[0-9]|\\(?[0-9]{{3,4}}\\)?[ \\-.][0-9]{{3}}[\\-.][0-9]{{4}}|\\b[0-9]{{9,11}}\\b', '[PHONE]', 'g'),
             '\\b(?:[0-9]{{1,3}}\\.){{3}}[0-9]{{1,3}}\\b', '[IPV4]', 'g'),
           'https?://[^\\s]+', '[URL]', 'g') AS scrubbed
  FROM aug
)
SELECT doc_id,
       CAST(n_email AS BIGINT) AS n_email,
       CAST(n_phone AS BIGINT) AS n_phone,
       CAST(n_ipv4 AS BIGINT) AS n_ipv4,
       CAST(n_url AS BIGINT) AS n_url,
       n_email + n_phone + n_ipv4 + n_url > 0 AS has_pii,
       CAST(length(scrubbed) AS BIGINT) AS scrubbed_len
FROM sig
"""


def _q_url_domain_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain corpus profile: extract URL hosts, one explode + one
    hash agg (partial-aggregated) — the domain-mix census a training-data
    curation pass runs before sampling."""
    from pyspark.sql import functions as F

    aug = _pii_augmented_docs(spark, sf_dir)
    hosts = aug.select(
        "doc_id",
        F.explode(
            F.expr(r"regexp_extract_all(text, 'https?://([a-z0-9.-]+)', 1)")
        ).alias("domain"),
    )
    return hosts.groupBy("domain").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.min("doc_id").alias("first_doc"),
    )


ORACLE["url_domain_profile"] = f"""
WITH aug AS ({_PII_AUG_SQL}),
hosts AS (
  SELECT doc_id, unnest(regexp_extract_all(text, 'https?://([a-z0-9.-]+)', 1)) AS domain
  FROM aug
)
SELECT domain, CAST(count(*) AS BIGINT) AS n_docs, min(doc_id) AS first_doc
FROM hosts GROUP BY domain
"""


# --- L54: the composed CURATION pipeline -------------------------------------
# The curation twin of L46 (dedup_pipeline): the end-to-end cleaning chain
# a training-data user actually runs — PII scrub → quality score → lang-ID
# → exact-dedup canonicalization → selection → BPE token accounting — as
# ONE registry entry through the library functions, so the stage CONTRACTS
# (quality/lang computed over the SCRUBBED text, fingerprint over the
# scrubbed text, thresholds applied to the ROUNDED score) are what's
# certified, not each stage alone. Corpus: the PII-augmented fixture plus
# exact clones of the doc_id % 17 subset (cloned AFTER augmentation so
# fingerprints match by construction) — every stage filters a non-trivial
# set at sf0.01: 41 docs exceed the PII cap, ~188 miss the quality bar,
# 47 zero-en-stopword docs lang-route away, 30 clones dedup-drop.
# Scale shape: one narrow codegen map (4 regex scrubs + quality + lang
# scores + fingerprint + BPE chain), ONE shuffle (fingerprint window),
# then a projection — no joins at all.
_CURATION_QUALITY_TAU = 0.52
_CURATION_PII_CAP = 1


def _q_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from .llm import text as llm_text
    from .llm.bpe import bpe_count_expr

    aug = _pii_augmented_docs(spark, sf_dir)
    corpus = aug.unionAll(
        aug.filter(F.col("doc_id") % 17 == 0).select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
        )
    )
    enriched = llm_text.lang_id(
        llm_text.quality_score(
            llm_text.scrub_pii(corpus), text_col="scrubbed_text"
        ),
        text_col="scrubbed_text",
    ).withColumn(
        # llm_text.fingerprint's normalization, inline so it rides the
        # same narrow map instead of a corpus-sized join back
        "fp",
        F.md5(F.regexp_replace(F.lower(F.col("scrubbed_text")), "[^a-z ]", "")),
    )
    ranked = enriched.withColumn(
        "_rk",
        F.row_number().over(Window.partitionBy("fp").orderBy("doc_id")),
    )
    n_pii = (
        F.col("n_email") + F.col("n_phone") + F.col("n_ipv4") + F.col("n_url")
    )
    kept = ranked.filter(
        (F.col("_rk") == 1)
        & (F.col("predicted_lang") == "en")
        & (F.round(F.col("quality"), 6) >= _CURATION_QUALITY_TAU)
        & (n_pii <= _CURATION_PII_CAP)
    )
    return kept.select(
        "doc_id",
        F.round(F.col("quality"), 6).alias("quality"),
        n_pii.cast("long").alias("n_pii"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.expr(bpe_count_expr("scrubbed_text")).cast("long").alias(
            "bpe_tokens"
        ),
    )


def _curation_oracle() -> str:
    """DuckDB replay of every curation stage, generated from the SAME
    sources of truth the Spark side composes: llm.text.PII_PATTERNS
    (scrub order preserved: email → phone → ipv4 → url, counts over the
    pre-scrub text), LANG_STOPWORDS (max-score with the de-first
    tie-break, exactly _lang_id_oracle's CASE), the quality formula, and
    llm.bpe's replace chain over the scrubbed text."""
    from .llm.bpe import bpe_count_expr
    from .llm.text import LANG_STOPWORDS, PII_PATTERNS

    scrub = "text"
    counts = []
    for kind in ("email", "phone", "ipv4", "url"):
        pat = PII_PATTERNS[kind].replace("'", "''")
        counts.append(f"len(regexp_extract_all(text, '{pat}')) AS n_{kind}")
        scrub = (
            f"regexp_replace({scrub}, '{pat}', '[{kind.upper()}]', 'g')"
        )
    langs = sorted(LANG_STOPWORDS)
    score_cols = []
    for lang in langs:
        words = ", ".join(f"'{w}'" for w in LANG_STOPWORDS[lang])
        score_cols.append(
            f"len([t for t in string_split(lower(scrubbed), ' ') "
            f"if list_contains([{words}], t)]) AS s_{lang}"
        )
    cases = []
    for i, lang in enumerate(langs):
        conds = " AND ".join(
            f"s_{lang} >= s_{other}" for other in langs[i + 1 :]
        )
        cases.append(
            f"WHEN {conds} THEN '{lang}'" if conds else f"ELSE '{lang}'"
        )
    case_sql = "CASE " + " ".join(cases) + " END"
    bpe = bpe_count_expr("scrubbed", dialect="duckdb")
    return f"""
WITH aug AS ({_PII_AUG_SQL}),
corpus AS (
  SELECT doc_id, text FROM aug
  UNION ALL
  SELECT doc_id + 1000000, text FROM aug WHERE doc_id % 17 = 0
),
scr AS (
  SELECT doc_id, {', '.join(counts)}, {scrub} AS scrubbed
  FROM corpus
),
q AS (
  SELECT doc_id, n_email + n_phone + n_ipv4 + n_url AS n_pii, scrubbed,
         len(string_split(scrubbed, ' ')) AS n_tokens,
         length(scrubbed) AS n_chars,
         length(regexp_replace(scrubbed, '[^\\.,;:!\\?]', '', 'g')) AS punct,
         len([t for t in string_split(lower(scrubbed), ' ')
              if list_contains([{_EN_WORDS}], t)]) AS stop,
         {', '.join(score_cols)},
         md5(regexp_replace(lower(scrubbed), '[^a-z ]', '', 'g')) AS fp
  FROM scr
),
scored AS (
  SELECT doc_id, n_pii, n_tokens, scrubbed, fp,
         round(CASE WHEN n_tokens < 5 THEN 0.0
                    ELSE least(1.0,
                         0.5 * CAST(stop AS DOUBLE) / greatest(n_tokens, 1)
                         + 0.5 * (1 - CAST(punct AS DOUBLE)
                                  / greatest(n_chars, 1)))
               END, 6) AS quality,
         {case_sql} AS predicted_lang,
         row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rk
  FROM q
)
SELECT doc_id, quality,
       CAST(n_pii AS BIGINT) AS n_pii,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST({bpe} AS BIGINT) AS bpe_tokens
FROM scored
WHERE rk = 1 AND predicted_lang = 'en'
  AND quality >= {_CURATION_QUALITY_TAU} AND n_pii <= {_CURATION_PII_CAP}
"""


ORACLE["curation_pipeline"] = _curation_oracle()


def _q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-to-stream as-of join: each purchase event joined to the
    latest signup value at-or-before it per user. Oracle uses DuckDB's
    native ASOF JOIN; Spark side is the tag-union + last_value window
    (operators/asof_join.py) — one shuffle, no UDF."""
    from pyspark.sql import functions as F

    from .operators.asof_join import asof_join_backward

    register_views(spark, sf_dir, ("events",))
    ev = spark.table("events")
    left = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    # one reading per (user, ts): latest-by-offset wins, so equal-ts ties
    # are deterministic in both engines
    right = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id", "ts")
        .agg(F.max_by("value", "event_id").alias("value"))
    )
    return asof_join_backward(
        left, right, keys=["user_id"], ts="ts", right_values=["value"]
    ).select("event_id", "user_id", "value", F.col("asof_value"))


ORACLE["asof_join_streams"] = """
SELECT e.event_id, e.user_id, e.value, s.value AS asof_value
FROM (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase') e
ASOF LEFT JOIN (SELECT user_id, ts, max_by(value, event_id) AS value
                FROM events WHERE event_type = 'signup' GROUP BY user_id, ts) s
  ON e.user_id = s.user_id AND e.ts >= s.ts
"""


def _q_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of: each purchase joined to the EARLIEST signup value
    at-or-after it per user (operators/asof_join.asof_join_forward);
    oracle is DuckDB's native ASOF with the <= inequality."""
    from pyspark.sql import functions as F

    from .operators.asof_join import asof_join_forward

    register_views(spark, sf_dir, ("events",))
    ev = spark.table("events")
    left = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    right = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id", "ts")
        .agg(F.max_by("value", "event_id").alias("value"))
    )
    return asof_join_forward(
        left, right, keys=["user_id"], ts="ts", right_values=["value"]
    ).select("event_id", "user_id", "value", F.col("asof_value"))


ORACLE["asof_join_forward"] = """
SELECT e.event_id, e.user_id, e.value, s.value AS asof_value
FROM (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase') e
ASOF LEFT JOIN (SELECT user_id, ts, max_by(value, event_id) AS value
                FROM events WHERE event_type = 'signup' GROUP BY user_id, ts) s
  ON e.user_id = s.user_id AND e.ts <= s.ts
"""


def _q_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-lookback as-of: like asof_join_streams but matches older
    than 30 days are nulled (pandas merge_asof(tolerance=...) semantics;
    operators/asof_join.py tolerance arm). Oracle: DuckDB ASOF keeps the
    match unconditionally, a CASE re-applies the bound."""
    from pyspark.sql import functions as F

    from .operators.asof_join import asof_join_backward

    register_views(spark, sf_dir, ("events",))
    ev = spark.table("events")
    tol_us = 30 * 86_400_000_000  # 30 days in µs
    left = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.unix_micros("ts").alias("ts_us"), "value"
    )
    right = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id", F.unix_micros("ts").alias("ts_us"))
        .agg(F.max_by("value", "event_id").alias("value"))
    )
    return asof_join_backward(
        left, right, keys=["user_id"], ts="ts_us",
        right_values=["value"], tolerance=tol_us,
    ).select("event_id", "user_id", "value", F.col("asof_value"))


ORACLE["asof_join_tolerance"] = """
SELECT e.event_id, e.user_id, e.value,
       CASE WHEN s.ts >= e.ts - INTERVAL 30 DAY THEN s.value END AS asof_value
FROM (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase') e
ASOF LEFT JOIN (SELECT user_id, ts, max_by(value, event_id) AS value
                FROM events WHERE event_type = 'signup' GROUP BY user_id, ts) s
  ON e.user_id = s.user_id AND e.ts >= s.ts
"""


# Second-moment aggregate battery: corr / covariance / variance families —
# standard analytics surface, both engines implement the same co-moment
# definitions. Map-side partial aggregation applies (AggregateExpression
# partials), so the shuffle carries per-task moment tuples.
SPARK_SQL["stats_battery"] = ORACLE["stats_battery"] = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       round(CAST(avg(value) AS DOUBLE), 6) AS avg_value,
       round(CAST(stddev_samp(value) AS DOUBLE), 5) AS sd_value,
       round(CAST(var_samp(value) AS DOUBLE), 4) AS var_value,
       round(CAST(corr(value, CAST(hour(ts) AS DOUBLE)) AS DOUBLE), 6) AS corr_value_hour,
       round(CAST(covar_samp(value, CAST(hour(ts) AS DOUBLE)) AS DOUBLE), 5) AS covar_value_hour
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def _q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribution range join: count purchases inside each signup's
    2-day window per user. Spark side is the bucketed equi-join
    (operators/range_join.py); oracle is the naive containment join."""
    from pyspark.sql import functions as F

    from .operators.range_join import bucketed_range_join

    register_views(spark, sf_dir, ("events",))
    ev = spark.table("events")
    us = F.unix_micros  # µs since epoch, matches DuckDB epoch_us
    points = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"), us("ts").alias("pts"), "user_id"
    )
    intervals = ev.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("iid"),
        us("ts").alias("w_start"),
        (us("ts") + F.lit(2 * 86_400_000_000)).alias("w_end"),
        "user_id",
    )
    joined = bucketed_range_join(
        points,
        intervals,
        ts="pts",
        start="w_start",
        end="w_end",
        bucket_width=86_400_000_000,  # 1 day ≈ half the interval width
        keys=["user_id"],
    )
    return joined.groupBy("iid").agg(
        F.count("*").alias("n_purchases_in_window"),
        F.min("pid").alias("first_pid"),
    )


ORACLE["range_join_attribution"] = """
SELECT i.event_id AS iid,
       CAST(count(*) AS BIGINT) AS n_purchases_in_window,
       min(p.event_id) AS first_pid
FROM (SELECT event_id, user_id, epoch_us(ts) AS w_start,
             epoch_us(ts) + 2 * 86400000000 AS w_end
      FROM events WHERE event_type = 'signup') i
JOIN (SELECT event_id, user_id, epoch_us(ts) AS pts
      FROM events WHERE event_type = 'purchase') p
  ON p.user_id = i.user_id AND p.pts BETWEEN i.w_start AND i.w_end
GROUP BY i.event_id
"""


# one-slot registry of the shingle-hash cache per session: each
# _q_ngram_jaccard call persists a corpus-sized frame, and without an
# unpersist a session invoking it repeatedly (the query + the dedup
# family) accumulates dead caches that evict working memory
_JACCARD_PERSIST: dict[str, DataFrame] = {}


def _q_ngram_jaccard(
    spark: SparkSession, sf_dir: str, max_bucket: int | None = None
) -> DataFrame:
    """Hash-once n-gram Jaccard on LSH candidates (see ORACLE comment).
    ``max_bucket`` routes through lsh_candidate_pairs' star+chain cap —
    the registry default (_q_ngram_jaccard_capped)."""
    from pyspark.sql import functions as F

    from .llm import dedup as llm_dedup

    register_views(spark, sf_dir, ("documents",))
    docs = spark.table("documents")
    app_id = spark.sparkContext.applicationId
    prev = _JACCARD_PERSIST.pop(app_id, None)
    if prev is not None:
        prev.unpersist()
    h = docs.select(
        "doc_id",
        F.expr(
            "transform(array_distinct(transform(sequence(1, greatest(length(text) - 4, 1)),"
            " i -> substr(text, i, 5))), s -> CAST(conv(substr(md5(s), 1, 15), 16, 10) AS BIGINT))"
        ).alias("hashes"),
    ).withColumn("n", F.size("hashes")).persist()
    _JACCARD_PERSIST[app_id] = h
    sig = h.select(
        "doc_id",
        F.expr("array_min(transform(hashes, x -> shiftright(x, 28)))").alias("m0"),
        F.expr("array_min(transform(hashes, x -> x & 268435455))").alias("m1"),
    )
    pairs = llm_dedup.lsh_candidate_pairs(
        sig, bands=1, rows_per_band=2, max_bucket=max_bucket
    )
    # Sort-merge joins on doc_id: the candidate pairs are already
    # LSH-pruned, and broadcasting the corpus-wide shingle-hash relation
    # would OOM at 100 TB. The explicit hint keeps small-SF runs from
    # auto-broadcasting the same relation the big-SF plan must shuffle.
    # merge, NOT shuffle_hash: SMJ measures the same at bench scale
    # (2.05 vs 2.21 s sf0.1, parity at x10) and SPILLS under memory
    # pressure, where the shuffle-hash build side hard-fails once a
    # partition's hash relation exceeds its execution-memory slice
    # (observed at the x1000 growth tier: "Can't acquire ... bytes to
    # build hash relation" with 32 shuffle partitions).
    x, y = h.hint("merge").alias("x"), h.hint("merge").alias("y")
    inter = F.size(F.array_intersect("x.hashes", "y.hashes"))
    return (
        pairs.join(x, F.col("id_a") == F.col("x.doc_id"))
        .join(y, F.col("id_b") == F.col("y.doc_id"))
        .select(
            "id_a",
            "id_b",
            F.round(
                inter.cast("double") / (F.col("x.n") + F.col("y.n") - inter), 6
            ).alias("jaccard"),
        )
    )


def _q_ngram_jaccard_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The registry default: bucket-capped candidate pairs (star+chain,
    SCALE.md-measured ~linear where the uncapped form spills at ×100)."""
    return _q_ngram_jaccard(spark, sf_dir, max_bucket=_JACCARD_MAX_BUCKET)


# one-slot per-session cache of the parity signature pass, lifecycle as
# _JACCARD_PERSIST
_PARITY_PERSIST: dict[str, DataFrame] = {}


def _q_minhash_engine_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry presence for the PRODUCTION minhash engine (xxhash64,
    ``llm/dedup.py minhash_signatures``): in-query pair-set equality
    against the DuckDB-replayable md5 pipeline on the engine-independent
    core — exact-duplicate pairs (jaccard == 1, identical shingle-hash
    sets). Identical shingle sets yield identical minhash signatures
    under ANY hash engine, so both UNCAPPED pipelines must emit every
    such pair deterministically; probabilistic (jaccard < 1) candidates
    are excluded because their bucketing is hash-dependent by design
    (measured: only 13/683 raw candidates shared between engines at
    sf0.01 — see tests/test_llm.py corpus-recall test for the hash
    QUALITY gate). The test corpus carries no exact duplicates, so the
    query MIRRORS it (same text, doc_id + 1_000_000): every doc gets
    exactly one exact-dup partner and the expectation is corpus-sized,
    not vacuous. Exactness is verified by SET FINGERPRINT, not
    array_intersect: jaccard == 1 is set equality, and md5 over the
    sorted hash list is one 16-byte compare per candidate instead of an
    O(shingles) intersect over the xx side's large uncapped candidate
    set; the decimal-joined sorted list renders identically in DuckDB,
    so the fingerprint is engine-portable. BOTH engines' band minima and
    the fingerprint come from ONE persisted pass over the mirrored
    corpus (doc_id + 9 small columns — the un-persisted plan re-ran the
    text-hash pass at each of its 8 subtree references, 16 parquet
    scans; persisting the combined pass measured ~20% faster at sf0.1,
    3.8 -> 3.1 s). Output: both engines' exact-dup pairs
    full-outer-joined with in_md5/in_xxhash64 flags — a
    production-engine regression (dropped or invented pair)
    hash-mismatches the oracle, which replays the md5 side with both
    flags literally true."""
    from pyspark.sql import functions as F

    from .llm import dedup as llm_dedup

    register_views(spark, sf_dir, ("documents",))
    app_id = spark.sparkContext.applicationId
    prev = _PARITY_PERSIST.pop(app_id, None)
    if prev is not None:
        prev.unpersist()
    base = spark.table("documents").select("doc_id", "text")
    md_hashes = F.expr(
        "transform(array_distinct(transform(sequence(1, greatest(length(text) - 4, 1)),"
        " i -> substr(text, i, 5))), s -> md5(s))"
    )
    # ONE selective band of 4 hashes (not 2): a 2-hash band key collides
    # corpus-wide on the globally-min-hashing shingle and the candidate
    # volume dominated the query. Same 8-hex md5 slices as the
    # minhash_signatures oracle pair.
    # r13: every signature/fingerprint column is a pure function of
    # text, and the mirror copies text verbatim — so BOTH engines digest
    # the BASE corpus only and the mirrored relation is the persisted
    # base pass unioned with its doc_id-shifted projection (row-for-row
    # identical to digesting the mirrored corpus, at half the hash work).
    # r14 (guide §1.2/§2.4, VERDICT r13 #3): the xx columns ride the
    # SAME select instead of a second minhash_signatures pass joined on
    # doc_id — the shingle relation is engine-independent, so one
    # staged projection computes both engines' digest arrays and the
    # join (2 corpus scans + an exchange) disappears. xm_i values are
    # bit-identical to minhash_signatures(hash_engine="xxhash64") —
    # same shingle set, same digest + slice expressions (pytest-pinned).
    staged = base.select(
        "doc_id",
        md_hashes.alias("_h"),
        F.transform(
            F.array_distinct(llm_dedup.shingles(F.col("text"), 5)),
            lambda s: F.xxhash64(s),
        ).alias("_hx"),
    )
    allsig_base = staged.select(
        "doc_id",
        F.md5(F.concat_ws(",", F.array_sort("_h"))).alias("fp"),
        *[
            F.expr(f"array_min(transform(_h, h -> substr(h, {8 * i + 1}, 8)))").alias(f"m{i}")
            for i in range(4)
        ],
        *[
            F.array_min(
                F.transform(F.col("_hx"), llm_dedup._xx_slice_fn(i))
            ).alias(f"xm{i}")
            for i in range(4)
        ],
    ).persist()
    allsig = allsig_base.unionByName(
        allsig_base.withColumn("doc_id", F.col("doc_id") + 1_000_000)
    )
    _PARITY_PERSIST[app_id] = allsig_base
    fp = allsig.select("doc_id", "fp")

    # r13 (4): ONE tagged pipeline for both engines instead of two
    # independent exact-pair pipelines full-outer-joined at the end.
    # Each engine's single band key rides the same allsig row, so one
    # explode tags every doc with (engine, band_key); the bucket
    # self-join keys on (engine, band_key) — buckets never mix engines —
    # and the fp-equality verify runs ONCE over the tagged candidate
    # union (two sort-merge joins instead of four). The final
    # full-outer join becomes a groupBy(id_a, id_b) flag aggregate,
    # which also stops the old plan from RE-RUNNING both candidate
    # pipelines as the join's two inputs. Pair sets and flags are
    # identical: with one band a pair surfaces at most once per engine,
    # verify is deterministic per pair, and bool_or over the engine tags
    # reproduces the in_md5/in_xxhash64 columns of the full-outer form
    # (a pair missing from an engine's set simply has no row with that
    # tag — the old join's null → coalesce(False)).
    banded = allsig.select(
        "doc_id",
        F.explode(
            F.array(
                F.struct(
                    F.lit("m").alias("eng"),
                    F.concat_ws("|", "m0", "m1", "m2", "m3").alias("bk"),
                ),
                F.struct(
                    F.lit("x").alias("eng"),
                    F.concat_ws("|", "xm0", "xm1", "xm2", "xm3").alias("bk"),
                ),
            )
        ).alias("_b"),
    ).select("doc_id", "_b.eng", "_b.bk")
    l, r = banded.alias("l"), banded.alias("r")
    cand = l.join(
        r,
        (F.col("l.eng") == F.col("r.eng"))
        & (F.col("l.bk") == F.col("r.bk"))
        & (F.col("l.doc_id") < F.col("r.doc_id")),
    ).select(
        F.col("l.eng").alias("eng"),
        F.col("l.doc_id").alias("id_a"),
        F.col("r.doc_id").alias("id_b"),
    )
    # same sort-merge shape as the jaccard family's verify joins
    # (PLANS.md): the fingerprint relation is corpus-sized — one row
    # per doc — so auto-broadcast would be the 100 TB-invalid plan
    x, y = fp.hint("merge").alias("x"), fp.hint("merge").alias("y")
    verified = (
        cand.join(x, F.col("id_a") == F.col("x.doc_id"))
        .join(y, F.col("id_b") == F.col("y.doc_id"))
        .filter(F.col("x.fp") == F.col("y.fp"))
        .select("eng", "id_a", "id_b")
    )
    return verified.groupBy("id_a", "id_b").agg(
        F.max(F.col("eng") == "m").alias("in_md5"),
        F.max(F.col("eng") == "x").alias("in_xxhash64"),
    )


def _q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload → mapInPandas feature extraction (decode stubbed —
    no codec libs in container; the Arrow plumbing is real). The stub
    histogram is deterministic, so DuckDB can replay it byte-for-byte from
    hex(payload) — giving the Arrow batch path a full value-hash oracle."""
    from pyspark.sql import functions as F

    from .llm import multimodal as mm

    feats = mm.extract_features(_media_frame(spark, sf_dir), dim=8)
    return feats.select(
        "media_id",
        "kind",
        "n_bytes",
        F.round(F.element_at("feature", 1).cast("double"), 6).alias("f0"),
    )


# Replays decode_stub exactly: byte histogram mod 8 over the UTF-8 payload
# (bytes via hex-pair extraction), bucket-0 ratio rounded half-to-even to
# match Python's round() in the stub.
ORACLE["multimodal_features"] = """
WITH p AS (
  SELECT doc_id,
         ['image', 'audio', 'video'][CAST(doc_id % 3 AS INT) + 1] AS kind,
         hex(encode(text)) AS hx,
         octet_length(encode(text)) AS n
  FROM documents
),
bytes AS (
  SELECT doc_id, ('0x' || substr(hx, 2 * i.i + 1, 2))::INT % 8 AS bucket
  FROM p, unnest(range(0, n)) AS i(i)
),
h AS (SELECT doc_id, count(*) AS c FROM bytes WHERE bucket = 0 GROUP BY doc_id)
SELECT p.doc_id AS media_id, p.kind, CAST(p.n AS BIGINT) AS n_bytes,
       round(round_even(coalesce(h.c, 0) / greatest(p.n, 1), 6), 6) AS f0
FROM p LEFT JOIN h ON p.doc_id = h.doc_id
"""


def _q_multimodal_decode_dispatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL decoder through the feature pipeline (r13 — decode_stub
    retired as the swap point): ``extract_features(decoder=
    decode_media)`` over the SQL-built PNG fixture plus a non-media
    payload per doc. decode_media sniffs the container magic, decodes
    pixels with the engine's own codec, and emits the 8-bucket
    luminance histogram; unknown magic takes the NULL CONTRACT (a null
    feature row, never a raise, never a fake value). The oracle states
    every histogram arithmetically from the fixture's closed-form
    pixels (luminance = (299r+587g+114b)//1000 for both color types —
    gray pixels store exactly that value and luminance_grid is the
    identity on (v,v,v)) and NULL rows for the garbage payloads — so
    both the real-decode leg AND the unsupported-kind leg of the
    dispatcher carry a value-hash certificate. JPEG/WAV/AVI dispatch
    legs are pytest-pinned (their bitstreams are worker-built; their
    pixel/sample decodes carry their own oracles: L88/L89/L92)."""
    from pyspark.sql import functions as F

    from .llm import multimodal as mm

    media = _png_pixel_fixture(spark, sf_dir).select(
        "media_id", F.lit("image").alias("kind"), "payload"
    )
    register_views(spark, sf_dir, ("documents",))
    garbage = spark.table("documents").select(
        (F.col("doc_id") + 10000000).alias("media_id"),
        F.lit("text").alias("kind"),
        F.encode(F.lit("not a media container"), "UTF-8").alias("payload"),
    )
    feats = mm.extract_features(
        media.unionByName(garbage), dim=8, decoder=mm.decode_media
    )
    return feats.select(
        "media_id",
        *[
            F.round(F.element_at("feature", i + 1).cast("double"), 6)
            .alias(f"f{i}")
            for i in range(8)
        ],
    )


ORACLE["multimodal_decode_dispatch"] = """
WITH m AS (
  SELECT doc_id AS d, v
  FROM documents, (VALUES (0), (1)) AS var(v)
),
px AS (
  SELECT d, v,
         (h1.h * h1.h % 2147483629 % 256
          + CASE WHEN v = 1 AND xx.x = d*3 % 16 AND yy.y = d*5 % 16
                 THEN 1 ELSE 0 END) % 256 AS r,
         h2.h * h2.h % 2147483629 % 256 AS g,
         h3.h * h3.h % 2147483629 % 256 AS b
  FROM m, range(16) xx(x), range(16) yy(y),
       LATERAL (SELECT (d*131 + xx.x*17 + yy.y*29 + 7) % 2147483629
                       * ((d*131 + xx.x*17 + yy.y*29 + 7) % 2147483629)
                       % 2147483629 AS h) h1,
       LATERAL (SELECT (d*137 + xx.x*23 + yy.y*31 + 7) % 2147483629
                       * ((d*137 + xx.x*23 + yy.y*31 + 7) % 2147483629)
                       % 2147483629 AS h) h2,
       LATERAL (SELECT (d*139 + xx.x*19 + yy.y*37 + 7) % 2147483629
                       * ((d*139 + xx.x*19 + yy.y*37 + 7) % 2147483629)
                       % 2147483629 AS h) h3
),
h AS (
  SELECT d, v, ((299*r + 587*g + 114*b) // 1000) // 32 AS bucket,
         count(*) AS c
  FROM px GROUP BY d, v, ((299*r + 587*g + 114*b) // 1000) // 32
)
SELECT d*2 + v AS media_id,
       round(round_even(coalesce(max(CASE WHEN bucket = 0 THEN c END), 0)
                        / 256.0, 6), 6) AS f0,
       round(round_even(coalesce(max(CASE WHEN bucket = 1 THEN c END), 0)
                        / 256.0, 6), 6) AS f1,
       round(round_even(coalesce(max(CASE WHEN bucket = 2 THEN c END), 0)
                        / 256.0, 6), 6) AS f2,
       round(round_even(coalesce(max(CASE WHEN bucket = 3 THEN c END), 0)
                        / 256.0, 6), 6) AS f3,
       round(round_even(coalesce(max(CASE WHEN bucket = 4 THEN c END), 0)
                        / 256.0, 6), 6) AS f4,
       round(round_even(coalesce(max(CASE WHEN bucket = 5 THEN c END), 0)
                        / 256.0, 6), 6) AS f5,
       round(round_even(coalesce(max(CASE WHEN bucket = 6 THEN c END), 0)
                        / 256.0, 6), 6) AS f6,
       round(round_even(coalesce(max(CASE WHEN bucket = 7 THEN c END), 0)
                        / 256.0, 6), 6) AS f7
FROM h GROUP BY d, v
UNION ALL
SELECT doc_id + 10000000 AS media_id,
       CAST(NULL AS DOUBLE) AS f0, CAST(NULL AS DOUBLE) AS f1,
       CAST(NULL AS DOUBLE) AS f2, CAST(NULL AS DOUBLE) AS f3,
       CAST(NULL AS DOUBLE) AS f4, CAST(NULL AS DOUBLE) AS f5,
       CAST(NULL AS DOUBLE) AS f6, CAST(NULL AS DOUBLE) AS f7
FROM documents
"""


def _q_multimodal_image_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL container-metadata decode round-trip: JVM-side SQL builds
    spec-conformant PNG (signature + IHDR) and JPEG (SOI + APP0 + SOF0)
    byte strings carrying each row's metadata dims big-endian — plus a
    deliberate garbage payload every 17th row — and
    ``multimodal.parse_image_dims`` (pure-stdlib format parsing, the one
    leg of "decode" that needs no codec library) recovers them in an
    Arrow-batched mapInPandas. The oracle states the expected output
    arithmetically, so any parser regression (endianness, marker walk,
    truncation handling) hash-fails."""
    from pyspark.sql import functions as F

    from .llm import multimodal as mm

    media = _media_frame(spark, sf_dir, with_payload=False)
    png = F.concat(
        # signature + IHDR length/tag
        F.unhex(F.lit("89504E470D0A1A0A0000000D49484452")),
        F.unhex(F.lpad(F.hex(F.col("width")), 8, "0")),
        F.unhex(F.lpad(F.hex(F.col("height")), 8, "0")),
        F.unhex(F.lit("0806000000")),  # bit depth/color/etc.
    )
    jpeg = F.concat(
        # SOI + APP0 (JFIF) + SOF0 marker/len/precision
        F.unhex(F.lit("FFD8FFE000104A46494600010100000100010000FFC0001108")),
        F.unhex(F.lpad(F.hex(F.col("height")), 4, "0")),
        F.unhex(F.lpad(F.hex(F.col("width")), 4, "0")),
        F.unhex(F.lit("03012200021101031101")),  # 3 components
    )
    payload = (
        F.when(F.col("media_id") % 17 == 0,
               F.encode(F.lit("not an image"), "UTF-8"))
        .when(F.col("media_id") % 2 == 0, png)
        .otherwise(jpeg)
    )
    return mm.image_dims(media.select("media_id", payload.alias("payload")))


ORACLE["multimodal_image_dims"] = """
SELECT doc_id AS media_id,
       CASE WHEN doc_id % 17 = 0 THEN NULL
            WHEN doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END AS fmt,
       CASE WHEN doc_id % 17 = 0 THEN NULL
            ELSE CAST(n_chars % 640 + 1 AS INT) END AS width,
       CASE WHEN doc_id % 17 = 0 THEN NULL
            ELSE CAST(n_chars % 480 + 1 AS INT) END AS height
FROM documents
"""


def _q_multimodal_wav_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio twin of multimodal_image_dims: SQL builds spec-conformant
    RIFF/WAVE headers (little-endian fields via byte-reversed hex) with
    per-row channels/rate/data-size, a garbage payload every 13th row,
    and ``multimodal.parse_wav_meta`` recovers channels/rate/bits and
    derives duration from the data-chunk size — against an arithmetic
    expected-output oracle (floor-division duration both sides)."""
    from pyspark.sql import functions as F

    from .llm import multimodal as mm

    def le(col, nbytes: int):
        h = F.lpad(F.hex(col), 2 * nbytes, "0")
        return F.unhex(
            F.concat(
                *[F.substring(h, 2 * i + 1, 2) for i in reversed(range(nbytes))]
            )
        )

    media = _media_frame(spark, sf_dir, with_payload=False)
    channels = (F.col("media_id") % 2 + 1).cast("int")
    rate = F.element_at(
        F.array(F.lit(8000), F.lit(16000), F.lit(44100)),
        (F.col("media_id") % 3 + 1).cast("int"),
    )
    data_size = (F.col("width").cast("long") * 128).cast("int")
    wav = F.concat(
        F.encode(F.lit("RIFF"), "UTF-8"),
        le(data_size + 36, 4),
        F.encode(F.lit("WAVEfmt "), "UTF-8"),
        le(F.lit(16), 4),           # fmt chunk size
        le(F.lit(1), 2),            # PCM
        le(channels, 2),
        le(rate, 4),
        le(rate * channels * 2, 4),  # byte rate
        le(channels * 2, 2),         # block align
        le(F.lit(16), 2),            # bits per sample
        F.encode(F.lit("data"), "UTF-8"),
        le(data_size, 4),
    )
    payload = F.when(
        F.col("media_id") % 13 == 0, F.encode(F.lit("static noise"), "UTF-8")
    ).otherwise(wav)
    return mm.wav_meta(media.select("media_id", payload.alias("payload")))


ORACLE["multimodal_wav_meta"] = """
WITH p AS (
  SELECT doc_id,
         CAST(doc_id % 2 + 1 AS INT) AS channels,
         [8000, 16000, 44100][CAST(doc_id % 3 AS INT) + 1] AS rate,
         (n_chars % 640 + 1) * 128 AS data_size
  FROM documents
)
SELECT doc_id AS media_id,
       CASE WHEN doc_id % 13 = 0 THEN NULL ELSE channels END AS channels,
       CASE WHEN doc_id % 13 = 0 THEN NULL ELSE CAST(rate AS INT) END AS sample_rate,
       CASE WHEN doc_id % 13 = 0 THEN NULL ELSE 16 END AS bits,
       CASE WHEN doc_id % 13 = 0 THEN NULL
            ELSE CAST(data_size AS BIGINT) * 1000 // (rate * channels * 2)
       END AS duration_ms
FROM p
"""


_PNG_FIXTURE_P = 2147483629


def _png_fixture_payloads(it):
    """mapInPandas worker for :func:`_png_pixel_fixture`: numpy-vectorized
    pixel synthesis + stdlib zlib framing, BYTE-IDENTICAL to the SQL
    builder (:func:`_png_pixel_fixture_sql`) — pinned by pytest at
    sf0.001 and proven by full-corpus md5 comparison at sf0.01/sf0.1
    during the r13 optimization round. All intermediates stay < 2^62 in
    int64 (h < p ~ 2^31, h*h < 2^62), matching the SQL builder's
    BIGINT-safety argument."""
    import struct
    import zlib

    import numpy as np
    import pandas as pd

    P = _PNG_FIXTURE_P
    x = np.arange(16, dtype=np.int64)[None, :]
    y = np.arange(16, dtype=np.int64)[:, None]

    def mix(d, a, bc, cc):
        h = (d * a + x * bc + y * cc + 7) % P
        h = (h * h) % P
        return (h * h) % P % 256

    sig = b"\x89PNG\r\n\x1a\n"
    iend = b"\x00\x00\x00\x00IEND\xaeB`\x82"
    for pdf in it:
        mids: list[int] = []
        payloads: list[bytes] = []
        for d in pdf["d"]:
            d = int(d)
            r0 = mix(d, 131, 17, 29)
            g = mix(d, 137, 23, 31)
            b = mix(d, 139, 19, 37)
            is_gray = d % 2 == 0
            px, py = (d * 3) % 16, (d * 5) % 16
            for v in (0, 1):
                r = r0
                if v:
                    r = r0.copy()
                    r[py, px] = (r[py, px] + 1) % 256
                if is_gray:
                    rows = ((299 * r + 587 * g + 114 * b) // 1000).astype(
                        np.uint8
                    )
                    color_type = 0
                else:
                    rows = (
                        np.stack([r, g, b], axis=2)
                        .astype(np.uint8)
                        .reshape(16, 48)
                    )
                    color_type = 2
                raw = np.zeros((16, rows.shape[1] + 1), dtype=np.uint8)
                raw[:, 1:] = rows  # filter byte 0 per scanline
                raw_b = raw.tobytes()
                n_raw = len(raw_b)
                zl = (
                    b"\x78\x01\x01"
                    + struct.pack("<HH", n_raw, 0xFFFF - n_raw)
                    + raw_b
                    + struct.pack(">I", zlib.adler32(raw_b))
                )
                ihdr = struct.pack(">IIBBBBB", 16, 16, 8, color_type, 0, 0, 0)
                payload = (
                    sig
                    + struct.pack(">I", 13)
                    + b"IHDR"
                    + ihdr
                    + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr))
                    + struct.pack(">I", len(zl))
                    + b"IDAT"
                    + zl
                    + struct.pack(">I", zlib.crc32(b"IDAT" + zl))
                    + iend
                )
                mids.append(d * 2 + v)
                payloads.append(payload)
        yield pd.DataFrame({"media_id": mids, "payload": payloads})


def _png_pixel_fixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(media_id, payload): spec-conformant PNGs with real PIXEL content,
    same contract as :func:`_png_pixel_fixture_sql` (the original
    SQL-built form, kept as the parity twin) but synthesized
    numpy-vectorized in one mapInPandas — BYTE-IDENTICAL payloads,
    pytest-pinned. The SQL builder's giant interpreted higher-order
    expression tree cost 5–85 s per evaluation at sf0.1 (non-codegen
    lambda interpretation, progressively JIT-warmed: measured 84 → 52 →
    8 s across three runs in one session); the numpy form is ~1
    CPU-second total and stable from the first run (optimization guide
    §4.2 — hand whole batches to vectorized native code). The DuckDB
    oracles still state the decoded pixels arithmetically from the same
    closed-form formulas, so every downstream decode certificate is
    unchanged."""
    from pyspark.sql import functions as F

    register_views(spark, sf_dir, ("documents",))
    docs = spark.table("documents").select(F.col("doc_id").alias("d"))
    return docs.mapInPandas(
        _png_fixture_payloads, "media_id long, payload binary"
    )


def _png_pixel_fixture_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(media_id, payload): SQL-BUILT spec-conformant PNGs with real
    PIXEL content — the L49 fixture move extended from headers to full
    images. Gray (even doc_id) or RGB (odd), 16x16, bit depth 8, zlib
    STORED blocks (deflate BTYPE 00 — SQL-expressible, no compressor
    needed), filter 0 scanlines; the adler32 folds in-plan alongside the
    byte stream and the chunk CRCs come from F.crc32 (same IEEE
    polynomial as PNG), so the ENTIRE payload is JVM-side codegen and
    the DuckDB oracle can state the decoded luminance arithmetically.
    Each document yields two variants: v=0 the base image, v=1 with ONE
    red-channel value bumped (+1 mod 256) at a doc-keyed pixel — a
    perceptual near-duplicate that perturbs at most one downsample cell
    and therefore at most 2 dHash bits. Compressed-IDAT PNGs (all five
    filter types, all color types incl. palette) are covered by the
    encode_png round-trip pytests, which no SQL oracle could replay.

    r13 optimization round: retired from the query path in favor of the
    byte-identical numpy twin (:func:`_png_pixel_fixture`) — the nested
    transform/aggregate lambdas run INTERPRETED (no whole-stage codegen
    for higher-order functions), which made this builder the dominant
    cost of all five PNG-decode certificates. Kept as the independent
    cross-implementation witness the parity pytest runs against."""
    from pyspark.sql import functions as F

    register_views(spark, sf_dir, ("documents",))
    docs = spark.table("documents").select(F.col("doc_id").alias("d"))
    media = docs.select(
        "d", F.explode(F.array(F.lit(0), F.lit(1))).alias("v")
    )
    d, v = F.col("d"), F.col("v")
    is_gray = d % 2 == 0
    stride = F.when(is_gray, F.lit(17)).otherwise(F.lit(49)).cast("long")
    n_raw = stride * 16

    def idiv(a, b):
        return F.floor(a / b).cast("long")

    def hx2(c):
        return F.lpad(F.hex(c), 2, "0")

    def byte_at(i):
        y = idiv(i, stride)
        k = i % stride
        x = F.when(is_gray, k - 1).otherwise(idiv(k - 1, F.lit(3)))
        c = (k - 1) % 3
        perturb = F.when(
            (v == 1) & (x == (d * 3) % 16) & (y == (d * 5) % 16), F.lit(1)
        ).otherwise(F.lit(0))

        # double-squared hash mixing mod a 31-bit prime: h mod p,
        # squared mod p TWICE, low byte. Each property is load-bearing:
        # a LINEAR formula makes every doc share gradients and floods
        # the near-dup join with cross-doc pairs; a SMALL prime makes
        # docs p apart byte-identical (collision clusters that grow
        # with the corpus — measured: 84k pairs at sf0.1 under p=1009);
        # ONE squaring under a 31-bit p barely wraps for small h, so
        # the low byte stays structured (h^2 mod 256 depends only on
        # h mod 128 — measured ~1-3k spurious near-pairs); and p must
        # not be Mersenne (2^31-1's bit-rotation structure leaks into
        # the low byte). p = 2147483629 double-squared gives exactly
        # the 1-per-doc variant pairs at sf0.01/sf0.1/synth-stride ids,
        # and every intermediate stays < 2^62, BIGINT-safe for any
        # doc_id on both engines.
        def mix(a, bc, cc):
            h = (d * a + x * bc + y * cc + 7) % 2147483629
            h = (h * h) % 2147483629
            return (h * h) % 2147483629 % 256

        r = (mix(131, 17, 29) + perturb) % 256
        g = mix(137, 23, 31)
        b = mix(139, 19, 37)
        lum = idiv(299 * r + 587 * g + 114 * b, F.lit(1000))
        pix = F.when(is_gray, lum).otherwise(
            F.when(c == 0, r).otherwise(F.when(c == 1, g).otherwise(b))
        )
        return F.when(k == 0, F.lit(0).cast("long")).otherwise(
            pix.cast("long")
        )

    # one transform + one array_join, NOT a string-accumulating fold: a
    # fold copies the growing hex string on every step (O(bytes^2) per
    # image — measured 12.5 s of the 15 s sf0.1 wall-clock before this
    # form). The adler32 sums fold over the byte ARRAY in closed form:
    # s1 = (1 + Σb) mod 65521, s2 = (n + Σ (n-i)·b_i) mod 65521 (i
    # 0-based) — both sums < 2^28, so one mod at the end is exact.
    idx = F.sequence(F.lit(0).cast("long"), n_raw - 1)
    bytes_arr = F.transform(idx, byte_at)
    raw_hex = F.array_join(F.transform(bytes_arr, hx2), "")
    byte_sum = F.aggregate(
        bytes_arr, F.lit(0).cast("long"), lambda a, x: a + x
    )
    s1 = (F.lit(1).cast("long") + byte_sum) % 65521
    weighted = F.aggregate(
        F.zip_with(bytes_arr, idx, lambda b, i: (n_raw - i) * b),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    s2 = (n_raw + weighted) % 65521
    adler_hex = F.concat(
        F.lpad(F.hex(s2), 4, "0"), F.lpad(F.hex(s1), 4, "0")
    )
    len_le = F.concat(hx2(n_raw % 256), hx2(idiv(n_raw, F.lit(256))))
    nlen = F.lit(65535).cast("long") - n_raw
    nlen_le = F.concat(hx2(nlen % 256), hx2(idiv(nlen, F.lit(256))))
    zlib_hex = F.concat(F.lit("780101"), len_le, nlen_le, raw_hex, adler_hex)
    ihdr_hex = F.concat(
        F.lit("00000010" "00000010" "08"),
        F.when(is_gray, F.lit("00")).otherwise(F.lit("02")),
        F.lit("000000"),
    )
    ihdr_crc = F.lpad(
        F.hex(F.crc32(F.unhex(F.concat(F.lit("49484452"), ihdr_hex)))), 8, "0"
    )
    idat_len = F.lpad(F.hex(n_raw + 11), 8, "0")
    idat_crc = F.lpad(
        F.hex(F.crc32(F.unhex(F.concat(F.lit("49444154"), zlib_hex)))), 8, "0"
    )
    payload_hex = F.concat(
        F.lit("89504E470D0A1A0A0000000D49484452"),
        ihdr_hex,
        ihdr_crc,
        idat_len,
        F.lit("49444154"),
        zlib_hex,
        idat_crc,
        F.lit("0000000049454E44AE426082"),
    )
    return media.select(
        (d * 2 + v).alias("media_id"), F.unhex(payload_hex).alias("payload")
    )


def _q_image_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL pixel decode round-trip (the round-10 verdict's remaining
    stub, closed): SQL-built PNGs (see _png_pixel_fixture) →
    ``multimodal.parse_png_pixels`` (stdlib zlib inflate + defilter) →
    integer luminance → 8x8 box-downsample → aHash + dHash, Arrow-batched
    in one mapInPandas. The oracle replays pixel → luminance → grid →
    hash arithmetic from the fixture formulas, so ANY decoder regression
    (chunk walk, inflate, stride math, gray-vs-RGB sample layout,
    luminance coefficients, grid boundaries, bit packing, two's
    complement) hash-fails."""
    from .llm import multimodal as mm

    return mm.image_phash(_png_pixel_fixture(spark, sf_dir))


ORACLE["image_phash"] = """
WITH m AS (
  SELECT doc_id AS d, v
  FROM documents, (VALUES (0), (1)) AS var(v)
),
px AS (
  SELECT d, v, xx.x AS x, yy.y AS y,
         (h1.h * h1.h % 2147483629 % 256
          + CASE WHEN v = 1 AND xx.x = d*3 % 16 AND yy.y = d*5 % 16
                 THEN 1 ELSE 0 END) % 256 AS r,
         h2.h * h2.h % 2147483629 % 256 AS g,
         h3.h * h3.h % 2147483629 % 256 AS b
  FROM m, range(16) xx(x), range(16) yy(y),
       LATERAL (SELECT (d*131 + xx.x*17 + yy.y*29 + 7) % 2147483629
                       * ((d*131 + xx.x*17 + yy.y*29 + 7) % 2147483629)
                       % 2147483629 AS h) h1,
       LATERAL (SELECT (d*137 + xx.x*23 + yy.y*31 + 7) % 2147483629
                       * ((d*137 + xx.x*23 + yy.y*31 + 7) % 2147483629)
                       % 2147483629 AS h) h2,
       LATERAL (SELECT (d*139 + xx.x*19 + yy.y*37 + 7) % 2147483629
                       * ((d*139 + xx.x*19 + yy.y*37 + 7) % 2147483629)
                       % 2147483629 AS h) h3
),
cell AS (
  SELECT d, v, y // 2 AS cy, x // 2 AS cx,
         sum((299*r + 587*g + 114*b) // 1000) // 4 AS cv
  FROM px GROUP BY d, v, y // 2, x // 2
),
mu AS (SELECT d, v, sum(cv) // 64 AS mu FROM cell GROUP BY d, v),
ah AS (
  SELECT c.d, c.v,
         sum(CASE WHEN c.cv >= mu.mu
                  THEN CAST(1 AS HUGEINT) << CAST(8*c.cy + c.cx AS INT)
                  ELSE 0 END) AS h
  FROM cell c JOIN mu ON c.d = mu.d AND c.v = mu.v
  GROUP BY c.d, c.v
),
dh AS (
  SELECT a.d, a.v,
         sum(CASE WHEN a.cv < b.cv
                  THEN CAST(1 AS HUGEINT) << CAST(8*a.cy + a.cx AS INT)
                  ELSE 0 END) AS h
  FROM cell a JOIN cell b
    ON a.d = b.d AND a.v = b.v AND a.cy = b.cy AND b.cx = (a.cx + 1) % 8
  GROUP BY a.d, a.v
)
SELECT m.d*2 + m.v AS media_id,
       CAST(16 AS INT) AS width, CAST(16 AS INT) AS height,
       CAST(CASE WHEN ah.h >= 9223372036854775808::HUGEINT
                 THEN ah.h - 18446744073709551616::HUGEINT ELSE ah.h END
            AS BIGINT) AS ahash64,
       CAST(CASE WHEN dh.h >= 9223372036854775808::HUGEINT
                 THEN dh.h - 18446744073709551616::HUGEINT ELSE dh.h END
            AS BIGINT) AS dhash64
FROM m
JOIN ah ON m.d = ah.d AND m.v = ah.v
JOIN dh ON m.d = dh.d AND m.v = dh.v
"""


# one-slot per-session cache of the decoded hash relation (own slot:
# the banded self-join references it twice; sharing another query's
# slot could unpersist a frame mid-plan)
_PHASH_PERSIST: dict[str, DataFrame] = {}


_PHASH_MAX_BUCKET = 64


def _q_image_phash_near_dup(
    spark: SparkSession, sf_dir: str, max_bucket: int | None = _PHASH_MAX_BUCKET
) -> DataFrame:
    """Perceptual image near-dup (the LAION-style image-dedup stage):
    dHash fingerprints from the REAL decode path, then
    ``multimodal.phash_near_dup``'s BANDED pair generation — 4 disjoint
    16-bit bands, equi-join per band, exact bit_count verify on
    candidates only. Exact by pigeonhole (hamming <= 3 < 4 bands forces
    at least one identical band) on spread hashes, so at this fixture
    the all-pairs relation coincides; at 100 TB the banded join shuffles
    on (band, value) buckets while all-pairs would be quadratic. The
    registry default caps bucket occupancy at ``_PHASH_MAX_BUCKET``
    (VERDICT r11 #2 — real crawls flood dhash64 = 0 with flat images
    and one degenerate bucket squares); the oracle REPLAYS the cap, and
    the uncapped twin stays registered as the exactness cross-check.
    The hash relation persists (one-slot per-session swap, the
    estimator-query pattern): the banded self-join would otherwise
    evaluate the decode subtree TWICE — and at scale the fingerprints
    are tiny next to the images they summarize, so caching them IS the
    production move."""
    from .llm import multimodal as mm

    app_id = spark.sparkContext.applicationId
    prev = _PHASH_PERSIST.pop(app_id, None)
    if prev is not None:
        prev.unpersist()
    hashes = mm.image_phash(_png_pixel_fixture(spark, sf_dir)).persist()
    _PHASH_PERSIST[app_id] = hashes
    return mm.phash_near_dup(
        hashes, max_hamming=3, bands=4, max_bucket=max_bucket
    )


def _q_image_phash_near_dup_uncapped(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Uncapped exactness twin (the L4/L15 capped/uncapped precedent):
    the pure pigeonhole relation, checked against the ALL-PAIRS oracle —
    proves banding itself loses nothing; the capped registry default
    above proves the occupancy guard replays deterministically."""
    return _q_image_phash_near_dup(spark, sf_dir, max_bucket=None)


# shared oracle head: fixture pixels → dHash (replays decode + hash
# arithmetic); capped/uncapped tails differ only in candidate generation
# m + px prefix shared with the resize-pixels oracle (which groups the
# SAME closed-form source pixels into 4x4 block means instead of the
# phash 8x8 cells)
_PHASH_PX_HEAD = """
WITH m AS (
  SELECT doc_id AS d, v
  FROM documents, (VALUES (0), (1)) AS var(v)
),
px AS (
  SELECT d, v, xx.x AS x, yy.y AS y,
         (h1.h * h1.h % 2147483629 % 256
          + CASE WHEN v = 1 AND xx.x = d*3 % 16 AND yy.y = d*5 % 16
                 THEN 1 ELSE 0 END) % 256 AS r,
         h2.h * h2.h % 2147483629 % 256 AS g,
         h3.h * h3.h % 2147483629 % 256 AS b
  FROM m, range(16) xx(x), range(16) yy(y),
       LATERAL (SELECT (d*131 + xx.x*17 + yy.y*29 + 7) % 2147483629
                       * ((d*131 + xx.x*17 + yy.y*29 + 7) % 2147483629)
                       % 2147483629 AS h) h1,
       LATERAL (SELECT (d*137 + xx.x*23 + yy.y*31 + 7) % 2147483629
                       * ((d*137 + xx.x*23 + yy.y*31 + 7) % 2147483629)
                       % 2147483629 AS h) h2,
       LATERAL (SELECT (d*139 + xx.x*19 + yy.y*37 + 7) % 2147483629
                       * ((d*139 + xx.x*19 + yy.y*37 + 7) % 2147483629)
                       % 2147483629 AS h) h3
)"""

_PHASH_DH_HEAD = _PHASH_PX_HEAD + """,
cell AS (
  SELECT d, v, y // 2 AS cy, x // 2 AS cx,
         sum((299*r + 587*g + 114*b) // 1000) // 4 AS cv
  FROM px GROUP BY d, v, y // 2, x // 2
),
dh AS (
  SELECT a.d, a.v,
         CAST(CASE WHEN s >= 9223372036854775808::HUGEINT
                   THEN s - 18446744073709551616::HUGEINT ELSE s END
              AS BIGINT) AS h
  FROM (
    SELECT a.d, a.v,
           sum(CASE WHEN a.cv < b.cv
                    THEN CAST(1 AS HUGEINT) << CAST(8*a.cy + a.cx AS INT)
                    ELSE 0 END) AS s
    FROM cell a JOIN cell b
      ON a.d = b.d AND a.v = b.v AND a.cy = b.cy AND b.cx = (a.cx + 1) % 8
    GROUP BY a.d, a.v
  ) a(d, v, s)
),
hh AS (SELECT d*2 + v AS media_id, h,
              CASE WHEN h < 0
                   THEN CAST(h AS HUGEINT) + 18446744073709551616::HUGEINT
                   ELSE CAST(h AS HUGEINT) END AS hu
       FROM dh)"""

ORACLE["image_phash_near_dup_uncapped"] = _PHASH_DH_HEAD + """
SELECT a.media_id AS id_a, b.media_id AS id_b,
       CAST(bit_count(xor(a.h, b.h)) AS INT) AS hamming
FROM hh a JOIN hh b
  ON a.media_id < b.media_id AND bit_count(xor(a.h, b.h)) <= 3
"""

# registry default: replay phash_near_dup's occupancy cap exactly —
# explode the 4 disjoint 16-bit bands off the UNSIGNED hash, keep the
# first _PHASH_MAX_BUCKET ids per (band_idx, band_val) bucket
# (row_number ordered by id, the _cap_banding discipline), pair within
# surviving buckets, exact bit_count verify
ORACLE["image_phash_near_dup"] = _PHASH_DH_HEAD + f""",
bands AS (
  SELECT media_id, h, j.band_idx,
         CAST((hu >> CAST(16 * j.band_idx AS INT)) & 65535 AS BIGINT)
           AS band_val
  FROM hh, (VALUES (0), (1), (2), (3)) AS j(band_idx)
),
capped AS (
  SELECT media_id, h, band_idx, band_val FROM (
    SELECT *, row_number() OVER (
        PARTITION BY band_idx, band_val ORDER BY media_id) AS rk
    FROM bands)
  WHERE rk <= {_PHASH_MAX_BUCKET}
),
cand AS (
  SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b,
                  a.h AS ha, b.h AS hb
  FROM capped a JOIN capped b
    ON a.band_idx = b.band_idx AND a.band_val = b.band_val
   AND a.media_id < b.media_id
)
SELECT id_a, id_b, CAST(bit_count(xor(ha, hb)) AS INT) AS hamming
FROM cand WHERE bit_count(xor(ha, hb)) <= 3
"""


def _q_multimodal_mp4_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video leg of the container trio: SQL builds ISO-BMFF bytes (ftyp +
    moov/mvhd v0 with per-row timescale/duration, big-endian u32s via
    hex/lpad/unhex), garbage every 11th row; ``multimodal.parse_mp4_meta``
    box-walks them back against an arithmetic oracle (floor-division
    milliseconds both sides)."""
    from pyspark.sql import functions as F

    from .llm import multimodal as mm

    def be4(col):
        return F.unhex(F.lpad(F.hex(col), 8, "0"))

    media = _media_frame(spark, sf_dir, with_payload=False)
    timescale = F.element_at(
        F.array(F.lit(600), F.lit(1000), F.lit(90000)),
        (F.col("media_id") % 3 + 1).cast("int"),
    )
    duration = (F.col("width").cast("long") * 100).cast("int")
    mp4 = F.concat(
        F.unhex(F.lit("00000010")), F.encode(F.lit("ftypisom"), "UTF-8"),
        F.unhex(F.lit("00000200")),
        be4(F.lit(36)), F.encode(F.lit("moov"), "UTF-8"),
        be4(F.lit(28)), F.encode(F.lit("mvhd"), "UTF-8"),
        F.unhex(F.lit("000000000000000000000000")),  # ver/flags, ctime, mtime
        be4(timescale),
        be4(duration),
    )
    payload = F.when(
        F.col("media_id") % 11 == 0, F.encode(F.lit("no box here"), "UTF-8")
    ).otherwise(mp4)
    return mm.mp4_meta(media.select("media_id", payload.alias("payload")))


ORACLE["multimodal_mp4_meta"] = """
WITH p AS (
  SELECT doc_id,
         [600, 1000, 90000][CAST(doc_id % 3 AS INT) + 1] AS ts,
         CAST(n_chars % 640 + 1 AS BIGINT) * 100 AS dur
  FROM documents
)
SELECT doc_id AS media_id,
       CASE WHEN doc_id % 11 = 0 THEN NULL ELSE CAST(ts AS INT) END AS timescale,
       CASE WHEN doc_id % 11 = 0 THEN NULL
            ELSE dur * 1000 // ts END AS duration_ms
FROM p
"""


def _q_multimodal_jpeg_pixels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL baseline JPEG pixel round-trip (VERDICT r11 #4 — the last
    image-pixel stub, closed): per doc, a deterministic 16x16 grayscale
    image of 2x2 FLAT 8x8 blocks (levels from the double-squared
    31-bit-prime mix — the _png_pixel_fixture discipline) is encoded by
    ``multimodal.encode_jpeg`` (FDCT + quantize + canonical Huffman
    tables) and decoded back by ``multimodal.parse_jpeg_pixels`` (the
    full marker walk, DHT Huffman entropy decode, dequant, inverse
    zigzag, IDCT) inside one Arrow-batched mapInPandas. Flat blocks with
    the Q[0]=8 exact-DC quant table round-trip BIT-EXACTLY, so the
    oracle replays the expected pixels in closed form — any regression
    anywhere in the codec chain (bit packing, Huffman assignment, EXTEND
    sign decode, zigzag, IDCT scaling, level shift) changes px_checksum
    and hash-fails. Unlike the PNG fixture the payload is built in the
    Python worker (a Huffman BITSTREAM is not reasonably expressible in
    SQL); the oracle certifies the pixels, the pytest suite certifies
    the byte format (hand-built streams, truncation sweeps, independent
    IDCT). AC-path coverage lives in the pytests — AC blocks involve
    float IDCT rounding, which is not replayable as integer SQL."""
    import pandas as pd

    from .llm import multimodal as mm

    register_views(spark, sf_dir, ("documents",))
    docs = spark.table("documents").select("doc_id")
    P = 2147483629

    def level(d: int, by: int, bx: int) -> int:
        h0 = (d * 131 + by * 17 + bx * 29 + 7) % P
        h1 = h0 * h0 % P
        return (h1 * h1 % P) % 256

    def batches(it):
        for pdf in it:
            out = {"media_id": [], "width": [], "height": [],
                   "px_sum": [], "px_checksum": []}
            for d in pdf["doc_id"]:
                d = int(d)
                rows = [[level(d, y // 8, x // 8) for x in range(16)]
                        for y in range(16)]
                got = mm.parse_jpeg_pixels(mm.encode_jpeg(rows))
                out["media_id"].append(d)
                if got is None:
                    out["width"].append(None)
                    out["height"].append(None)
                    out["px_sum"].append(None)
                    out["px_checksum"].append(None)
                    continue
                w, h, px = got
                out["width"].append(w)
                out["height"].append(h)
                out["px_sum"].append(
                    sum(px[y][x][0] for y in range(h) for x in range(w))
                )
                out["px_checksum"].append(
                    sum(px[y][x][0] * ((x + 1) + 17 * (y + 1))
                        for y in range(h) for x in range(w))
                )
            yield pd.DataFrame(out)

    schema = (
        "media_id long, width int, height int, "
        "px_sum long, px_checksum long"
    )
    return docs.mapInPandas(batches, schema)


ORACLE["multimodal_jpeg_pixels"] = """
WITH px AS (
  SELECT d.doc_id AS media_id, xx.x AS x, yy.y AS y,
         (h1.h * h1.h % 2147483629) % 256 AS g
  FROM documents d, range(16) xx(x), range(16) yy(y),
       LATERAL (SELECT (d.doc_id*131 + (yy.y//8)*17 + (xx.x//8)*29 + 7)
                       % 2147483629
                     * ((d.doc_id*131 + (yy.y//8)*17 + (xx.x//8)*29 + 7)
                       % 2147483629)
                     % 2147483629 AS h) h1
)
SELECT media_id, CAST(16 AS INT) AS width, CAST(16 AS INT) AS height,
       CAST(sum(g) AS BIGINT) AS px_sum,
       CAST(sum(g * ((x+1) + 17*(y+1))) AS BIGINT) AS px_checksum
FROM px GROUP BY media_id
"""


def _q_multimodal_wav_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL PCM audio sample decode (L89 — the AUDIO leg of decode_stub
    closed): per doc, a SQL-BUILT spec-conformant 16-bit PCM WAV (mono
    for even doc_id, stereo interleaved for odd; 64 frames at 8 kHz;
    samples from the double-squared 31-bit-prime mix, centered to signed
    int16) is decoded by ``multimodal.parse_wav_samples`` (RIFF chunk
    walk, format/alignment/bomb guards, little-endian two's-complement
    widening) inside one Arrow-batched mapInPandas, reduced to the
    integer audio telemetry a curation pass filters on. PCM is
    uncompressed, so — unlike the JPEG bitstream — the WHOLE payload is
    JVM-side codegen (the _png_pixel_fixture discipline) and the oracle
    states every sample arithmetically: any regression in the chunk
    walk, sign widening, or channel interleave shifts the
    position-weighted checksum and hash-fails. 8/24/32-bit depths,
    malformed-input totality, and the declared-size bomb guard are
    pytest-covered (round-trip + hypothesis fuzz)."""
    from pyspark.sql import functions as F

    from .llm import multimodal as mm

    register_views(spark, sf_dir, ("documents",))
    docs = spark.table("documents").select(F.col("doc_id").alias("d"))
    d = F.col("d")
    P = 2147483629
    ch = (d % 2 + 1).cast("long")
    n_s = ch * 64  # interleaved sample count (64 frames)

    def idiv(a, b):
        return F.floor(a / b).cast("long")

    def hx2(c):
        return F.lpad(F.hex(c.cast("long") % 256), 2, "0")

    def le2(c):
        return F.concat(hx2(c), hx2(idiv(c, F.lit(256))))

    def le4(c):
        return F.concat(
            hx2(c), hx2(idiv(c, F.lit(256))),
            hx2(idiv(c, F.lit(65536))), hx2(idiv(c, F.lit(16777216))),
        )

    def sample_le(j):
        h = (d * 131 + j * 17 + 7) % P
        h = (h * h) % P
        u = (h * h) % P % 65536  # signed sample is u - 32768,
        # whose two's-complement halfword is (u + 32768) mod 65536
        return le2((u + 32768) % 65536)

    samples_hex = F.array_join(
        F.transform(F.sequence(F.lit(0).cast("long"), n_s - 1), sample_le),
        "",
    )
    payload_hex = F.concat(
        F.lit("52494646"), le4(n_s * 2 + 36), F.lit("57415645"),
        F.lit("666D7420"), le4(F.lit(16)), le2(F.lit(1)), le2(ch),
        le4(F.lit(8000)), le4(ch * 16000), le2(ch * 2), le2(F.lit(16)),
        F.lit("64617461"), le4(n_s * 2), samples_hex,
    )
    fixture = docs.select(
        d.alias("media_id"), F.unhex(payload_hex).alias("payload")
    )
    return mm.wav_features(fixture)


ORACLE["multimodal_wav_samples"] = """
WITH s AS (
  SELECT d.doc_id AS media_id, 1 + d.doc_id % 2 AS ch, j.j AS j,
         (h1.h * h1.h % 2147483629) % 65536 - 32768 AS v
  FROM documents d, range(128) j(j),
       LATERAL (SELECT (d.doc_id*131 + j.j*17 + 7) % 2147483629
                     * ((d.doc_id*131 + j.j*17 + 7) % 2147483629)
                     % 2147483629 AS h) h1
  WHERE j.j < 64 * (1 + d.doc_id % 2)
)
SELECT media_id, CAST(ch AS INT) AS channels,
       CAST(8000 AS INT) AS sample_rate,
       CAST(64 AS BIGINT) AS n_frames,
       CAST(max(abs(v)) AS BIGINT) AS peak,
       CAST(sum(v) AS BIGINT) AS sum_val,
       CAST(sum(v * (j + 1)) AS BIGINT) AS checksum
FROM s GROUP BY media_id, ch
"""


def _q_multimodal_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video pixel decode (L92 — the LAST decode stub in the
    engine, closed): per doc, an MJPEG-in-AVI video of ``doc_id % 3 + 1``
    frames — each frame a 16x16 grayscale baseline JPEG of 2x2 FLAT 8x8
    blocks (levels from the double-squared 31-bit-prime mix with the
    frame index folded in) — is containerized by
    ``multimodal.encode_avi`` (RIFF: hdrl avih/strh/strf + movi '00dc'
    chunks + idx1) and decoded back by ``multimodal.video_frames``
    (the production mapInPandas op: RIFF walk → per-frame Huffman/DCT
    JPEG decode → luminance grid → box-downsample → ahash64/dhash64).
    Flat blocks round-trip BIT-EXACTLY through the JPEG codec
    (the multimodal_jpeg_pixels discipline) and gray luminance is the
    identity, so the oracle replays the ENTIRE library output — frame
    count, dimensions, luminance sum, and both 64-bit perceptual hashes
    — in closed-form SQL: a regression anywhere in the container walk,
    frame/header cross-checks, JPEG entropy decode, downsample
    boundaries, or hash bit packing flips a value and hash-fails.
    Container malformation totality (truncation sweeps, size bombs,
    frame-count lies, dimension mismatches, rec-list scope) is
    pytest-covered. Reference analog: fixed-function typed decode,
    /root/reference/src/FlatbufferReader.h:26-85."""
    import pandas as pd

    from .llm import multimodal as mm

    register_views(spark, sf_dir, ("documents",))
    docs = spark.table("documents").select("doc_id")
    P = 2147483629

    def level(d: int, f: int, by: int, bx: int) -> int:
        h0 = (d * 131 + f * 9377 + by * 17 + bx * 29 + 7) % P
        h1 = h0 * h0 % P
        return (h1 * h1 % P) % 256

    def payloads(it):
        for pdf in it:
            mids, pls = [], []
            for d in pdf["doc_id"]:
                d = int(d)
                frames = [
                    mm.encode_jpeg(
                        [[level(d, f, y // 8, x // 8) for x in range(16)]
                         for y in range(16)]
                    )
                    for f in range(d % 3 + 1)
                ]
                mids.append(d)
                pls.append(mm.encode_avi(frames, 16, 16, fps=10))
            yield pd.DataFrame({"media_id": mids, "payload": pls})

    media = docs.mapInPandas(payloads, "media_id long, payload binary")
    return mm.video_frames(media)


# Cell value replay: the 16x16 frame is 2x2 flat 8x8 blocks, luminance
# of gray (v,v,v) is exactly v, and box_downsample's (c*16)//8
# boundaries keep every 2x2 cell inside one block — so cell (cy,cx) IS
# level(d, f, cy//4, cx//4), lum_sum is 4*sum(cells), ahash bit
# (8cy+cx) = cell >= floor-mean, dhash bit = cell < row-neighbor
# (wraparound). Bit 63 adds as its two's-complement value (the
# _signed64 convention; DuckDB raises on 1<<63, so it's a literal).
ORACLE["multimodal_video_frames"] = """
WITH fr AS (
  SELECT d.doc_id AS media_id, f.f AS frame_idx,
         CAST(d.doc_id % 3 + 1 AS INT) AS n_frames
  FROM documents d, range(3) f(f)
  WHERE f.f <= d.doc_id % 3
),
cells AS (
  SELECT fr.media_id, fr.frame_idx, fr.n_frames, cy.cy AS cy, cx.cx AS cx,
         (h1.h * h1.h % 2147483629) % 256 AS v
  FROM fr, range(8) cy(cy), range(8) cx(cx),
       LATERAL (SELECT (fr.media_id*131 + fr.frame_idx*9377
                        + (cy.cy//4)*17 + (cx.cx//4)*29 + 7) % 2147483629
                     * ((fr.media_id*131 + fr.frame_idx*9377
                         + (cy.cy//4)*17 + (cx.cx//4)*29 + 7) % 2147483629)
                     % 2147483629 AS h) h1
),
m AS (
  SELECT media_id, frame_idx, any_value(n_frames) AS n_frames,
         sum(v) // 64 AS mean, 4 * sum(v) AS lum_sum
  FROM cells GROUP BY media_id, frame_idx
),
bits AS (
  SELECT c.media_id, c.frame_idx,
         CASE WHEN c.v >= m.mean THEN
           CASE WHEN 8*c.cy + c.cx = 63 THEN -9223372036854775808
                ELSE (1::BIGINT << CAST(8*c.cy + c.cx AS INT)) END
           ELSE 0 END AS abit,
         CASE WHEN c.v < nx.v THEN
           CASE WHEN 8*c.cy + c.cx = 63 THEN -9223372036854775808
                ELSE (1::BIGINT << CAST(8*c.cy + c.cx AS INT)) END
           ELSE 0 END AS dbit
  FROM cells c
  JOIN m ON c.media_id = m.media_id AND c.frame_idx = m.frame_idx
  JOIN cells nx ON nx.media_id = c.media_id
               AND nx.frame_idx = c.frame_idx
               AND nx.cy = c.cy AND nx.cx = (c.cx + 1) % 8
)
SELECT b.media_id, CAST(b.frame_idx AS INT) AS frame_idx,
       CAST(m.n_frames AS INT) AS n_frames,
       CAST(16 AS INT) AS width, CAST(16 AS INT) AS height,
       CAST(m.lum_sum AS BIGINT) AS lum_sum,
       CAST(sum(b.abit) AS BIGINT) AS ahash,
       CAST(sum(b.dbit) AS BIGINT) AS dhash
FROM bits b
JOIN m ON b.media_id = m.media_id AND b.frame_idx = m.frame_idx
GROUP BY b.media_id, b.frame_idx, m.n_frames, m.lum_sum
"""


def _q_video_phash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-level perceptual near-dup (L93): the banded image-dedup
    machinery lifted to multi-frame media, end-to-end REAL — per doc
    TWO MJPEG-in-AVI videos (vid = doc_id*2 + v: the base L92 fixture,
    and a perturbed twin whose frame-0 top-left block level bumps by
    +1 mod 256 — the audio-fingerprint two-variant move), decoded by
    ``video_frames`` (container walk → JPEG codec → dhash per frame),
    paired by ``video_near_dup``: FRAME-ALIGNED band equi-join
    (pigeonhole-exact per frame at hamming ≤ 3 over 4 bands),
    occupancy-capped buckets, exact bit_count verify, and the
    at-least-half-the-shorter-video vote. Flat blocks round-trip the
    JPEG codec bit-exactly and gray luminance is the identity, so the
    oracle replays EVERYTHING — cells, dhash bits, band values built
    from bits (DuckDB cannot shift signed 64-bit patterns; the bit form
    is definitionally identical to Spark's shiftrightunsigned slices),
    the cap's row_number, candidate generation, per-frame hamming, and
    the vote — in closed-form SQL.

    Fixture density is DELIBERATE: 16x16 frames have four flat DCT
    blocks, so the dhash has only ~16 varying bits and unrelated videos
    collide freely — exactly the flood regime the occupancy cap exists
    for. The certificate therefore pins the cap path itself (row counts
    grow sublinearly: 6.4k pairs at sf0.01 → 7.3k at sf0.1 because
    saturated buckets stay at C(64,2)), alongside the constructed
    per-doc twin pairs whose perturbed frame the vote must absorb."""
    import pandas as pd

    from .llm import multimodal as mm

    register_views(spark, sf_dir, ("documents",))
    docs = spark.table("documents").select("doc_id")
    P = 2147483629

    def level(d: int, f: int, by: int, bx: int, v: int) -> int:
        h0 = (d * 131 + f * 9377 + by * 17 + bx * 29 + 7) % P
        h1 = h0 * h0 % P
        g = (h1 * h1 % P) % 256
        if v == 1 and f == 0 and by == 0 and bx == 0:
            g = (g + 1) % 256
        return g

    def payloads(it):
        for pdf in it:
            mids, pls = [], []
            for d in pdf["doc_id"]:
                d = int(d)
                for v in (0, 1):
                    frames = [
                        mm.encode_jpeg(
                            [[level(d, f, y // 8, x // 8, v)
                              for x in range(16)] for y in range(16)]
                        )
                        for f in range(d % 3 + 1)
                    ]
                    mids.append(d * 2 + v)
                    pls.append(mm.encode_avi(frames, 16, 16, fps=10))
            yield pd.DataFrame({"media_id": mids, "payload": pls})

    media = docs.mapInPandas(payloads, "media_id long, payload binary")
    # persist the decoded hash relation (the image_phash_near_dup
    # discipline): video_near_dup references it four times (both band
    # sides + both n_frames legs) and the codec must run ONCE
    frames = mm.video_frames(media).persist()
    return mm.video_near_dup(frames, hash_col="dhash")


ORACLE["video_phash_near_dup"] = """
WITH fr AS (
  SELECT d.doc_id AS doc, v.v AS v, d.doc_id*2 + v.v AS vid, f.f AS f,
         CAST(d.doc_id % 3 + 1 AS INT) AS nf
  FROM documents d, range(2) v(v), range(3) f(f)
  WHERE f.f <= d.doc_id % 3
),
cells AS (
  SELECT fr.vid, fr.f, cy.cy AS cy, cx.cx AS cx,
         ((h1.h * h1.h % 2147483629) % 256
          + CASE WHEN fr.v = 1 AND fr.f = 0 AND cy.cy < 4 AND cx.cx < 4
                 THEN 1 ELSE 0 END) % 256 AS val
  FROM fr, range(8) cy(cy), range(8) cx(cx),
       LATERAL (SELECT (fr.doc*131 + fr.f*9377
                        + (cy.cy//4)*17 + (cx.cx//4)*29 + 7) % 2147483629
                     * ((fr.doc*131 + fr.f*9377
                         + (cy.cy//4)*17 + (cx.cx//4)*29 + 7) % 2147483629)
                     % 2147483629 AS h) h1
),
dbits AS (
  SELECT c.vid, c.f, 8*c.cy + c.cx AS b,
         CASE WHEN c.val < nx.val THEN 1 ELSE 0 END AS bit
  FROM cells c
  JOIN cells nx ON nx.vid = c.vid AND nx.f = c.f AND nx.cy = c.cy
               AND nx.cx = (c.cx + 1) % 8
),
bands AS (
  SELECT vid, f, CAST(b // 16 AS INT) AS band_idx,
         CAST(sum(bit * (1::BIGINT << CAST(b % 16 AS INT))) AS BIGINT)
           AS band_val
  FROM dbits GROUP BY vid, f, b // 16
),
capped AS (
  SELECT vid, f, band_idx, band_val,
         row_number() OVER (PARTITION BY f, band_idx, band_val
                            ORDER BY vid) AS rk
  FROM bands
),
cand AS (
  SELECT DISTINCT a.vid AS id_a, b2.vid AS id_b, a.f AS f
  FROM capped a
  JOIN capped b2 ON a.f = b2.f AND a.band_idx = b2.band_idx
                AND a.band_val = b2.band_val AND a.vid < b2.vid
  WHERE a.rk <= 64 AND b2.rk <= 64
),
ham AS (
  SELECT c.id_a, c.id_b, c.f,
         sum(CASE WHEN da.bit <> db.bit THEN 1 ELSE 0 END) AS hd
  FROM cand c
  JOIN dbits da ON da.vid = c.id_a AND da.f = c.f
  JOIN dbits db ON db.vid = c.id_b AND db.f = c.f AND db.b = da.b
  GROUP BY c.id_a, c.id_b, c.f
),
m AS (
  SELECT id_a, id_b, count(*) AS n_matched
  FROM ham WHERE hd <= 3 GROUP BY id_a, id_b
),
nfr AS (SELECT DISTINCT vid, nf FROM fr)
SELECT m.id_a, m.id_b, CAST(m.n_matched AS BIGINT) AS n_matched,
       CAST(least(na.nf, nb.nf) AS INT) AS n_frames_min,
       m.n_matched * 2 >= least(na.nf, nb.nf) AS matched
FROM m JOIN nfr na ON na.vid = m.id_a JOIN nfr nb ON nb.vid = m.id_b
"""


def _wav_fixture_payloads(it):
    """mapInPandas worker for :func:`_wav_fp_fixture`: numpy-vectorized
    PCM synthesis, BYTE-IDENTICAL to the SQL builder
    (:func:`_wav_fp_fixture_sql`) — pinned by pytest at sf0.001 and
    proven by full-corpus md5 comparison at sf0.01/sf0.1 during the r13
    optimization round (the _png_fixture_payloads move, guide §4.2).
    All intermediates stay < 2^62 in int64 (h < P ~ 2^31, h*h < 2^62),
    matching the SQL builder's BIGINT-safety argument."""
    import struct

    import numpy as np
    import pandas as pd

    P = 2147483629
    for pdf in it:
        mids: list[int] = []
        payloads: list[bytes] = []
        for d in pdf["d"]:
            d = int(d)
            ch = d % 2 + 1
            n_s = ch * 128
            bump_j = (d * 7 % 61 + 1) * 2 * ch
            j = np.arange(n_s, dtype=np.int64)
            h = (d * 131 + j * 17 + 7) % P
            h = (h * h) % P
            u0 = (h * h) % P % 65536
            header = (
                b"RIFF" + struct.pack("<I", n_s * 2 + 36) + b"WAVE"
                + b"fmt " + struct.pack("<IHHIIHH", 16, 1, ch, 8000,
                                        ch * 16000, ch * 2, 16)
                + b"data" + struct.pack("<I", n_s * 2)
            )
            for v in (0, 1):
                u = u0
                if v:
                    u = u0.copy()
                    u[bump_j] += 1
                s16 = ((u - 32768) % 65536).astype("<u2")
                mids.append(d * 2 + v)
                payloads.append(header + s16.tobytes())
        yield pd.DataFrame({"media_id": mids, "payload": payloads})


def _wav_fp_fixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(media_id, payload): PCM WAVs for the audio-fingerprint family
    (L90), synthesized numpy-vectorized in one mapInPandas —
    BYTE-IDENTICAL to :func:`_wav_fp_fixture_sql` (the original SQL
    builder, kept as the cross-implementation witness), pytest-pinned.
    The SQL form's interpreted higher-order expression tree cost
    7.2 s cold / 1.3-1.8 s per warm evaluation at sf0.1 — and every
    consumer re-evaluates the fixture inline — vs ~0.1 CPU-seconds of
    numpy (r13, guide §4.2)."""
    from pyspark.sql import functions as F

    register_views(spark, sf_dir, ("documents",))
    docs = spark.table("documents").select(F.col("doc_id").alias("d"))
    return docs.mapInPandas(
        _wav_fixture_payloads, "media_id long, payload binary"
    )


def _wav_fp_fixture_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(media_id, payload): SQL-built PCM WAVs for the audio-fingerprint
    family (L90) — per doc TWO variants (the _png_pixel_fixture move):
    v=0 the base clip (128 frames, mono even doc_id / stereo odd,
    samples from the double-squared prime mix), v=1 with ONE halfword
    bumped +1 mod 65536 at the first sample of a doc-keyed window — the
    wrap keeps |amplitude| within 1 of the base (32767→-32768 moves
    |s| by exactly 1), so ONE window's energy moves by <=1 and at most
    the two adjacent gradient bits flip: a guaranteed near-duplicate at
    hamming <= 2."""
    from pyspark.sql import functions as F

    register_views(spark, sf_dir, ("documents",))
    docs = spark.table("documents").select(F.col("doc_id").alias("d"))
    media = docs.select(
        "d", F.explode(F.array(F.lit(0), F.lit(1))).alias("v")
    )
    d, v = F.col("d"), F.col("v")
    P = 2147483629
    ch = (d % 2 + 1).cast("long")
    n_s = ch * 128
    bump_j = (d * 7 % 61 + 1) * 2 * ch  # 1st sample of frame 2W, chan 0

    def idiv(a, b):
        return F.floor(a / b).cast("long")

    def hx2(c):
        return F.lpad(F.hex(c.cast("long") % 256), 2, "0")

    def le2(c):
        return F.concat(hx2(c), hx2(idiv(c, F.lit(256))))

    def le4(c):
        return F.concat(
            hx2(c), hx2(idiv(c, F.lit(256))),
            hx2(idiv(c, F.lit(65536))), hx2(idiv(c, F.lit(16777216))),
        )

    def sample_le(j):
        h = (d * 131 + j * 17 + 7) % P
        h = (h * h) % P
        u = (h * h) % P % 65536
        u = u + F.when((v == 1) & (j == bump_j), F.lit(1)).otherwise(
            F.lit(0)
        )
        return le2(((u - 32768) % 65536 + 65536) % 65536)

    samples_hex = F.array_join(
        F.transform(F.sequence(F.lit(0).cast("long"), n_s - 1), sample_le),
        "",
    )
    payload_hex = F.concat(
        F.lit("52494646"), le4(n_s * 2 + 36), F.lit("57415645"),
        F.lit("666D7420"), le4(F.lit(16)), le2(F.lit(1)), le2(ch),
        le4(F.lit(8000)), le4(ch * 16000), le2(ch * 2), le2(F.lit(16)),
        F.lit("64617461"), le4(n_s * 2), samples_hex,
    )
    return media.select(
        (d * 2 + v).alias("media_id"), F.unhex(payload_hex).alias("payload")
    )


_PHASH_LAYOUT_CACHE: dict[tuple[str, str], str] = {}


def _phash_layout(spark: SparkSession, sf_dir: str) -> str:
    """Session-memoized stored phash layout over the synthetic standing
    hashes (cheap arithmetic build — no pixel decode; the decode legs
    are certified by image_phash/multimodal_jpeg_pixels)."""
    import tempfile

    from .llm import multimodal as mm

    key = (spark.sparkContext.applicationId, sf_dir)
    path = _PHASH_LAYOUT_CACHE.get(key)
    if path is not None:
        return path
    path = tempfile.mkdtemp(prefix="k2n_phash_layout_")
    mm.write_phash_layout(
        _phash_standing_hashes(spark, sf_dir), path,
        hash_col="h", id_col="media_id",
    )
    _PHASH_LAYOUT_CACHE[key] = path
    return path


def _phash_standing_hashes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(media_id, h): spread 62-bit standing fingerprints — low 31 bits
    and high 31 bits from two independent double-squared prime mixes, so
    every 16-bit band carries entropy (a 31-bit-only hash would zero
    bands 2-3 and flood those buckets)."""
    from pyspark.sql import functions as F

    register_views(spark, sf_dir, ("documents",))
    d = F.col("doc_id")
    P = 2147483629

    def mix(a):
        h = (d * a + 7) % P
        h = (h * h) % P
        return (h * h) % P

    return spark.table("documents").select(
        d.alias("media_id"),
        (mix(131) + mix(137) * F.lit(2147483648).cast("long")).alias("h"),
    )


def _q_phash_stored_admission(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-dup admission against the STORED fingerprint layout
    (L91 — the image twin of incremental_neardup_stored_probe): the
    standing corpus's capped banded relation was written ONCE; per
    arrival batch only the arrival side bands, broadcast against the
    stored buckets, exact bit_count verify on candidates. Two probes
    per doc: a 1-bit-flipped twin of the standing hash (rejected at
    best_hamming 1) and an independently-mixed novel hash (admitted
    unless an incidental collision — the oracle replays whichever
    happens). The oracle replays the capped layout build AND the probe:
    banding, occupancy cap order, candidate join, min-hamming verify,
    the admitted rule."""
    from pyspark.sql import functions as F

    from .llm import multimodal as mm

    layout = _phash_layout(spark, sf_dir)
    register_views(spark, sf_dir, ("documents",))
    d = F.col("doc_id")
    P = 2147483629

    def mix(a):
        h = (d * a + 7) % P
        h = (h * h) % P
        return (h * h) % P

    std_h = mix(131) + mix(137) * F.lit(2147483648).cast("long")
    near = spark.table("documents").select(
        (d * 2 + 1000000).alias("media_id"),
        F.expr(
            "CAST(shiftleft(1L, CAST(doc_id % 62 AS INT)) AS BIGINT)"
        ).bitwiseXOR(std_h).alias("h"),
    )
    novel = spark.table("documents").select(
        (d * 2 + 1000001).alias("media_id"),
        (mix(151) + mix(157) * F.lit(2147483648).cast("long")).alias("h"),
    )
    return mm.phash_admission(
        spark, layout, near.unionByName(novel), hash_col="h",
        id_col="media_id",
    )


ORACLE["phash_stored_admission"] = """
WITH s AS (
  SELECT doc_id AS media_id,
         (h1.h * h1.h % 2147483629)
         + (h2.h * h2.h % 2147483629) * 2147483648 AS h
  FROM documents,
       LATERAL (SELECT (doc_id*131 + 7) % 2147483629
                     * ((doc_id*131 + 7) % 2147483629)
                     % 2147483629 AS h) h1,
       LATERAL (SELECT (doc_id*137 + 7) % 2147483629
                     * ((doc_id*137 + 7) % 2147483629)
                     % 2147483629 AS h) h2
),
stored AS (
  SELECT media_id, h, band_idx, band_val FROM (
    SELECT s.media_id, s.h, j.band_idx,
           (s.h >> CAST(16 * j.band_idx AS INT)) & 65535 AS band_val,
           row_number() OVER (
             PARTITION BY j.band_idx,
                          (s.h >> CAST(16 * j.band_idx AS INT)) & 65535
             ORDER BY s.media_id) AS rk
    FROM s, (VALUES (0), (1), (2), (3)) AS j(band_idx))
  WHERE rk <= 64
),
a AS (
  SELECT doc_id*2 + 1000000 AS media_id,
         xor(s.h, CAST(1 AS BIGINT) << CAST(doc_id % 62 AS INT)) AS h
  FROM documents JOIN s ON s.media_id = doc_id
  UNION ALL
  SELECT doc_id*2 + 1000001 AS media_id,
         (h3.h * h3.h % 2147483629)
         + (h4.h * h4.h % 2147483629) * 2147483648 AS h
  FROM documents,
       LATERAL (SELECT (doc_id*151 + 7) % 2147483629
                     * ((doc_id*151 + 7) % 2147483629)
                     % 2147483629 AS h) h3,
       LATERAL (SELECT (doc_id*157 + 7) % 2147483629
                     * ((doc_id*157 + 7) % 2147483629)
                     % 2147483629 AS h) h4
),
ab AS (
  SELECT a.media_id, a.h, j.band_idx,
         (a.h >> CAST(16 * j.band_idx AS INT)) & 65535 AS band_val
  FROM a, (VALUES (0), (1), (2), (3)) AS j(band_idx)
),
best AS (
  SELECT ab.media_id,
         min(bit_count(xor(ab.h, stored.h))) AS best_hamming
  FROM ab JOIN stored
    ON ab.band_idx = stored.band_idx AND ab.band_val = stored.band_val
  GROUP BY ab.media_id
)
SELECT a.media_id,
       coalesce(best.best_hamming > 3, TRUE) AS admitted,
       CAST(best.best_hamming AS INT) AS best_hamming
FROM a LEFT JOIN best ON a.media_id = best.media_id
"""


_VIDEO_PHASH_LAYOUT_CACHE: dict = {}


def _video_standing_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(media_id, frame_idx, n_frames, h): the standing video corpus as
    spread 62-bit per-frame fingerprints — two independent
    double-squared prime mixes with the frame index folded in (the
    _phash_standing_hashes discipline, one hash row per frame; nf =
    doc_id % 3 + 1 so vote denominators vary)."""
    from pyspark.sql import functions as F

    register_views(spark, sf_dir, ("documents",))
    return spark.table("documents").select(
        F.col("doc_id").alias("media_id"),
        F.explode(F.expr("sequence(0, CAST(doc_id % 3 AS INT))")).alias(
            "frame_idx"
        ),
        F.expr("CAST(doc_id % 3 + 1 AS INT)").alias("n_frames"),
    ).select(
        "media_id",
        F.col("frame_idx").cast("int").alias("frame_idx"),
        "n_frames",
        F.expr(
            "(media_id*131 + frame_idx*9377 + 7) % 2147483629"
            " * ((media_id*131 + frame_idx*9377 + 7) % 2147483629)"
            " % 2147483629"
            " * ((media_id*131 + frame_idx*9377 + 7) % 2147483629"
            "    * ((media_id*131 + frame_idx*9377 + 7) % 2147483629)"
            "    % 2147483629) % 2147483629"
            " + (media_id*137 + frame_idx*9377 + 7) % 2147483629"
            "   * ((media_id*137 + frame_idx*9377 + 7) % 2147483629)"
            "   % 2147483629"
            "   * ((media_id*137 + frame_idx*9377 + 7) % 2147483629"
            "      * ((media_id*137 + frame_idx*9377 + 7) % 2147483629)"
            "      % 2147483629) % 2147483629 * 2147483648"
        ).alias("h"),
    )


def _video_phash_layout(spark: SparkSession, sf_dir: str) -> str:
    """Session-memoized stored video-fingerprint layout over the
    synthetic standing frames (cheap arithmetic build — no pixel
    decode; the decode legs are certified by multimodal_video_frames/
    video_phash_near_dup)."""
    import tempfile

    from .llm import multimodal as mm

    key = (spark.sparkContext.applicationId, sf_dir)
    path = _VIDEO_PHASH_LAYOUT_CACHE.get(key)
    if path is not None:
        return path
    path = tempfile.mkdtemp(prefix="k2n_video_phash_layout_")
    mm.write_video_phash_layout(
        _video_standing_frames(spark, sf_dir), path, hash_col="h"
    )
    _VIDEO_PHASH_LAYOUT_CACHE[key] = path
    return path


def _q_video_stored_admission(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standing-corpus video admission against the STORED frame-aware
    fingerprint layout (L94 — the video twin of phash_stored_admission,
    with the L93 vote on top): the standing corpus's capped banded
    relation + its (id, n_frames) vote relation were written ONCE; per
    arrival batch only the arrival side bands, broadcast against the
    stored buckets, exact bit_count verify and the
    half-the-shorter-video vote on candidates only. Two probes per doc:
    a twin of the standing video whose frame-0 fingerprint flips ONE
    bit (frame 0 still verifies at hamming 1, every other frame at 0 —
    the vote must reject it at every n_frames) and an
    independently-mixed novel video (admitted unless an incidental
    collision — the oracle replays whichever happens). The oracle
    replays the capped layout build AND the probe: frame-aware banding,
    cap order, candidate join, hamming verify, the vote, the
    best-match report."""
    from pyspark.sql import functions as F

    from .llm import multimodal as mm

    layout = _video_phash_layout(spark, sf_dir)
    std = _video_standing_frames(spark, sf_dir)
    twin = std.select(
        (F.col("media_id") * 2 + 2000000).alias("media_id"),
        "frame_idx",
        "n_frames",
        F.when(
            F.col("frame_idx") == 0,
            F.col("h").bitwiseXOR(
                F.expr(
                    "CAST(shiftleft(1L, CAST(media_id % 62 AS INT)) AS BIGINT)"
                )
            ),
        )
        .otherwise(F.col("h"))
        .alias("h"),
    )
    novel = std.select(
        (F.col("media_id") * 2 + 2000001).alias("media_id"),
        "frame_idx",
        "n_frames",
        F.expr(
            "(media_id*151 + frame_idx*9377 + 7) % 2147483629"
            " * ((media_id*151 + frame_idx*9377 + 7) % 2147483629)"
            " % 2147483629"
            " * ((media_id*151 + frame_idx*9377 + 7) % 2147483629"
            "    * ((media_id*151 + frame_idx*9377 + 7) % 2147483629)"
            "    % 2147483629) % 2147483629"
            " + (media_id*157 + frame_idx*9377 + 7) % 2147483629"
            "   * ((media_id*157 + frame_idx*9377 + 7) % 2147483629)"
            "   % 2147483629"
            "   * ((media_id*157 + frame_idx*9377 + 7) % 2147483629"
            "      * ((media_id*157 + frame_idx*9377 + 7) % 2147483629)"
            "      % 2147483629) % 2147483629 * 2147483648"
        ).alias("h"),
    )
    return mm.video_phash_admission(
        spark, layout, twin.unionByName(novel), hash_col="h"
    )


_VIDEO_MIX = """
  (({id})*{a} + f*9377 + 7) % 2147483629
  * ((({id})*{a} + f*9377 + 7) % 2147483629) % 2147483629
  * (
      (({id})*{a} + f*9377 + 7) % 2147483629
      * ((({id})*{a} + f*9377 + 7) % 2147483629) % 2147483629
    ) % 2147483629
"""


def _video_h(id_expr: str, a: int, b: int) -> str:
    lo = _VIDEO_MIX.format(id=id_expr, a=a)
    hi = _VIDEO_MIX.format(id=id_expr, a=b)
    return f"(({lo}) + ({hi}) * 2147483648)"


ORACLE["video_stored_admission"] = f"""
WITH std AS (
  SELECT doc_id AS vid, f.f AS f,
         CAST(doc_id % 3 + 1 AS INT) AS nf,
         {_video_h('doc_id', 131, 137)} AS h
  FROM documents, range(3) f(f) WHERE f.f <= doc_id % 3
),
stored AS (
  SELECT vid, f, h, band_idx, band_val FROM (
    SELECT std.vid, std.f, std.h, j.band_idx,
           (std.h >> CAST(16 * j.band_idx AS INT)) & 65535 AS band_val,
           row_number() OVER (
             PARTITION BY std.f, j.band_idx,
                          (std.h >> CAST(16 * j.band_idx AS INT)) & 65535
             ORDER BY std.vid) AS rk
    FROM std, (VALUES (0), (1), (2), (3)) AS j(band_idx))
  WHERE rk <= 64
),
a AS (
  SELECT vid*2 + 2000000 AS vid, f, nf,
         CASE WHEN f = 0
              THEN xor(h, CAST(1 AS BIGINT) << CAST(vid % 62 AS INT))
              ELSE h END AS h
  FROM std
  UNION ALL
  SELECT doc_id*2 + 2000001 AS vid, f.f AS f,
         CAST(doc_id % 3 + 1 AS INT) AS nf,
         {_video_h('doc_id', 151, 157)} AS h
  FROM documents, range(3) f(f) WHERE f.f <= doc_id % 3
),
ab AS (
  SELECT a.vid, a.f, a.nf, a.h, j.band_idx,
         (a.h >> CAST(16 * j.band_idx AS INT)) & 65535 AS band_val
  FROM a, (VALUES (0), (1), (2), (3)) AS j(band_idx)
),
cand AS (
  SELECT DISTINCT ab.vid AS id_a, stored.vid AS id_b, ab.f AS f,
                  ab.nf AS nf_a, ab.h AS h_a, stored.h AS h_b
  FROM ab JOIN stored
    ON ab.f = stored.f AND ab.band_idx = stored.band_idx
   AND ab.band_val = stored.band_val
),
pairs AS (
  SELECT c.id_a, c.id_b, any_value(c.nf_a) AS nf_a, count(*) AS nm
  FROM cand c
  WHERE bit_count(xor(c.h_a, c.h_b)) <= 3
  GROUP BY c.id_a, c.id_b
),
best AS (
  SELECT p.id_a, max(p.nm) AS best_match_frames,
         max(CASE WHEN p.nm * 2 >= least(p.nf_a, snf.nf) THEN 1 ELSE 0 END)
           AS hit
  FROM pairs p
  JOIN (SELECT DISTINCT vid, nf FROM std) snf ON snf.vid = p.id_b
  GROUP BY p.id_a
),
arrivals AS (SELECT DISTINCT vid FROM a)
SELECT arrivals.vid AS media_id,
       coalesce(best.hit, 0) = 0 AS admitted,
       CAST(best.best_match_frames AS BIGINT) AS best_match_frames
FROM arrivals LEFT JOIN best ON arrivals.vid = best.id_a
"""


def _q_audio_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual audio fingerprint (L90): SQL-built PCM clips →
    ``multimodal.audio_fingerprint`` (real sample decode → channel-sum
    |envelope| → 64 windows → 63 gradient bits in one BIGINT). The
    oracle replays the WHOLE chain arithmetically — samples, frame sums,
    window energies, gradient bits, bit packing — so any regression in
    the decode, the window bucketing, or the bit order hash-fails."""
    from .llm import multimodal as mm

    return mm.audio_fingerprint(_wav_fp_fixture(spark, sf_dir))


_AUDIO_FP_HEAD = """
WITH m AS (
  SELECT doc_id AS d, v
  FROM documents, (VALUES (0), (1)) AS var(v)
),
s AS (
  SELECT d, v, j.j AS j,
         ((h1.h * h1.h % 2147483629) % 65536
          + CASE WHEN v = 1 AND j.j = (d*7 % 61 + 1) * 2 * (1 + d % 2)
                 THEN 1 ELSE 0 END) % 65536 AS u
  FROM m, range(256) j(j),
       LATERAL (SELECT (d*131 + j.j*17 + 7) % 2147483629
                     * ((d*131 + j.j*17 + 7) % 2147483629)
                     % 2147483629 AS h) h1
  WHERE j.j < 128 * (1 + d % 2)
),
fr AS (
  SELECT d, v, j // (1 + d % 2) AS i,
         abs(sum(u - 32768)) AS am
  FROM s GROUP BY d, v, i
),
en AS (
  SELECT d, v, i // 2 AS w, sum(am) AS e FROM fr GROUP BY d, v, w
),
fp AS (
  SELECT a.d, a.v,
         sum(CASE WHEN a.e > b.e
                  THEN CAST(1 AS BIGINT) << CAST(a.w AS INT)
                  ELSE 0 END) AS fp63
  FROM en a JOIN en b ON a.d = b.d AND a.v = b.v AND b.w = a.w + 1
  GROUP BY a.d, a.v
)
"""

ORACLE["audio_fingerprint"] = _AUDIO_FP_HEAD + """
SELECT d*2 + v AS media_id, CAST(128 AS BIGINT) AS n_frames,
       CAST(fp63 AS BIGINT) AS fp63
FROM fp
"""


def _q_audio_fp_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio near-dup pairs over the L90 fingerprints: the SAME banded
    equi-join family as the image leg (``phash_near_dup`` is hash-column
    generic) — 4 disjoint 16-bit bands, occupancy cap, exact bit_count
    verify, pigeonhole-exact for hamming <= 3. Every doc's bumped
    variant (one halfword +1 mod 2^16 → one window energy moves <= 1 →
    <= 2 gradient bits) must pair with its base; the oracle replays the
    capped banded relation as CTEs, so the pair set matches exactly —
    incidental cross-doc pairs included."""
    from pyspark.sql import functions as F

    from .llm import multimodal as mm

    fps = mm.audio_fingerprint(_wav_fp_fixture(spark, sf_dir)).filter(
        F.col("fp63").isNotNull()
    )
    return mm.phash_near_dup(fps, hash_col="fp63")


ORACLE["audio_fp_near_dup"] = _AUDIO_FP_HEAD + """,
hh AS (
  SELECT d*2 + v AS media_id, fp63 AS h, fp63 AS hu FROM fp
),
bands AS (
  SELECT media_id, h, j.band_idx,
         CAST((hu >> CAST(16 * j.band_idx AS INT)) & 65535 AS BIGINT)
           AS band_val
  FROM hh, (VALUES (0), (1), (2), (3)) AS j(band_idx)
),
capped AS (
  SELECT media_id, h, band_idx, band_val FROM (
    SELECT *, row_number() OVER (
        PARTITION BY band_idx, band_val ORDER BY media_id) AS rk
    FROM bands)
  WHERE rk <= 64
),
cand AS (
  SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b,
                  a.h AS ha, b.h AS hb
  FROM capped a JOIN capped b
    ON a.band_idx = b.band_idx AND a.band_val = b.band_val
   AND a.media_id < b.media_id
)
SELECT id_a, id_b, CAST(bit_count(xor(ha, hb)) AS INT) AS hamming
FROM cand WHERE bit_count(xor(ha, hb)) <= 3
"""


def _q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .llm import multimodal as mm

    return mm.resize_spec(_media_frame(spark, sf_dir, with_payload=False), max_side=224)


def _q_multimodal_resize_pixels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL pixel resize certificate (r12 — L18's pixel leg closed):
    the SQL-built 16x16 PNGs (_png_pixel_fixture, both variants, gray
    and RGB) run through ``multimodal.resize_images`` (decode → integer
    area-average to 4x4 → RGB PNG re-encode), then the RESIZED payloads
    are re-decoded IN-PLAN and reduced to position-weighted channel
    checksums. 16→4 is divisible, so every output pixel is exactly a
    4x4 block mean with floor division — the oracle states it from the
    closed-form source pixels; any regression in either codec direction
    or the downsample arithmetic hash-fails. Arbitrary-ratio and
    upscale behavior (repeat-pixel, determinism, totality) are
    pytest-covered."""
    import pandas as pd

    from .llm import multimodal as mm

    resized = mm.resize_images(_png_pixel_fixture(spark, sf_dir), 4, 4)

    def batches(it):
        for pdf in it:
            out = {"media_id": [], "width": [], "height": [],
                   "px_sum": [], "px_checksum": []}
            for mid, w, h, p in zip(pdf["media_id"], pdf["width"],
                                    pdf["height"], pdf["payload"]):
                out["media_id"].append(mid)
                got = mm.parse_png_pixels(bytes(p)) if p is not None else None
                if got is None:
                    for c in ("width", "height", "px_sum", "px_checksum"):
                        out[c].append(None)
                    continue
                gw, gh, rows = got
                out["width"].append(gw)
                out["height"].append(gh)
                out["px_sum"].append(sum(
                    r + g + b for row in rows for (r, g, b) in row
                ))
                out["px_checksum"].append(sum(
                    (r + 2 * g + 3 * b) * ((x + 1) + 5 * (y + 1))
                    for y, row in enumerate(rows)
                    for x, (r, g, b) in enumerate(row)
                ))
            yield pd.DataFrame(out)

    schema = ("media_id long, width int, height int, "
              "px_sum long, px_checksum long")
    return resized.mapInPandas(batches, schema)


ORACLE["multimodal_resize_pixels"] = _PHASH_PX_HEAD + """,
cell AS (
  SELECT d, v, y // 4 AS cy, x // 4 AS cx,
         sum(CASE WHEN d % 2 = 0 THEN (299*r + 587*g + 114*b) // 1000
                  ELSE r END) // 16 AS rr,
         sum(CASE WHEN d % 2 = 0 THEN (299*r + 587*g + 114*b) // 1000
                  ELSE g END) // 16 AS gg,
         sum(CASE WHEN d % 2 = 0 THEN (299*r + 587*g + 114*b) // 1000
                  ELSE b END) // 16 AS bb
  FROM px GROUP BY d, v, cy, cx
)
SELECT d*2 + v AS media_id, CAST(4 AS INT) AS width, CAST(4 AS INT) AS height,
       CAST(sum(rr + gg + bb) AS BIGINT) AS px_sum,
       CAST(sum((rr + 2*gg + 3*bb) * ((cx+1) + 5*(cy+1))) AS BIGINT)
         AS px_checksum
FROM cell GROUP BY media_id
"""


def _q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .llm import multimodal as mm

    return mm.frame_sample_plan(
        _media_frame(spark, sf_dir, with_payload=False), every_ms=1000
    )


ORACLE["multimodal_frame_sample"] = """
SELECT doc_id AS media_id, t.f AS frame_ts_ms
FROM documents,
     unnest(generate_series(0, greatest(n_chars * 10 - 1, 0), 1000)) AS t(f)
WHERE doc_id % 3 = 2
"""


ORACLE["multimodal_resize_spec"] = """
SELECT doc_id AS media_id,
       CAST(w AS INT) AS width, CAST(h AS INT) AS height,
       CAST(round(w * s) AS INT) AS target_width,
       CAST(round(h * s) AS INT) AS target_height
FROM (
  SELECT doc_id, n_chars % 640 + 1 AS w, n_chars % 480 + 1 AS h,
         least(224.0 / (n_chars % 640 + 1), 224.0 / (n_chars % 480 + 1), 1.0) AS s
  FROM documents WHERE doc_id % 3 = 0
)
"""


# --- repetition signals (Gopher/RefinedWeb-style quality heuristics) --------
# Word-level repetition ratios per document: duplicate-word fraction and
# most-frequent-word fraction — the cheap high-signal filters a training
# pipeline runs before anything expensive. One explode + two hash aggs,
# all partial-aggregated.
SPARK_SQL["repetition_signals"] = """
WITH w AS (SELECT doc_id, split(text, ' ') AS ws FROM documents),
e AS (SELECT doc_id, explode(ws) AS wd FROM w),
c AS (SELECT doc_id, wd, count(*) AS n FROM e GROUP BY doc_id, wd),
t AS (SELECT doc_id, max(n) AS top_n, sum(n) AS tot, count(*) AS n_distinct
      FROM c GROUP BY doc_id)
SELECT doc_id, CAST(tot AS BIGINT) AS n_words,
       round(1.0 - CAST(n_distinct AS DOUBLE) / tot, 6) AS dup_word_ratio,
       round(CAST(top_n AS DOUBLE) / tot, 6) AS top_word_ratio
FROM t
"""
ORACLE["repetition_signals"] = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
e AS (SELECT doc_id, unnest(ws) AS wd FROM w),
c AS (SELECT doc_id, wd, count(*) AS n FROM e GROUP BY doc_id, wd),
t AS (SELECT doc_id, max(n) AS top_n, sum(n) AS tot, count(*) AS n_distinct
      FROM c GROUP BY doc_id)
SELECT doc_id, CAST(tot AS BIGINT) AS n_words,
       round(1.0 - CAST(n_distinct AS DOUBLE) / tot, 6) AS dup_word_ratio,
       round(CAST(top_n AS DOUBLE) / tot, 6) AS top_word_ratio
FROM t
"""


# --- dedup clustering: candidate pairs → connected components ---------------
# The step after pairwise dedup: group verified duplicates transitively and
# elect the lowest doc id as canonical. Spark side is iterative min-label
# propagation (llm/dedup.connected_components — O(diameter) shuffle rounds,
# lineage-truncated); the oracle is a recursive CTE over the IDENTICAL
# LSH-pruned edge set (same CTEs as ngram_jaccard_pairs), so both engines
# see the same graph.

# The CC label table is the shared product of the dedup family:
# ``dedup_components`` returns it directly and ``dedup_keep_canonical`` is a
# projection over it. Computing the iterative label-propagation loop twice in
# one session doubles the most expensive pipeline in the registry, so the
# labels are memoized per (session, sf_dir) as a localCheckpointed DataFrame
# — materialized once, O(corpus) rows of two longs, lineage-free so each
# consumer's plan is a flat scan of the checkpoint.
_CC_LABELS_CACHE: dict[tuple[str, str], DataFrame] = {}


def _dedup_component_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from .llm import dedup as llm_dedup

    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _CC_LABELS_CACHE.get(key)
    if cached is not None:
        return cached
    register_views(spark, sf_dir, ("documents",))
    docs = spark.table("documents")
    # capped candidate basis — the same scale-safe default the registry
    # pair query uses (uncapped edge building spilled at the ×100 tier)
    edges = _q_ngram_jaccard(
        spark, sf_dir, max_bucket=_JACCARD_MAX_BUCKET
    ).filter(F.col("jaccard") >= 0.5)
    labels = llm_dedup.connected_components(edges, docs, "doc_id").localCheckpoint()
    _CC_LABELS_CACHE[key] = labels
    return labels


def _q_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _dedup_component_labels(spark, sf_dir)


ORACLE["dedup_components"] = """
WITH RECURSIVE """ + _jaccard_cand_duck(_JACCARD_MAX_BUCKET) + """,
verified AS (
  -- threshold on the ROUNDED jaccard, matching the Spark side's filter
  -- over _q_ngram_jaccard's round(...,6) output: thresholding one side
  -- rounded and the other raw can build different edge sets on values
  -- straddling the 6-dp boundary. Candidate basis = the same capped
  -- star+chain pair set the registry pair query emits.
  SELECT id_a, id_b
  FROM pairs JOIN hn x ON id_a = x.doc_id JOIN hn y ON id_b = y.doc_id
  WHERE round(CAST(len(list_intersect(x.hashes, y.hashes)) AS DOUBLE)
        / (x.n + y.n - len(list_intersect(x.hashes, y.hashes))), 6) >= 0.5
),
edges AS (
  SELECT id_a AS a, id_b AS b FROM verified
  UNION ALL SELECT id_b, id_a FROM verified
),
reach(src, dst) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a
)
SELECT src AS doc_id, min(dst) AS component_id FROM reach GROUP BY src
"""


def _q_dedup_keep_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup END PRODUCT: one row per document with its component id
    and a keep/drop decision (keep = lowest doc id of the duplicate
    group; min-label makes the component id that canonical doc).
    Downstream training-mix building filters ``keep``. A projection over
    the memoized CC label table (_dedup_component_labels) — when both
    dedup queries run in one session the label-propagation loop executes
    exactly once."""
    from pyspark.sql import functions as F

    comp = _dedup_component_labels(spark, sf_dir)
    return comp.select(
        "doc_id",
        "component_id",
        (F.col("doc_id") == F.col("component_id")).alias("keep"),
    )


ORACLE["dedup_keep_canonical"] = ORACLE["dedup_components"].replace(
    "SELECT src AS doc_id, min(dst) AS component_id FROM reach GROUP BY src",
    """SELECT src AS doc_id, min(dst) AS component_id,
       src = min(dst) AS keep FROM reach GROUP BY src""",
)


# --- L103: quality-aware canonical selection (keep the BEST copy) ------------
# dedup_keep_canonical keeps the MIN-ID cluster member (the determinism
# anchor); production curation keeps the BEST one — here the longest
# (n_chars, the standard "keep the longest copy" rule), ties broken by id.
# Same memoized CC labels, so when the three dedup end-product queries run
# in one session the label-propagation loop still executes exactly once.
# Scale shape: labels ⋈ documents on doc_id (doc-level), ONE row_number
# window per component — component size bounds the sort, and components
# are duplicate-cluster-sized, never corpus-sized.
def _q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    comp = _dedup_component_labels(spark, sf_dir)
    docs = spark.table("documents").select("doc_id", "n_chars")
    w = Window.partitionBy("component_id").orderBy(
        F.desc("n_chars"), F.col("doc_id")
    )
    return (
        comp.join(docs, "doc_id")
        .withColumn("keep", F.row_number().over(w) == 1)
        .select("doc_id", "component_id", "n_chars", "keep")
    )


ORACLE["dedup_keep_best"] = ORACLE["dedup_components"].replace(
    "SELECT src AS doc_id, min(dst) AS component_id FROM reach GROUP BY src",
    """, comp AS (
  SELECT src AS doc_id, min(dst) AS component_id FROM reach GROUP BY src
)
SELECT c.doc_id, c.component_id, d.n_chars,
       row_number() OVER (PARTITION BY c.component_id
                          ORDER BY d.n_chars DESC, c.doc_id) = 1 AS keep
FROM comp c JOIN documents d ON c.doc_id = d.doc_id""",
)


# --- the composed dedup pipeline: what a real user actually runs ------------
# L2 → L3 → L4 → L6 → L23 as ONE query through the LIBRARY functions
# (llm/dedup.py minhash_signatures → lsh_candidate_pairs → ngram_jaccard
# → connected_components → keep projection), the batch analog of the
# reference's end-to-end filter→write chain its domain tests exercise
# (/root/reference/domain-tests/test_writer_modules.py:18-41). The
# per-stage registry queries pin each operator alone; this entry pins the
# COMPOSITION — stage outputs feeding the next stage's contract (m-column
# banding, capped pair set, rounded-jaccard threshold, CC regime pick).
# Scale shape: narrow signature map → bucket-keyed pair join (capped, no
# all-pairs) → sort-merge verify joins (hinted — the shingle relation is
# corpus-sized, broadcast would OOM at 100 TB) → edge-count-chosen CC
# regime. The DuckDB oracle replays every stage: 8 md5-slice minhashes
# (two digests: md5(s), md5(s || '1') — exactly the md5 engine's
# group-salting), 4×2 banding, the star+chain cap at 8, Jaccard over the
# distinct shingle-string sets, recursive-CTE reachability.
_DEDUP_PIPE_BANDS = 4
_DEDUP_PIPE_ROWS = 2
_DEDUP_PIPE_TAU = 0.5


_PIPELINE_PERSIST: dict[str, list[DataFrame]] = {}


def _dedup_pipeline_labels(
    docs: DataFrame,
    hash_engine: str,
    verify_hashes: DataFrame | None = None,
    sig: DataFrame | None = None,
):
    """Shared composed-pipeline body (L46 and its engine-parity twin):
    full-text-fingerprinted signatures → content-ordered capped
    candidates → rounded-jaccard verify → CC labels, under the given
    hash engine. The fingerprint chain order makes exact duplicates
    cap-proof under ANY engine (lsh_candidate_pairs' chain_col).
    Returns (persisted signature relation, labels frame) — the CALLER
    owns the sig's unpersist lifecycle. The persist matters: the capped
    pair join references the signature relation three times (ranked
    window + both self-join sides), and each reference would otherwise
    re-run the shingle-hash pass — measured 9.6 → 2.3 s for the pair
    stage at sf0.1.

    ``sig`` (r13): a caller-built, already-persisted signature relation
    (the md5 callers build it with ``emit_hashes_col`` so the verify
    hashes ride the SAME corpus digest pass — one pass instead of two);
    must carry m0..mN and ``_fp``. When None, built here as before."""
    from pyspark.sql import functions as F

    from .llm import dedup as llm_dedup

    docs = docs.withColumn("_fp", F.md5(F.col("text").cast("binary")))
    if sig is None:
        sig = llm_dedup.minhash_signatures(
            docs,
            num_hashes=_DEDUP_PIPE_BANDS * _DEDUP_PIPE_ROWS,
            shingle_k=5,
            keep_cols=("_fp",),
            hash_engine=hash_engine,
        ).persist()
    verified = _dedup_pipeline_verified(docs, sig, verify_hashes)
    labels = llm_dedup.connected_components(verified, docs, "doc_id")
    return sig, labels


def _dedup_pipeline_verified(
    docs: DataFrame, sig: DataFrame, verify_hashes: DataFrame | None
) -> DataFrame:
    """The pipeline's verified-edge relation (pairs → thresholded
    jaccard) — factored out of :func:`_dedup_pipeline_labels` so the
    parity certificate can route edges through
    ``mirror_merged_flags`` (regime-switched flag computation) instead
    of materializing full label relations per engine (r13). The ``sh``
    column (the verify-hash array riding combined signature frames) is
    dropped before banding: the pair path never reads it, and keeping
    it widens the checkpointed ranked relation for nothing."""
    from pyspark.sql import functions as F

    from .llm import dedup as llm_dedup

    pairs = llm_dedup.lsh_candidate_pairs(
        sig.drop("sh"),
        bands=_DEDUP_PIPE_BANDS,
        rows_per_band=_DEDUP_PIPE_ROWS,
        max_bucket=_JACCARD_MAX_BUCKET,
        chain_col="_fp",
    )
    return llm_dedup.ngram_jaccard(
        docs, pairs, join_hint="merge", hashes=verify_hashes
    ).filter(F.round(F.col("jaccard"), 6) >= _DEDUP_PIPE_TAU)


def _q_dedup_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    register_views(spark, sf_dir, ("documents",))
    docs = spark.table("documents")
    # one-slot per-session persist lifecycle, as _JACCARD_PERSIST.
    # r13: the verify-side hash relation is referenced by BOTH sides of
    # the candidate join — persist it once instead of re-running the
    # corpus shingle+md5 pass per reference (ngram_jaccard docstring).
    # r13 (2): it rides the SIGNATURE pass's _d0 digests
    # (emit_hashes_col), so the whole pipeline runs ONE corpus digest
    # pass instead of two — one combined persisted frame serves both
    # relations.
    from pyspark.sql import functions as F
    from .llm import dedup as _dd

    combined = _dd.minhash_signatures(
        docs.withColumn("_fp", F.md5(F.col("text").cast("binary"))),
        num_hashes=_DEDUP_PIPE_BANDS * _DEDUP_PIPE_ROWS,
        shingle_k=5,
        keep_cols=("_fp",),
        hash_engine="md5",
        emit_hashes_col="sh",
    ).persist()
    vh = combined.select("doc_id", "sh")
    sig, labels = _dedup_pipeline_labels(
        docs, "md5", verify_hashes=vh, sig=combined
    )
    app_id = spark.sparkContext.applicationId
    for prev in _PIPELINE_PERSIST.pop(app_id, []):
        prev.unpersist()
    _PIPELINE_PERSIST[app_id] = [combined]
    return labels.select(
        "doc_id",
        "component_id",
        (F.col("doc_id") == F.col("component_id")).alias("keep"),
    )


ORACLE["dedup_pipeline"] = f"""
WITH RECURSIVE sh AS (
  SELECT doc_id,
         list_distinct([substr(text, i, 5)
              for i in range(1, greatest(length(text) - 4, 1) + 1)]) AS sh
  FROM documents
),
hx AS (
  SELECT doc_id,
         [md5(s) for s in sh] AS h0,
         [md5(s || '1') for s in sh] AS h1
  FROM sh
),
hn AS (
  -- verify-side shingle identity: top 60 md5 bits as BIGINT (the
  -- family-wide convention; see ngram_jaccard)
  SELECT doc_id,
         [('0x' || substr(h, 1, 15))::BIGINT for h in h0] AS hashes
  FROM hx
),
sig AS (
  SELECT doc_id,
         list_min([substr(h, 1, 8) for h in h0]) AS m0,
         list_min([substr(h, 9, 8) for h in h0]) AS m1,
         list_min([substr(h, 17, 8) for h in h0]) AS m2,
         list_min([substr(h, 25, 8) for h in h0]) AS m3,
         list_min([substr(h, 1, 8) for h in h1]) AS m4,
         list_min([substr(h, 9, 8) for h in h1]) AS m5,
         list_min([substr(h, 17, 8) for h in h1]) AS m6,
         list_min([substr(h, 25, 8) for h in h1]) AS m7
  FROM hx
),
banded AS (
  SELECT doc_id, 0 AS band, m0 || '|' || m1 AS band_key FROM sig
  UNION ALL SELECT doc_id, 1, m2 || '|' || m3 FROM sig
  UNION ALL SELECT doc_id, 2, m4 || '|' || m5 FROM sig
  UNION ALL SELECT doc_id, 3, m6 || '|' || m7 FROM sig
),
fp AS (SELECT doc_id, md5(text) AS fp FROM documents),
ranked AS (
  -- chain order = (full-text fingerprint, doc_id): exact duplicates are
  -- adjacent, so the cap can never separate an exact-duplicate pair
  -- (see llm.dedup.lsh_candidate_pairs' chain_col)
  SELECT b.doc_id, b.band, b.band_key,
         row_number() OVER w AS rk,
         first_value(b.doc_id) OVER w AS canon,
         lag(b.doc_id) OVER w AS prev
  FROM banded b JOIN fp f ON b.doc_id = f.doc_id
  WINDOW w AS (PARTITION BY b.band, b.band_key ORDER BY f.fp, b.doc_id)
),
pairs AS (
  SELECT DISTINCT id_a, id_b FROM (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b
    FROM ranked a JOIN ranked b
      ON a.band = b.band AND a.band_key = b.band_key
     AND a.doc_id < b.doc_id
     AND a.rk <= {_JACCARD_MAX_BUCKET} AND b.rk <= {_JACCARD_MAX_BUCKET}
    UNION ALL
    SELECT least(canon, doc_id), greatest(canon, doc_id)
    FROM ranked WHERE rk > {_JACCARD_MAX_BUCKET}
    UNION ALL
    SELECT least(prev, doc_id), greatest(prev, doc_id)
    FROM ranked WHERE rk > {_JACCARD_MAX_BUCKET}
  )
),
verified AS (
  SELECT id_a, id_b
  FROM pairs JOIN hn x ON id_a = x.doc_id JOIN hn y ON id_b = y.doc_id
  WHERE round(CAST(len(list_intersect(x.hashes, y.hashes)) AS DOUBLE)
        / len(list_distinct(list_concat(x.hashes, y.hashes))), 6)
        >= {_DEDUP_PIPE_TAU}
),
edges AS (
  SELECT id_a AS a, id_b AS b FROM verified
  UNION ALL SELECT id_b, id_a FROM verified
),
reach(src, dst) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a
)
SELECT src AS doc_id, min(dst) AS component_id,
       src = min(dst) AS keep
FROM reach GROUP BY src
"""


def _q_dedup_pipeline_engine_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end certificate for the PRODUCTION dedup engine: the WHOLE
    composed pipeline (signatures → content-ordered capped buckets →
    jaccard verify → connected components) runs under BOTH hash engines
    over the mirrored corpus (every doc gets one exact-dup partner at
    doc_id + 1_000_000, the minhash_engine_parity scaffold), and the
    output is the per-doc merged flag — did the pipeline put the doc and
    its mirror in one component? — for each engine side by side. The
    chain_col guarantee makes BOTH columns provably all-true (exact
    duplicates are chain-adjacent in every shared bucket, and their
    chain edge verifies at jaccard exactly 1), so a production-engine
    regression that drops an exact pair anywhere in the chain flips a
    flag and hash-mismatches the oracle, which independently replays the
    md5 side's full pipeline (recursive-CTE reachability included) and
    asserts cross-engine agreement. Composed-pipeline analog of the
    reference's end-to-end domain tests
    (/root/reference/domain-tests/test_writer_modules.py:18-41): the
    chain is certified as a whole, not stage by stage. NOTE the keep
    SETS (which doc survives) still differ between engines on NEAR-dup
    (τ < 1) merges — candidate surfacing for non-identical docs is
    hash-dependent by design; measured r8: keep sets agreed on only
    756/1000 docs before the chain_col fix, 894/1000 after (SCALE.md
    r8) — which is exactly why the invariant certified here is the
    engine-independent core (exact-pair merging), not whole-keep-set
    equality."""
    from pyspark.sql import functions as F

    register_views(spark, sf_dir, ("documents",))
    base = spark.table("documents").select("doc_id", "text")
    docs = base.unionAll(
        base.select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text")
    )
    app_id = spark.sparkContext.applicationId
    sides = []
    # r13: the verify-hash relation is engine-INDEPENDENT and referenced
    # four times across the two engine sides (both join sides each) —
    # one persisted copy replaces four corpus shingle+md5 passes over
    # the mirrored corpus (guide §2.4).
    from .llm import dedup as _dd

    # r13 (2): the verify-hash relation rides the md5 SIGNATURE pass's
    # _d0 digests (emit_hashes_col) — the mirrored corpus is digested
    # twice total (once per engine) instead of three times.
    from pyspark.sql import functions as F2

    # r13 (3): the mirror copies TEXT verbatim, and every signature/hash
    # column is a pure function of text — so each engine digests the
    # BASE corpus once and the mirror rows are a doc_id-shifted
    # projection of the same persisted pass (guide §1.2: don't compute
    # the same thing twice). Row-for-row identical to digesting the
    # mirrored corpus directly.
    def _mirror(sig_base):
        return sig_base.unionByName(
            sig_base.withColumn("doc_id", F2.col("doc_id") + 1_000_000)
        )

    base_fp = base.withColumn("_fp", F2.md5(F2.col("text").cast("binary")))
    # r14 (guide §1.2/§2.4, VERDICT r13 #3): BOTH engines' signatures
    # ride ONE corpus scan + shingle pass (emit_xx_prefix — the shingle
    # relation is engine-independent; only the digests differ), so the
    # parity certificate persists a single combined frame where it used
    # to persist one per engine. Each engine's signature relation is a
    # pure column projection of that pass — values pytest-pinned
    # bit-identical to the separate per-engine calls.
    n_hashes = _DEDUP_PIPE_BANDS * _DEDUP_PIPE_ROWS
    dual = _dd.minhash_signatures(
        base_fp,
        num_hashes=n_hashes,
        shingle_k=5,
        keep_cols=("_fp",),
        hash_engine="md5",
        emit_hashes_col="sh",
        emit_xx_prefix="_x",
    ).persist()
    combined_base = dual.select(
        "doc_id", "_fp", *[f"m{i}" for i in range(n_hashes)], "sh"
    )
    xx_base = dual.select(
        "doc_id",
        "_fp",
        *[F2.col(f"_x{i}").alias(f"m{i}") for i in range(n_hashes)],
    )
    combined = _mirror(combined_base)
    vh = combined.select("doc_id", "sh")
    sigs = [dual]
    # r13 (4): each engine side feeds its VERIFIED edges to
    # mirror_merged_flags — in the tiny-edge regime (the one the driver
    # union-find already owns) the flag is answered from the label map
    # with one pruned base-id scan + two broadcast joins per engine,
    # instead of materializing corpus-sized label relations twice per
    # engine and self-joining them; past the edge threshold it falls
    # back to the full CC + self-join shape, so the certificate keeps
    # the pipeline's scale regimes. Output identical (oracle-checked).
    docs_fp = docs.withColumn("_fp", F.md5(F.col("text").cast("binary")))
    # r13 (5): ONE verify pass for both engines (the minhash-parity fuse,
    # item 12, applied to the composed pipeline). Banding stays
    # per-engine — the band keys ARE the engine under test — but the
    # jaccard of a pair is engine-independent and the two engines'
    # candidate sets overlap almost entirely (both surface the same
    # exact-dup chains), so verifying the DISTINCT pair union once with
    # per-engine membership flags replaces the two corpus-array verify
    # joins (~2.7 s warm each) with one. Equivalence: each engine's
    # verified edge SET is {pairs it surfaced} ∩ {jaccard ≥ τ} — the
    # groupBy preserves exact per-engine membership (pair sets are
    # distinct() already) and the checkpointed verify relation feeds
    # both engine filters without re-running the join.
    pairs_by_engine = {
        engine: _dd.lsh_candidate_pairs(
            (combined if engine == "md5" else _mirror(xx_base)).drop("sh"),
            bands=_DEDUP_PIPE_BANDS,
            rows_per_band=_DEDUP_PIPE_ROWS,
            max_bucket=_JACCARD_MAX_BUCKET,
            chain_col="_fp",
        )
        for engine in ("md5", "xxhash64")
    }
    tagged = pairs_by_engine["md5"].select(
        "id_a", "id_b", F.lit(True).alias("_m"), F.lit(False).alias("_x")
    ).unionByName(
        pairs_by_engine["xxhash64"].select(
            "id_a", "id_b", F.lit(False).alias("_m"), F.lit(True).alias("_x")
        )
    ).groupBy("id_a", "id_b").agg(
        F.max("_m").alias("_in_md5"), F.max("_x").alias("_in_xx")
    )
    verified_all = _fresh_ckpt(
        spark,
        _dd.ngram_jaccard(
            docs_fp,
            tagged,
            join_hint="merge",
            hashes=vh,
            carry_cols=("_in_md5", "_in_xx"),
        )
        .filter(F.round(F.col("jaccard"), 6) >= _DEDUP_PIPE_TAU)
        .select("id_a", "id_b", "_in_md5", "_in_xx"),
    )
    for col, flag in (("_in_md5", "merged_md5"), ("_in_xx", "merged_xxhash64")):
        sides.append(
            _dd.mirror_merged_flags(
                verified_all.filter(F.col(col)).select("id_a", "id_b"),
                base,
                flag,
            )
        )
    for prev in _PARITY_PIPE_PERSIST.pop(app_id, []):
        prev.unpersist()
    _PARITY_PIPE_PERSIST[app_id] = sigs
    return sides[0].join(sides[1], "doc_id")


_PARITY_PIPE_PERSIST: dict[str, list[DataFrame]] = {}


def _parity_pipeline_oracle() -> str:
    """Derive the parity oracle from the dedup_pipeline oracle by string
    surgery — ONE source of truth for the md5 replay: corpus → mirrored
    corpus, per-doc keep → per-base-doc mirror-merged flag (emitted for
    both engine columns: the cross-engine agreement IS the assertion)."""
    tail = """SELECT src AS doc_id, min(dst) AS component_id,
       src = min(dst) AS keep
FROM reach GROUP BY src"""
    new_tail = """, comp AS (
  SELECT src AS doc_id, min(dst) AS component_id FROM reach GROUP BY src
)
SELECT a.doc_id AS doc_id,
       a.component_id = b.component_id AS merged_md5,
       a.component_id = b.component_id AS merged_xxhash64
FROM comp a JOIN comp b ON a.doc_id + 1000000 = b.doc_id"""
    core = ORACLE["dedup_pipeline"]
    assert tail in core and core.count("FROM documents") == 3, (
        "dedup_pipeline oracle changed shape; update the parity surgery"
    )
    out = core.replace("FROM documents", "FROM aug").replace(tail, new_tail)
    # insert aug AFTER the blanket replace so its own FROM documents stays
    return out.replace(
        "WITH RECURSIVE sh AS (",
        "WITH RECURSIVE aug AS (\n"
        "  SELECT doc_id, text FROM documents\n"
        "  UNION ALL SELECT doc_id + 1000000, text FROM documents\n"
        "),\nsh AS (",
        1,
    )


ORACLE["dedup_pipeline_engine_parity"] = _parity_pipeline_oracle()


# --- deterministic stratified sampling: the training-mix builder ------------
# Hash-gated per-stratum sampling: md5(doc_id) mod 1000 under a per-lang
# rate. Deterministic (re-runs pick the same docs), join-free (rates ride
# as a CASE), and executor-local — the scalable alternative to
# sample()/reservoir approaches whose output depends on partitioning.
SPARK_SQL["training_mix_sample"] = """
WITH gated AS (
  SELECT doc_id, lang, n_chars,
         CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 15), 16, 10) AS BIGINT) % 1000 AS gate
  FROM documents
)
SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars
FROM gated
WHERE gate < CASE lang WHEN 'en' THEN 800 WHEN 'de' THEN 500
                       WHEN 'fr' THEN 500 ELSE 250 END
"""
ORACLE["training_mix_sample"] = """
WITH gated AS (
  SELECT doc_id, lang, n_chars,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 1000 AS gate
  FROM documents
)
SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars
FROM gated
WHERE gate < CASE lang WHEN 'en' THEN 800 WHEN 'de' THEN 500
                       WHEN 'fr' THEN 500 ELSE 250 END
"""


# --- decontamination: n-gram overlap against a benchmark set ----------------
# The training-data hygiene check: how many of a document's 8-gram shingles
# appear in an eval/benchmark corpus (here: docs 0-4 stand in for the
# benchmark). The benchmark side is small by construction → broadcast join
# at any scale; the document side is a narrow explode.
SPARK_SQL["decontamination_overlap"] = """
WITH d AS (
  SELECT doc_id,
         array_distinct(transform(sequence(1, greatest(length(text) - 7, 1)),
                                  i -> substr(text, i, 8))) AS sh
  FROM documents
),
bench AS (SELECT DISTINCT explode(sh) AS g FROM d WHERE doc_id < 5),
e AS (SELECT doc_id, size(sh) AS n, explode(sh) AS g FROM d WHERE doc_id >= 5)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_overlap,
       round(CAST(count(*) AS DOUBLE) / n, 6) AS overlap_ratio
FROM e JOIN bench USING (g) GROUP BY doc_id, n
"""
ORACLE["decontamination_overlap"] = """
WITH d AS (
  SELECT doc_id,
         list_distinct([substr(text, i, 8)
              for i in range(1, greatest(length(text) - 7, 1) + 1)]) AS sh
  FROM documents
),
bench AS (SELECT DISTINCT unnest(sh) AS g FROM d WHERE doc_id < 5),
e AS (SELECT doc_id, len(sh) AS n, unnest(sh) AS g FROM d WHERE doc_id >= 5)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_overlap,
       round(CAST(count(*) AS DOUBLE) / n, 6) AS overlap_ratio
FROM e JOIN bench USING (g) GROUP BY doc_id, n
"""


# --- L83: Bloom production-engine parity certificate --------------------------
# The L2/L53/L69 engine split applied to the Bloom family: md5 hex
# slices are the oracle-replayable position twin, xxhash64 is what a
# 100 TB filter build actually runs (JVM-native, no hex-string
# materialization per key). The two engines set DIFFERENT bits, so the
# certifiable shared surface is the GUARANTEE, not the bit pattern:
# every exact member must test positive under BOTH engines. The corpus
# mirrors itself (the minhash_engine_parity move) so every arrival IS
# an exact member by construction; the oracle replays the md5 leg's
# full bitmap math and pins the xxhash64 leg as the literal invariant —
# a single false negative in either engine flips the driver hash. The
# FP behavior of the xx leg (engine-specific by nature) is pinned
# in-band by pytest on the bloom corpus fixture.


def _q_bloom_engine_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from .llm import dedup as llm_dedup

    register_views(spark, sf_dir, ("documents",))
    fp = spark.table("documents").select(
        "doc_id", F.md5(F.col("text")).alias("_fp")
    )
    arrivals = fp.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "_fp"
    )
    legs = {}
    for engine in ("md5", "xxhash64"):
        params, words = llm_dedup.bloom_build(
            fp, "_fp", k=_BLOOM_K, bits_per_key=_BLOOM_BITS_PER_KEY,
            hash_engine=engine,
        )
        legs[engine] = llm_dedup.bloom_membership(
            arrivals, params, words, "_fp", "doc_id", k=_BLOOM_K,
            hash_engine=engine,
        ).withColumnRenamed("bloom_positive", f"in_{engine}")
    return legs["md5"].join(legs["xxhash64"], "doc_id").select(
        "doc_id", "in_md5", "in_xxhash64"
    )


ORACLE["bloom_engine_parity"] = f"""
WITH fp0 AS (SELECT doc_id, md5(text) AS f FROM documents),
std AS (SELECT DISTINCT f FROM fp0),
p AS (SELECT CAST(count(*) AS BIGINT) AS n_keys,
             greatest(63, CAST(ceil(count(*) * {_BLOOM_BITS_PER_KEY}.0 / 63)
                               AS BIGINT) * 63) AS m_bits
      FROM std),
sh2 AS (SELECT ('0x' || substr(md5(f), 1, 15))::BIGINT % p.m_bits AS h1,
               ('0x' || substr(md5(f), 17, 15))::BIGINT % (p.m_bits - 1) + 1
                 AS h2, p.m_bits AS m
        FROM std, p),
spos AS (SELECT (h1 + i * h2) % m AS pos
         FROM sh2, range({_BLOOM_K}) t(i)),
words AS (SELECT pos // 63 AS word_idx,
                 bit_or(1::BIGINT << CAST(pos % 63 AS INT)) AS word
          FROM spos GROUP BY 1),
arr AS (SELECT doc_id + 1000000 AS doc_id, f FROM fp0),
ah2 AS (SELECT doc_id,
               ('0x' || substr(md5(f), 1, 15))::BIGINT % p.m_bits AS h1,
               ('0x' || substr(md5(f), 17, 15))::BIGINT % (p.m_bits - 1) + 1
                 AS h2, p.m_bits AS m
        FROM arr, p),
apos AS (SELECT doc_id, (h1 + i * h2) % m AS pos
         FROM ah2, range({_BLOOM_K}) t(i))
SELECT a.doc_id,
       bool_and(coalesce(
         (w.word & (1::BIGINT << CAST(a.pos % 63 AS INT))) <> 0,
         FALSE)) AS in_md5,
       true AS in_xxhash64
FROM apos a LEFT JOIN words w ON a.pos // 63 = w.word_idx
GROUP BY a.doc_id
"""


# --- L76: Bloom-filter decontamination (single-pass, benchmark as bitmap) ----
# How decontamination actually runs at 100 TB: the benchmark's n-grams
# collapse to a Bloom bitmap (6 bits/gram — a 10^9-gram benchmark suite
# is ~750 MB of filter vs tens of GB of gram strings), the corpus makes
# ONE pass probing it, and only bloom-positive docs (a sliver) ever
# reach the exact verify that L9 runs on everything. One-sided error is
# the contract: a contaminated doc can NEVER test clean (same
# FN-impossible structure as L73), false positives only send extra docs
# to the verify stage. This certificate emits the exact overlap count
# NEXT TO the bloom hit count per doc, so the driver hash pins both the
# probe math and the n_bloom_hits >= n_exact_hits one-sidedness on every
# row. Same benchmark split as L9 (doc_id < 5), but 20-char shingles —
# the analog of the 13-TOKEN windows production decontamination matches
# on (long enough to be rare: 39 of 495 docs at sf0.01, 8%, where L9's
# 8-char grams flag every doc — the verify-sliver routing is only real
# when the gram is discriminative). Sizing differs from L73 on purpose:
# a DOC is flagged if ANY of its ~10^2-10^3 grams hits, so the per-gram
# FPR must sit well under 1/n_grams — 32 bits/key with k=22 probes
# (~0.5^22 ≈ 2e-7 per gram, <0.1% per doc; the admission gate's 6/4
# sizing would flag nearly every doc, measured 4973 of 4995 at sf0.1).
_DECON_BLOOM_K = 22
_DECON_BLOOM_BPK = 32
_DECON_GRAM = 20
# module-level so the boundary pytest can pin both probe regimes on the
# same corpus (monkeypatch to 0 → broadcast word-join form)
_DECON_LITERAL_WORD_CAP = None  # resolved to dedup.BLOOM_LITERAL_WORD_CAP


def _q_bloom_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from .llm import dedup as llm_dedup

    register_views(spark, sf_dir, ("documents",))
    d = spark.table("documents").select(
        "doc_id",
        F.array_distinct(
            F.transform(
                F.sequence(
                    F.lit(1),
                    F.greatest(F.length("text") - (_DECON_GRAM - 1), F.lit(1)),
                ),
                lambda i: F.substring(F.col("text"), i, _DECON_GRAM),
            )
        ).alias("sh"),
    )
    bench = (
        d.filter(F.col("doc_id") < 5)
        .select(F.explode("sh").alias("g"))
        .distinct()
    )
    params, words = llm_dedup.bloom_build(
        bench, "g", k=_DECON_BLOOM_K, bits_per_key=_DECON_BLOOM_BPK
    )
    # The probe FORM is auto-selected by count_bloom_hits (the round-10
    # verdict's missing chooser): at this benchmark's size the stored
    # word count is far under BLOOM_LITERAL_WORD_CAP, so the probe
    # collects into a LITERAL word map (the L52 literal-chain precedent
    # — ~m/63 entries, bounded by the benchmark suite's size) and runs
    # as pure whole-stage-codegen expressions per document row — no
    # explode, no join, no shuffle on the bloom leg (the k=22 explode
    # form measured 9.1 s at sf0.1 against 31M shuffled probe rows). A
    # benchmark suite too large for the plan (10^9 grams → ~8M words)
    # trips the cap and the SAME call degrades to the broadcast
    # word-join form — identical relation (pytest pins the boundary),
    # identical oracle. The literal closure remains a stateless
    # expression, so the same probe decontaminates a readStream
    # unchanged (pytest pins stream ≡ batch).
    m_bits = int(params.collect()[0]["m_bits"])
    # r14 (guide §1.2, VERDICT r13 #7): the gram relation feeds BOTH
    # decontamination legs (bloom-probe + exact-hit join) and Spark
    # re-inlines it — the corpus shingle pass ran twice per query.
    # Checkpoint it once (A/B min-of-3 warm: 4.2–4.5 → 3.1–3.2 s at
    # sf0.1); tracked release via _CKPT_PERSIST. The bench leg (docs <
    # 5) stays inline — its pushed-down filter shingles 5 docs only.
    corpus = _fresh_ckpt(spark, d.filter(F.col("doc_id") >= 5))
    flagged = llm_dedup.count_bloom_hits(
        corpus.select(
            "doc_id", F.size("sh").cast("long").alias("n_grams"), "sh"
        ),
        words,
        m_bits,
        _DECON_BLOOM_K,
        grams_col="sh",
        literal_word_cap=(
            _DECON_LITERAL_WORD_CAP
            if _DECON_LITERAL_WORD_CAP is not None
            else llm_dedup.BLOOM_LITERAL_WORD_CAP
        ),
    )
    exact = (
        corpus.select("doc_id", F.explode("sh").alias("g"))
        .join(F.broadcast(bench), "g")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_exact_hits"))
    )
    return flagged.join(exact, "doc_id", "left").select(
        "doc_id",
        "n_grams",
        "n_bloom_hits",
        F.coalesce("n_exact_hits", F.lit(0)).alias("n_exact_hits"),
    )


ORACLE["bloom_decontamination"] = f"""
WITH d AS (
  SELECT doc_id,
         list_distinct([substr(text, i, {_DECON_GRAM})
              for i in range(1, greatest(length(text) - {_DECON_GRAM - 1}, 1)
                             + 1)]) AS sh
  FROM documents
),
bench AS (SELECT DISTINCT unnest(sh) AS g FROM d WHERE doc_id < 5),
p AS (SELECT CAST(count(*) AS BIGINT) AS n_keys,
             greatest(63, CAST(ceil(count(*) * {_DECON_BLOOM_BPK}.0 / 63)
                               AS BIGINT) * 63) AS m_bits
      FROM bench),
bh2 AS (SELECT ('0x' || substr(md5(g), 1, 15))::BIGINT % p.m_bits AS h1,
               ('0x' || substr(md5(g), 17, 15))::BIGINT % (p.m_bits - 1) + 1
                 AS h2, p.m_bits AS m
        FROM bench, p),
bpos AS (SELECT (h1 + i * h2) % m AS pos
         FROM bh2, range({_DECON_BLOOM_K}) t(i)),
words AS (SELECT pos // 63 AS word_idx,
                 bit_or(1::BIGINT << CAST(pos % 63 AS INT)) AS word
          FROM bpos GROUP BY 1),
corpus AS (SELECT doc_id, len(sh) AS n_grams, unnest(sh) AS g
           FROM d WHERE doc_id >= 5),
ch2 AS (SELECT doc_id, n_grams, g,
               ('0x' || substr(md5(g), 1, 15))::BIGINT % p.m_bits AS h1,
               ('0x' || substr(md5(g), 17, 15))::BIGINT % (p.m_bits - 1) + 1
                 AS h2, p.m_bits AS m
        FROM corpus, p),
cpos AS (SELECT doc_id, n_grams, g, (h1 + i * h2) % m AS pos
         FROM ch2, range({_DECON_BLOOM_K}) t(i)),
ghits AS (SELECT doc_id, n_grams, g,
                 bool_and(coalesce(
                   (w.word & (1::BIGINT << CAST(c.pos % 63 AS INT))) <> 0,
                   FALSE)) AS hit
          FROM cpos c LEFT JOIN words w ON c.pos // 63 = w.word_idx
          GROUP BY doc_id, n_grams, g),
exact AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_exact_hits
          FROM corpus JOIN bench USING (g) GROUP BY doc_id)
SELECT h.doc_id,
       CAST(h.n_grams AS BIGINT) AS n_grams,
       CAST(sum(CASE WHEN h.hit THEN 1 ELSE 0 END) AS BIGINT)
         AS n_bloom_hits,
       coalesce(any_value(exact.n_exact_hits), 0) AS n_exact_hits
FROM ghits h LEFT JOIN exact ON h.doc_id = exact.doc_id
GROUP BY h.doc_id, h.n_grams
"""


# --- L77: deterministic weighted sampling (Efraimidis-Spirakis A-Res) --------
# Exact-k sampling WITHOUT replacement, inclusion probability
# proportional to weight — the op behind "sample 1M docs by length/
# quality for eval" that temperature/stratified sampling (L24/L37)
# don't give (those are rate-based, per-row independent, so the sample
# SIZE is random). A-Res: per row an exponential variate
# e = -ln(u)/w with u a hash-derived uniform; the k SMALLEST e win.
# This is THE distributed weighted-sampling algorithm: each partition
# keeps its local top-k and the driver merges — Spark plans exactly
# that from ORDER BY + LIMIT (TakeOrderedAndProject, O(n) map +
# O(k log k) merge, no global sort, no shuffle of the corpus).
# Determinism + portability: u = (h + 0.5) / 2^52 with h a 52-bit md5
# slice — h is exactly representable as a double, so both engines
# compute bit-identical u, and ties (impossible in the continuous key
# outside hash collisions) break on doc_id.
_ARS_K = 100


def _weighted_sample_sql(dialect: str, salt: str = "", k: int = _ARS_K) -> str:
    if dialect == "spark":
        h = (
            "CAST(conv(substr(md5(CAST(doc_id AS STRING) || '|"
            + salt
            + "'), 1, 13), 16, 10) AS BIGINT)"
        )
    else:
        h = (
            "('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|"
            + salt
            + "'), 1, 13))::BIGINT"
        )
    return f"""
SELECT doc_id, n_chars, round(ekey, 6) AS ekey
FROM (
  SELECT doc_id, n_chars,
         -ln(({h} + 0.5) / 4503599627370496.0) / n_chars AS ekey
  FROM documents
)
ORDER BY ekey, doc_id
LIMIT {k}
"""


SPARK_SQL["weighted_sample_ars"] = _weighted_sample_sql("spark")
ORACLE["weighted_sample_ars"] = _weighted_sample_sql("duck")


# --- token-budget corpus selection (histogram threshold) --------------------
# "Select the highest-quality documents until the token budget is spent."
# The naive form is a global sort by quality + running token sum — a
# single-partition window at any scale. The scale-safe form used here:
# (1) bucket the quality score into 1000 fixed-width bins (narrow map);
# (2) aggregate token counts per bin (one map-side-combined shuffle to
#     <=1000 rows); (3) run the cumulative sum highest-bin-first over that
#     TINY histogram (single-partition window over <=1000 rows, O(1));
# (4) broadcast-join the kept-bin set back and filter (whole-bin
#     granularity keeps the selection deterministic and order-free).
# Quality proxy = distinct-word ratio; budget = 30% of corpus tokens.
_BUDGET_FRAC = 0.30


def _token_budget_sql(toks: str, uniq: str) -> str:
    return f"""
WITH b AS (
  SELECT doc_id, {toks} AS toks,
         CAST(least(999, floor(CAST({uniq} AS DOUBLE) / {toks} * 1000)) AS INT) AS qb
  FROM documents
),
hist AS (SELECT qb, sum(toks) AS btoks FROM b GROUP BY qb),
cum AS (
  SELECT qb,
         sum(btoks) OVER (ORDER BY qb DESC
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_toks,
         sum(btoks) OVER () AS total_toks
  FROM hist
),
kept AS (SELECT qb FROM cum WHERE cum_toks <= {_BUDGET_FRAC} * total_toks)
SELECT b.doc_id, b.qb AS quality_bucket, CAST(b.toks AS BIGINT) AS doc_tokens
FROM b JOIN kept ON b.qb = kept.qb
"""


SPARK_SQL["token_budget_select"] = _token_budget_sql(
    "size(split(text, ' '))", "size(array_distinct(split(text, ' ')))"
)
ORACLE["token_budget_select"] = _token_budget_sql(
    "len(string_split(text, ' '))", "len(list_distinct(string_split(text, ' ')))"
)


# --- incremental corpus merge: dedup-on-arrival -----------------------------
# The continuously-ingesting pipeline's admission check: an incoming batch
# is admitted doc-by-doc iff its content hash is unseen in the corpus AND
# it is the batch's first occurrence of that hash (deterministic keeper =
# min doc_id). Here docs with doc_id % 10 >= 8 stand in for the incoming
# batch; the rest are the standing corpus. Scale shape: the corpus side is
# reduced to distinct hashes BEFORE the join (map-side combine), the
# incoming batch is tiny relative to the corpus → Spark broadcasts it and
# the corpus-side scan streams through; no corpus-sized shuffle. At 100 TB
# the corpus hash set would live as a hash-bucketed table so the probe is
# a co-located join on the bucket prefix.
SPARK_SQL["incremental_dedup_merge"] = ORACLE["incremental_dedup_merge"] = """
WITH corpus AS (
  SELECT md5(text) AS h FROM documents WHERE doc_id % 10 < 8 GROUP BY md5(text)
),
incoming AS (
  SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id % 10 >= 8
),
firsts AS (SELECT h, min(doc_id) AS keeper FROM incoming GROUP BY h)
SELECT i.doc_id, i.h AS content_hash,
       (c.h IS NULL AND i.doc_id = f.keeper) AS accept
FROM incoming i
LEFT JOIN corpus c ON i.h = c.h
JOIN firsts f ON i.h = f.h
"""


# --- SRP (signed random projections): embedding-space LSH -------------------
# Deterministic ±1 hyperplanes (llm/similarity.srp_planes) are embedded as
# LITERALS in both engines, so the bit-exact signature is oracle-checkable:
# float→double cast is exact and both engines fold the dot product in array
# order, giving bitwise-identical sums.

def _srp_sig_sql_duckdb(planes: list[list[float]]) -> str:
    terms = []
    for j, plane in enumerate(planes):
        arr = "[" + ", ".join(str(x) for x in plane) + "]"
        terms.append(
            f"(CASE WHEN list_dot_product(v, {arr}) >= 0 THEN 1 ELSE 0 END)"
            f" * CAST({2**j} AS BIGINT)"
        )
    return " + ".join(terms)


def _q_srp_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .llm import similarity as sim

    register_views(spark, sf_dir, ("embeddings",))
    return sim.srp_signatures(spark.table("embeddings"), bits=16, dim=64)


# Registry default max_bucket for the SRP pair family: small enough that
# the star+chain branch actually executes at the sf0.01 correctness gate
# (band buckets there top out at 9 members), production-shaped enough to
# bound a boilerplate embedding cluster's pair output.
_SRP_MAX_BUCKET = 4


def _q_srp_near_dup(
    spark: SparkSession, sf_dir: str, max_bucket: int | None = None
) -> DataFrame:
    from pyspark.sql import functions as F

    from .llm import similarity as sim

    register_views(spark, sf_dir, ("embeddings",))
    pairs = sim.srp_candidate_pairs(
        spark.table("embeddings"), bits=16, bands=2, dim=64, max_bucket=max_bucket
    )
    return pairs.orderBy(F.desc("cosine"), "id_a", "id_b").limit(20)


def _q_srp_near_dup_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The registry default: bucket-capped SRP candidates (the uncapped
    form's pair output spills at the ×100 growth tier — SCALE.md)."""
    return _q_srp_near_dup(spark, sf_dir, max_bucket=_SRP_MAX_BUCKET)


def _srp_oracles() -> None:
    from .llm.similarity import srp_planes

    planes = srp_planes(64, 16)
    sig = _srp_sig_sql_duckdb(planes)
    ORACLE["srp_signatures"] = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
SELECT vec_id, {sig} AS srp_sig FROM e
"""
    # shared head: signature + band explosion (replays srp_candidate_pairs)
    srp_head = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
s AS (SELECT vec_id, v, {sig} AS sig FROM e),
b AS (SELECT vec_id, v, t.band, (sig // CAST(pow(2, t.band * 8) AS BIGINT)) % 256 AS band_val
      FROM s, unnest([0, 1]) AS t(band))"""
    srp_tail = """
SELECT id_a, id_b,
       round(list_dot_product(x.v, y.v)
             / (sqrt(list_dot_product(x.v, x.v)) * sqrt(list_dot_product(y.v, y.v))),
             6) AS cosine
FROM pairs JOIN s x ON id_a = x.vec_id JOIN s y ON id_b = y.vec_id
ORDER BY cosine DESC, id_a, id_b LIMIT 20
"""
    ORACLE["srp_near_dup_uncapped"] = srp_head + """,
pairs AS (SELECT DISTINCT a.vec_id AS id_a, b2.vec_id AS id_b
          FROM b a JOIN b b2 ON a.band = b2.band AND a.band_val = b2.band_val
                            AND a.vec_id < b2.vec_id)""" + srp_tail
    # the registry default replays the star+chain cap: rank within each
    # (band, band_val) bucket by vec_id, lowest _SRP_MAX_BUCKET members
    # pair all-against-all, members past the cap emit canonical + chain
    # edges — identical to srp_candidate_pairs(max_bucket=...)
    m = _SRP_MAX_BUCKET
    ORACLE["srp_near_dup_pairs"] = srp_head + f""",
r AS (
  SELECT vec_id, v, band, band_val,
         row_number() OVER w AS rk,
         first_value(vec_id) OVER w AS canon,
         lag(vec_id) OVER w AS prev
  FROM b WINDOW w AS (PARTITION BY band, band_val ORDER BY vec_id)
),
pairs AS (
  SELECT DISTINCT id_a, id_b FROM (
    SELECT a.vec_id AS id_a, b2.vec_id AS id_b
    FROM r a JOIN r b2 ON a.band = b2.band AND a.band_val = b2.band_val
                      AND a.vec_id < b2.vec_id AND a.rk <= {m} AND b2.rk <= {m}
    UNION ALL SELECT canon, vec_id FROM r WHERE rk > {m}
    UNION ALL SELECT prev, vec_id FROM r WHERE rk > {m}
  )
)""" + srp_tail


_srp_oracles()


def _q_ivf_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF centroid TRAINING (Lloyd's): map-only assignment against literal
    centroids + one k×dim partial-agg shuffle per iteration. Uses the
    deterministic engine-portable twin (md5 seeding, ordered-fold dots,
    DECIMAL-exact update — llm/similarity.kmeans_train_portable) so a
    DuckDB oracle replays the identical iteration; the production
    xxhash/BLAS path (kmeans_train) is covered by tests/test_llm.py."""
    from .llm import similarity as sim

    register_views(spark, sf_dir, ("embeddings",))
    emb = spark.table("embeddings")
    centroids = sim.kmeans_train_portable(emb, k=8, n_iter=1)
    return sim.kmeans_assignment_stats_portable(emb, centroids)


# Shared DuckDB replay of kmeans_train_portable(k, n_iter=1) +
# per-vector assignment: asg1 yields (vec_id, v, cid, cv, d). Reused by the
# training-stats oracle and the SemDeDup oracles so each checks the
# identical iteration. ``k_expr`` is a SQL expression over the corpus —
# a literal ("8") for the fixed-k forms, or the corpus-scaled clamp for
# the auto form (replaying semantic_dedup_auto_portable's
# k = min(n, max(min_k, n // target_cluster_size)) rule in SQL).
def _kmeans_asg1_duck(k_expr: str) -> str:
    return f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
seed AS (
  SELECT row_number() OVER (
           ORDER BY ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT % 9973,
                    vec_id) - 1 AS cid, v
  FROM e
),
s0 AS (SELECT cid, v FROM seed WHERE cid < ({k_expr})),""" + _KMEANS_ASG1_TAIL


_KMEANS_ASG1_TAIL = """
asg0 AS (
  SELECT vec_id, v, cid FROM (
    SELECT e.vec_id, e.v, s.cid, list_dot_product(e.v, s.v) AS d
    FROM e CROSS JOIN s0 s)
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cid) = 1
),
u AS (SELECT cid, unnest(v) AS x, unnest(range(1, len(v) + 1)) AS pos FROM asg0),
m AS (SELECT cid, pos, CAST(sum(CAST(x AS DECIMAL(38,18))) AS DOUBLE) / count(*) AS cx
      FROM u GROUP BY cid, pos),
mlist AS (SELECT cid, list(cx ORDER BY pos) AS cv FROM m GROUP BY cid),
c1 AS (SELECT s.cid, coalesce(ml.cv, s.v) AS cv FROM s0 s LEFT JOIN mlist ml USING (cid)),
asg1 AS (
  SELECT vec_id, v, cid, cv, d FROM (
    SELECT e.vec_id, e.v, c.cid, c.cv, list_dot_product(e.v, c.cv) AS d
    FROM e CROSS JOIN c1 c)
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cid) = 1
)"""

_KMEANS_ASG1_DUCK = _kmeans_asg1_duck("8")

ORACLE["ivf_kmeans_train"] = _KMEANS_ASG1_DUCK + """
SELECT CAST(cid AS INT) AS centroid_id, CAST(count(*) AS BIGINT) AS n,
       round(CAST(sum(CAST(d / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(cv, cv)))
                          AS DECIMAL(38,18))) AS DOUBLE) / count(*), 6) AS mean_cos
FROM asg1 GROUP BY cid
"""


# --- L57: product quantization (PQ) codebooks + ADC top-k ---------------------
# The compression leg of IVF-PQ (Jégou et al. 2011): m per-subspace
# codebooks trained with the SAME portable Lloyd twin the IVF family
# uses, vectors encode to m codes, and the query scores candidates
# through literal m×k distance tables — m map lookups per candidate, no
# join, TakeOrderedAndProject for the top-k. The oracle replays ALL m
# trainings (seed → assign → DECIMAL-exact update → re-assign) over the
# sliced subvectors plus the table-lookup scoring, generated from the
# same constants.
_PQ_M, _PQ_K = 4, 16


def _q_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from .llm import similarity as sim

    register_views(spark, sf_dir, ("embeddings",))
    emb = spark.table("embeddings")
    books = sim.pq_train_portable(emb, m=_PQ_M, k=_PQ_K, n_iter=1)
    qv = [
        float(x)
        for x in emb.filter("vec_id = 0")
        .select(F.col("embedding").cast("array<double>"))
        .first()[0]
    ]
    return sim.pq_adc_topk_portable(emb, books, qv, k=10, exclude_id=0)


def _pq_train_ctes(m: int, k: int) -> list[str]:
    """Per-subspace replay of pq_train_portable over an ``ed(vec_id, fv)``
    relation the caller provides: for each subspace, md5-gated seeding,
    max-dot assign with cid tie-break, DECIMAL(38,18) centroid update,
    re-assign to codes. Shared by the flat-PQ and IVF-PQ oracles."""
    ctes = []
    for j in range(m):
        # subspace slice bounds are computed from the corpus's own
        # dimensionality so the oracle needs no dim literal
        lo = f"({j} * (len(fv) // {m}) + 1)"
        hi = f"(({j} + 1) * (len(fv) // {m}))"
        ctes.append(f"""
e_{j} AS (SELECT vec_id, fv[{lo}:{hi}] AS v FROM ed),
seed_{j} AS (
  SELECT row_number() OVER (
           ORDER BY ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT % 9973,
                    vec_id) - 1 AS cid, v
  FROM e_{j}
),
s0_{j} AS (SELECT cid, v FROM seed_{j} WHERE cid < {k}),
asg0_{j} AS (
  SELECT vec_id, v, cid FROM (
    SELECT e.vec_id, e.v, s.cid, list_dot_product(e.v, s.v) AS d
    FROM e_{j} e CROSS JOIN s0_{j} s)
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cid) = 1
),
u_{j} AS (SELECT cid, unnest(v) AS x, unnest(range(1, len(v) + 1)) AS pos FROM asg0_{j}),
m_{j} AS (SELECT cid, pos, CAST(sum(CAST(x AS DECIMAL(38,18))) AS DOUBLE) / count(*) AS cx
          FROM u_{j} GROUP BY cid, pos),
mlist_{j} AS (SELECT cid, list(cx ORDER BY pos) AS cv FROM m_{j} GROUP BY cid),
c1_{j} AS (SELECT s.cid, coalesce(ml.cv, s.v) AS cv FROM s0_{j} s LEFT JOIN mlist_{j} ml USING (cid)),
code_{j} AS (
  SELECT vec_id, cid FROM (
    SELECT e.vec_id, c.cid, list_dot_product(e.v, c.cv) AS d
    FROM e_{j} e CROSS JOIN c1_{j} c)
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cid) = 1
)""")
    return ctes


def _pq_oracle(m: int, k: int) -> str:
    """Flat-PQ replay: codebooks over raw vectors, one distance table per
    subspace for the query, m-lookup sum in subspace order."""
    ctes = [
        "ed AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS fv FROM embeddings)"
    ]
    ctes += _pq_train_ctes(m, k)
    for j in range(m):
        ctes.append(f"""
q_{j} AS (SELECT v AS qv FROM e_{j} WHERE vec_id = 0),
t_{j} AS (SELECT c.cid, list_dot_product(q.qv, c.cv) AS t FROM c1_{j} c, q_{j} q),
sc_{j} AS (SELECT c.vec_id, t.t FROM code_{j} c JOIN t_{j} t ON c.cid = t.cid)""")
    sum_expr = " + ".join(f"sc_{j}.t" for j in range(m))
    joins = "sc_0" + "".join(f" JOIN sc_{j} USING (vec_id)" for j in range(1, m))
    return (
        "WITH " + ",".join(ctes) + f""",
scored AS (SELECT sc_0.vec_id, {sum_expr} AS s FROM {joins})
SELECT vec_id, round(s, 6) AS adc_score FROM scored WHERE vec_id <> 0
ORDER BY adc_score DESC, vec_id LIMIT 10
"""
    )


ORACLE["pq_adc_topk"] = _pq_oracle(_PQ_M, _PQ_K)


# --- L58: COMPOSED IVF-PQ — coarse quantizer + residual PQ + probed ADC -------
# The full ANN index read path (Jégou et al. 2011 §IV): the coarse
# kmeans (the SAME portable replay the IVF family certifies) partitions
# the corpus into inverted lists; PQ codebooks are trained on RESIDUALS
# (v − coarse centroid); the query probes its nearest lists and scores
# only their members through per-(list, subspace) distance tables built
# over its own residual. At 100 TB the coarse cid is the stored layout's
# partition key (write_ivf_layout), so the probe filter is partition
# pruning and the scan touches probes/coarse_k of the data.
_IVFPQ_COARSE_K, _IVFPQ_PROBES = 8, 2


def _q_ivf_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .llm import similarity as sim

    register_views(spark, sf_dir, ("embeddings",))
    return sim.ivf_pq_topk_portable(
        spark.table("embeddings"),
        coarse_k=_IVFPQ_COARSE_K,
        probes=_IVFPQ_PROBES,
        m=_PQ_M,
        k=_PQ_K,
        topk=10,
    )


def _ivf_pq_oracle(m: int, k: int, coarse_k: int, probes: int) -> str:
    """IVF-PQ replay: the coarse kmeans iteration (the shared
    _kmeans_asg1_duck CTEs: e/seed/s0/asg0/u/m/mlist/c1/asg1), residuals
    as the PQ training relation, the per-subspace codebook replay, then
    probe selection and per-(list, subspace) tables over the query's
    residual; a doc joins only its OWN list's table, which also applies
    the probed-list filter."""
    head = _kmeans_asg1_duck(str(coarse_k)) + """,
ed AS (SELECT vec_id,
              list_transform(range(1, len(v) + 1), i -> v[i] - cv[i]) AS fv
       FROM asg1),
qf AS (SELECT v FROM e WHERE vec_id = 0),
probe AS (
  SELECT cid, cv FROM (
    SELECT c.cid, c.cv, list_dot_product(q.v, c.cv) AS d
    FROM c1 c CROSS JOIN qf q)
""" + f"  QUALIFY row_number() OVER (ORDER BY d DESC, cid) <= {probes}\n" + """),
qres AS (
  SELECT p.cid AS lcid,
         list_transform(range(1, len(q.v) + 1), i -> q.v[i] - p.cv[i]) AS qr
  FROM probe p CROSS JOIN qf q
)"""
    ctes = [head] + _pq_train_ctes(m, k)
    for j in range(m):
        lo = f"({j} * (len(qr) // {m}) + 1)"
        hi = f"(({j} + 1) * (len(qr) // {m}))"
        ctes.append(f"""
tt_{j} AS (SELECT qres.lcid, c.cid,
                  list_dot_product(qres.qr[{lo}:{hi}], c.cv) AS t
           FROM c1_{j} c CROSS JOIN qres),
ss_{j} AS (SELECT cd.vec_id, t.lcid, t.t
           FROM code_{j} cd JOIN tt_{j} t ON cd.cid = t.cid)""")
    sum_expr = " + ".join(f"ss_{j}.t" for j in range(m))
    joins = "".join(
        f"\n  JOIN ss_{j} ON ss_{j}.vec_id = a.vec_id AND ss_{j}.lcid = a.cid"
        for j in range(m)
    )
    return (
        ",".join(ctes) + f""",
scored AS (
  SELECT a.vec_id, a.cid AS lcid, {sum_expr} AS s
  FROM asg1 a{joins}
)"""
    )


ORACLE["ivf_pq_topk"] = _ivf_pq_oracle(
    _PQ_M, _PQ_K, _IVFPQ_COARSE_K, _IVFPQ_PROBES
) + """
SELECT vec_id, CAST(lcid AS INT) AS list_id, round(s, 6) AS adc_score
FROM scored WHERE vec_id <> 0
ORDER BY adc_score DESC, vec_id LIMIT 10
"""


# --- IVF-PQ recall gate, DECOMPOSED (r10) -------------------------------------
# An ANN index without a measured recall number is an unquantified
# approximation — and a bare ratio doesn't say WHICH stage loses. This
# query certifies recall@10 of the compressed probe against EXACT
# max-dot search over the raw vectors AND decomposes the loss into its
# two independent causes, all in-query, both engines (ranking everywhere
# by the 6dp-rounded score with vec_id tie-break — the family's
# established cross-engine rank convention):
#
# - ``recall_adc``          the production probe as-is (ADC top-10).
# - ``recall_probed_exact`` exact rescoring RESTRICTED to the probed
#                           lists — the ceiling ANY reranker can reach
#                           with these probes (IVFADC+R, Jégou et al.
#                           2011 §V, with C→∞): the gap to 1.0 is pure
#                           COARSE-COVERAGE loss (true neighbors living
#                           in unprobed lists), the gap from recall_adc
#                           up to it is pure PQ QUANTIZATION loss.
#
# Measured at sf0.01 with the registry's oracle-replayable budget
# (coarse_k=8, probes=2, m=4, k=16): recall_adc 0.1, probed-exact
# ceiling 0.2 — i.e. the tiny 1-iteration coarse quantizer dominates the
# loss, not the codebooks; the production knob is probes (SCALE.md r10
# measures the probes curve). Output is one row carrying all three
# ordered id lists, so the driver hash-compare pins the exact sets, not
# just the ratios. Scale shape: the exact side is one narrow dot-product
# map + TakeOrdered (the brute-force baseline every ANN deployment
# measures on a sample); the probed-exact side adds one IN filter on the
# assignment column; the approx side is the L58 probe.
ORACLE["ivf_pq_recall"] = _ivf_pq_oracle(
    _PQ_M, _PQ_K, _IVFPQ_COARSE_K, _IVFPQ_PROBES
) + """,
approx AS (
  SELECT vec_id FROM scored WHERE vec_id <> 0
  ORDER BY round(s, 6) DESC, vec_id LIMIT 10
),
pexact AS (
  SELECT a.vec_id FROM asg1 a CROSS JOIN qf
  WHERE a.vec_id <> 0 AND a.cid IN (SELECT cid FROM probe)
  ORDER BY round(list_dot_product(a.v, qf.v), 6) DESC, a.vec_id LIMIT 10
),
exact AS (
  SELECT e.vec_id FROM e CROSS JOIN qf
  WHERE e.vec_id <> 0
  ORDER BY round(list_dot_product(e.v, qf.v), 6) DESC, e.vec_id LIMIT 10
),
al AS (SELECT list_sort(list(vec_id)) AS ids FROM approx),
pl AS (SELECT list_sort(list(vec_id)) AS ids FROM pexact),
el AS (SELECT list_sort(list(vec_id)) AS ids FROM exact)
SELECT CAST(10 AS BIGINT) AS k,
       CAST(len(list_intersect(al.ids, el.ids)) AS BIGINT) AS n_hits_adc,
       round(len(list_intersect(al.ids, el.ids)) / 10.0, 6) AS recall_adc,
       CAST(len(list_intersect(pl.ids, el.ids)) AS BIGINT)
         AS n_hits_probed_exact,
       round(len(list_intersect(pl.ids, el.ids)) / 10.0, 6)
         AS recall_probed_exact,
       array_to_string(al.ids, ',') AS approx_ids,
       array_to_string(pl.ids, ',') AS probed_exact_ids,
       array_to_string(el.ids, ',') AS exact_ids
FROM al CROSS JOIN pl CROSS JOIN el
"""


# --- IVFADC+R: the rerank read path the recall gate motivates (r10) ----------
# ADC top-C candidates rescored exactly against the raw vectors before
# the final top-k (Jégou et al. 2011 §V): recovers the full PQ
# quantization loss whenever C covers the probed lists' true contenders
# — rerank cost O(C·dim), corpus-size-independent. Oracle = the full
# index replay, candidate cut, then exact dot-product rescoring.
_IVFPQ_RERANK_C = 50

ORACLE["ivf_pq_rerank_topk"] = _ivf_pq_oracle(
    _PQ_M, _PQ_K, _IVFPQ_COARSE_K, _IVFPQ_PROBES
) + f""",
cand AS (
  SELECT vec_id FROM scored WHERE vec_id <> 0
  ORDER BY round(s, 6) DESC, vec_id LIMIT {_IVFPQ_RERANK_C}
)
SELECT e.vec_id, round(list_dot_product(e.v, qf.v), 6) AS exact_score
FROM cand JOIN e USING (vec_id) CROSS JOIN qf
ORDER BY exact_score DESC, vec_id LIMIT 10
"""


def _q_ivf_pq_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry form rides the STORED layout (L61 — this round's
    build-once theme): ADC candidates from the partition-pruned code
    scan, exact rerank against the raw relation. The model is
    bit-identical to the inline training by construction, so the
    full-replay oracle certifies this path too. Measured 7.1 s inline →
    ~1.5 s stored at sf0.1."""
    from pyspark.sql import functions as F

    from .llm import similarity as sim

    coarse, books, layout = _ivf_pq_layout(spark, sf_dir)
    register_views(spark, sf_dir, ("embeddings",))
    emb = spark.table("embeddings")
    vec = F.col("embedding").cast("array<double>")
    qv = [float(x) for x in emb.filter("vec_id = 0").select(vec).first()[0]]
    cand = sim.ivf_pq_stored_probe(
        spark, layout, coarse, books, qv,
        probes=_IVFPQ_PROBES, topk=_IVFPQ_RERANK_C, exclude_id=0,
    ).select("vec_id")
    exact = F.aggregate(
        F.zip_with(vec, sim.lit_doubles(qv), lambda x, y: x * y),
        F.lit(0.0),
        lambda s, x: s + x,
    )
    return (
        emb.select("vec_id", F.round(exact, 6).alias("exact_score"))
        .join(F.broadcast(cand), "vec_id")
        .orderBy(F.desc("exact_score"), F.col("vec_id"))
        .limit(10)
    )


def _q_ivf_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from .llm import similarity as sim

    # the STORED layout's model (bit-identical to inline training by
    # construction — the L61 contract): training leaves the recall gate
    # too; measured 8.3 s inline → ~1.5 s stored at sf0.1
    coarse, _books, layout = _ivf_pq_layout(spark, sf_dir)
    register_views(spark, sf_dir, ("embeddings",))
    emb = spark.table("embeddings")
    qv = [
        float(x)
        for x in emb.filter("vec_id = 0")
        .select(F.col("embedding").cast("array<double>"))
        .first()[0]
    ]
    approx = sim.ivf_pq_stored_probe(
        spark, layout, coarse, _books, qv,
        probes=_IVFPQ_PROBES, topk=10, exclude_id=0,
    ).select("vec_id")
    by_dot = sorted(
        sorted(coarse), key=lambda t: (-sim._seq_dot(qv, t[1]), t[0])
    )
    probed = [cid for cid, _ in by_dot[:_IVFPQ_PROBES]]
    vec = F.col("embedding").cast("array<double>")
    dot_q = F.aggregate(
        F.zip_with(vec, sim.lit_doubles(qv), lambda x, y: x * y),
        F.lit(0.0),
        lambda s, x: s + x,
    )
    cid_col = sim.pq_code_col("CAST(embedding AS ARRAY<DOUBLE>)", [coarse])[0]
    pexact = (
        emb.filter(F.col("vec_id") != 0)
        .filter(cid_col.isin(probed))
        .select("vec_id", F.round(dot_q, 6).alias("d"))
        .orderBy(F.desc("d"), "vec_id")
        .limit(10)
        .select("vec_id")
    )
    exact = (
        emb.filter(F.col("vec_id") != 0)
        .select("vec_id", F.round(dot_q, 6).alias("d"))
        .orderBy(F.desc("d"), "vec_id")
        .limit(10)
        .select("vec_id")
    )
    al = approx.agg(F.sort_array(F.collect_list("vec_id")).alias("aids"))
    pl = pexact.agg(F.sort_array(F.collect_list("vec_id")).alias("pids"))
    el = exact.agg(F.sort_array(F.collect_list("vec_id")).alias("eids"))
    hits_a = F.size(F.array_intersect("aids", "eids"))
    hits_p = F.size(F.array_intersect("pids", "eids"))
    return (
        al.crossJoin(pl)
        .crossJoin(el)
        .select(
            F.lit(10).cast("long").alias("k"),
            hits_a.cast("long").alias("n_hits_adc"),
            F.round(hits_a / F.lit(10.0), 6).alias("recall_adc"),
            hits_p.cast("long").alias("n_hits_probed_exact"),
            F.round(hits_p / F.lit(10.0), 6).alias("recall_probed_exact"),
            F.concat_ws(",", F.col("aids").cast("array<string>")).alias(
                "approx_ids"
            ),
            F.concat_ws(",", F.col("pids").cast("array<string>")).alias(
                "probed_exact_ids"
            ),
            F.concat_ws(",", F.col("eids").cast("array<string>")).alias(
                "exact_ids"
            ),
        )
    )


# --- stored IVF-PQ read path (VERDICT r8 #2) ---------------------------------
# The production shape: training (coarse quantizer + m residual
# codebooks) runs ONCE at layout-build time and the query plan contains
# NO training at all — one partition-pruned scan of the code columns,
# m literal-map lookups, TakeOrderedAndProject. Identical semantics to
# ivf_pq_topk (same trainer, same assignment/probe/ADC rules, query =
# embedding 0), so it shares that query's full-replay DuckDB oracle;
# what changes is WHERE the work happens, which is the whole point.

def _ivf_pq_layout_path(sf_dir: str) -> str:
    import hashlib
    import os
    import tempfile

    # source identity (path + mtime + size) + index params: regenerated
    # fixtures or retuned params must never serve a stale layout
    src = os.path.join(sf_dir, "embeddings.parquet")
    try:
        st = os.stat(src)
        ident = f"{sf_dir}|{int(st.st_mtime)}|{st.st_size}"
    except OSError:
        ident = sf_dir
    ident += f"|{_IVFPQ_COARSE_K}|{_PQ_M}|{_PQ_K}"
    tag = hashlib.md5(ident.encode()).hexdigest()[:10]
    return os.path.join(tempfile.gettempdir(), f"k2n_ivfpq_layout_v1_{tag}")


def _ivf_pq_layout(spark: SparkSession, sf_dir: str):
    """(coarse, books, layout_dir) for the stored IVF-PQ probe, built
    write-if-absent: the portable trainings run once, the layout persists
    partitioned by list_id, and the trained model rides next to it as
    ``_model.json`` (underscore-prefixed → invisible to the parquet
    FileIndex) so later sessions skip training entirely — exactly the
    amortization a 100 TB deployment gets from its stored index."""
    import json as _json
    import os
    import tempfile

    from .llm import similarity as sim

    register_views(spark, sf_dir, ("embeddings",))
    layout = _ivf_pq_layout_path(sf_dir)
    model_file = os.path.join(layout, "_model.json")
    if os.path.exists(os.path.join(layout, "_SUCCESS")) and os.path.exists(
        model_file
    ):
        with open(model_file) as f:
            m = _json.load(f)
        coarse = [(int(cid), [float(x) for x in cv]) for cid, cv in m["coarse"]]
        books = [
            [(int(cid), [float(x) for x in cv]) for cid, cv in cb]
            for cb in m["books"]
        ]
        return coarse, books, layout
    emb = spark.table("embeddings")
    import time as _time

    t0 = _time.perf_counter()
    coarse = sim.kmeans_train_portable(emb, k=_IVFPQ_COARSE_K, n_iter=1)
    # residual relation for codebook training — the same construction as
    # ivf_pq_topk_portable's (max-dot assign, subtract assigned centroid)
    from pyspark.sql import functions as F

    vec = F.col("embedding").cast("array<double>")
    ordered_coarse = sorted(coarse)
    cid_col = sim.pq_code_col("CAST(embedding AS ARRAY<DOUBLE>)", [coarse])[0]
    cent_map = F.map_from_arrays(
        sim.lit_longs([cid for cid, _ in ordered_coarse]),
        F.array(*[sim.lit_doubles(c) for _, c in ordered_coarse]),
    )
    resid = emb.select(
        F.col("vec_id"),
        F.zip_with(
            vec, F.element_at(cent_map, cid_col), lambda x, c: x - c
        ).alias("embedding"),
    )
    books = sim.pq_train_portable(resid, m=_PQ_M, k=_PQ_K, n_iter=1)
    tmp = tempfile.mkdtemp(prefix="k2n_ivfpq_build_")
    build = os.path.join(tmp, "layout")
    sim.write_ivf_pq_layout(emb, coarse, books, build)
    with open(os.path.join(build, "_model.json"), "w") as f:
        _json.dump({"coarse": coarse, "books": books}, f)
    _publish_layout(tmp, build, layout, ("_SUCCESS", "_model.json"))
    LAYOUT_BUILD_LOG["ivf_pq"] = round(_time.perf_counter() - t0, 3)
    return coarse, books, layout


def _publish_layout(
    tmp: str, build: str, layout: str, complete_markers: tuple[str, ...]
) -> None:
    """Atomically publish a built layout directory (ADVICE r9): NEVER
    rmtree-then-rename — the layout path is keyed by source identity +
    params, so a concurrent session renaming the same path is producing
    the SAME content, and pre-deleting could yank a winner's freshly
    published directory out from under a reader. Rename first; on
    EEXIST/ENOTEMPTY keep a COMPLETE occupant (all ``complete_markers``
    present) and only replace a broken partial (a crashed build at the
    same identity — the one case where deleting is safe). The tmp parent
    is always cleaned up (no-op when the rename moved it)."""
    import os
    import shutil

    def _complete() -> bool:
        return all(
            os.path.exists(os.path.join(layout, m)) for m in complete_markers
        )

    try:
        os.rename(build, layout)
    except OSError:
        if not _complete():
            shutil.rmtree(layout, ignore_errors=True)
            try:
                os.rename(build, layout)
            except OSError:
                pass  # second loss: a complete winner appeared meanwhile
    shutil.rmtree(tmp, ignore_errors=True)


def _q_ivf_pq_stored_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from .llm import similarity as sim

    coarse, books, layout = _ivf_pq_layout(spark, sf_dir)
    qv = [
        float(x)
        for x in spark.table("embeddings")
        .filter("vec_id = 0")
        .select(F.col("embedding").cast("array<double>"))
        .first()[0]
    ]
    return sim.ivf_pq_stored_probe(
        spark, layout, coarse, books, qv,
        probes=_IVFPQ_PROBES, topk=10, exclude_id=0,
    )


# bit-identical to the inline composition by construction (same portable
# trainer, same assignment and probe rules, codes round-trip parquet as
# exact longs), so the stored path reuses the full-replay oracle
ORACLE["ivf_pq_stored_probe"] = ORACLE["ivf_pq_topk"]


_SEMDEDUP_TAU = 0.4


# SemDeDup auto-k parameters for the registry default: cluster size held
# ~constant as the corpus grows (k = min(n, max(2, n // 64))), which the
# growth sweep measured linear (+1.15) where fixed-k is superlinear
# (+1.32). target=64 gives k=7 at the sf0.01 correctness gate — the same
# regime the old fixed k=8 exercised.
_SEMDEDUP_TARGET = 64
_SEMDEDUP_K_EXPR = (
    f"SELECT least(count(*), greatest(2, count(*) // {_SEMDEDUP_TARGET})) FROM e"
)


def _q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): kmeans-cluster the embedding space,
    prune within-cluster cosine near-duplicates keeping the min-id
    survivor. REGISTRY DEFAULT = the auto-k portable form: k scales with
    the corpus (constant cluster size), so the per-cluster quadratic
    term stays bounded as the corpus grows — the fixed-k form this
    replaced measures superlinear (+1.32) on the repo's own growth
    sweep. The portable kmeans twin keeps the DuckDB oracle replaying
    clustering + threshold test bit-for-bit, with k itself re-derived in
    SQL from count(*). tau = 0.4 here because the synthetic embeddings
    are near-isotropic (within-cluster cosine tops out ~0.48 at sf0.01);
    a real corpus runs this at the paper's 0.95+."""
    from .llm import similarity as sim

    register_views(spark, sf_dir, ("embeddings",))
    return sim.semantic_dedup_auto_portable(
        spark.table("embeddings"),
        threshold=_SEMDEDUP_TAU,
        target_cluster_size=_SEMDEDUP_TARGET,
        n_iter=1,
    )


def _q_semantic_dedup_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-k cross-check twin of the auto-k registry default (one
    pinned clustering size, the pre-r5 registry semantics)."""
    from .llm import similarity as sim

    register_views(spark, sf_dir, ("embeddings",))
    emb = spark.table("embeddings")
    centroids = sim.kmeans_train_portable(emb, k=8, n_iter=1)
    return sim.semantic_dedup_prune(emb, centroids, threshold=_SEMDEDUP_TAU)


def _semdedup_prune_duck(k_expr: str) -> str:
    return _kmeans_asg1_duck(k_expr) + f""",
pruned AS (
  SELECT DISTINCT b.vec_id
  FROM asg1 a JOIN asg1 b ON a.cid = b.cid AND a.vec_id < b.vec_id
  WHERE list_dot_product(a.v, b.v)
        / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))
        >= {_SEMDEDUP_TAU}
)
SELECT asg1.vec_id, CAST(cid AS INT) AS centroid_id,
       pruned.vec_id IS NULL AS keep
FROM asg1 LEFT JOIN pruned ON asg1.vec_id = pruned.vec_id
"""


ORACLE["semantic_dedup_prune"] = _semdedup_prune_duck(_SEMDEDUP_K_EXPR)
ORACLE["semantic_dedup_fixed_k"] = _semdedup_prune_duck("8")




# --- L86: deterministic mergeable quantile sketch (KLL-style) ---------------


def _q_kll_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus length telemetry via the md5-driven KLL sketch
    (llm/quantiles.py): level-structured compaction with deterministic
    parity flips, sharded by content key, fixed declarative unroll — the
    streaming-mergeable replacement for exact percentile sorts. The
    oracle replays every compaction round verbatim (generated CTEs with
    the identical window transformation), so the hash certifies the
    SKETCH MATH, not just the answers."""
    from .llm import quantiles as qz

    register_views(spark, sf_dir, ("documents",))
    docs = spark.table("documents").select("doc_id", "n_chars")
    sk = qz.build_sketch(docs, value_col="n_chars", tb_col="doc_id")
    return qz.quantiles_from_sketch(sk)


def _kll_oracle(groups: tuple[str, ...] = ()) -> str:
    """Generated-CTE replay of the full sketch construction (one CTE per
    compaction round, same window transformation, same md5 parities) —
    parameterized by grouping columns so the global and per-group
    telemetry queries share one generator."""
    from .llm.quantiles import (
        DEFAULT_K,
        DEFAULT_SHARDS,
        GLOBAL_ROUNDS,
        QUANTILES,
        SHARD_ROUNDS,
    )

    k = DEFAULT_K
    g = "".join(f"{c}, " for c in groups)          # leading group cols
    gpart = ", ".join(groups)                       # partition prefix
    ctes = [f"""
st0 AS (
  SELECT {g}doc_id % {DEFAULT_SHARDS} AS shard, CAST(0 AS BIGINT) AS level,
         CAST(n_chars AS BIGINT) AS value, CAST(doc_id AS BIGINT) AS tb
  FROM documents)"""]
    n = 0
    for rnd in range(SHARD_ROUNDS + GLOBAL_ROUNDS):
        sharded = rnd < SHARD_ROUNDS
        part = g + ("shard, level" if sharded else "level")
        cols = g + ("shard, " if sharded else "")
        drop_shard = (
            f"s{SHARD_ROUNDS} AS (SELECT {g}level, value, tb "
            f"FROM st{SHARD_ROUNDS}),"
            if rnd == SHARD_ROUNDS
            else ""
        )
        src_rel = f"st{n}" if sharded else (f"s{SHARD_ROUNDS}" if rnd == SHARD_ROUNDS else f"st{n}")
        ctes.append(f"""
{drop_shard}
st{n + 1} AS (
  SELECT {cols}CASE WHEN _cnt > {k} AND _rn < _pairs THEN level + 1
              ELSE level END AS level, value, tb
  FROM (
    SELECT {cols}level, value, tb,
           count(*) OVER (PARTITION BY {part}) AS _cnt,
           row_number() OVER (PARTITION BY {part} ORDER BY value, tb) - 1
             AS _rn,
           count(*) OVER (PARTITION BY {part}) // 2 * 2 AS _pairs,
           ('0x' || substr(md5(CAST(level AS VARCHAR) || ':{rnd}'), 1, 1))
             ::BIGINT % 2 AS _par
    FROM {src_rel})
  WHERE _cnt <= {k} OR _rn >= _pairs OR _rn % 2 = _par)""")
        n += 1
    final = f"st{n}"
    by = f" PARTITION BY {gpart}" if groups else ""
    grp = f" GROUP BY {gpart}" if groups else ""
    legs = " UNION ALL ".join(
        f"""SELECT {g}'{name}' AS quantile,
       min(CASE WHEN cum >= CAST((W * {num} + {den - 1}) // {den} AS BIGINT)
                THEN value END) AS q_value,
       CAST(max((W * {num} + {den - 1}) // {den}) AS BIGINT) AS target_rank,
       CAST(max(W) AS BIGINT) AS total_weight FROM run{grp}"""
        for name, num, den in QUANTILES
    )
    return (
        "WITH "
        + ",".join(ctes)
        + f""",
wsk AS (SELECT {g}value, tb, CAST(1 AS BIGINT) << CAST(level AS INT) AS w
        FROM {final}),
run AS (SELECT {g}value,
               sum(w) OVER ({by.strip() if groups else ''}
                            ORDER BY value, tb ROWS UNBOUNDED PRECEDING)
                 AS cum,
               sum(w) OVER ({by.strip() if groups else ''}) AS W
        FROM wsk)
{legs}"""
    )


ORACLE["kll_quantiles"] = _kll_oracle()


# ceil(eps * W) band the certificate flags against — matches the pytest
# band (measured headroom ~2x over worst observed at both sf tiers)
_KLL_EPS_NUM, _KLL_EPS_DEN = 5, 100


# one-slot per-session cache of the certificate's quantile relation
_KLL_CERT_PERSIST: dict[str, DataFrame] = {}


def _q_kll_error_certificate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sketch's accuracy, MEASURED per quantile (the L71/L73
    certificate move — 'measured, not argued'): for each reported
    quantile, the EXACT rank of the returned value over the raw corpus,
    the signed rank error vs the target, and a within-band flag at
    eps = 5% of W. One extra corpus pass (a broadcast of 6 thresholds +
    one conditional-count aggregation) — the certificate costs one scan,
    the production query (kll_quantiles) costs none of this. The 6-row
    quantile relation persists (one-slot per-session swap): both the
    exact-rank crossJoin and the final join reference it, and without
    the cache each branch would re-run the full 24-round sketch."""
    from pyspark.sql import functions as F

    from .llm import quantiles as qz

    register_views(spark, sf_dir, ("documents",))
    docs = spark.table("documents").select("doc_id", "n_chars")
    app_id = spark.sparkContext.applicationId
    prev = _KLL_CERT_PERSIST.pop(app_id, None)
    if prev is not None:
        prev.unpersist()
    q = qz.quantiles_from_sketch(
        qz.build_sketch(docs, value_col="n_chars", tb_col="doc_id")
    ).persist()
    _KLL_CERT_PERSIST[app_id] = q
    exact = (
        docs.crossJoin(F.broadcast(q.select("quantile", "q_value")))
        .groupBy("quantile")
        .agg(
            F.sum(
                F.when(F.col("n_chars") <= F.col("q_value"), 1).otherwise(0)
            )
            .cast("long")
            .alias("exact_rank")
        )
    )
    return q.join(exact, "quantile").select(
        "quantile",
        "q_value",
        "target_rank",
        "exact_rank",
        (F.col("exact_rank") - F.col("target_rank")).alias("rank_err"),
        (
            F.abs(F.col("exact_rank") - F.col("target_rank"))
            <= F.expr(
                f"CAST((total_weight * {_KLL_EPS_NUM} + {_KLL_EPS_DEN - 1})"
                f" DIV {_KLL_EPS_DEN} AS BIGINT)"
            )
        ).alias("within_band"),
    )


def _kll_certificate_oracle() -> str:
    base = _kll_oracle()
    return f"""WITH q AS ({base}),
exact AS (
  SELECT q.quantile,
         CAST(count(*) FILTER (WHERE d.n_chars <= q.q_value) AS BIGINT)
           AS exact_rank
  FROM q, documents d GROUP BY q.quantile
)
SELECT q.quantile, q.q_value, q.target_rank, e.exact_rank,
       e.exact_rank - q.target_rank AS rank_err,
       abs(e.exact_rank - q.target_rank)
         <= CAST((q.total_weight * {_KLL_EPS_NUM} + {_KLL_EPS_DEN - 1})
                 // {_KLL_EPS_DEN} AS BIGINT) AS within_band
FROM q JOIN exact e ON q.quantile = e.quantile
"""


ORACLE["kll_error_certificate"] = _kll_certificate_oracle()


def _q_kll_quantiles_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group telemetry (the dashboard shape): the same deterministic
    sketch built per language slice — group columns ride every
    compaction partition, so each group compacts independently and the
    output is one row per (lang, quantile). The oracle is the same
    generated round-replay with the group prefix threaded through every
    PARTITION BY."""
    from .llm import quantiles as qz

    register_views(spark, sf_dir, ("documents",))
    docs = spark.table("documents").select("lang", "doc_id", "n_chars")
    sk = qz.build_sketch(
        docs, value_col="n_chars", tb_col="doc_id", group_cols=("lang",)
    )
    return qz.grouped_quantiles_from_sketch(sk, ("lang",))


ORACLE["kll_quantiles_by_lang"] = _kll_oracle(groups=("lang",))


QUERY_FUNCS: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "tfidf_top_term": _q_tfidf_top_term,
    "bm25_topk": _q_bm25_topk,
    "unigram_logprob_score": _q_unigram_logprob,
    "doc_chunks": _q_doc_chunks,
    "pii_scrub_signals": _q_pii_scrub,
    "url_domain_profile": _q_url_domain_profile,
    "dedup_components": _q_dedup_components,
    "dedup_keep_canonical": _q_dedup_keep_canonical,
    "dedup_keep_best": _q_dedup_keep_best,
    "bigram_logprob_score": _q_bigram_logprob,
    # r13: SQL-text queries whose hot CTEs are materialized once by a
    # custom builder (_run_sql_materialized) — overrides the _sql()
    # auto-wiring; the SPARK_SQL/ORACLE texts stay the certificate.
    "nb_lang_classifier": _q_nb_lang_classifier,
    "kneser_ney_bigram_score": _q_kneser_ney_bigram,
    "js_source_drift": _q_js_source_drift,
    "bpe_token_counts": _q_bpe_token_counts,
    "bpe_trained_token_counts": _q_bpe_trained_counts,
    "bpe_trained_tokenization": _q_bpe_trained_tokenization,
    "bpe_train_merges": _q_bpe_train,
    "chunk_dedup_stats": _q_chunk_dedup_stats,
    "line_boilerplate_removal": _q_line_boilerplate_removal,
    "duplicate_span_removal": _q_duplicate_span_removal,
    "html_text_extract": _q_html_text_extract,
    "url_canonical_dedup": _q_url_canonical_dedup,
    "span_rewrite_stored": _q_span_rewrite_stored,
    "web_curation_pipeline": _q_web_curation_pipeline,
    "normalized_dedup": _q_normalized_dedup,
    "script_profile": _q_script_profile,
    "quality_filter_report": _q_quality_filter_report,
    "ivf_pq_topk": _q_ivf_pq_topk,
    "ivf_pq_stored_probe": _q_ivf_pq_stored_probe,
    "ivf_pq_recall": _q_ivf_pq_recall,
    "ivf_pq_rerank_topk": _q_ivf_pq_rerank,
    "pq_adc_topk": _q_pq_adc_topk,
    "incremental_neardup_merge": _q_incremental_neardup,
    "incremental_neardup_stored_probe": _q_incremental_neardup_stored,
    "bloom_admission_filter": _q_bloom_admission,
    "bloom_fpr_certificate": _q_bloom_fpr_certificate,
    "bloom_decontamination": _q_bloom_decontamination,
    # weighted_sample_ars registers via SPARK_SQL (pure SQL both sides)
    "admission_pipeline": _q_admission_pipeline,
    "rrf_fusion": _q_rrf_fusion,
    "bloom_engine_parity": _q_bloom_engine_parity,
    "dsir_engine_parity": _q_dsir_engine_parity,
    "curation_pipeline": _q_curation_pipeline,
    "dedup_pipeline": _q_dedup_pipeline,
    "dedup_pipeline_engine_parity": _q_dedup_pipeline_engine_parity,
    "srp_signatures": _q_srp_signatures,
    # scale-safe registry defaults (capped / auto-k); the uncapped and
    # fixed-k twins stay as named cross-checks with their own oracles
    "srp_near_dup_pairs": _q_srp_near_dup_capped,
    "srp_near_dup_uncapped": _q_srp_near_dup,
    "ivf_kmeans_train": _q_ivf_kmeans,
    "semantic_dedup_prune": _q_semantic_dedup,
    "semantic_dedup_fixed_k": _q_semantic_dedup_fixed,
    "lang_id_heuristic": _q_lang_id,
    "simhash_fingerprints": _q_simhash,
    "quality_score": _q_quality,
    "asof_join_streams": _q_asof_join,
    "asof_join_forward": _q_asof_forward,
    "asof_join_tolerance": _q_asof_tolerance,
    "range_join_attribution": _q_range_join,
    "ngram_jaccard_pairs": _q_ngram_jaccard_capped,
    "ngram_jaccard_uncapped": _q_ngram_jaccard,
    "minhash_engine_parity": _q_minhash_engine_parity,
    "multimodal_features": _q_multimodal_features,
    "multimodal_resize_spec": _q_multimodal_resize,
    "multimodal_resize_pixels": _q_multimodal_resize_pixels,
    "multimodal_frame_sample": _q_multimodal_frames,
    "multimodal_image_dims": _q_multimodal_image_dims,
    "multimodal_wav_meta": _q_multimodal_wav_meta,
    "image_phash": _q_image_phash,
    "kll_quantiles": _q_kll_quantiles,
    "kll_error_certificate": _q_kll_error_certificate,
    "kll_quantiles_by_lang": _q_kll_quantiles_by_lang,
    "image_phash_near_dup": _q_image_phash_near_dup,
    "image_phash_near_dup_uncapped": _q_image_phash_near_dup_uncapped,
    "multimodal_mp4_meta": _q_multimodal_mp4_meta,
    "multimodal_jpeg_pixels": _q_multimodal_jpeg_pixels,
    "multimodal_wav_samples": _q_multimodal_wav_samples,
    "multimodal_video_frames": _q_multimodal_video_frames,
    "video_phash_near_dup": _q_video_phash_near_dup,
    "video_stored_admission": _q_video_stored_admission,
    "multimodal_decode_dispatch": _q_multimodal_decode_dispatch,
    "audio_fingerprint": _q_audio_fingerprint,
    "phash_stored_admission": _q_phash_stored_admission,
    "audio_fp_near_dup": _q_audio_fp_near_dup,
    "minhash_jaccard_estimate": _q_minhash_estimate,
    "bbit_minhash_estimate": _q_bbit_minhash_estimate,
    "quantized_adc_topk": _q_quantized_adc_topk,
    "ivf_partitioned_probe": _q_ivf_partitioned_probe,
    "ivf_probe_topk": _q_ivf_probe_topk,
}


# ---------------------------------------------------------------------------
# Public API consumed by __spark_entry__.py
# ---------------------------------------------------------------------------

# The driver records correctness rows for the FIRST 50 entries (dict
# insertion order); the registry is larger, so ordering IS the
# verification budget. The ordering is derived AT CALL TIME from the
# recorded CORRECTNESS_r*.json history (kafka_to_nexus_spark.rotation):
# never-checked queries first, then behavior-changed ones
# (rotation.CHANGED), then oldest-green first — so the window rotates
# itself the moment the driver writes a new correctness file, and
# tests/test_window_policy.py can never be red at a round boundary
# (rounds 5/6 kept this as a hand-pasted static tuple, which was stale
# the moment each round's file landed).


def _with_ckpt_release(fn):
    """Wrap a registry builder so the PREVIOUS query's eager
    localCheckpoints are deterministically released when the next query
    builds (ADVICE r13 #3): checkpointed blocks are pinned at the RDD
    level outside the cache manager, so without this a long-lived driver
    running the registry repeatedly accumulates pinned executor storage
    until ContextCleaner GC happens to run. Contract (same as
    _PIPELINE_PERSIST's): a query's returned frame must be consumed
    before the NEXT registry query is built."""
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        _release_prior_ckpts(spark)
        return fn(spark, sf_dir)

    run.__name__ = getattr(fn, "__name__", "query")
    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from . import rotation

    all_funcs = {name: _sql(name) for name in SPARK_SQL}
    all_funcs.update(QUERY_FUNCS)
    order = rotation.rotation_order(all_funcs)
    if order is None:
        # no history recorded yet (round 1): any order satisfies the
        # policy; alphabetical keeps it deterministic
        order = sorted(all_funcs)
    return {name: _with_ckpt_release(all_funcs[name]) for name in order}


def oracle_sql(sf_dir: str | None = None) -> dict[str, str]:
    """DuckDB oracle SQL per query. ``sf_dir`` pins the tier for the
    corpus-constant oracles (bm25/unigram); None falls back to the
    ``SPARK_GRAFT_ORACLE_SF_DIR`` env var, then the driver's sf0.01."""
    out = dict(ORACLE)
    out.update(_lazy_oracles(sf_dir))
    out.update(_trained_oracles())
    return out


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: the engine's signature pipeline — as-of windowed scan +
    per-source running aggregates (F2+F3+W1) on the events stream."""
    register_views(spark, sf_dir, ("events",))
    return spark.sql(
        f"""
        WITH windowed AS ({_ASOF_BODY})
        SELECT user_id,
               min(value) AS minimum_value,
               max(value) AS maximum_value,
               round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(value), 6) AS average_value,
               CAST(count(*) AS BIGINT) AS n_messages,
               CAST(sum(CASE WHEN is_buffered THEN 1 ELSE 0 END) AS BIGINT) AS n_buffered
        FROM windowed GROUP BY user_id
        """
    )
