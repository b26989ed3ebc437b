"""Grouped KLL sketch at per-SOURCE width (VERDICT r11 #6, SCALE.md r12).

Usage: python tools/kll_width_sweep.py [N_SOURCES] [ROWS_PER_SOURCE]

`kll_quantiles_by_lang` runs the grouped sketch at 5 groups; the real
dashboard shape is per-source telemetry at ~50k sources. This sweep
builds the grouped sketch with group_cols=("source",) at width and
records:

  - wall time for build + grouped quantiles (and the exact groupBy
    percentile as the cost reference)
  - total sketch rows and the max per-group row count vs the
    ~k·(max_level+1) bound — the "state stays bounded" check
  - exchange count in the build plan — the "one corpus shuffle for the
    shard phase + one group repartition" shape must hold at width
    (group columns ride the partition keys, so width adds KEYS, not
    STAGES)
  - accuracy: p50/p99 vs the exact per-group answer on a 20-group
    sample (rank error within the sketch's certificate band)

Values are deterministic (31-bit-prime mix of the row id), w=ROWS_PER_
SOURCE per group — above k=32 so the global rounds genuinely compact
per group."""
import json
import pathlib
import statistics
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from kafka_to_nexus_spark.llm import quantiles as qz
from kafka_to_nexus_spark.session import get_spark

N_SOURCES = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
ROWS_PER_SOURCE = int(sys.argv[2]) if len(sys.argv) > 2 else 200

spark = get_spark(extra_conf={"spark.ui.showConsoleProgress": "false"})
spark.conf.set("spark.sql.shuffle.partitions", "32")

P = 2147483629
rows = spark.range(N_SOURCES * ROWS_PER_SOURCE).select(
    F.concat(F.lit("s"), (F.col("id") % N_SOURCES)).alias("source"),
    F.col("id").alias("doc_id"),
    (((F.col("id") * 131 + 7) % P) * ((F.col("id") * 131 + 7) % P) % P % 100_000)
    .alias("value"),
).localCheckpoint()  # synthesis cost out of the timers

result = {"n_sources": N_SOURCES, "rows_per_source": ROWS_PER_SOURCE}

# --- grouped sketch build + quantiles ---------------------------------------
t0 = time.monotonic()
sk = qz.build_sketch(
    rows, value_col="value", tb_col="doc_id", group_cols=("source",)
).persist()
sk_rows = sk.count()
t_build = time.monotonic() - t0

t0 = time.monotonic()
gq = qz.grouped_quantiles_from_sketch(sk, ("source",))
n_q = gq.count()
t_quant = time.monotonic() - t0
result["build_sec"] = round(t_build, 2)
result["quantiles_sec"] = round(t_quant, 2)
result["quantile_rows"] = n_q

# --- state bound -------------------------------------------------------------
per_group = sk.groupBy("source").count()
stats = per_group.agg(
    F.max("count").alias("mx"), F.avg("count").alias("avg")
).first()
top = sk.agg(F.max("level")).first()[0]
bound = qz.DEFAULT_K * (int(top or 0) + 2)
result["sketch_rows_total"] = sk_rows
result["sketch_rows_per_group_max"] = stats["mx"]
result["sketch_rows_per_group_avg"] = round(stats["avg"], 1)
result["per_group_bound_k_levels"] = bound
result["state_bounded"] = bool(stats["mx"] <= bound)

# --- plan shape: exchanges don't grow with width ------------------------------
plan = qz.build_sketch(
    rows, value_col="value", tb_col="doc_id", group_cols=("source",)
)._jdf.queryExecution().executedPlan().toString()
result["build_plan_exchanges"] = plan.count("Exchange")

# --- exact reference cost ------------------------------------------------------
t0 = time.monotonic()
exact = rows.groupBy("source").agg(
    F.expr("percentile(value, 0.5)").alias("p50"),
    F.expr("percentile(value, 0.99)").alias("p99"),
)
exact.count()
result["exact_groupby_percentile_sec"] = round(time.monotonic() - t0, 2)

# --- accuracy on a 20-group sample ---------------------------------------------
import bisect

from collections import defaultdict

sample = [r.source for r in per_group.limit(20).collect()]
got = {
    (r.source, r.quantile): r.q_value
    for r in gq.filter(F.col("source").isin(sample)).collect()
}
vals_by_src: dict[str, list[int]] = defaultdict(list)
for r in rows.filter(F.col("source").isin(sample)).collect():
    vals_by_src[r.source].append(r.value)
for vals in vals_by_src.values():
    vals.sort()
fracs = {name: (num, den) for name, num, den in qz.QUANTILES}
errs = []
for (s, qname), v in got.items():
    num, den = fracs[qname]
    vals = vals_by_src[s]
    w = len(vals)
    target = -(-w * num // den)
    rank = bisect.bisect_right(vals, v)  # items <= answer
    errs.append(abs(rank - target) / w)
result["rank_err_max"] = round(max(errs), 4) if errs else None
result["rank_err_mean"] = round(statistics.mean(errs), 4) if errs else None

sk.unpersist()
print(json.dumps(result))
