"""Benchmark harness: run the engine's query inventory at the bench scale
factor and print ONE JSON line with per-query wall-clock.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from kafka_to_nexus_spark import queries as Q
from kafka_to_nexus_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(
        app_name="bench",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    # JVM/codegen/file-index warmup so the first timed query doesn't absorb
    # one-time session costs (standard bench practice; per-query numbers
    # then reflect the plan, not JIT).
    Q.register_views(spark, sf_dir)
    spark.sql("SELECT count(*) FROM events").collect()
    spark.sql("SELECT count(*) FROM lineitem").collect()

    timings: dict[str, float] = {}
    total = 0.0
    for name, fn in Q.queries().items():
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        # noop sink: full execution, no driver materialization cost
        df.write.format("noop").mode("overwrite").save()
        dt = round(time.perf_counter() - t0, 3)
        timings[name] = dt
        total += dt
    spark.stop()
    print(
        json.dumps(
            {
                "metric": "inventory_e2e",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
