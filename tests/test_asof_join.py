"""As-of join operator vs pandas merge_asof (the semantics oracle)."""

from __future__ import annotations

import pandas as pd
import pytest

from kafka_to_nexus_spark.operators.asof_join import asof_join_backward

LEFT_SCHEMA = "key string, ts long, lv double"
RIGHT_SCHEMA = "key string, ts long, rv double"

LEFT = [
    ("a", 5, 1.0),
    ("a", 10, 2.0),
    ("a", 20, 3.0),
    ("b", 7, 4.0),
    ("b", 8, 5.0),
    ("c", 1, 6.0),  # no right rows for c at all
]
RIGHT = [
    ("a", 4, 40.0),
    ("a", 10, 100.0),  # exact-ts match must be visible to left@10
    ("a", 15, 150.0),
    ("b", 8, 80.0),
]


def _expected(tolerance=None):
    lf = pd.DataFrame(LEFT, columns=["key", "ts", "lv"]).sort_values("ts")
    rf = pd.DataFrame(RIGHT, columns=["key", "ts", "rv"]).sort_values("ts")
    kwargs = {} if tolerance is None else {"tolerance": tolerance}
    m = pd.merge_asof(lf, rf, on="ts", by="key", direction="backward", **kwargs)
    return {(r.key, r.ts): (None if pd.isna(r.rv) else r.rv) for r in m.itertuples()}


def _got(spark, tolerance=None):
    out = asof_join_backward(
        spark.createDataFrame(LEFT, LEFT_SCHEMA),
        spark.createDataFrame(RIGHT, RIGHT_SCHEMA),
        keys=["key"],
        ts="ts",
        right_values=["rv"],
        tolerance=tolerance,
    ).collect()
    return {(r.key, r.ts): r.asof_rv for r in out}


def test_backward_asof_matches_pandas(spark):
    assert _got(spark) == _expected()


def test_exact_ts_match_is_visible(spark):
    got = _got(spark)
    assert got[("a", 10)] == 100.0  # reading AT the event ts, not before


def test_unmatched_left_rows_survive_with_null(spark):
    got = _got(spark)
    assert got[("c", 1)] is None
    assert len(got) == len(LEFT)


def test_tolerance_expires_old_matches(spark):
    got = _got(spark, tolerance=3)
    exp = _expected(tolerance=3)
    assert got == exp
    # a@20: nearest reading is 15 (within 5 > 3) → expired
    assert got[("a", 20)] is None


def test_forward_asof_matches_pandas(spark):
    import pandas as pd

    left = pd.DataFrame({"k": ["a"] * 4 + ["b"] * 2,
                         "ts": [1, 5, 9, 20, 2, 8],
                         "lv": [10, 11, 12, 13, 20, 21]})
    right = pd.DataFrame({"k": ["a"] * 3 + ["b"],
                          "ts": [2, 5, 10, 50],
                          "value": [1.0, 2.0, 3.0, 4.0]})
    from kafka_to_nexus_spark.operators.asof_join import asof_join_forward

    got = (
        asof_join_forward(
            spark.createDataFrame(left), spark.createDataFrame(right),
            keys=["k"], ts="ts", right_values=["value"])
        .orderBy("k", "ts").toPandas()
    )
    expect = pd.merge_asof(
        left.sort_values("ts"), right.sort_values("ts"),
        on="ts", by="k", direction="forward").sort_values(["k", "ts"])
    assert list(got["asof_value"].fillna(-1)) == list(expect["value"].fillna(-1))


def test_forward_asof_tolerance(spark):
    import pandas as pd

    left = pd.DataFrame({"k": ["a", "a"], "ts": [1, 6], "lv": [0, 1]})
    right = pd.DataFrame({"k": ["a"], "ts": [8], "value": [5.0]})
    from kafka_to_nexus_spark.operators.asof_join import asof_join_forward

    got = (
        asof_join_forward(
            spark.createDataFrame(left), spark.createDataFrame(right),
            keys=["k"], ts="ts", right_values=["value"], tolerance=3)
        .orderBy("ts").collect()
    )
    assert got[0].asof_value is None  # next reading at 8 is 7 ahead > 3
    assert got[1].asof_value == 5.0   # 8 within 6 + 3


def test_null_valued_right_row_is_the_match(spark):
    """merge_asof matches ROWS: when the latest at-or-before right row
    carries a null value, the result is null — not a stale value from an
    older (possibly out-of-tolerance) row, which the per-column
    last(ignorenulls) form silently substituted."""
    import pandas as pd

    from kafka_to_nexus_spark.operators.asof_join import asof_join_backward

    left = pd.DataFrame({"k": ["a"], "ts": [10], "lv": [0]})
    right = pd.DataFrame({"k": ["a", "a"], "ts": [5, 10],
                          "value": [3.0, None]})
    got = asof_join_backward(
        spark.createDataFrame(left), spark.createDataFrame(right),
        keys=["k"], ts="ts", right_values=["value"], tolerance=2,
    ).collect()
    assert got[0].asof_value is None
    expect = pd.merge_asof(left, right, on="ts", by="k", tolerance=2)
    assert pd.isna(expect["value"].iloc[0])
    # without tolerance the matched row is still ts=10 -> null value
    got = asof_join_backward(
        spark.createDataFrame(left), spark.createDataFrame(right),
        keys=["k"], ts="ts", right_values=["value"],
    ).collect()
    assert got[0].asof_value is None
