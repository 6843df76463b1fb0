"""Unit tests for temporal operators: gap-boundary exactness and
as-of tie semantics (total-order determinism under partitioning)."""

import datetime as dt

from pyspark.sql import Row

from mdscraper_spark.operators import temporal

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ev(spark, rows):
    return spark.createDataFrame(
        [Row(event_id=i, user_id=u, ts=t) for i, (u, t) in enumerate(rows)])


def test_sessionize_gap_boundary_exact(spark):
    # gap of exactly 30 min stays in-session; 30 min + 1 us starts a new one
    rows = [
        (1, T0),
        (1, T0 + dt.timedelta(minutes=30)),                      # same session
        (1, T0 + dt.timedelta(minutes=60, microseconds=1)),      # new session
    ]
    out = {r["session_id"]: r for r in
           temporal.sessionize(_ev(spark, rows)).collect()}
    assert set(out) == {"1#1", "1#2"}
    assert out["1#1"]["n_events"] == 2
    assert out["1#2"]["n_events"] == 1


def test_sessionize_partition_invariant(spark):
    rows = [(u, T0 + dt.timedelta(minutes=17 * i % 95)) for u in (1, 2, 3)
            for i in range(7)]
    a = sorted(map(tuple, temporal.sessionize(_ev(spark, rows)).collect()))
    b = sorted(map(tuple, temporal.sessionize(
        _ev(spark, rows).repartition(7)).collect()))
    assert a == b


def test_asof_join_picks_latest_at_or_before(spark):
    left = spark.createDataFrame(
        [Row(event_id=100, user_id=1, ts=T0 + dt.timedelta(minutes=10))])
    right = spark.createDataFrame([
        Row(user_id=1, click_event_id=1, click_ts=T0),
        Row(user_id=1, click_event_id=2,
            click_ts=T0 + dt.timedelta(minutes=10)),   # equal ts: included
        Row(user_id=1, click_event_id=3,
            click_ts=T0 + dt.timedelta(minutes=11)),   # after: excluded
    ])
    out = temporal.asof_join(left, right, key="user_id",
                             left_ts="ts", right_ts="click_ts",
                             right_cols=("click_event_id", "click_ts"),
                             right_order=("click_ts", "click_event_id"))
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["click_event_id"] == 2


def test_asof_join_tie_breaks_to_max_order_col(spark):
    left = spark.createDataFrame(
        [Row(event_id=100, user_id=1, ts=T0 + dt.timedelta(minutes=5))])
    right = spark.createDataFrame([
        Row(user_id=1, click_event_id=7, click_ts=T0),
        Row(user_id=1, click_event_id=9, click_ts=T0),   # same ts: max id wins
    ])
    out = temporal.asof_join(left, right, key="user_id",
                             left_ts="ts", right_ts="click_ts",
                             right_cols=("click_event_id", "click_ts"),
                             right_order=("click_ts", "click_event_id"))
    assert out.collect()[0]["click_event_id"] == 9


def test_asof_join_inner_drops_unmatched(spark):
    left = spark.createDataFrame(
        [Row(event_id=100, user_id=1, ts=T0),
         Row(event_id=101, user_id=2, ts=T0)])
    right = spark.createDataFrame(
        [Row(user_id=1, click_event_id=1,
             click_ts=T0 - dt.timedelta(minutes=1))])
    out = temporal.asof_join(left, right, key="user_id",
                             left_ts="ts", right_ts="click_ts",
                             right_cols=("click_event_id", "click_ts"))
    assert [r["event_id"] for r in out.collect()] == [100]


def test_asof_join_ignores_null_right_ts(spark):
    """A null right_ts can never satisfy right_ts <= left_ts: it must
    not become the carried match for left rows with no genuine prior
    right row (null __t sorts first under asc — engines must agree
    with SQL's null-comparison-is-false)."""
    left = spark.createDataFrame(
        [Row(event_id=100, user_id=1, ts=T0)])
    right = spark.createDataFrame(
        [Row(user_id=1, click_event_id=1, click_ts=None),
         Row(user_id=1, click_event_id=2,
             click_ts=T0 + dt.timedelta(minutes=1))],
        "user_id long, click_event_id long, click_ts timestamp")
    out = temporal.asof_join(left, right, key="user_id",
                             left_ts="ts", right_ts="click_ts",
                             right_cols=("click_event_id", "click_ts"))
    assert out.collect() == []          # no prior real click -> dropped


def test_range_join_bucket_boundaries_and_plan(spark):
    """Bucketed range join: pairs straddling a bucket boundary must
    still match (left explodes to bucket ±1), no pair duplicates, and
    the plan is an equi-join — never a cross product."""
    import datetime

    from mdscraper_spark.operators.temporal import range_join

    t0 = datetime.datetime(2025, 6, 14, 12, 0, 0)

    def ts(sec):
        return t0 + datetime.timedelta(seconds=sec)

    left = spark.createDataFrame(
        [(1, "u", ts(0)), (2, "u", ts(299)), (3, "u", ts(10_000)),
         (4, "v", ts(0))],
        "lid long, user string, ts timestamp")
    right = spark.createDataFrame(
        # 299s after lid=1 (inside ±300s), 599s (outside for lid=1 but
        # 300s from lid=2 -> inside), far row, other-key row
        [("u", ts(299), 10), ("u", ts(599), 11), ("u", ts(50_000), 12),
         ("w", ts(0), 13)],
        "user string, rts timestamp, rid int")

    pairs = range_join(left, right, "user", "ts", "rts", 5,
                       ["lid"], ["rid"])
    got = sorted((r.lid, r.rid) for r in pairs.collect())
    assert got == [(1, 10), (2, 10), (2, 11)]

    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
