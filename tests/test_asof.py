"""as-of join semantics: >= tie inclusion, no-match nulls, key isolation."""

from __future__ import annotations

import datetime as dt

from dodo_spark.operators.events import asof_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_tie_and_carry_forward(spark):
    left = spark.createDataFrame(
        [
            (1, 100, _ts("2024-01-01 10:00:00")),  # exact tie -> matches v=5
            (2, 100, _ts("2024-01-01 11:00:00")),  # carries v=5 forward
            (3, 100, _ts("2024-01-01 09:00:00")),  # before any right -> null
            (4, 200, _ts("2024-01-01 12:00:00")),  # other key, no right rows
        ],
        "event_id BIGINT, user_id BIGINT, ts TIMESTAMP",
    )
    right = spark.createDataFrame(
        [(100, _ts("2024-01-01 10:00:00"), 5.0)],
        "user_id BIGINT, ts TIMESTAMP, v DOUBLE",
    )
    got = {
        r["event_id"]: (r["v_r"], r["ts_r"])
        for r in asof_join(left, right, on=["user_id"]).collect()
    }
    assert got[1] == (5.0, _ts("2024-01-01 10:00:00"))
    assert got[2] == (5.0, _ts("2024-01-01 10:00:00"))
    assert got[3] == (None, None)
    assert got[4] == (None, None)


def test_asof_picks_latest_not_first(spark):
    left = spark.createDataFrame(
        [(1, 7, _ts("2024-01-01 23:00:00"))], "event_id BIGINT, user_id BIGINT, ts TIMESTAMP"
    )
    right = spark.createDataFrame(
        [
            (7, _ts("2024-01-01 01:00:00"), 1.0),
            (7, _ts("2024-01-01 22:00:00"), 2.0),
            (7, _ts("2024-01-02 00:00:00"), 3.0),  # after left -> excluded
        ],
        "user_id BIGINT, ts TIMESTAMP, v DOUBLE",
    )
    [row] = asof_join(left, right, on=["user_id"]).collect()
    assert row["v_r"] == 2.0


def test_asof_randomized_against_naive(spark):
    """Seeded random instances vs a naive per-row reference implementation."""
    import random

    rng = random.Random(20260813)
    for trial in range(3):
        lefts = [
            (i, rng.randrange(4), _ts("2024-01-01 00:00:00")
             + dt.timedelta(minutes=rng.randrange(0, 600)))
            for i in range(40)
        ]
        rights_raw = {}
        for _ in range(30):
            key = (rng.randrange(4), _ts("2024-01-01 00:00:00")
                   + dt.timedelta(minutes=rng.randrange(0, 600)))
            rights_raw[key] = round(rng.uniform(0, 100), 3)  # dedupe per (key, ts)
        rights = [(k, t, v) for (k, t), v in rights_raw.items()]

        left = spark.createDataFrame(lefts, "event_id BIGINT, user_id BIGINT, ts TIMESTAMP")
        right = spark.createDataFrame(rights, "user_id BIGINT, ts TIMESTAMP, v DOUBLE")
        got = {
            r["event_id"]: r["v_r"]
            for r in asof_join(left, right, on=["user_id"]).collect()
        }

        for eid, uid, lts in lefts:
            cands = [(t, v) for (k, t, v) in rights if k == uid and t <= lts]
            expect = max(cands)[1] if cands else None
            assert got[eid] == expect, (trial, eid, uid, lts, got[eid], expect)


def test_asof_null_in_matched_row_stays_null(spark):
    """When the matched (latest) right row has a NULL payload column, the
    output must carry that NULL — not back-fill the column from an OLDER
    right row (the whole matched row travels as one struct)."""
    left = spark.createDataFrame(
        [(1, 7, _ts("2024-01-01 23:00:00"))], "event_id BIGINT, user_id BIGINT, ts TIMESTAMP"
    )
    right = spark.createDataFrame(
        [
            (7, _ts("2024-01-01 01:00:00"), 1.0, "old"),
            (7, _ts("2024-01-01 22:00:00"), None, "new"),  # latest: v is NULL
        ],
        "user_id BIGINT, ts TIMESTAMP, v DOUBLE, tag STRING",
    )
    [row] = asof_join(left, right, on=["user_id"]).collect()
    assert row["tag_r"] == "new"
    assert row["v_r"] is None  # NOT 1.0 from the older row
    assert row["ts_r"] == _ts("2024-01-01 22:00:00")


def test_range_join_bucket_boundaries(spark):
    """Intervals spanning multiple day buckets and points exactly on
    interval endpoints (BETWEEN is inclusive both ends)."""
    from dodo_spark.operators.events import range_join_buckets

    points = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 00:00:00")),  # == iv_start
            (2, _ts("2024-01-03 23:59:59")),  # inside, 3rd bucket
            (3, _ts("2024-01-04 00:00:00")),  # == iv_end
            (4, _ts("2024-01-04 00:00:01")),  # just past end
            (5, _ts("2023-12-31 23:59:59")),  # just before start
        ],
        "pid BIGINT, ts TIMESTAMP",
    )
    intervals = spark.createDataFrame(
        [(100, _ts("2024-01-01 00:00:00"), _ts("2024-01-04 00:00:00"))],
        "iv_id BIGINT, iv_start TIMESTAMP, iv_end TIMESTAMP",
    )
    got = sorted(
        r["pid"]
        for r in range_join_buckets(points, intervals, "ts", "iv_start", "iv_end").collect()
    )
    assert got == [1, 2, 3]


def test_range_join_hour_buckets(spark):
    from dodo_spark.operators.events import range_join_buckets

    points = spark.createDataFrame(
        [(1, _ts("2024-01-01 05:30:00")), (2, _ts("2024-01-01 09:00:00"))],
        "pid BIGINT, ts TIMESTAMP",
    )
    intervals = spark.createDataFrame(
        [(7, _ts("2024-01-01 05:00:00"), _ts("2024-01-01 08:00:00"))],
        "iv_id BIGINT, iv_start TIMESTAMP, iv_end TIMESTAMP",
    )
    rows = range_join_buckets(
        points, intervals, "ts", "iv_start", "iv_end", bucket="1 hour"
    ).collect()
    assert [r["pid"] for r in rows] == [1]


def test_asof_forward_randomized_against_naive(spark):
    """Forward direction vs a naive reference: earliest right at-or-after,
    same-instant right included (the <= tie rule)."""
    import random

    rng = random.Random(20260815)
    for trial in range(3):
        lefts = [
            (i, rng.randrange(4), _ts("2024-01-01 00:00:00")
             + dt.timedelta(minutes=rng.randrange(0, 600)))
            for i in range(40)
        ]
        rights_raw = {}
        for _ in range(30):
            key = (rng.randrange(4), _ts("2024-01-01 00:00:00")
                   + dt.timedelta(minutes=rng.randrange(0, 600)))
            rights_raw[key] = round(rng.uniform(0, 100), 3)
        rights = [(k, t, v) for (k, t), v in rights_raw.items()]

        left = spark.createDataFrame(lefts, "event_id BIGINT, user_id BIGINT, ts TIMESTAMP")
        right = spark.createDataFrame(rights, "user_id BIGINT, ts TIMESTAMP, v DOUBLE")
        got = {
            r["event_id"]: (r["v_r"], r["ts_r"])
            for r in asof_join(
                left, right, on=["user_id"], direction="forward"
            ).collect()
        }
        for eid, uid, lts in lefts:
            cands = [(t, v) for (k, t, v) in rights if k == uid and t >= lts]
            expect = min(cands) if cands else (None, None)
            assert got[eid] == (expect[1] if cands else None,
                                expect[0] if cands else None), (trial, eid)


def test_asof_forward_same_instant_matches(spark):
    left = spark.createDataFrame(
        [(1, 1, _ts("2024-01-01 10:00:00"))],
        "event_id BIGINT, user_id BIGINT, ts TIMESTAMP",
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), 5.0),
         (1, _ts("2024-01-01 11:00:00"), 9.0)],
        "user_id BIGINT, ts TIMESTAMP, v DOUBLE",
    )
    row = asof_join(left, right, on=["user_id"], direction="forward").collect()[0]
    assert row["v_r"] == 5.0  # the same-instant row, not the later one


def test_asof_direction_validated(spark):
    left = spark.createDataFrame([], "user_id BIGINT, ts TIMESTAMP")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="backward|forward"):
        asof_join(left, left, on=["user_id"], direction="nearest")
