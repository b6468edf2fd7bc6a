"""As-of join: crafted semantics cases (equality-inclusive match,
ties, tolerance boundary, both directions, unmatched lefts) plus a
randomized differential check against a driver-side oracle. DuckDB
ASOF JOIN parity is enforced by the driver gate (events_asof_join);
these tests pin the operator's own contract."""

import datetime as dt
import os
import random

from pyspark.sql import Row
from pyspark.sql import functions as F

from jaccard_join_duckdb_spark.operators.temporal import asof_join

_T0 = dt.datetime(2024, 1, 1)


def _ts(minutes):
    return _T0 + dt.timedelta(minutes=minutes)


def _mk(spark, rows, cols):
    return spark.createDataFrame([Row(**dict(zip(cols, r))) for r in rows])


def _left(spark, rows):
    return _mk(spark, rows, ["lid", "user_id", "ts"])


def _right(spark, rows):
    return _mk(spark, rows, ["rid", "user_id", "ts"])


def _run(left, right, **kw):
    out = asof_join(left, right, key="user_id", ts_col="ts",
                    right_cols=["rid"], tie_col="rid", **kw)
    return {
        (r.lid, r.r_rid, r.r_ts and r.r_ts.replace(tzinfo=None))
        for r in out.collect()
    }


def test_backward_basic_and_equality_inclusive(spark):
    L = _left(spark, [(1, "u", _ts(10)), (2, "u", _ts(5)), (3, "v", _ts(10))])
    R = _right(spark, [(100, "u", _ts(5)), (101, "u", _ts(8)), (102, "w", _ts(1))])
    got = _run(L, R)
    # lid=2 at t5 matches rid=100 at t5 exactly (<= is inclusive);
    # lid=3 has no same-key right row -> NULLs
    assert got == {(1, 101, _ts(8)), (2, 100, _ts(5)), (3, None, None)}


def test_tie_breaks_to_greatest_tie_col(spark):
    L = _left(spark, [(1, "u", _ts(10))])
    R = _right(spark, [(100, "u", _ts(5)), (105, "u", _ts(5)), (90, "u", _ts(5))])
    assert _run(L, R) == {(1, 105, _ts(5))}


def test_tolerance_boundary_inclusive_then_null(spark):
    L = _left(spark, [(1, "u", _ts(60)), (2, "u", _ts(61))])
    R = _right(spark, [(100, "u", _ts(0))])
    got = _run(L, R, tolerance=F.expr("INTERVAL 1 HOUR"))
    # exactly 60 min: kept; 61 min: nulled (tolerance is inclusive)
    assert got == {(1, 100, _ts(0)), (2, None, None)}


def test_forward_direction(spark):
    L = _left(spark, [(1, "u", _ts(10))])
    R = _right(spark, [(100, "u", _ts(5)), (101, "u", _ts(12)), (102, "u", _ts(20))])
    assert _run(L, R, direction="forward") == {(1, 101, _ts(12))}


def test_every_left_row_survives(spark):
    L = _left(spark, [(i, f"u{i % 3}", _ts(i)) for i in range(20)])
    R = _right(spark, [(100, "u0", _ts(3))])
    out = asof_join(L, R, key="user_id", ts_col="ts", right_cols=["rid"])
    assert out.count() == 20
    assert set(out.columns) == {"lid", "user_id", "ts", "r_ts", "r_rid"}


def test_randomized_vs_driver_oracle(spark):
    rng = random.Random(7)
    L = [(i, f"u{rng.randrange(4)}", _ts(rng.randrange(100))) for i in range(60)]
    R = [(1000 + i, f"u{rng.randrange(4)}", _ts(rng.randrange(100)))
         for i in range(60)]
    got = _run(_left(spark, L), _right(spark, R),
               tolerance=F.expr("INTERVAL 30 MINUTES"))
    expect = set()
    for lid, lu, lt in L:
        cands = [(rid, rt) for rid, ru, rt in R if ru == lu and rt <= lt]
        if cands:
            best_t = max(rt for _, rt in cands)
            best = max(rid for rid, rt in cands if rt == best_t)
            if (lt - best_t) <= dt.timedelta(minutes=30):
                expect.add((lid, best, best_t))
                continue
        expect.add((lid, None, None))
    assert got == expect


def test_null_timestamps_both_sides(spark):
    """NULL-ts right rows can never match (DuckDB ASOF comparison
    semantics); NULL-ts left rows survive unmatched — both
    directions."""
    L = _left(spark, [(1, "u", _ts(10)), (2, "u", None)])
    R = _right(spark, [(100, "u", _ts(5)), (101, "u", None)])
    assert _run(L, R) == {(1, 100, _ts(5)), (2, None, None)}
    assert _run(L, R, direction="forward") == {
        (1, None, None),   # no right row at/after t10 with a real ts
        (2, None, None),
    }


def test_null_keys_never_match(spark):
    """NULL keys never equi-match (DuckDB ASOF join-condition
    semantics): NULL-key right rows are dropped, NULL-key left rows
    survive unmatched."""
    L = _left(spark, [(1, None, _ts(10)), (2, "u", _ts(10))])
    R = _right(spark, [(100, None, _ts(5)), (101, "u", _ts(5))])
    assert _run(L, R) == {(1, None, None), (2, 101, _ts(5))}


def test_default_tie_is_payload_deterministic(spark):
    """tie_col=None orders equal-timestamp right duplicates by the
    full payload struct: the greatest payload wins, every run — the
    round-5 verdict's retry-nondeterminism nit. Pinned across
    repartitionings (which permute the window's input order)."""
    L = _left(spark, [(1, "u", _ts(10))])
    rows = [(100, "u", _ts(5)), (105, "u", _ts(5)), (101, "u", _ts(5))]
    expect = None
    for n_parts in (1, 2, 5):
        R = _right(spark, rows).repartition(n_parts)
        out = asof_join(L, R, key="user_id", ts_col="ts",
                        right_cols=["rid"])  # no tie_col
        got = {(r.lid, r.r_rid) for r in out.collect()}
        if expect is None:
            expect = got
        assert got == expect == {(1, 105)}  # greatest (ts, rid) payload


class TestResampleEvents:
    def test_gap_filled_grid(self, spark):
        from datetime import datetime

        from jaccard_join_duckdb_spark.operators.temporal import (
            resample_events,
        )

        rows = [
            (datetime(2024, 1, 1, 1, 30), "a", 10.0),
            (datetime(2024, 1, 1, 4, 0), "a", 5.0),   # same 6h bucket
            (datetime(2024, 1, 2, 13, 0), "b", 2.0),  # 1.5 days later
        ]
        df = spark.createDataFrame(rows, "ts timestamp, k string, v double")
        out = {
            (r["bucket_start"].isoformat(), r["k"]): r
            for r in resample_events(
                df, "ts", "k", value_col="v", step_hours=6
            ).collect()
        }
        # grid: buckets 2024-01-01T00 .. 2024-01-02T12 (7 buckets) x 2 keys
        assert len(out) == 14
        hot = out[("2024-01-01T00:00:00", "a")]
        assert hot["n_events"] == 2 and hot["sum_value"] == 15.0
        assert not hot["is_gap"]
        gap = out[("2024-01-01T06:00:00", "a")]
        assert gap["n_events"] == 0 and gap["sum_value"] == 0.0
        assert gap["is_gap"]
        b = out[("2024-01-02T12:00:00", "b")]
        assert b["n_events"] == 1 and not b["is_gap"]
        # day-anchored buckets: every bucket hour is a multiple of 6
        assert all(
            int(k[0][11:13]) % 6 == 0 for k in out
        )
        # zero-filled rows dominate: exactly 2 non-gap cells (the two
        # 'a' events share one bucket)
        assert sum(1 for r in out.values() if not r["is_gap"]) == 2

    def test_validation(self, spark):
        import pytest as _pytest

        from jaccard_join_duckdb_spark.operators.temporal import (
            resample_events,
        )

        with _pytest.raises(ValueError):
            resample_events(None, "ts", "k", step_hours=0)

    def test_non_divisor_step_conserves_events(self, spark):
        """step_hours=7 (24 % 7 != 0): the round-7 advisor repro. A
        uniform grid stepped from the corpus minimum diverges from
        the day-anchored fact buckets after the first midnight and
        the left join silently DROPPED matching fact rows (2 events
        in, 1 out). The day-anchored grid must conserve every event
        for any step, and every grid bucket hour must be an anchored
        offset (hour % step == hour of some event-day anchor)."""
        from datetime import datetime

        from jaccard_join_duckdb_spark.operators.temporal import (
            resample_events,
        )

        rows = [
            # the advisor's shape: events either side of a midnight
            (datetime(2024, 1, 1, 23, 0), "a", 1.0),
            (datetime(2024, 1, 2, 1, 0), "a", 1.0),
            # plus extras across more days and a second key
            (datetime(2024, 1, 3, 22, 30), "b", 2.0),
            (datetime(2024, 1, 1, 0, 0), "b", 3.0),
        ]
        df = spark.createDataFrame(rows, "ts timestamp, k string, v double")
        for step in (5, 7, 9, 11, 24):
            got = resample_events(
                df, "ts", "k", value_col="v", step_hours=step
            ).collect()
            assert sum(r["n_events"] for r in got) == len(rows), (
                f"step={step} dropped events"
            )
            # grid hours are exactly the day-anchored offsets
            offs = set(range(0, 24, step)) if step < 24 else {0}
            assert all(r["bucket_start"].hour in offs for r in got)
            # dense: both keys present at every grid time
            times = {r["bucket_start"] for r in got}
            assert len(got) == 2 * len(times)
