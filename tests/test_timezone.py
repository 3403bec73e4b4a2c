"""Loading the events table must not mutate the caller's session timezone,
and must produce the same UTC instants under any session timezone.

Regression for the r3 side effect where `_load_events` (and
`read_event_stream`) did `spark.conf.set("spark.sql.session.timeZone",
"UTC")`, silently changing timestamp rendering for every subsequent query
on the caller's session.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from filter_vectordb_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"

TZ_KEY = "spark.sql.session.timeZone"


def _instant_fingerprint(spark):
    """Sum of epoch-micros over the events table — session-tz-independent
    iff the loader converts correctly."""
    ev = load_table(spark, "events", SF_DIR)
    return ev.agg(F.sum(F.unix_micros("ts")).alias("s")).collect()[0].s


def test_load_events_does_not_mutate_session_timezone(spark):
    original = spark.conf.get(TZ_KEY)
    utc_fp = _instant_fingerprint(spark)
    try:
        spark.conf.set(TZ_KEY, "America/New_York")
        ny_fp = _instant_fingerprint(spark)
        # 1. the load did not silently reset the caller's timezone
        assert spark.conf.get(TZ_KEY) == "America/New_York"
        # 2. the instants are identical under a non-UTC session
        assert ny_fp == utc_fp
        # 3. an unrelated timestamp query still sees the caller's zone
        rendered = spark.sql(
            "SELECT date_format(timestamp_micros(0), 'HH:mm') AS h"
        ).collect()[0].h
        assert rendered == "19:00"  # 1970-01-01 00:00 UTC is 19:00 in NY
    finally:
        spark.conf.set(TZ_KEY, original)


def test_event_stream_source_does_not_mutate_session_timezone(spark):
    from filter_vectordb_spark.streaming.events import read_event_stream

    original = spark.conf.get(TZ_KEY)
    try:
        spark.conf.set(TZ_KEY, "America/New_York")
        read_event_stream(spark, SF_DIR)  # building the plan must not mutate
        assert spark.conf.get(TZ_KEY) == "America/New_York"
    finally:
        spark.conf.set(TZ_KEY, original)


def test_ntz_conversion_is_exact_in_dst_transition_hours(spark):
    """The wall→instant conversion must be exact even for wall times that
    fall in a session zone's DST transition hours, where any
    wall-clock-roundtrip approach is lossy (the fall-back hour repeats,
    the spring-forward hour does not exist)."""
    from filter_vectordb_spark.sources.tables import _NTZ_AS_UTC_MICROS_SQL

    cases = [
        ("2024-11-03 06:30:00", 1730615400000000),  # NY fall-back hour
        ("2024-03-10 07:30:00", 1710055800000000),  # NY spring-forward hour
        ("2021-06-01 12:00:00.123456", 1622548800123456),
    ]
    original = spark.conf.get(TZ_KEY)
    try:
        for tz in ("UTC", "America/New_York", "Australia/Lord_Howe"):
            spark.conf.set(TZ_KEY, tz)
            for wall, want in cases:
                got = spark.sql(
                    "SELECT unix_micros("
                    + _NTZ_AS_UTC_MICROS_SQL.replace(
                        "ts", f"TIMESTAMP_NTZ'{wall}'"
                    )
                    + ") AS u"
                ).collect()[0].u
                assert got == want, (tz, wall, got, want)
    finally:
        spark.conf.set(TZ_KEY, original)
