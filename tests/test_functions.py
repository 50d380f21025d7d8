"""Unit tests for the compat mini-languages (pure Python — no Spark)."""

from __future__ import annotations

import pytest

from exosql_spark.functions.datetime_compat import parse_duration, strftime_to_java
from exosql_spark.functions.json_compat import jp_to_jsonpath


class TestStrftimeTranslate:
    def test_basic_date(self):
        assert strftime_to_java("%Y-%m-%d") == "yyyy-MM-dd"

    def test_time(self):
        assert strftime_to_java("%H:%M:%S") == "HH:mm:ss"

    def test_literal_text_quoted(self):
        # letters outside tokens must be quoted so they aren't patterns
        assert strftime_to_java("%Y-%m-%dT%H") == "yyyy-MM-dd'T'HH"

    def test_percent_escape(self):
        assert strftime_to_java("%d%%") == "dd'%'"

    def test_names(self):
        assert strftime_to_java("%A %B") == "EEEE MMMM"


class TestDuration:
    def test_simple(self):
        assert parse_duration("1D")["d"] == 1
        assert parse_duration("-30m")["m"] == -30
        assert parse_duration("2h")["h"] == 2
        assert parse_duration("1M")["M"] == 1
        assert parse_duration("1Y")["Y"] == 1

    def test_compound(self):
        u = parse_duration("1d 2h 30m")
        assert (u["d"], u["h"], u["m"]) == (1, 2, 30)

    def test_negative_compound(self):
        u = parse_duration("-1d 12h")
        assert (u["d"], u["h"]) == (-1, -12)

    def test_invalid(self):
        with pytest.raises(ValueError):
            parse_duration("soon")


class TestJsonPointer:
    def test_root(self):
        assert jp_to_jsonpath("/") == "$"
        assert jp_to_jsonpath("") == "$"

    def test_object_keys(self):
        assert jp_to_jsonpath("/a/b") == "$.a.b"

    def test_array_index(self):
        assert jp_to_jsonpath("/a/0/b") == "$.a[0].b"


class TestStrftimeSemantics:
    """The Java translation must FORMAT identically to C strftime —
    checked through Spark date_format vs Python's strftime."""

    PATTERNS = [
        "%Y-%m-%d", "%H:%M:%S", "%Y/%m", "%d.%m.%y", "%j",
        "%a %b %d", "%A %B", "%Y-%m-%dT%H:%M:%S", "%I %p",
    ]

    def test_formats_match_c_reference(self, spark):
        from datetime import datetime

        from pyspark.sql import functions as F

        from exosql_spark.functions.datetime_compat import strftime

        dts = [
            datetime(1999, 12, 31, 23, 59, 59),
            datetime(2024, 1, 1, 0, 0, 0),
            datetime(2007, 6, 15, 9, 5, 30),
        ]
        df = spark.createDataFrame([(d,) for d in dts], "ts timestamp_ntz")
        for fmt in self.PATTERNS:
            got = [r.x for r in df.select(strftime("ts", fmt).alias("x")).collect()]
            want = [d.strftime(fmt) for d in dts]
            # C %I is zero-padded; locale AM/PM capitalization matches
            assert got == want, (fmt, got, want)


class TestRegexMap:
    def test_named_captures(self, spark):
        from exosql_spark.functions import regex_map

        df = spark.createDataFrame([("Customer#000000042",)], "s string")
        m = df.select(
            regex_map("s", r"(?P<word>[A-Za-z]+)#(?P<num>\d+)").alias("m")
        ).collect()[0].m
        assert m == {"word": "Customer", "num": "000000042"}

    def test_numbered_captures_and_miss(self, spark):
        from exosql_spark.functions import regex_map

        df = spark.createDataFrame([("abc 123",), ("nope",)], "s string")
        rows = df.select(regex_map("s", r"([a-z]+) (\d+)").alias("m")).collect()
        assert rows[0].m == {"1": "abc", "2": "123"}
        assert rows[1].m is None


class TestFormatCompat:
    def test_exo_format_c_subset_and_si(self, spark):
        from pyspark.sql import functions as F

        from exosql_spark.functions.format_compat import exo_format

        df = spark.createDataFrame([(42, 1234567.0, "ok")], "n long, v double, s string")
        row = df.select(
            exo_format("%d items: %s", F.col("n"), F.col("s")).alias("a"),
            exo_format("rev %k!", F.col("v")).alias("b"),
            exo_format("%.2f", F.col("v")).alias("c"),
        ).collect()[0]
        assert row.a == "42 items: ok"
        assert row.b == "rev 1.2M!"
        assert row.c == "1234567.00"

    def test_humanize_si_thresholds(self, spark):
        from pyspark.sql import functions as F

        from exosql_spark.functions.format_compat import humanize_si

        df = spark.createDataFrame(
            [(999.0,), (1500.0,), (2_500_000.0,), (3.2e9,), (-1.5e12,)], "v double"
        )
        got = [r.h for r in df.select(humanize_si("v").alias("h")).collect()]
        assert got == ["999.0", "1.5k", "2.5M", "3.2G", "-1.5T"]

    def test_format_py_fallback(self):
        from exosql_spark.functions.format_compat import _format_py

        assert _format_py("%d/%s = %k", [7, "x", 2_000_000]) == "7/x = 2.0M"
