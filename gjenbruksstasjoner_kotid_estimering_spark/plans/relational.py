"""Relational core: scans, projections, filters, scalar functions.

SURVEY.md §2 Part B rows "Scans/sources", "Projection/filter", "Scalar fns".
Each query grounds a reference behavior (cited per query) as a declarative
plan: filters/projections reach the parquet scan via Catalyst pushdown
(verified in tests/test_plans.py), expressions stay inside whole-stage
codegen, no Python in any of these paths.

Oracle-parity rules used throughout the registry:

- every computed column aliased identically in Spark and SQL;
- per-row double arithmetic is identical IEEE-754 work in both engines →
  bit-exact;
- aggregates over doubles use only order-insensitive-exact forms (count,
  min, max, sums of integer-valued or cents-scaled values) so partial-agg
  order can never flip a bit (see plans/aggregates.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register


@register(
    "scan_project",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_quantity,
               l_extendedprice * (1.0 - l_discount) AS net_price
        FROM lineitem
    """,
    doc="Parquet scan + column projection/aliasing (reference re-read of the "
    "feature table, estimate_queue.py:72-77; projection O5/O16). Catalyst "
    "prunes the scan to the 5 referenced columns.",
    tags=("scan", "projection"),
)
def scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).alias(
            "net_price"
        ),
    )


@register(
    "scan_limit1",
    oracle="""
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        FROM orders ORDER BY o_orderkey LIMIT 1
    """,
    doc="'First object under prefix' (reference preprocess_image.py:22-33: "
    "list bucket, take first) as ORDER BY key LIMIT 1 — a deterministic "
    "top-1, not an arbitrary head.",
    tags=("scan", "limit"),
)
def scan_limit1(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
        .orderBy("o_orderkey")
        .limit(1)
    )


@register(
    "filter_predicates",
    oracle="""
        SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
        FROM orders
        WHERE o_orderstatus = 'F'
          AND o_totalprice > 1000.0
          AND o_orderpriority IN ('1-URGENT', '2-HIGH')
          AND o_custkey IS NOT NULL
          AND o_orderpriority LIKE '%H%'
    """,
    doc="Predicate stack: equality, range, IN-list, null-check, LIKE — the "
    "set-oriented form of the reference's assert/threshold guards "
    "(estimate_queue.py:128-133,135,144). All pushed to the parquet scan.",
    tags=("filter",),
)
def filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.where(
        (F.col("o_orderstatus") == "F")
        & (F.col("o_totalprice") > 1000.0)
        & F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        & F.col("o_custkey").isNotNull()
        & F.col("o_orderpriority").like("%H%")
    ).select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")


@register(
    "range_filter",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate
        FROM lineitem
        WHERE l_quantity BETWEEN 10.0 AND 20.0
          AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    """,
    doc="Range predicates = the relational analog of the ROI bounding-box "
    "crop (reference preprocess_image.py:82-107: slice rows/cols to "
    "[min,max]); numeric BETWEEN + half-open timestamp range.",
    tags=("filter", "range"),
)
def range_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.where(
        F.col("l_quantity").between(10.0, 20.0)
        & (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_shipdate")


@register(
    "scalar_math_projection",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               CAST(l_quantity AS DOUBLE)
                 * (CAST(1.0 AS DOUBLE) / CAST(255.0 AS DOUBLE)) AS norm_qty,
               CAST(l_linenumber AS DOUBLE) AS linenumber_d
        FROM lineitem
    """,
    doc="Cast + scalar arithmetic: the normalize step (reference "
    "preprocess_image.py:110-136: astype(float64) * 1/255) over a numeric "
    "column instead of an image tensor.",
    tags=("projection", "math"),
)
def scalar_math_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_quantity").cast("double") * (F.lit(1.0) / F.lit(255.0))).alias(
            "norm_qty"
        ),
        F.col("l_linenumber").cast("double").alias("linenumber_d"),
    )


@register(
    "derived_arithmetic",
    oracle="""
        SELECT event_id,
               GREATEST(value, 0.0) AS x_pos,
               ROUND(value / 100.0 + 1.0, 0) AS lanes,
               GREATEST(value, 0.0) * 0.13 AS cars,
               (GREATEST(value, 0.0) * 0.13) / 74.0 AS hours
        FROM events
    """,
    doc="greatest/round/multiply/divide chain — the estimator's derived "
    "arithmetic (reference estimate_queue.py:118-124,142,152,163) as a "
    "pure projection.",
    tags=("projection", "math"),
)
def derived_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    x_pos = F.greatest(F.col("value"), F.lit(0.0))
    cars = x_pos * F.lit(0.13)
    return ev.select(
        "event_id",
        x_pos.alias("x_pos"),
        F.round(F.col("value") / F.lit(100.0) + F.lit(1.0), 0).alias("lanes"),
        cars.alias("cars"),
        (cars / F.lit(74.0)).alias("hours"),
    )


@register(
    "case_when_threshold",
    oracle="""
        SELECT event_id, value,
               CASE WHEN value > 300.0
                    THEN (CASE WHEN value > 250.0 THEN 139.4 ELSE value END)
                         * 2.0 + 34.0
                    ELSE 0.0 END AS meters,
               CASE WHEN value > 300.0 THEN 'visible' ELSE 'empty' END AS gate
        FROM events
    """,
    doc="Nested CASE with the estimator's exact branch structure: full-queue "
    "saturation inside, visibility gate outside — order of operations is "
    "the hard part (reference estimate_queue.py:135-150; saturation "
    "identity estimate_queue_test.py:93-94).",
    tags=("projection", "case"),
)
def case_when_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    inner = F.when(F.col("value") > 250.0, F.lit(139.4)).otherwise(F.col("value"))
    meters = F.when(
        F.col("value") > 300.0, inner * F.lit(2.0) + F.lit(34.0)
    ).otherwise(F.lit(0.0))
    gate = F.when(F.col("value") > 300.0, F.lit("visible")).otherwise(
        F.lit("empty")
    )
    return ev.select(
        "event_id", "value", meters.alias("meters"), gate.alias("gate")
    )


@register(
    "conditional_projection",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               CASE WHEN l_discount > 0.05 THEN l_extendedprice ELSE 0.0 END
                 AS masked_price,
               CASE WHEN l_returnflag = 'R' THEN 'returned' ELSE 'kept' END
                 AS flag_label
        FROM lineitem
    """,
    doc="Elementwise conditional projection — the ROI mask "
    "(reference preprocess_image.py:57-79: np.where(mask, mask, image)) as "
    "when/otherwise over columns.",
    tags=("projection", "case"),
)
def conditional_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.when(F.col("l_discount") > 0.05, F.col("l_extendedprice"))
        .otherwise(F.lit(0.0))
        .alias("masked_price"),
        F.when(F.col("l_returnflag") == "R", F.lit("returned"))
        .otherwise(F.lit("kept"))
        .alias("flag_label"),
    )


@register(
    "string_funcs",
    oracle="""
        SELECT c_custkey,
               lower(c_name) AS name_lower,
               upper(c_mktsegment) AS seg_upper,
               substring(c_name, 1, 8) AS name_prefix,
               concat(c_mktsegment, '#', CAST(c_custkey AS VARCHAR)) AS seg_key,
               length(c_name) AS name_len,
               split_part(c_name, '#', 2) AS name_num
        FROM customer
    """,
    doc="String surface: lower/upper/substring/concat/length/split — the "
    "reference's path munging (tasks.py:21-27) generalized.",
    tags=("string",),
)
def string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.lower("c_name").alias("name_lower"),
        F.upper("c_mktsegment").alias("seg_upper"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.concat(
            F.col("c_mktsegment"), F.lit("#"), F.col("c_custkey").cast("string")
        ).alias("seg_key"),
        F.length("c_name").alias("name_len"),
        F.split(F.col("c_name"), "#").getItem(1).alias("name_num"),
    )


@register(
    "string_regexp_replace",
    oracle=r"""
        SELECT doc_id,
               concat(source, '/station_id_', CAST(doc_id AS VARCHAR), '.jpg')
                 AS raw_path,
               regexp_replace(
                 concat(source, '/station_id_', CAST(doc_id AS VARCHAR), '.jpg'),
                 '^[^/]+', 'intermediate') AS intermediate_path,
               regexp_replace(
                 concat(source, '/station_id_', CAST(doc_id AS VARCHAR), '.jpg'),
                 '\.jpg$', '.bin') AS bin_path
        FROM documents
    """,
    doc="Deterministic output-path derivation (reference tasks.py:19-29: "
    "re.sub('^[^/]+', 'intermediate', prefix, 1) + extension swap) as "
    "regexp_replace over a path column. Patterns are anchored, so Spark's "
    "replace-all and the reference's count=1 agree.",
    tags=("string", "regex"),
)
def string_regexp_replace(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    raw_path = F.concat(
        F.col("source"),
        F.lit("/station_id_"),
        F.col("doc_id").cast("string"),
        F.lit(".jpg"),
    )
    return d.select(
        "doc_id",
        raw_path.alias("raw_path"),
        F.regexp_replace(raw_path, "^[^/]+", "intermediate").alias(
            "intermediate_path"
        ),
        F.regexp_replace(raw_path, r"\.jpg$", ".bin").alias("bin_path"),
    )


@register(
    "regex_extract_timestamp",
    oracle=r"""
        WITH named AS (
          SELECT event_id,
                 concat('station_id_', CAST(user_id AS VARCHAR), '_',
                        strftime(ts, '%Y%m%dT%H%M%S'), '.bin') AS filename
          FROM events
        )
        SELECT event_id, filename,
               CAST(regexp_extract(filename,
                    'station_id_([0-9]+)_([0-9T]+).bin', 1) AS BIGINT)
                 AS station_id,
               CAST(epoch(strptime(regexp_extract(filename,
                    'station_id_([0-9]+)_([0-9T]+).bin', 2),
                    '%Y%m%dT%H%M%S')) AS BIGINT) AS epoch_utc,
               CAST(epoch(timezone('Europe/Oslo',
                    strptime(regexp_extract(filename,
                        'station_id_([0-9]+)_([0-9T]+).bin', 2),
                        '%Y%m%dT%H%M%S'))) AS BIGINT) AS epoch_oslo
        FROM named
    """,
    doc="Round-trip of the reference's filename metadata codec "
    "(estimate_queue.py:31-61): format station/timestamp into "
    "'station_id_X_T.bin', regex-extract back, parse T as naive ISO-8601 "
    "and as Europe/Oslo wall time → epoch seconds. Golden anchor "
    "(41, 1588750800) is pytest-checked in tests/test_filename.py.",
    tags=("string", "regex", "timestamp"),
)
def regex_extract_timestamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import filename as fn

    ev = load_table(spark, sf_dir, "events")
    named = ev.select(
        "event_id",
        F.concat(
            F.lit("station_id_"),
            F.col("user_id").cast("string"),
            F.lit("_"),
            F.date_format("ts", "yyyyMMdd'T'HHmmss"),
            F.lit(".bin"),
        ).alias("filename"),
    )
    raw_ts = F.regexp_extract("filename", fn.FILENAME_RE, 2)
    naive = F.to_timestamp(raw_ts, fn.TS_FORMAT)
    return named.select(
        "event_id",
        "filename",
        fn.station_id_col(F.col("filename")).alias("station_id"),
        F.unix_timestamp(naive).alias("epoch_utc"),
        F.unix_timestamp(F.to_utc_timestamp(naive, fn.REFERENCE_TZ)).alias(
            "epoch_oslo"
        ),
    )


@register(
    "decimal_cast",
    oracle="""
        SELECT o_orderkey,
               CAST(CAST(o_totalprice AS DECIMAL(18,3)) AS DOUBLE) AS total_dec,
               CAST(CAST(o_totalprice AS DECIMAL(18,3)) * 2 AS DOUBLE)
                 AS total_dec_x2
        FROM orders
    """,
    doc="Decimal boundary cast (reference estimate_queue.py:176: "
    "Decimal(str(v)) only at the DynamoDB sink). Decimal arithmetic is "
    "exercised, result compared as double per SURVEY.md §7 risk register.",
    tags=("cast", "decimal"),
)
def decimal_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    dec = F.col("o_totalprice").cast("decimal(18,3)")
    return o.select(
        "o_orderkey",
        dec.cast("double").alias("total_dec"),
        (dec * F.lit(2)).cast("double").alias("total_dec_x2"),
    )


@register(
    "json_extract",
    oracle="""
        SELECT event_id, event_type,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
               CAST(json_extract_string(props, '$.missing') AS BIGINT)
                 AS missing_attr
        FROM events
    """,
    doc="Semi-structured property extraction — the DynamoDB attribute dicts "
    "(reference estimate_queue.py:170-178) generalized to JSON props on the "
    "events stream; missing path → NULL.",
    tags=("json",),
)
def json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "event_type",
        F.get_json_object("props", "$.k").cast("long").alias("k"),
        F.get_json_object("props", "$.missing").cast("long").alias("missing_attr"),
    )


@register(
    "sort_multi",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_returnflag, l_shipdate, l_quantity
        FROM lineitem
        ORDER BY l_returnflag, l_shipdate DESC, l_orderkey, l_linenumber
        LIMIT 100
    """,
    doc="Global multi-key sort with mixed directions + limit — executed as "
    "TakeOrderedAndProject (per-partition top-k + driver merge), never a "
    "full global sort.",
    tags=("sort",),
)
def sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select(
            "l_orderkey", "l_linenumber", "l_returnflag", "l_shipdate", "l_quantity"
        )
        .orderBy(
            F.col("l_returnflag"),
            F.col("l_shipdate").desc(),
            F.col("l_orderkey"),
            F.col("l_linenumber"),
        )
        .limit(100)
    )


@register(
    "null_funcs",
    oracle="""
        SELECT event_id,
               coalesce(CAST(json_extract_string(props, '$.missing') AS BIGINT),
                        -1) AS k_or_default,
               nullif(event_type, 'error') AS type_or_null,
               (json_extract_string(props, '$.missing') IS NULL) AS is_missing,
               CASE WHEN json_extract_string(props, '$.missing') IS NULL
                    THEN 'absent' ELSE 'present' END AS presence
        FROM events
    """,
    doc="NULL-handling surface: coalesce / nullif / null-test / null-driven "
    "CASE — the set-oriented form of the reference's missing-attribute "
    "guards (estimate_queue.py:37-59 error paths become NULL rows).",
    tags=("null",),
)
def null_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    missing = F.get_json_object("props", "$.missing")
    return ev.select(
        "event_id",
        F.coalesce(missing.cast("long"), F.lit(-1)).alias("k_or_default"),
        F.nullif(F.col("event_type"), F.lit("error")).alias("type_or_null"),
        missing.isNull().alias("is_missing"),
        F.when(missing.isNull(), F.lit("absent"))
        .otherwise(F.lit("present"))
        .alias("presence"),
    )


@register(
    "date_arith",
    oracle="""
        SELECT event_id,
               ts + INTERVAL 90 MINUTE AS ts_plus_90m,
               CAST(extract(hour FROM ts) AS INT) AS hour_of_day,
               CAST(dayofweek(ts) + 1 AS INT) AS dow,
               date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS days_since,
               CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s
        FROM events
    """,
    doc="Timestamp arithmetic: interval add, field extraction, day diff, "
    "epoch — the reference's timestamp handling (estimate_queue.py:49-51) "
    "generalized. DuckDB dayofweek is 0-based Sunday; Spark's is 1-based — "
    "the oracle shifts to match.",
    tags=("datetime",),
)
def date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        (F.col("ts") + F.expr("INTERVAL 90 MINUTES")).alias("ts_plus_90m"),
        F.hour("ts").alias("hour_of_day"),
        F.dayofweek("ts").alias("dow"),
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")).alias(
            "days_since"
        ),
        F.unix_timestamp("ts").alias("epoch_s"),
    )


@register(
    "try_funcs",
    oracle="""
        SELECT event_id,
               TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_ok,
               TRY_CAST(event_type AS BIGINT) AS not_a_number,
               TRY_CAST(substring(event_type, 1, 1) AS BIGINT) AS first_char_num,
               CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) = 0
                    THEN NULL
                    ELSE CAST(round(value * 100.0, 0) AS BIGINT)
                         / CAST(json_extract_string(props, '$.k') AS BIGINT)
               END AS cents_per_k
        FROM events
    """,
    doc="Error-tolerant casts: try_cast yields NULL instead of failing the "
    "batch (the set-oriented analog of the reference's raise-on-malformed, "
    "estimate_queue.py:53-59), plus guarded division.",
    tags=("cast", "null"),
)
def try_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # Parse the JSON path ONCE in a separate projection: referencing the
    # raw get_json_object three times in one select re-parses per
    # reference (codegen CSE can't hoist out of `when` branches, and
    # CollapseProject keeps the two projects apart because the alias is
    # non-cheap and multi-referenced — verified 1 occurrence in the
    # executed plan).
    from ..io import fan_out

    parsed = fan_out(ev).select(
        "event_id",
        "event_type",
        "value",
        F.get_json_object("props", "$.k").alias("_k"),
    )
    k = F.col("_k")
    cents = F.round(F.col("value") * 100.0, 0).cast("long")
    return parsed.select(
        "event_id",
        k.try_cast("bigint").alias("k_ok"),
        F.col("event_type").try_cast("bigint").alias("not_a_number"),
        F.substring("event_type", 1, 1).try_cast("bigint").alias(
            "first_char_num"
        ),
        F.when(k.cast("bigint") == 0, F.lit(None).cast("double"))
        .otherwise(cents / k.cast("bigint"))
        .alias("cents_per_k"),
    )


@register(
    "json_struct_parse",
    oracle="""
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
               json_valid(props) AS is_valid
        FROM events
    """,
    doc="Typed JSON parsing: from_json with an explicit schema → struct "
    "field access (vs json_extract's stringly path) + validity probe. At "
    "scale an explicit schema beats per-row path evaluation for multi-"
    "field payloads.",
    tags=("json", "struct"),
)
def json_struct_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    parsed = F.from_json(F.col("props"), "k BIGINT")
    return ev.select(
        "event_id",
        parsed.getField("k").alias("k"),
        F.get_json_object("props", "$.k").isNotNull().alias("is_valid"),
    )


@register(
    "string_funcs2",
    oracle="""
        SELECT c_custkey,
               lpad(CAST(c_custkey AS VARCHAR), 9, '0') AS padded_key,
               translate(c_mktsegment, 'AEIOU', 'aeiou') AS seg_translated,
               repeat(substring(c_mktsegment, 1, 1), 3) AS tripled_initial,
               reverse(c_name) AS name_reversed,
               levenshtein(c_name, 'Customer#000000000') AS edit_dist
        FROM customer
    """,
    doc="String surface 2: lpad (the reference's zero-padded id scheme, "
    "c_name/test fixtures), translate, repeat, reverse, and levenshtein — "
    "the edit-distance primitive behind fuzzy matching (both engines "
    "implement the classic Wagner-Fischer distance).",
    tags=("string",),
)
def string_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.lpad(F.col("c_custkey").cast("string"), 9, "0").alias("padded_key"),
        F.translate("c_mktsegment", "AEIOU", "aeiou").alias("seg_translated"),
        F.repeat(F.substring("c_mktsegment", 1, 1), 3).alias("tripled_initial"),
        F.reverse("c_name").alias("name_reversed"),
        F.levenshtein(F.col("c_name"), F.lit("Customer#000000000")).alias(
            "edit_dist"
        ),
    )
