"""String / date / math scalar-function queries (SURVEY.md §2.9).

The reference's scalar surface — regex capture extraction, LIKE
routing, filename formatting, URL decoding, UTC timestamp formatting,
date casts, and integer range expansion — re-expressed over the
synthetic schema. All of these are JVM-side built-ins
(pyspark.sql.functions), so they stay inside whole-stage codegen; none
require a Python UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from martian_moments_spark.catalog import load
from martian_moments_spark.functions.numeric import fixed_sum, sql_fixed_sum
from martian_moments_spark.plans.registry import register


@register(
    "regex_extract_key",
    ops=("F1",),
    oracle="""
        SELECT
            c_name,
            CAST(regexp_extract(c_name, 'Customer#([0-9]{9})', 1) AS BIGINT) AS extracted_key,
            (CAST(regexp_extract(c_name, 'Customer#([0-9]{9})', 1) AS BIGINT) = c_custkey)
                AS key_matches
        FROM customer
    """,
)
def regex_extract_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex capture-group extraction + cast — the reference's SCLK
    extraction REGEXP_SUBSTR(img_src, '_([0-9]{10})_', ... 'e', 1)::BIGINT
    (camera_travel_correlation.sql:15), applied to the customer-name
    embedded key."""
    customer = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    extracted = F.regexp_extract(F.col("c_name"), r"Customer#([0-9]{9})", 1).cast("long")
    return customer.select(
        "c_name",
        extracted.alias("extracted_key"),
        (extracted == F.col("c_custkey")).alias("key_matches"),
    )


@register(
    "like_prefix_routing",
    ops=("F2", "F4", "A1"),
    oracle=f"""
        SELECT
            CASE
                WHEN p_name LIKE 'small%' THEN 'route_small'
                WHEN p_name LIKE 'red%'   THEN 'route_red'
                WHEN p_name LIKE '%bolt'  THEN 'route_bolt_suffix'
                ELSE 'route_default'
            END AS route,
            COUNT(*) AS n_parts,
            {sql_fixed_sum("p_retailprice")} AS total_price
        FROM part
        GROUP BY 1
    """,
)
def like_prefix_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE / prefix-match routing — the reference routes files to
    tables by filename prefix (src/utils/minio.py:26-34,
    src/utils/snowflake.py:31-39) and asserts IMG_SRC LIKE 'http%'
    (sources.yml:160-162)."""
    part = load(spark, sf_dir, "part").select("p_name", "p_retailprice")
    route = (
        F.when(F.col("p_name").startswith("small"), "route_small")
        .when(F.col("p_name").startswith("red"), "route_red")
        .when(F.col("p_name").like("%bolt"), "route_bolt_suffix")
        .otherwise("route_default")
    )
    return (
        part.withColumn("route", route)
        .groupBy("route")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            fixed_sum("p_retailprice").alias("total_price"),
        )
    )


@register(
    "batch_filename_format",
    ops=("F3", "A4", "A8"),
    oracle="""
        SELECT
            o_custkey,
            'orders_batch_key_' || CAST(MIN(o_orderkey) AS VARCHAR)
                || '_to_' || CAST(MAX(o_orderkey) AS VARCHAR) || '.json' AS batch_filename,
            COUNT(*) AS batch_count
        FROM orders
        GROUP BY o_custkey
    """,
)
def batch_filename_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-envelope filename construction — the reference's
    mars_rover_photos_batch_sol_{min}_to_{max}_{ts}.json naming
    (src/ingestion/photos.py:26-36: Python min/max over the batch then
    string interpolation), as min/max aggregates + concat."""
    orders = load(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    return orders.groupBy("o_custkey").agg(
        F.concat(
            F.lit("orders_batch_key_"),
            F.min("o_orderkey").cast("string"),
            F.lit("_to_"),
            F.max("o_orderkey").cast("string"),
            F.lit(".json"),
        ).alias("batch_filename"),
        F.count(F.lit(1)).alias("batch_count"),
    )


@register(
    "url_decode_keys",
    ops=("F5",),
    oracle="""
        SELECT
            r_name,
            replace(r_name, ' ', '%20') AS encoded_key,
            r_name AS decoded_key
        FROM region
    """,
)
def url_decode_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-decoding of object keys — the reference unquotes MinIO event
    keys (urllib.parse.unquote, src/utils/kafka.py:11). Round-trips a
    percent-encoding so decode correctness is self-evident: the oracle
    states decoded_key must equal the original (this DuckDB build has
    no url_decode, so the expected value is expressed directly)."""
    region = load(spark, sf_dir, "region").select("r_name")
    encoded = F.replace(F.col("r_name"), F.lit(" "), F.lit("%20"))
    return region.select(
        "r_name",
        encoded.alias("encoded_key"),
        F.url_decode(encoded).alias("decoded_key"),
    )


@register(
    "timestamp_format_iso",
    ops=("F6", "F7", "F8"),
    oracle="""
        SELECT
            event_id,
            strftime(ts, '%Y-%m-%dT%H:%M:%S') AS iso_ts,
            CAST(ts AS DATE)                  AS event_date,
            CAST(date_trunc('hour', ts) AS TIMESTAMP) AS event_hour
        FROM events
    """,
)
def timestamp_format_iso(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ISO-8601 UTC timestamp formatting + date casts — the envelope
    ingestion_date stamp strftime('%Y-%m-%dT%H:%M:%S')
    (src/ingestion/photos.py:35 et al.) and the ::date casts in silver
    (flat_photo_response.sql:12-16)."""
    events = load(spark, sf_dir, "events").select("event_id", "ts")
    return events.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss").alias("iso_ts"),
        F.col("ts").cast("date").alias("event_date"),
        F.date_trunc("hour", F.col("ts")).alias("event_hour"),
    )


@register(
    "sol_range_expansion",
    ops=("F9", "N2"),
    oracle="""
        SELECT
            n_nationkey,
            n_name,
            UNNEST(generate_series(CAST(n_nationkey AS BIGINT),
                                   CAST(n_nationkey + 3 AS BIGINT))) AS sol
        FROM nation
    """,
)
def sol_range_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer range expansion — the reference builds a contiguous
    sol_range list(range(min, max+1)) for each scheduling batch
    (src/utils/snowflake.py:94). Spark: sequence() + explode, fully
    JVM-side (no driver loop)."""
    nation = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return nation.select(
        "n_nationkey",
        "n_name",
        F.explode(
            F.sequence(
                F.col("n_nationkey").cast("long"), (F.col("n_nationkey") + 3).cast("long")
            )
        ).alias("sol"),
    )


@register(
    "date_arithmetic",
    ops=("F8", "P6"),
    oracle="""
        SELECT
            o_orderkey,
            CAST(o_orderdate AS DATE)                       AS order_date,
            CAST(o_orderdate + INTERVAL 30 DAY AS DATE)     AS due_date,
            CAST(date_part('year', o_orderdate) AS INT)     AS order_year,
            CAST(date_part('month', o_orderdate) AS INT)    AS order_month,
            CAST(date_part('day', o_orderdate) AS INT)      AS order_day
        FROM orders
    """,
)
def date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date arithmetic + component extraction (beyond-reference scalar
    surface; the reference only casts — flat_manifest_response.sql:13-16
    — but any user of it needs interval math for sol/earth-date
    windows)."""
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    return orders.select(
        "o_orderkey",
        F.col("o_orderdate").cast("date").alias("order_date"),
        F.date_add(F.col("o_orderdate").cast("date"), 30).alias("due_date"),
        F.year("o_orderdate").cast("int").alias("order_year"),
        F.month("o_orderdate").cast("int").alias("order_month"),
        F.dayofmonth("o_orderdate").cast("int").alias("order_day"),
    )


@register(
    "charset_audit",
    ops=("F1", "A1", "P8"),
    oracle="""
        WITH flags AS (
            SELECT source,
                   CASE WHEN regexp_matches(text, '[^\\x00-\\x7F]') THEN 1 ELSE 0 END AS has_non_ascii,
                   CASE WHEN regexp_matches(text, '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]') THEN 1 ELSE 0 END AS has_control,
                   CASE WHEN regexp_matches(text, '�') THEN 1 ELSE 0 END AS has_replacement,
                   CAST(len(regexp_extract_all(text, '[^\\x00-\\x7F]')) AS BIGINT) AS n_non_ascii_chars
            FROM documents
        )
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(has_non_ascii) AS BIGINT) AS n_non_ascii_docs,
               CAST(SUM(has_control) AS BIGINT) AS n_control_docs,
               CAST(SUM(has_replacement) AS BIGINT) AS n_replacement_docs,
               CAST(SUM(n_non_ascii_chars) AS BIGINT) AS n_non_ascii_chars,
               CAST(COUNT(*) - SUM(has_non_ascii) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
                   AS ascii_doc_share
        FROM flags GROUP BY source
        ORDER BY source
    """,
)
def charset_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-set hygiene audit per source — the encoding triage a
    crawl pipeline runs before tokenization: documents containing
    non-ASCII text, C0 control characters (mojibake / binary bleed),
    or U+FFFD replacement characters (evidence of a decode that
    already lost bytes), plus the non-ASCII char volume. Regex classes
    stay in the byte-range subset both engines interpret identically.

    Scale: per-row regex inside codegen; one rollup on source."""
    t = F.col("text")
    flags = load(spark, sf_dir, "documents").select(
        "source",
        F.when(t.rlike("[^\\x00-\\x7F]"), 1).otherwise(0).alias("has_non_ascii"),
        F.when(t.rlike("[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]"), 1).otherwise(0).alias("has_control"),
        F.when(t.rlike("�"), 1).otherwise(0).alias("has_replacement"),
        F.size(F.regexp_extract_all(t, F.lit("[^\\x00-\\x7F]"), F.lit(0)))
        .cast("long")
        .alias("n_non_ascii_chars"),
    )
    n = F.count(F.lit(1))
    return (
        flags.groupBy("source")
        .agg(
            n.cast("long").alias("n_docs"),
            F.sum("has_non_ascii").cast("long").alias("n_non_ascii_docs"),
            F.sum("has_control").cast("long").alias("n_control_docs"),
            F.sum("has_replacement").cast("long").alias("n_replacement_docs"),
            F.sum("n_non_ascii_chars").cast("long").alias("n_non_ascii_chars"),
            (
                (n - F.sum("has_non_ascii")).cast("double") / n.cast("double")
            ).alias("ascii_doc_share"),
        )
        .orderBy("source")
    )
