"""Scalar function surface: string / date / math / array / map / JSON.

The reference's scalar functions are inventoried at SURVEY.md §2.8 (trim,
split, replace, stringify, sanitize, timestamps, JSON ser/de, arithmetic);
data-value date/array/map functions are absent there and provided here via
Spark builtins. Everything stays JVM-side inside whole-stage codegen — no
Python in any of these plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ai_batch_processing_spark.registry import register
from ai_batch_processing_spark.session import load_tables


@register(
    "q23_string_funcs",
    oracle="""
        SELECT
            p_partkey,
            UPPER(p_brand) AS brand_upper,
            LOWER(p_type) AS type_lower,
            LENGTH(p_name) AS name_len,
            SUBSTRING(p_name, 1, 8) AS name_prefix,
            TRIM(CONCAT(p_brand, ' ', p_type)) AS brand_type,
            REPLACE(p_brand, 'Brand#', 'B-') AS brand_short,
            REGEXP_REPLACE(p_name, '[aeiou]', '', 'g') AS name_novowel,
            LPAD(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
            CASE WHEN p_name LIKE '%steel%' THEN 1 ELSE 0 END AS has_steel
        FROM part
        ORDER BY p_partkey
    """,
    doc="string functions (upper/lower/length/substr/concat/replace/regex/lpad/like).",
    tags=("scalar", "string"),
)
def q23_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["part"])
    return (
        t["part"]
        .select(
            "p_partkey",
            F.upper("p_brand").alias("brand_upper"),
            F.lower("p_type").alias("type_lower"),
            F.length("p_name").alias("name_len"),
            F.substring("p_name", 1, 8).alias("name_prefix"),
            F.trim(F.concat(F.col("p_brand"), F.lit(" "), F.col("p_type"))).alias("brand_type"),
            F.replace(F.col("p_brand"), F.lit("Brand#"), F.lit("B-")).alias("brand_short"),
            F.regexp_replace("p_name", "[aeiou]", "").alias("name_novowel"),
            F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
            F.when(F.col("p_name").like("%steel%"), 1).otherwise(0).alias("has_steel"),
        )
        .orderBy("p_partkey")
    )


@register(
    "q24_date_funcs",
    oracle="""
        SELECT
            o_orderkey,
            CAST(year(o_orderdate) AS INT) AS order_year,
            CAST(month(o_orderdate) AS INT) AS order_month,
            CAST(day(o_orderdate) AS INT) AS order_day,
            date_trunc('month', o_orderdate) AS month_start,
            CAST(date_diff('day', o_orderdate, TIMESTAMP '2002-01-01 00:00:00') AS BIGINT) AS days_to_2002,
            o_orderdate + INTERVAL 30 DAY AS due_date,
            strftime(o_orderdate, '%Y-%m-%d') AS order_date_str
        FROM orders
        ORDER BY o_orderkey
    """,
    doc="date/time functions: extract, trunc, diff, interval add, format.",
    tags=("scalar", "date"),
)
def q24_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["orders"])
    return (
        t["orders"]
        .select(
            "o_orderkey",
            F.year("o_orderdate").cast("int").alias("order_year"),
            F.month("o_orderdate").cast("int").alias("order_month"),
            F.dayofmonth("o_orderdate").cast("int").alias("order_day"),
            F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
            F.datediff(F.lit("2002-01-01").cast("date"), F.col("o_orderdate").cast("date"))
            .cast("long")
            .alias("days_to_2002"),
            (F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")).alias("due_date"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date_str"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "q25_math_funcs",
    oracle="""
        SELECT
            l_orderkey,
            l_linenumber,
            ROUND(ABS(l_discount - 0.05), 4) AS disc_dev,
            CAST(CEIL(l_quantity) AS BIGINT) AS qty_ceil,
            CAST(FLOOR(l_extendedprice / 1000) AS BIGINT) AS price_k,
            ROUND(SQRT(l_quantity), 6) AS qty_sqrt,
            ROUND(LN(l_extendedprice + 1), 6) AS price_ln,
            ROUND(POW(1 + l_tax, 2), 6) AS tax_sq,
            CAST(l_partkey % 7 AS BIGINT) AS partkey_mod,
            ROUND(GREATEST(l_discount, l_tax), 4) AS max_rate,
            ROUND(LEAST(l_discount, l_tax), 4) AS min_rate
        FROM lineitem
        ORDER BY l_orderkey, l_linenumber
    """,
    doc="math functions: abs/ceil/floor/sqrt/ln/pow/mod/greatest/least.",
    tags=("scalar", "math"),
)
def q25_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["lineitem"])
    return (
        t["lineitem"]
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round(F.abs(F.col("l_discount") - 0.05), 4).alias("disc_dev"),
            F.ceil("l_quantity").cast("long").alias("qty_ceil"),
            F.floor(F.col("l_extendedprice") / 1000).cast("long").alias("price_k"),
            F.round(F.sqrt("l_quantity"), 6).alias("qty_sqrt"),
            F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("price_ln"),
            F.round(F.pow(1 + F.col("l_tax"), 2), 6).alias("tax_sq"),
            (F.col("l_partkey") % 7).cast("long").alias("partkey_mod"),
            F.round(F.greatest("l_discount", "l_tax"), 4).alias("max_rate"),
            F.round(F.least("l_discount", "l_tax"), 4).alias("min_rate"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@register(
    "q26_json_funcs",
    oracle="""
        SELECT
            event_type,
            COUNT(*) AS n,
            ROUND(AVG(CAST(json_extract_string(props, '$.k') AS BIGINT)) + 1e-9, 4) AS avg_k,
            CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    doc="JSON extraction from a string column (events.props) + aggregation.",
    tags=("scalar", "json"),
)
def q26_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["events"])
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        t["events"]
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg(k) + 1e-9, 4).alias("avg_k"),
            F.max(k).cast("long").alias("max_k"),
        )
        .orderBy("event_type")
    )


@register(
    "q27_array_funcs",
    oracle="""
        SELECT
            vec_id,
            len(embedding) AS dim,
            ROUND(CAST(embedding[1] AS DOUBLE), 6) AS first_val,
            ROUND(CAST(list_max(embedding) AS DOUBLE), 6) AS max_val,
            ROUND(CAST(list_min(embedding) AS DOUBLE), 6) AS min_val,
            ROUND(list_sum(CAST(embedding AS DOUBLE[])), 4) AS sum_val
        FROM embeddings
        ORDER BY vec_id
    """,
    doc="array functions over array<float>: size/element_at/array_max/min/aggregate.",
    tags=("scalar", "array"),
)
def q27_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["embeddings"])
    emb_d = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return (
        t["embeddings"]
        .select(
            "vec_id",
            F.size("embedding").alias("dim"),
            F.round(F.element_at("embedding", 1).cast("double"), 6).alias("first_val"),
            F.round(F.array_max("embedding").cast("double"), 6).alias("max_val"),
            F.round(F.array_min("embedding").cast("double"), 6).alias("min_val"),
            F.round(F.aggregate(emb_d, F.lit(0.0), lambda acc, x: acc + x), 4).alias("sum_val"),
        )
        .orderBy("vec_id")
    )


@register(
    "q28_null_handling",
    oracle="""
        SELECT
            c_custkey,
            COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER') AS segment_bucket,
            CASE
                WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 5000 THEN 'low'
                ELSE 'high'
            END AS bal_bucket,
            ROUND(IFNULL(NULLIF(c_acctbal, 0.0), -1.0), 2) AS bal_or_flag
        FROM customer
        ORDER BY c_custkey
    """,
    doc="null semantics: coalesce / nullif / ifnull / case chains.",
    tags=("scalar", "null"),
)
def q28_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["customer"])
    return (
        t["customer"]
        .select(
            "c_custkey",
            F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER")).alias(
                "segment_bucket"
            ),
            F.when(F.col("c_acctbal") < 0, "debt")
            .when(F.col("c_acctbal") < 5000, "low")
            .otherwise("high")
            .alias("bal_bucket"),
            F.round(F.ifnull(F.nullif(F.col("c_acctbal"), F.lit(0.0)), F.lit(-1.0)), 2).alias("bal_or_flag"),
        )
        .orderBy("c_custkey")
    )


@register(
    "q29_map_funcs",
    oracle="""
        SELECT
            event_id,
            2 AS n_keys,
            'k,type' AS keys_sorted,
            json_extract_string(props, '$.k') AS k_val,
            event_type AS type_val
        FROM events
        WHERE event_id < 500
        ORDER BY event_id
    """,
    doc="map construction + map_keys/element_at/map_concat over typed MapType "
    "(from_json to map<string,string>, merged with a built map). The DuckDB "
    "oracle checks the flattened values — map internals are Spark-typed.",
    tags=("scalar", "map"),
)
def q29_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["events"])
    props_map = F.from_json("props", "map<string,string>")
    merged = F.map_concat(props_map, F.create_map(F.lit("type"), F.col("event_type")))
    return (
        t["events"]
        .filter(F.col("event_id") < 500)
        .select("event_id", merged.alias("m"))
        .select(
            "event_id",
            F.size(F.map_keys("m")).alias("n_keys"),
            F.array_join(F.array_sort(F.map_keys("m")), ",").alias("keys_sorted"),
            F.element_at("m", "k").alias("k_val"),
            F.element_at("m", "type").alias("type_val"),
        )
        .orderBy("event_id")
    )


@register(
    "q81_regex_extract",
    oracle="""
        SELECT
            doc_id,
            len(regexp_extract_all(text, '([a-z]{5})')) AS n_five_plus,
            COALESCE(regexp_extract(text, '(qu[a-z]+)', 1), '') AS first_qu_word,
            CASE WHEN regexp_matches(text, 'spark') THEN 1 ELSE 0 END AS mentions_spark
        FROM documents
        WHERE doc_id < 300
        ORDER BY doc_id
    """,
    doc="regexp breadth: extract_all count, group extraction with default, boolean match.",
    tags=("scalar", "string", "regex"),
)
def q81_regex_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["documents"])
    return (
        t["documents"]
        .filter(F.col("doc_id") < 300)
        .select(
            "doc_id",
            F.size(F.expr("regexp_extract_all(text, '([a-z]{5})')")).alias("n_five_plus"),
            F.regexp_extract("text", "(qu[a-z]+)", 1).alias("first_qu_word"),
            F.when(F.col("text").rlike("spark"), 1).otherwise(0).alias("mentions_spark"),
        )
        .orderBy("doc_id")
    )


@register(
    "q82_higher_order_array_funcs",
    oracle="""
        SELECT
            vec_id,
            len(list_filter(CAST(embedding AS DOUBLE[]), x -> x > 0)) AS n_positive,
            ROUND(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> abs(x))), 4) AS l1_norm,
            CASE WHEN len(list_filter(CAST(embedding AS DOUBLE[]), x -> abs(x) > 0.2)) > 0
                 THEN 1 ELSE 0 END AS has_large,
            ROUND(list_max(CAST(embedding AS DOUBLE[])), 6) AS max_val
        FROM embeddings
        WHERE vec_id < 200
        ORDER BY vec_id
    """,
    doc="higher-order array functions: filter / transform+aggregate / exists / max "
    "— all JVM-side lambda expressions, no Python.",
    tags=("scalar", "array", "hof"),
)
def q82_higher_order_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["embeddings"])
    dbl = F.transform("embedding", lambda x: x.cast("double"))
    return (
        t["embeddings"]
        .filter(F.col("vec_id") < 200)
        .select(
            "vec_id",
            F.size(F.filter(dbl, lambda x: x > 0)).alias("n_positive"),
            F.round(
                F.aggregate(F.transform(dbl, lambda x: F.abs(x)), F.lit(0.0), lambda a, x: a + x), 4
            ).alias("l1_norm"),
            F.when(F.exists(dbl, lambda x: F.abs(x) > 0.2), 1).otherwise(0).alias("has_large"),
            F.round(F.array_max(dbl), 6).alias("max_val"),
        )
        .orderBy("vec_id")
    )
