"""Scalar-function families — SURVEY.md §2 B.8.

One query per family, several functions each; everything is a per-row
JVM-side expression inside whole-stage codegen (no UDFs, no shuffle
beyond the scan). Transcendentals (ln/pow) are rounded to 6dp because
libm implementations differ by an ulp across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from event_stream_for_k8s_spark.catalog import load
from event_stream_for_k8s_spark.plans.registry import query


@query(
    "fn_string",
    oracle="""
SELECT p_partkey,
       upper(p_brand) AS brand_u,
       lower(p_type) AS type_l,
       trim(p_name) AS name_t,
       substring(p_name, 1, 8) AS name_pfx,
       concat_ws('|', p_brand, p_type) AS brand_type,
       len(string_split(p_name, ' ')) AS n_words,
       regexp_extract(p_type, '([A-Z]+)', 1) AS first_word,
       regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
       length(p_name) AS name_len,
       (p_type LIKE '%BRASS%') AS is_brass
FROM part
""",
    section="B.8",
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_u"),
        F.lower("p_type").alias("type_l"),
        F.trim("p_name").alias("name_t"),
        F.substring("p_name", 1, 8).alias("name_pfx"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.size(F.split("p_name", " ")).alias("n_words"),
        F.regexp_extract("p_type", "([A-Z]+)", 1).alias("first_word"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("devoweled"),
        F.length("p_name").alias("name_len"),
        F.col("p_type").like("%BRASS%").alias("is_brass"),
    )


@query(
    "fn_date",
    oracle="""
SELECT o_orderkey,
       year(o_orderdate) AS y,
       month(o_orderdate) AS m,
       day(o_orderdate) AS d,
       dayofweek(o_orderdate) AS dow,
       date_trunc('month', o_orderdate) AS month_start,
       cast(cast(o_orderdate AS date) + 30 AS varchar) AS plus30,
       datediff('day', DATE '1995-01-01', cast(o_orderdate AS date)) AS days_since,
       cast(epoch(o_orderdate) AS bigint) AS epoch_s,
       make_timestamp(cast(epoch(o_orderdate) AS bigint) * 1000000) AS rebuilt
FROM orders
""",
    section="B.8",
    notes="dow normalized to Sunday=0 on both engines (Spark dayofweek "
    "is 1-based)",
)
def fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        F.dayofmonth("o_orderdate").alias("d"),
        (F.dayofweek("o_orderdate") - 1).alias("dow"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.date_add(F.col("o_orderdate").cast("date"), 30)
        .cast("string")
        .alias("plus30"),
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")
        ).alias("days_since"),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
        F.timestamp_seconds(F.unix_timestamp("o_orderdate")).alias("rebuilt"),
    )


@query(
    "fn_math",
    oracle="""
SELECT l_orderkey, l_linenumber,
       round(l_extendedprice, 1) AS price_r1,
       cast(floor(l_extendedprice) AS bigint) AS price_floor,
       cast(ceil(l_extendedprice) AS bigint) AS price_ceil,
       abs(l_discount - 0.05) AS disc_dev,
       round(pow(l_quantity, 2), 6) AS qty_sq,
       sqrt(l_quantity) AS qty_sqrt,
       round(ln(l_extendedprice), 6) AS price_ln,
       cast(l_quantity AS bigint) % 7 AS qty_mod7,
       cast(sign(l_discount - 0.05) AS int) AS disc_sign
FROM lineitem
""",
    section="B.8",
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 1).alias("price_r1"),
        F.floor("l_extendedprice").alias("price_floor"),
        F.ceil("l_extendedprice").alias("price_ceil"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.round(F.pow("l_quantity", F.lit(2)), 6).alias("qty_sq"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        F.round(F.log(F.col("l_extendedprice")), 6).alias("price_ln"),
        (F.col("l_quantity").cast("bigint") % 7).alias("qty_mod7"),
        F.signum(F.col("l_discount") - 0.05).cast("int").alias("disc_sign"),
    )


@query(
    "fn_cond",
    oracle="""
SELECT o_orderkey,
       CASE WHEN o_totalprice > 200000 THEN 'big'
            WHEN o_totalprice > 50000 THEN 'mid'
            ELSE 'small' END AS bucket,
       nullif(o_orderstatus, 'O') AS status_nn,
       coalesce(nullif(o_orderstatus, 'O'), '-') AS status_def,
       greatest(o_totalprice, 100000.0) AS at_least_100k,
       least(cast(o_orderkey % 5 AS bigint), cast(o_custkey % 5 AS bigint)) AS min_mod
FROM orders
""",
    section="B.8",
)
def fn_cond(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    status_nn = F.nullif(F.col("o_orderstatus"), F.lit("O"))
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 200000, "big")
        .when(F.col("o_totalprice") > 50000, "mid")
        .otherwise("small")
        .alias("bucket"),
        status_nn.alias("status_nn"),
        F.coalesce(status_nn, F.lit("-")).alias("status_def"),
        F.greatest("o_totalprice", F.lit(100000.0)).alias("at_least_100k"),
        F.least(
            (F.col("o_orderkey") % 5).cast("bigint"),
            (F.col("o_custkey") % 5).cast("bigint"),
        ).alias("min_mod"),
    )


@query(
    "fn_array",
    oracle="""
SELECT doc_id,
       len(string_split(text, ' ')) AS n_tokens,
       array_to_string(string_split(text, ' ')[1:5], '|') AS first5,
       list_contains(string_split(text, ' '), 'the') AS has_the,
       len(list_distinct(string_split(text, ' '))) AS n_uniq,
       array_to_string(list_sort(list_distinct(string_split(text, ' ')))[1:3],
                       '|') AS first_uniq,
       cast(list_sum(list_transform(string_split(text, ' '), x -> length(x)))
            AS int) AS tot_len,
       len(list_filter(string_split(text, ' '), x -> length(x) > 4)) AS n_long
FROM documents
""",
    section="B.8",
    notes="array columns serialized with array_join/array_to_string: the "
    "driver's hasher requires scalar cells (list cells raise "
    "'unhashable type' in its pandas canonicalizer)",
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.array_join(F.slice(toks, 1, 5), "|").alias("first5"),
        F.array_contains(toks, "the").alias("has_the"),
        F.size(F.array_distinct(toks)).alias("n_uniq"),
        F.array_join(
            F.slice(F.array_sort(F.array_distinct(toks)), 1, 3), "|"
        ).alias("first_uniq"),
        F.aggregate(
            F.transform(toks, lambda x: F.length(x)),
            F.lit(0),
            lambda acc, x: acc + x,
        ).alias("tot_len"),
        F.size(F.filter(toks, lambda x: F.length(x) > 4)).alias("n_long"),
    )


@query(
    "fn_map",
    oracle="""
SELECT event_id,
       user_id AS uid_val,
       2 AS n_keys,
       value AS by_key
FROM events
""",
    section="B.8",
    notes="Spark side builds a real MapType column and extracts through "
    "map_from_arrays/element_at/map_keys; the oracle computes the same "
    "OUTPUT values directly (DuckDB maps exist but the check compares "
    "results, not plans)",
)
def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    m = F.map_from_arrays(
        F.array(F.lit("uid"), F.lit("val")),
        F.array(F.col("user_id").cast("double"), F.col("value")),
    )
    return ev.select(
        "event_id",
        F.element_at(m, "uid").cast("bigint").alias("uid_val"),
        F.size(F.map_keys(m)).alias("n_keys"),
        F.element_at(m, "val").alias("by_key"),
    )


@query(
    "fn_json",
    oracle="""
SELECT event_id,
       json_extract_string(nullif(props, ''), '$.k') AS k_str,
       try_cast(json_extract_string(nullif(props, ''), '$.k') AS int)
         AS k_int,
       to_json(struct_pack(event_id := event_id, user_id := user_id)) AS packed
FROM events
""",
    section="B.8",
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    # A7's JSON serialization (tasks.rs:105) + its inverse as expressions.
    ev = load(spark, sf_dir, "events")
    # nullif/try semantics: props content is a data property — empty
    # or non-numeric payloads degrade to NULL on both engines
    parsed = F.from_json("props", "k STRING")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        parsed.getField("k").try_cast("int").alias("k_int"),
        F.to_json(F.struct("event_id", "user_id")).alias("packed"),
    )


@query(
    "fn_cast",
    oracle="""
SELECT l_orderkey,
       cast(l_quantity AS int) AS qty_i,
       cast(l_quantity AS varchar) AS qty_s,
       cast(cast(l_orderkey AS varchar) AS bigint) AS key_rt,
       cast(cast(l_extendedprice AS decimal(12,2)) AS double) AS price_dec,
       cast(cast(l_extendedprice AS decimal(12,2)) AS varchar) AS price_s,
       cast(cast(l_shipdate AS date) AS varchar) AS ship_s
FROM lineitem
""",
    section="B.8",
)
def fn_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        F.col("l_quantity").cast("int").alias("qty_i"),
        F.col("l_quantity").cast("string").alias("qty_s"),
        F.col("l_orderkey").cast("string").cast("bigint").alias("key_rt"),
        # decimal exercised, but emitted as double: the driver hashes the
        # Spark Decimal object against DuckDB's float64 and diverges on
        # representation (VERDICT r01), so checked queries never emit a
        # raw DECIMAL column.
        F.col("l_extendedprice").cast("decimal(12,2)").cast("double")
        .alias("price_dec"),
        F.col("l_extendedprice").cast("decimal(12,2)").cast("string").alias("price_s"),
        F.col("l_shipdate").cast("date").cast("string").alias("ship_s"),
    )


@query(
    "fn_bitwise",
    oracle="""
SELECT l_orderkey,
       l_orderkey & 255 AS and_lo,
       l_orderkey | 4096 AS or_hi,
       xor(l_orderkey, l_partkey) AS xored,
       l_orderkey << 2 AS shl,
       l_orderkey >> 3 AS shr,
       bit_count(l_orderkey) AS popcnt
FROM lineitem
""",
    section="B.8",
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    k = F.col("l_orderkey")
    return li.select(
        "l_orderkey",
        k.bitwiseAND(F.lit(255)).alias("and_lo"),
        k.bitwiseOR(F.lit(4096)).alias("or_hi"),
        k.bitwiseXOR(F.col("l_partkey")).alias("xored"),
        F.shiftleft(k, 2).alias("shl"),
        F.shiftright(k, 3).alias("shr"),
        F.bit_count(k).alias("popcnt"),
    )


@query(
    "fn_struct",
    oracle="""
SELECT o_orderkey,
       o_custkey AS sk,
       o_totalprice AS sp,
       (o_custkey = o_orderkey % 1000) AS key_match,
       concat(cast(o_custkey AS varchar), '#', o_orderstatus) AS packed_id
FROM orders
""",
    section="B.8",
    notes="struct construction, field extraction, and struct-derived "
    "scalars on the Spark side; the oracle computes the same outputs "
    "directly (the check compares results, not plans)",
)
def fn_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    s = F.struct(
        F.col("o_custkey").alias("k"),
        F.col("o_totalprice").alias("p"),
        F.col("o_orderstatus").alias("st"),
    )
    return o.select(
        "o_orderkey",
        s.getField("k").alias("sk"),
        s.getField("p").alias("sp"),
        (s.getField("k") == F.col("o_orderkey") % 1000).alias("key_match"),
        F.concat(
            s.getField("k").cast("string"), F.lit("#"), s.getField("st")
        ).alias("packed_id"),
    )


@query(
    "fn_hash",
    oracle="""
SELECT doc_id, md5(text) AS h_md5, sha256(text) AS h_sha256,
       ('0x' || substr(md5(text), 1, 8))::bigint % 16 AS shard
FROM documents
""",
    section="B.8",
    notes="cryptographic/content hashing: md5 + sha256 hex digests "
    "(content-addressed dedup keys) and a derived 16-way shard id "
    "from the digest prefix — the deterministic-bucketing primitive "
    "exact dedup and layout partitioning build on",
)
def fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("h_md5"),
        F.sha2("text", 256).alias("h_sha256"),
        (
            F.conv(F.substring(F.md5("text"), 1, 8), 16, 10).cast("long")
            % 16
        ).alias("shard"),
    )


@query(
    "fn_url",
    oracle="""
WITH u AS (
  SELECT doc_id,
         'https://' || source || '.example.org/docs/' ||
         cast(doc_id AS varchar) || '?lang=' || lang AS url
  FROM documents
)
SELECT doc_id, url,
       regexp_extract(url, '^https://([^/]+)', 1) AS host,
       regexp_extract(url, '^https://[^/]+([^?]*)', 1) AS path,
       regexp_extract(url, 'lang=([a-zA-Z]+)', 1) AS lang_param
FROM u
""",
    section="B.8",
    notes="URL parsing family: Spark's parse_url(HOST/PATH/QUERY-key) "
    "checked against an independent regexp decomposition in the "
    "oracle — a true differential test of the builtin, not the same "
    "regex run twice. Pure narrow projection, no shuffle",
)
def fn_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.org/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
    )
    u = d.select("doc_id", url.alias("url"))
    return u.select(
        "doc_id",
        "url",
        F.expr("parse_url(url, 'HOST')").alias("host"),
        F.expr("parse_url(url, 'PATH')").alias("path"),
        F.expr("parse_url(url, 'QUERY', 'lang')").alias("lang_param"),
    )


@query(
    "fn_date2",
    oracle="""
SELECT o_orderkey,
       cast(cast(o_orderdate + INTERVAL 3 MONTH AS date) AS varchar)
         AS plus_3m,
       cast(last_day(o_orderdate) AS varchar) AS month_end,
       quarter(o_orderdate) AS qtr,
       dayofyear(o_orderdate) AS doy,
       date_trunc('quarter', o_orderdate) AS quarter_start
FROM orders
""",
    section="B.8",
    notes="month-granularity date arithmetic: add_months (end-of-month "
    "clamped, matching interval-month addition), last_day, quarter / "
    "dayofyear parts, quarter truncation. Date-typed results are "
    "stringified (memory: DATE columns hash differently across "
    "engines); date_trunc stays timestamp-typed on both",
)
def fn_date2(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.add_months("o_orderdate", 3).cast("string").alias("plus_3m"),
        F.last_day("o_orderdate").cast("string").alias("month_end"),
        F.quarter("o_orderdate").alias("qtr"),
        F.dayofyear("o_orderdate").alias("doy"),
        F.date_trunc("quarter", "o_orderdate").alias("quarter_start"),
    )


@query(
    "fn_string2",
    oracle="""
SELECT p_partkey,
       levenshtein(p_brand, substring(p_type, 1, 8)) AS brand_type_dist,
       split_part(p_name, ' ', 1) AS first_tok,
       split_part(p_name, ' ', -1) AS last_tok,
       repeat(p_brand, 2) AS brand2,
       reverse(p_brand) AS brand_rev,
       translate(p_type, 'AEIOU', 'aeiou') AS type_lower_vowels
FROM part
""",
    section="B.8",
    notes="string family 2: levenshtein edit distance (fuzzy matching "
    "primitive -- both engines implement it independently, a true "
    "differential), split_part incl. negative index, repeat / "
    "reverse / translate. Narrow map, no shuffle",
)
def fn_string2(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.levenshtein("p_brand", F.substring("p_type", 1, 8)).alias(
            "brand_type_dist"
        ),
        F.split_part("p_name", F.lit(" "), F.lit(1)).alias("first_tok"),
        F.split_part("p_name", F.lit(" "), F.lit(-1)).alias("last_tok"),
        F.repeat("p_brand", 2).alias("brand2"),
        F.reverse("p_brand").alias("brand_rev"),
        F.translate("p_type", "AEIOU", "aeiou").alias("type_lower_vowels"),
    )


@query(
    "fn_regexp",
    oracle="""
SELECT p_partkey,
       len(regexp_extract_all(p_name, '[aeiou]')) AS n_vowels,
       regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
       coalesce(array_to_string(
                  regexp_extract_all(p_name, '\\b[a-z]{5,}\\b'), '|'),
                '') AS long_words,
       regexp_matches(p_type, 'BRUSHED|POLISHED') AS is_finished,
       len(string_split_regex(p_name, '\\s+')) AS n_fields,
       regexp_replace(p_name, '(\\w+) (\\w+)', '\\2 \\1', 'g')
         AS swapped
FROM part
""",
    section="B.8",
    notes="regexp family beyond fn_string's extract/replace basics: "
    "match COUNT (regexp_count vs len(regexp_extract_all) — "
    "independent engines, true differential), anchored group "
    "extract, extract_all joined to a scalar (driver-hashable, no "
    "array column), boolean rlike, regex split count, and a "
    "capture-group BACKREFERENCE swap (Java $2/$1 vs RE2 \\\\2/\\\\1 "
    "spellings of the same semantics). Patterns stay in the "
    "Java-regex/RE2 common dialect (classes, alternation, word "
    "boundaries, bounded quantifiers). Narrow map, no shuffle",
)
def fn_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_count("p_name", F.lit("[aeiou]")).alias("n_vowels"),
        F.regexp_extract("p_name", r"([a-z]+)$", 1).alias("last_word"),
        F.array_join(
            F.regexp_extract_all(
                "p_name", F.lit(r"\b[a-z]{5,}\b"), 0
            ),
            "|",
        ).alias("long_words"),
        F.col("p_type").rlike("BRUSHED|POLISHED").alias("is_finished"),
        F.size(F.split("p_name", r"\s+")).alias("n_fields"),
        F.regexp_replace("p_name", r"(\w+) (\w+)", r"$2 $1").alias(
            "swapped"
        ),
    )


@query(
    "fn_trig",
    oracle="""
SELECT l_orderkey, l_linenumber,
       round(sin(l_quantity / 10), 6) AS s,
       round(cos(l_quantity / 10), 6) AS c,
       round(atan2(l_discount, l_tax + 0.01), 6) AS a2,
       round(degrees(l_discount), 6) AS deg,
       round(radians(l_quantity), 6) AS rad
FROM lineitem
""",
    section="B.8",
    notes="trigonometric family rounded to 6dp (libm vs JVM "
    "StrictMath differ in the last ulp)",
)
def fn_trig(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.sin(F.col("l_quantity") / 10), 6).alias("s"),
        F.round(F.cos(F.col("l_quantity") / 10), 6).alias("c"),
        F.round(F.atan2("l_discount", F.col("l_tax") + 0.01), 6).alias("a2"),
        F.round(F.degrees("l_discount"), 6).alias("deg"),
        F.round(F.radians("l_quantity"), 6).alias("rad"),
    )


@query(
    "fn_variant",
    oracle="""
SELECT event_id,
       try_cast(json_extract(nullif(props, ''), '$.k') AS int) AS k,
       json(nullif(props, ''))::varchar AS canonical,
       (try_cast(json_extract(nullif(props, ''), '$.k') AS int) % 10 = 0)
         AS k_mod10
FROM events
""",
    section="B.8",
    notes="Spark 4 VariantType: parse_json once, variant_get typed "
    "paths from the binary-encoded variant -- the semi-structured "
    "scale path (parse once, probe many; vs get_json_object which "
    "re-parses the string per call, see fn_json). Canonical "
    "re-serialization (minified, stable key order) matches DuckDB's "
    "json() normalization exactly",
)
def fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    # try_parse_json / try_variant_get: malformed or empty props (a
    # data property of the corpus) degrade to NULL like the oracle's
    # nullif + try_cast, instead of failing the job
    v = e.select(
        "event_id", F.try_parse_json(F.nullif("props", F.lit(""))).alias("v")
    )
    return v.select(
        "event_id",
        F.expr("try_variant_get(v, '$.k', 'int')").alias("k"),
        F.col("v").cast("string").alias("canonical"),
        (F.expr("try_variant_get(v, '$.k', 'int')") % 10 == 0).alias(
            "k_mod10"
        ),
    )


@query(
    "fn_try",
    oracle="""
SELECT event_id,
       round(CASE WHEN user_id % 3 = 0 THEN NULL
                  ELSE value / cast(user_id % 3 AS double) END, 6)
         AS safe_div,
       try_cast(event_type AS bigint) AS bad_int,
       try_cast(cast(user_id AS varchar) AS bigint) AS good_int,
       CASE WHEN user_id > 0 THEN NULL
            ELSE 9223372036854775807 + user_id END AS safe_add
FROM events
""",
    section="C",
    notes="error-tolerant expression family (ANSI-mode resilience): "
    "try_divide / try_cast / try_add return NULL instead of failing "
    "the 100 TB job on row 73 billion -- the difference between a "
    "rerun and a null-rate metric. DuckDB twins are try_cast plus "
    "CASE guards for the arithmetic forms it lacks",
)
def fn_try(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.round(
            F.expr("try_divide(value, cast(user_id % 3 AS double))"), 6
        ).alias("safe_div"),
        F.expr("try_cast(event_type AS bigint)").alias("bad_int"),
        F.expr("try_cast(cast(user_id AS string) AS bigint)").alias(
            "good_int"
        ),
        F.expr("try_add(9223372036854775807, user_id)").alias("safe_add"),
    )


@query(
    "fn_listagg",
    oracle="""
SELECT user_id,
       string_agg(event_type, ',' ORDER BY ts, event_id) AS type_seq,
       string_agg(DISTINCT event_type, ',' ORDER BY event_type)
         AS type_set
FROM events GROUP BY user_id
""",
    section="C",
    notes="SQL:2023 LISTAGG (Spark 4) twin of DuckDB string_agg: the "
    "ordered event-type sequence per user is the input to any "
    "behavioral n-gram model, and the WITHIN GROUP ordering plus "
    "tie-broken order keys make the concatenation deterministic at "
    "any parallelism. Group state is bounded by the per-user event "
    "count; for unbounded keys the scale twin is collect-then-slice "
    "(agg_collect) or sketching",
)
def fn_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    e.createOrReplaceTempView("ev_listagg")
    return spark.sql(
        """
SELECT user_id,
       listagg(event_type, ',')
         WITHIN GROUP (ORDER BY ts, event_id) AS type_seq,
       listagg(DISTINCT event_type, ',')
         WITHIN GROUP (ORDER BY event_type) AS type_set
FROM ev_listagg GROUP BY user_id
"""
    )


@query(
    "fn_crypto_roundtrip",
    oracle="""
SELECT doc_id,
       text AS decrypted,
       cast(((n_chars // 16) + 1) * 16 AS bigint) AS cipher_len
FROM documents
""",
    section="C",
    notes="column-level encryption for PII at rest (aes_encrypt / "
    "aes_decrypt, AES-128-ECB for determinism -- GCM's random IV is "
    "the production mode but defeats byte-level checks): the oracle "
    "verifies the DECRYPT(ENCRYPT(x)) identity on every document "
    "plus the exact PKCS#7 ciphertext length ((len div 16 + 1) * "
    "16), so a silent padding or charset change fails the hash. "
    "DuckDB has no AES, which is exactly why the roundtrip identity "
    "is the right oracle shape; the n_chars = length(text) fixture "
    "invariant (FIXTURES.md) feeds the length formula",
)
def fn_crypto_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    cipher = F.expr(
        "aes_encrypt(text, '0123456789abcdef', 'ECB')"
    )
    return d.select(
        "doc_id",
        F.expr(
            "cast(aes_decrypt(aes_encrypt(text, '0123456789abcdef', 'ECB'),"
            " '0123456789abcdef', 'ECB') AS string)"
        ).alias("decrypted"),
        F.length(cipher).cast("bigint").alias("cipher_len"),
    )


@query(
    "fn_mask",
    oracle="""
SELECT c_custkey,
       regexp_replace(regexp_replace(regexp_replace(
           c_name, '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'),
           '[0-9]', 'n', 'g') AS name_masked,
       regexp_replace(c_name, '[0-9]', '#', 'g') AS name_digits,
       regexp_replace(regexp_replace(regexp_replace(
           c_mktsegment, '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'),
           '[0-9]', 'n', 'g') AS seg_masked
FROM customer
""",
    section="B.6",
    notes="builtin data masking (mask()), the show-safe redaction tier "
    "next to fn_crypto_roundtrip's reversible tier and "
    "llm_pii_redact's pattern tier: class-preserving substitution "
    "(upper->X, lower->x, digit->n, punctuation kept) keeps format "
    "validators and length/shape analytics working on the masked "
    "copy. Single JVM pass per value vs the oracle's 3 regex "
    "rewrites; custom per-class chars shown on the phone column "
    "(digits->#, letters untouched)",
)
def fn_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.expr("mask(c_name)").alias("name_masked"),
        F.expr("mask(c_name, NULL, NULL, '#', NULL)").alias("name_digits"),
        F.expr("mask(c_mktsegment)").alias("seg_masked"),
    )


@query(
    "fn_array_setops",
    oracle="""
WITH t AS (
  SELECT doc_id,
         list_distinct(string_split(lower(text), ' ')) AS ta,
         ['the', 'and', 'of', 'small', 'red'] AS tb
  FROM documents
)
SELECT doc_id,
       cast(len(list_filter(ta, x -> list_contains(tb, x)))
            AS bigint) AS n_inter,
       cast(len(list_distinct(list_cat(ta, tb))) AS bigint) AS n_union,
       cast(len(list_filter(ta, x -> NOT list_contains(tb, x)))
            AS bigint) AS n_except,
       coalesce(array_to_string(
           list_sort(list_filter(ta, x -> list_contains(tb, x))), ','
       ), '') AS inter_str
FROM t
""",
    section="B.8",
    notes="array set algebra (intersect/union/except) over the "
    "distinct token set vs a probe vocabulary — the stopword-overlap "
    "primitive text filters build on. Inputs are DISTINCT arrays so "
    "both engines' dup semantics are moot, and outputs are SCALARS "
    "(sizes + a sorted joined string) because the driver's hasher "
    "can't take list cells; the sorted join also removes any "
    "engine-order dependence (DuckDB renders the empty join as NULL "
    "where Spark gives '' — coalesced). Zero-shuffle narrow map, "
    "JVM-side",
)
def fn_array_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    probe = F.array(*[F.lit(w) for w in ("the", "and", "of", "small", "red")])
    ta = F.array_distinct(F.split(F.lower("text"), " "))
    return d.select(
        "doc_id",
        F.size(F.array_intersect(ta, probe)).cast("bigint").alias("n_inter"),
        F.size(F.array_union(ta, probe)).cast("bigint").alias("n_union"),
        F.size(F.array_except(ta, probe)).cast("bigint").alias("n_except"),
        F.array_join(
            F.sort_array(F.array_intersect(ta, probe)), ","
        ).alias("inter_str"),
    )
