"""Scalar-function family queries (SURVEY.md §2.C) — one composite query per
family, each output column exercising one function.

Reference parity: string normalization need (case/name drift between the two
feature vocabularies, setupTables.py:16,20 — SURVEY §1.4.4); datetime
arithmetic (B1 hour window setupTables.py:31, B2 session intervals :32, B5
daily truncation :37); 2-dp money rounding (updateTables.py:21); conditional
defaults (ts DEFAULT CURRENT_TIMESTAMP, setupTables.py:57); struct/JSON
envelope handling (DMS JSON messages, lib/fin-transactions-stack.ts:135).

Scale notes: every function here is a JVM-side built-in inside whole-stage
codegen — no Python UDFs in these paths (see udfs.py for the deliberate
UDF surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load
from ..registry import query
from .exact import cents


@query(
    "fn_string",
    oracle="""
    SELECT doc_id,
           (source || '-' || lang) AS src_lang,
           substring(text, 1, 20) AS prefix20,
           upper(lang) AS lang_up,
           lower(source) AS src_low,
           trim(' ' || lang || ' ') AS lang_trim,
           lpad(CAST(doc_id AS VARCHAR), 8, '0') AS id_pad,
           regexp_extract(text, '([a-z]+)', 1) AS first_word,
           substring(regexp_replace(text, ' ', '_', 'g'), 1, 30) AS snake30,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           (text LIKE '%data%') AS mentions_data
    FROM documents
    WHERE doc_id < 200
    """,
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family: concat/substring/case/trim/lpad/regexp/split/like
    (ref §1.4.4 vocabulary normalization). The oracle concatenates with
    the NULL-propagating || operator, matching Spark's concat() — DuckDB's
    concat() function skips NULLs and would silently diverge on any
    NULL source/lang row (round-8 review finding)."""
    d = load(spark, sf_dir, "documents")
    return d.where(F.col("doc_id") < 200).select(
        "doc_id",
        F.concat("source", F.lit("-"), "lang").alias("src_lang"),
        F.substring("text", 1, 20).alias("prefix20"),
        F.upper("lang").alias("lang_up"),
        F.lower("source").alias("src_low"),
        F.trim(F.concat(F.lit(" "), F.col("lang"), F.lit(" "))).alias("lang_trim"),
        F.lpad(F.col("doc_id").cast("string"), 8, "0").alias("id_pad"),
        F.regexp_extract("text", r"([a-z]+)", 1).alias("first_word"),
        F.substring(F.regexp_replace("text", " ", "_"), 1, 30).alias("snake30"),
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
        F.col("text").like("%data%").alias("mentions_data"),
    )


@query(
    "fn_datetime",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate) AS o_year,
           month(o_orderdate) AS o_month,
           day(o_orderdate) AS o_day,
           CAST(date_part('dow', o_orderdate) + 1 AS BIGINT) AS dow_sun1,
           CAST(CAST(date_trunc('month', o_orderdate) AS DATE) AS VARCHAR) AS month_start,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS VARCHAR) AS month_end,
           CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '2025-01-01') AS INTEGER)
             AS days_to_2025,
           CAST(FLOOR(EPOCH(o_orderdate + INTERVAL 90 DAYS)) AS BIGINT) AS due_epoch,
           CAST(FLOOR(EPOCH(o_orderdate)) AS BIGINT) AS order_epoch,
           CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS order_date
    FROM orders
    WHERE o_orderkey % 7 = 0
    """,
)
def fn_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime family: extract/trunc/last_day/datediff/interval arithmetic/
    epoch (ref B1 hour window, B2 intervals, B5 daily truncation)."""
    o = load(spark, sf_dir, "orders")
    return o.where(F.col("o_orderkey") % 7 == 0).select(
        "o_orderkey",
        F.year("o_orderdate").alias("o_year"),
        F.month("o_orderdate").alias("o_month"),
        F.dayofmonth("o_orderdate").alias("o_day"),
        F.dayofweek("o_orderdate").cast("bigint").alias("dow_sun1"),
        F.date_trunc("month", "o_orderdate")
        .cast("date")
        .cast("string")
        .alias("month_start"),
        F.last_day("o_orderdate").cast("string").alias("month_end"),
        F.datediff(F.lit("2025-01-01").cast("date"), F.to_date("o_orderdate")).alias(
            "days_to_2025"
        ),
        F.unix_timestamp(
            F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
        ).alias("due_epoch"),
        F.unix_timestamp("o_orderdate").alias("order_epoch"),
        F.to_date("o_orderdate").cast("string").alias("order_date"),
    )


@query(
    "fn_math_decimal",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice, 2) AS price_r2,
           CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
           CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
           abs(l_discount - 0.05) AS disc_dev,
           pow(l_quantity, 2) AS qty_sq,
           sqrt(l_quantity) AS qty_sqrt,
           round(ln(l_extendedprice), 6) AS price_ln,
           l_orderkey % 7 AS key_mod7,
           CAST(sign(l_discount - 0.05) AS DOUBLE) AS disc_sign,
           CAST(CAST(l_extendedprice AS DECIMAL(12,2)) AS DOUBLE) AS price_dec
    FROM lineitem
    WHERE l_orderkey % 13 = 0
    """,
)
def fn_math_decimal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math/decimal family: round/floor/ceil/abs/pow/sqrt/ln/mod/sign +
    DECIMAL(12,2) cast round-trip (ref A14 2-dp rounding, §1.4.2 decimal
    cap)."""
    li = load(spark, sf_dir, "lineitem")
    return li.where(F.col("l_orderkey") % 13 == 0).select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 2).alias("price_r2"),
        F.floor("l_extendedprice").cast("bigint").alias("price_floor"),
        F.ceil("l_extendedprice").cast("bigint").alias("price_ceil"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.pow("l_quantity", F.lit(2)).alias("qty_sq"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        F.round(F.log("l_extendedprice"), 6).alias("price_ln"),
        (F.col("l_orderkey") % 7).alias("key_mod7"),
        F.signum(F.col("l_discount") - 0.05).cast("double").alias("disc_sign"),
        F.col("l_extendedprice")
        .cast("decimal(12,2)")
        .cast("double")
        .alias("price_dec"),
    )


@query(
    "fn_conditional",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice < 100000 THEN 'small'
                WHEN o_totalprice < 300000 THEN 'medium'
                ELSE 'large' END AS size_bucket,
           coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_norm,
           least(o_totalprice, 250000.0) AS capped_price,
           greatest(o_totalprice, 100000.0) AS floored_price,
           (CASE WHEN nullif(o_orderpriority, '4-NOT SPECIFIED') IS NULL
                 THEN 'none' ELSE o_orderpriority END) AS priority_norm
    FROM orders
    WHERE o_orderkey % 11 = 0
    """,
)
def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional family: case/when, coalesce, nullif, least/greatest
    (ref A10 default-column semantics, setupTables.py:57). Every branch
    and bound sits INSIDE the o_totalprice range (1k..500k) and the
    priority domain, so each conditional is load-bearing — the old
    sub-2000 thresholds made four of five columns constants/identities
    the differential could not discriminate (round-8 review finding);
    the unrepresentable NULL-priority branch now normalizes the real
    '4-NOT SPECIFIED' sentinel through nullif instead."""
    o = load(spark, sf_dir, "orders")
    return o.where(F.col("o_orderkey") % 11 == 0).select(
        "o_orderkey",
        F.when(F.col("o_totalprice") < 100000, "small")
        .when(F.col("o_totalprice") < 300000, "medium")
        .otherwise("large")
        .alias("size_bucket"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("OPEN")).alias(
            "status_norm"
        ),
        F.least("o_totalprice", F.lit(250000.0)).alias("capped_price"),
        F.greatest("o_totalprice", F.lit(100000.0)).alias("floored_price"),
        F.when(
            F.nullif(F.col("o_orderpriority"), F.lit("4-NOT SPECIFIED")).isNull(),
            "none",
        )
        .otherwise(F.col("o_orderpriority"))
        .alias("priority_norm"),
    )


@query(
    "fn_array",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INTEGER) AS emb_dim,
           round(embedding[1]::DOUBLE, 4) AS first_val,
           round(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE)), 6)
             AS l2_sq,
           CAST(len(list_filter(embedding, x -> x > 0)) AS INTEGER) AS n_pos,
           round(list_sort(embedding)[1]::DOUBLE, 4) AS min_val,
           round(list_sort(embedding)[len(embedding)]::DOUBLE, 4) AS max_val
    FROM embeddings
    WHERE vec_id % 5 = 0
    """,
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family: size/element_at/transform/aggregate/filter/sort over
    `embeddings.embedding` (north-star vector column)."""
    e = load(spark, sf_dir, "embeddings")
    return e.where(F.col("vec_id") % 5 == 0).select(
        "vec_id",
        F.size("embedding").alias("emb_dim"),
        F.round(F.element_at("embedding", 1).cast("double"), 4).alias("first_val"),
        F.round(
            F.aggregate(
                F.transform(
                    "embedding", lambda x: x.cast("double") * x.cast("double")
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            6,
        ).alias("l2_sq"),
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_pos"),
        F.round(F.element_at(F.array_sort("embedding"), 1).cast("double"), 4).alias(
            "min_val"
        ),
        F.round(F.element_at(F.array_sort("embedding"), -1).cast("double"), 4).alias(
            "max_val"
        ),
    )


@query(
    "fn_map_struct",
    oracle="""
    SELECT event_id,
           (struct_pack(uid := user_id, etype := event_type)).uid AS s_uid,
           (struct_pack(uid := user_id, etype := event_type)).etype AS s_type,
           map(['amount'], [value])['amount'][1] AS m_amount,
           CAST(cardinality(map(['amount','twice'], [value, value])) AS INTEGER) AS m_size
    FROM events
    WHERE event_id % 17 = 0
    """,
)
def fn_map_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct/map family: named_struct field access, map build/lookup/size
    (ref A2: the CDC JSON envelope is a nested struct,
    lib/fin-transactions-stack.ts:135)."""
    ev = load(spark, sf_dir, "events")
    s = F.named_struct(
        F.lit("uid"), F.col("user_id"), F.lit("etype"), F.col("event_type")
    )
    m1 = F.map_from_arrays(F.array(F.lit("amount")), F.array(F.col("value")))
    m2 = F.map_from_arrays(
        F.array(F.lit("amount"), F.lit("twice")),
        F.array(F.col("value"), F.col("value")),
    )
    return ev.where(F.col("event_id") % 17 == 0).select(
        "event_id",
        s.getField("uid").alias("s_uid"),
        s.getField("etype").alias("s_type"),
        F.element_at(m1, "amount").alias("m_amount"),
        F.size(m2).alias("m_size"),
    )


@query(
    "fn_json",
    oracle="""
    SELECT event_id,
           CAST(props->>'$.k' AS INT) AS k_int,
           CAST(props->>'$.k' AS VARCHAR) AS k_str,
           CAST(props->>'$.missing' AS VARCHAR) AS missing_field,
           to_json(struct_pack(user_id := user_id, k := CAST(props->>'$.k' AS INT)))
             AS envelope
    FROM events
    WHERE event_id % 19 = 0
    """,
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON family: get_json_object/from_json/to_json over `events.props`
    (ref A2/A4: DMS JSON encode/decode)."""
    ev = load(spark, sf_dir, "events")
    parsed = F.from_json("props", "k INT")
    return ev.where(F.col("event_id") % 19 == 0).select(
        "event_id",
        parsed.getField("k").alias("k_int"),
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.missing").alias("missing_field"),
        F.to_json(
            F.named_struct(
                F.lit("user_id"),
                F.col("user_id"),
                F.lit("k"),
                parsed.getField("k"),
            )
        ).alias("envelope"),
    )


@query(
    "fn_hash",
    oracle="""
    SELECT doc_id,
           md5(text) AS h_md5,
           sha256(text) AS h_sha256,
           CAST(length(md5(text)) + length(sha256(text)) AS INTEGER) AS h_lens
    FROM documents
    WHERE doc_id % 7 = 0
    """,
)
def fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cryptographic-hash family (content addressing, cache keys, exact
    dedup ids): md5 / sha2-256 — standardized outputs, so unlike
    xxhash64/murmur they are portable across engines (full oracle)."""
    d = load(spark, sf_dir, "documents").where(F.col("doc_id") % 7 == 0)
    return d.select(
        "doc_id",
        F.md5("text").alias("h_md5"),
        F.sha2("text", 256).alias("h_sha256"),
        (F.length(F.md5("text")) + F.length(F.sha2("text", 256)))
        .cast("int")
        .alias("h_lens"),
    )


@query(
    "fn_bitwise",
    oracle="""
    WITH flagged AS (
      SELECT user_id,
             CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2
                  WHEN 'purchase' THEN 4 WHEN 'signup' THEN 8 ELSE 16 END AS flag
      FROM events
    )
    SELECT user_id,
           CAST(bit_or(flag) AS BIGINT) AS seen_mask,
           CAST(bit_and(flag | 32) AS BIGINT) AS common_mask,
           CAST(bit_count(CAST(bit_or(flag) AS BIGINT)) AS INTEGER) AS n_distinct_kinds
    FROM flagged
    GROUP BY user_id
    """,
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise family as behavior flags: event kinds become bits; bit_or
    aggregates a per-user seen-mask (5 bools in one BIGINT — the compact
    form for billions of users), bit_and finds universally-set bits,
    bit_count reads the cardinality back out."""
    ev = load(spark, sf_dir, "events")
    flag = (
        F.when(F.col("event_type") == "view", 1)
        .when(F.col("event_type") == "click", 2)
        .when(F.col("event_type") == "purchase", 4)
        .when(F.col("event_type") == "signup", 8)
        .otherwise(16)
    )
    return (
        ev.select("user_id", flag.alias("flag"))
        .groupBy("user_id")
        .agg(
            F.bit_or("flag").cast("bigint").alias("seen_mask"),
            F.bit_and(F.col("flag").bitwiseOR(F.lit(32)))
            .cast("bigint")
            .alias("common_mask"),
            F.bit_count(F.bit_or("flag").cast("bigint"))
            .cast("int")
            .alias("n_distinct_kinds"),
        )
    )


@query(
    "fn_variant",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_typed,
           CAST(ROUND(value * 100, 0) AS BIGINT) AS amt_cents,
           event_type AS tag0,
           'OBJECT<k: BIGINT>' AS props_schema
    FROM events
    """,
)
def fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The VARIANT semi-structured type (Spark 4): ingest the raw JSON
    props column as a variant, extract a TYPED path, and round-trip a
    nested document (struct + array built from relational columns →
    JSON → variant → typed path extraction) — the open-schema
    ingestion shape that replaces rigid from_json structs when the
    payload evolves. The extraction contract is exact: every value
    pulled back out of the variant must equal the relational column it
    was built from, and `schema_of_variant` must report the stable
    inferred shape (pinned as a literal by the oracle — DuckDB has no
    variant, so the oracle recomputes the VALUES from the base columns
    and the schema string from the known payload shape).

    Scale shape: variant parse/extract are codegen expressions — no
    UDF, no shuffle; at 100 TB variant beats string-JSON scans because
    the binary encoding skips re-tokenizing on every path access."""
    ev = load(spark, sf_dir, "events")
    doc = F.parse_json(
        F.to_json(
            F.struct(
                cents(F.col("value")).alias("amt"),
                F.array("event_type").alias("tags"),
            )
        )
    )
    return ev.withColumn("doc", doc).select(
        "event_id",
        F.expr("variant_get(parse_json(props), '$.k', 'bigint')").alias(
            "k_typed"
        ),
        F.expr("variant_get(doc, '$.amt', 'bigint')").alias("amt_cents"),
        F.expr("variant_get(doc, '$.tags[0]', 'string')").alias("tag0"),
        F.expr("schema_of_variant(parse_json(props))").alias(
            "props_schema"
        ),
    )


@query(
    "fn_url",
    oracle="""
    WITH urls AS (
      SELECT doc_id,
             'https://' || source || '.example.com/docs/' || lang || '/'
               || doc_id || '?utm_source=feed&ref=' || (doc_id % 7)
               || '#s' || (doc_id % 3) AS url
      FROM documents WHERE doc_id % 5 = 0
    )
    SELECT doc_id,
           url,
           regexp_extract(url, '^([a-z]+)://', 1) AS proto,
           regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS host,
           regexp_extract(url, '^[a-z]+://[^/?#]+([^?#]*)', 1) AS path,
           regexp_extract(url, '\\?([^#]*)', 1) AS query,
           regexp_extract(url, '[?&]ref=([^&#]*)', 1) AS ref_param,
           regexp_extract(url, '#(.*)$', 1) AS fragment,
           regexp_extract(url, '^[a-z]+://([^/?#]+)', 1)
             || regexp_extract(url, '^[a-z]+://[^/?#]+([^?#]*)', 1)
             AS canonical
    FROM urls
    """,
)
def fn_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL function family: `parse_url` component extraction (PROTOCOL /
    HOST / PATH / QUERY / named QUERY param / REF fragment) plus the
    URL-CANONICALIZATION a web-corpus pipeline dedupes on — host+path
    with tracking query params and fragments stripped (the Common Crawl
    url-dedup normalization). URLs are synthesized deterministically
    from document metadata so both engines see identical inputs; the
    oracle re-derives every component with anchored regexes, certifying
    Spark's java.net.URI-based parser against a second implementation.

    Scale shape: all codegen string expressions — no UDF, no shuffle;
    the canonical column is exactly what `dedup_exact`'s hash-groupBy
    would key on at 100 TB."""
    d = load(spark, sf_dir, "documents").where(F.col("doc_id") % 5 == 0)
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.com/docs/"),
        F.col("lang"), F.lit("/"), F.col("doc_id").cast("string"),
        F.lit("?utm_source=feed&ref="), (F.col("doc_id") % 7).cast("string"),
        F.lit("#s"), (F.col("doc_id") % 3).cast("string"),
    )
    return d.select("doc_id", url.alias("url")).select(
        "doc_id",
        "url",
        F.parse_url("url", F.lit("PROTOCOL")).alias("proto"),
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY")).alias("query"),
        F.parse_url("url", F.lit("QUERY"), F.lit("ref")).alias("ref_param"),
        F.parse_url("url", F.lit("REF")).alias("fragment"),
        F.concat(
            F.parse_url("url", F.lit("HOST")),
            F.parse_url("url", F.lit("PATH")),
        ).alias("canonical"),
    )


@query(
    "fn_collation",
    oracle="""
    WITH mixed AS (
      SELECT doc_id, lang,
             CASE WHEN doc_id % 3 = 0 THEN upper(source)
                  WHEN doc_id % 3 = 1 THEN source
                  ELSE concat(upper(substr(source, 1, 1)), substr(source, 2))
             END AS s
      FROM documents
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT s) AS BIGINT) AS n_case_sensitive,
           CAST(COUNT(DISTINCT lower(s)) AS BIGINT) AS n_case_insensitive,
           CAST(SUM(CASE WHEN lower(s) = 'src7' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_src7_ci,
           CAST(SUM(CASE WHEN lower(s) >= 'src15' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_ge_src15_ci
    FROM mixed
    GROUP BY lang
    ORDER BY lang
    """,
)
def fn_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String COLLATION (Spark 4): the same source tag deterministically
    re-cased three ways, then counted under the session-default binary
    collation vs `UTF8_LCASE` — distinct counts, equality against a
    literal, and an ordering comparison all evaluated collation-aware
    (`collate()` propagates through =, >=, and DISTINCT). The oracle has
    no collation engine, so it certifies via the lower() equivalence —
    exactly the rewrite collations obsolete. The compared literals are
    IN-DOMAIN ('src7' equality, 'src15' ordering bound over the
    src0..src19 tag universe) so both counts split the data — an
    earlier out-of-domain pair ('web', 'n') matched 0 and all rows
    respectively, and a collation regression would have graded green.

    Scale shape: collation comparison is a codegen expression (ICU/UTF8
    binary compare JVM-side); the case-insensitive DISTINCT aggregates
    on the collated key directly, one partial-agg shuffle — no
    lower() copy of the column materialized at 100 TB."""
    d = load(spark, sf_dir, "documents")
    s = (
        F.when(F.col("doc_id") % 3 == 0, F.upper("source"))
        .when(F.col("doc_id") % 3 == 1, F.col("source"))
        .otherwise(
            F.concat(
                F.upper(F.substring("source", 1, 1)),
                F.expr("substr(source, 2)"),
            )
        )
    )
    sc = F.collate(F.col("s"), "UTF8_LCASE")
    return (
        d.select("doc_id", "lang", s.alias("s"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_rows"),
            F.count_distinct(F.col("s")).alias("n_case_sensitive"),
            F.count_distinct(sc).alias("n_case_insensitive"),
            F.sum(
                F.when(sc == F.lit("src7"), 1).otherwise(0)
            ).alias("n_src7_ci"),
            F.sum(
                F.when(sc >= F.lit("src15"), 1).otherwise(0)
            ).alias("n_ge_src15_ci"),
        )
        .orderBy("lang")
    )


@query(
    "fn_crypto",
    oracle="""
    SELECT doc_id,
           md5(text) AS text_md5,
           sha256(text) AS text_sha256,
           base64(encode(substr(text, 1, 24))) AS head_b64,
           decode(from_base64(base64(encode(substr(text, 1, 24)))))
             AS head_roundtrip,
           TRUE AS aes_roundtrip_ok
    FROM documents WHERE doc_id % 11 = 0
    """,
)
def fn_crypto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crypto/digest function family: md5 + sha2-256 content digests
    (the fingerprints a lake keys manifests on), base64 round-trip, and
    an AES-128 encrypt->decrypt round-trip in deterministic ECB mode —
    the at-rest column-encryption shape (GCM is what production uses;
    its random IV is deliberately avoided here so the query stays a
    pure function). DuckDB has no AES, so the oracle pins the CLAIM:
    the decrypted text must equal the source exactly (emitted as a
    boolean the Spark side computes from the real cipher round-trip and
    the oracle emits as TRUE).

    Scale shape: every function is a codegen expression over the scan —
    no UDF, no shuffle; digests at 100 TB are embarrassingly parallel
    map work."""
    d = load(spark, sf_dir, "documents").where(F.col("doc_id") % 11 == 0)
    # 16-byte AES-128 demo key; a real lake feeds this from a KMS column
    return d.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.sha2("text", 256).alias("text_sha256"),
        F.base64(F.substring("text", 1, 24).cast("binary")).alias("head_b64"),
        F.unbase64(
            F.base64(F.substring("text", 1, 24).cast("binary"))
        ).cast("string").alias("head_roundtrip"),
        (
            F.expr(
                "cast(aes_decrypt(aes_encrypt(cast(text as binary),"
                " '0123456789abcdef', 'ECB'), '0123456789abcdef', 'ECB')"
                " as string)"
            )
            == F.col("text")
        ).alias("aes_roundtrip_ok"),
    )


@query(
    "fn_try_ansi",
    oracle="""
    SELECT event_id,
           round(CAST(ROUND(value * 100, 0) AS BIGINT)
                 / nullif(user_id % 5, 0), 4) AS safe_div,
           TRY_CAST(event_type AS INTEGER) AS type_as_int,
           TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_num,
           string_split(event_type, '')[100] AS char100,
           user_id <> 0 AS ovf_null
    FROM events WHERE event_id % 13 = 0
    """,
)
def fn_try_ansi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-mode error-safe arithmetic (Spark 4 runs ANSI SQL by
    default, where overflow/bad-cast/div-by-zero THROW): the `try_`
    family converts each error class to NULL — try_divide on a zero
    divisor, try_cast on a non-numeric enum, try_cast on a JSON-path
    extract, try_element_at past the end, and try_add at int64 max
    (NULL exactly when the addend is nonzero — the oracle certifies the
    overflow contract as that boolean). This is the surface that lets a
    pipeline keep ANSI's correctness guarantees without a quarantine
    branch per expression.

    Scale shape: all codegen expressions, no UDF/shuffle; identical
    cost to the unguarded forms."""
    ev = load(spark, sf_dir, "events").where(F.col("event_id") % 13 == 0)
    return ev.select(
        "event_id",
        F.round(
            F.try_divide(cents(F.col("value")), F.col("user_id") % 5),
            4,
        ).alias("safe_div"),
        F.expr("try_cast(event_type as int)").alias("type_as_int"),
        F.expr(
            "try_cast(get_json_object(props, '$.k') as int)"
        ).alias("k_num"),
        F.expr("try_element_at(split(event_type, ''), 100)").alias("char100"),
        F.isnull(
            F.expr("try_add(9223372036854775807L, user_id)")
        ).alias("ovf_null"),
    )
