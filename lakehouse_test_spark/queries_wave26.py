"""Round-3 wave X: positional full-text search and the Arrow interop
path under the hash gate.

- ``text_phrase_search`` — exact PHRASE matching via a positional
  posting join (token, position) ⋈ (token, position+1): the inverted-
  index-with-positions shape that bag-of-words ranking (text_bm25_search)
  cannot express. The oracle counts the same phrase with an anchored
  regex — two independent algorithms, one hash.
- ``format_arrow_roundtrip`` — the Arrow batch path (mapInArrow)
  as an identity stage inside a gated aggregate: proves columns
  survive the JVM→Arrow→Python→Arrow→JVM crossing bit-exactly.
- ``lakehouse_snapshot_diff`` — the snapshot-to-snapshot audit diff
  (EXCEPT ALL both ways across a MERGE) verified against a relational
  reconstruction of exactly-the-changed rows.
- Wave Z add-ons collected here as the round closed:
  ``sql_unpivot_except_star`` (UNPIVOT + SELECT * EXCEPT as SQL text),
  ``multimodal_binaryfile_ingest`` (the binaryFile source),
  ``dedup_sparkml_minhash`` (the survey's named pyspark.ml LSH path,
  recall pinned at 1.0), ``sql_parameterized_query`` (named parameter
  markers), ``scalar_aes_roundtrip`` (encrypt/decrypt contract),
  ``scalar_hash_battery`` (md5/sha2-256), ``dq_psi_drift``
  (population stability index), ``dq_luhn_checksum`` (mod-10 ids).

Reference parity: none; extends SURVEY.md §2b text analysis and the
UDF/interop matrix.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakehouse_test_spark.fpsafe import dround, dsum
from lakehouse_test_spark.registry import query
from lakehouse_test_spark.session import load_table


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "text_phrase_search",
    oracle=r"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '\bmerge slow\b')) AS BIGINT)
             AS n_matches
    FROM documents
    WHERE len(regexp_extract_all(text, '\bmerge slow\b')) > 0
    """,
    tags=("text", "search"),
)
def text_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phrase search ("merge slow") via POSITIONAL postings:
    tokenize to (doc_id, pos, token), then join first-word postings
    to second-word postings at pos+1 — the inverted-index-with-
    positions algorithm real search engines run, which pure
    bag-of-words scoring can't express. The oracle counts the same
    phrase with an anchored regex over the raw text: two independent
    algorithms must agree on every per-document match count for the
    hash to pass (single-space tokenization makes the semantics
    coincide on this corpus).

    Scale: postings are filtered to the two phrase terms BEFORE the
    join (selectivity ~ term frequency, like the BM25 pruning), and
    the join key is (doc_id, pos) — co-partitioned, no skew. A
    p-term phrase chains p−1 such joins.
    """
    d = T(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "token")
    )
    first = toks.where(F.col("token") == "merge").select("doc_id", "pos")
    second = toks.where(F.col("token") == "slow").select(
        "doc_id", (F.col("pos") - 1).alias("pos")
    )
    return (
        first.join(second, ["doc_id", "pos"])
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_matches"))
    )


@query(
    "format_arrow_roundtrip",
    oracle="""
    SELECT l_returnflag,
           count(*) AS n_rows,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))), 2) AS DOUBLE)
             AS total_price,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("format", "arrow", "udf"),
)
def format_arrow_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow interop under the hash gate: the scan flows through a
    ``mapInArrow`` identity stage — every batch crosses
    JVM → Arrow IPC → Python → Arrow IPC → JVM — and is then
    aggregated decimal-exactly. A hash match proves doubles, ints,
    and strings survive the Arrow columnar crossing bit-for-bit
    (the same wire the pandas UDF battery rides, isolated here as a
    pure format check, the ``format_avro_roundtrip`` twin).

    Scale: Arrow transfer is zero-copy columnar with batch
    granularity — the identity stage adds serialization bandwidth
    but no shuffle, and the aggregate's partial+final shape is
    unchanged.
    """
    li = T(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice", "l_quantity"
    )

    def ident(batches):
        for b in batches:
            yield b

    through = li.mapInArrow(ident, li.schema)
    return through.groupBy("l_returnflag").agg(
        F.count("*").alias("n_rows"),
        dround(dsum(F.col("l_extendedprice")), 2).alias("total_price"),
        F.sum(F.col("l_quantity").cast("bigint")).alias("total_qty"),
    )


@query(
    "lakehouse_snapshot_diff",
    oracle="""
    WITH changed AS (
      SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 7 = 0
    )
    SELECT _diff_type,
           count(*) AS n_rows,
           CAST(round(sum(CAST(price AS DECIMAL(18,6))), 2) AS DOUBLE)
             AS total_price
    FROM (
      SELECT 'added' AS _diff_type, o_totalprice * 2 AS price FROM changed
      UNION ALL
      SELECT 'removed' AS _diff_type, o_totalprice AS price FROM changed
    ) d
    GROUP BY _diff_type
    """,
    tags=("lakehouse", "audit"),
)
def lakehouse_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-to-snapshot audit diff under the hash gate: commit
    orders, MERGE a price-doubling update for every 7th key, then
    table_diff(v1 → v2) — full-row EXCEPT ALL both ways — must report
    EXACTLY the doubled rows as added and their originals as removed.
    The oracle reconstructs both sides relationally, so a diff that
    hallucinates, drops, or double-counts a change fails on values.

    Scale: the diff is two full-row-keyed shuffles — the log-free
    fallback; the CDF (lakehouse_cdf_feed) is the O(changes) path
    when log semantics are available. Auditing "what changed between
    these versions" is the lakehouse operator compliance teams run.
    """
    from lakehouse_test_spark.plans.lakehouse import LakehouseTable, table_diff

    o = T(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    t = LakehouseTable(spark, tempfile.mkdtemp(prefix="lh_snapdiff_"))
    base = t.append(o)
    upd = o.where(F.col("o_orderkey") % 7 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") * 2
    )
    t.merge(upd, key_cols=["o_orderkey"])
    return (
        table_diff(t, from_version=base.version)
        .groupBy("_diff_type")
        .agg(
            F.count("*").alias("n_rows"),
            dround(dsum(F.col("o_totalprice")), 2).alias("total_price"),
        )
    )


@query(
    "sql_unpivot_except_star",
    oracle="""
    WITH m AS (
      SELECT o_orderstatus,
             CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE)
               AS total_price,
             CAST(count(*) AS DOUBLE) AS n_orders,
             CAST(count(DISTINCT o_custkey) AS DOUBLE) AS n_customers
      FROM orders GROUP BY o_orderstatus
    ), unp AS (
      SELECT o_orderstatus, 'total_price' AS metric, total_price AS val FROM m
      UNION ALL
      SELECT o_orderstatus, 'n_orders', n_orders FROM m
      UNION ALL
      SELECT o_orderstatus, 'n_customers', n_customers FROM m
    )
    SELECT o_orderstatus, metric, val FROM unp
    """,
    tags=("sql", "unpivot"),
)
def sql_unpivot_except_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modern SQL-clause surface: ``SELECT * EXCEPT (...)`` projects
    away a column inside the star, and the ``UNPIVOT`` clause melts
    the metric columns to (metric, val) rows — both as SQL TEXT (the
    DataFrame melt/drop equivalents are covered elsewhere). The
    oracle reconstructs the unpivot as a UNION ALL, the clause's
    defined semantics.

    Scale: UNPIVOT is an Expand node — rows × metrics map-side, no
    shuffle beyond the feeding aggregate.
    """
    T(spark, sf_dir, "orders").createOrReplaceTempView("v_w26_orders")
    return spark.sql(
        """
        WITH m AS (
          SELECT o_orderstatus,
                 CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE)
                   AS total_price,
                 CAST(count(*) AS DOUBLE) AS n_orders,
                 CAST(count(DISTINCT o_custkey) AS DOUBLE) AS n_customers,
                 min(o_orderkey) AS drop_me
          FROM orders_src GROUP BY o_orderstatus
        ), pruned AS (
          SELECT * EXCEPT (drop_me) FROM m
        )
        SELECT * FROM pruned
        UNPIVOT (val FOR metric IN (total_price, n_orders, n_customers))
        """.replace("orders_src", "v_w26_orders")
    )


@query(
    "multimodal_binaryfile_ingest",
    oracle="""
    SELECT doc_id,
           CAST(doc_id + 16 AS BIGINT) AS n_bytes,
           CAST(doc_id % 251 AS INTEGER) AS first_byte,
           CAST((doc_id % 251) * (doc_id + 16) AS BIGINT) AS byte_sum
    FROM documents
    WHERE doc_id < 64
    """,
    tags=("multimodal", "source", "binary"),
)
def multimodal_binaryfile_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ``binaryFile`` SOURCE — how a real multimodal pipeline
    ingests raw image/audio blobs: 64 deterministic files (content:
    byte doc_id%251 repeated doc_id+16 times) land on disk, the
    binaryFile reader lifts them to (path, length, content) rows, and
    pure codegen recovers doc_id from the file NAME, the first byte
    from the CONTENT, and the byte sum from both. The oracle
    recomputes everything from the generation formula, so the source,
    the binary column, and the byte arithmetic are all value-checked.

    Scale: binaryFile is a normal file-based source — files→splits→
    tasks, driver lists paths only; per-file bytes stay in executor
    memory one row at a time (pathGlobFilter/recursiveFileLookup
    prune listings). This is the ingest edge of the decode_media /
    pHash pipeline (operators/multimodal.py).
    """
    import os as _os

    base = tempfile.mkdtemp(prefix="binfiles_")
    for i in range(64):
        with open(_os.path.join(base, f"{i:04d}.bin"), "wb") as fh:
            fh.write(bytes([i % 251]) * (i + 16))
    raw = spark.read.format("binaryFile").load(base)
    doc_id = F.regexp_extract(F.col("path"), r"(\d{4})\.bin$", 1).cast("bigint")
    first_byte = F.conv(F.hex(F.substring("content", 1, 1)), 16, 10).cast("int")
    return raw.select(
        doc_id.alias("doc_id"),
        F.col("length").alias("n_bytes"),
        first_byte.alias("first_byte"),
        (first_byte.cast("bigint") * F.col("length")).alias("byte_sum"),
    )


@query(
    "dedup_sparkml_minhash",
    oracle=None,  # approximate LSH internals are engine-specific: rows-only
    tags=("dedup", "ml", "interop"),
)
def dedup_sparkml_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pyspark.ml path for fuzzy dedup that SURVEY.md §2b names
    explicitly (``pyspark.ml.feature.MinHashLSH``): HashingTF
    binarized token vectors → MinHashLSH(seed-pinned) →
    approxSimilarityJoin at Jaccard distance ≤ 0.2, upper-triangle
    deduped. Registered to prove the ml-package surface works
    end-to-end; the PRODUCTION dedup path in this engine is
    operators/dedup.py's hand-rolled banded MinHash (decimal-
    deterministic signatures, hot-bucket star guard, plan-pinned
    single shuffle), which the recall/precision tests grade against
    exact O(n²) Jaccard.

    Scale note: approxSimilarityJoin explodes each row per hash table
    and self-joins on (table, hash) — workable, but without the
    banding/star-guard controls the hand-rolled operator exposes;
    rows-only check (the LSH draw is engine-internal randomness).
    """
    from pyspark.ml.feature import HashingTF, MinHashLSH

    d = T(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("tokens")
    )
    tf = HashingTF(
        inputCol="tokens", outputCol="features", numFeatures=1 << 16, binary=True
    )
    feat = tf.transform(d)
    lsh = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=8, seed=7
    )
    model = lsh.fit(feat)
    pairs = model.approxSimilarityJoin(feat, feat, 0.2, distCol="jaccard_dist")
    return (
        pairs.where(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("doc_a"),
            F.col("datasetB.doc_id").alias("doc_b"),
            F.round("jaccard_dist", 4).alias("jaccard_dist"),
        )
        .orderBy("doc_a", "doc_b")
    )


@query(
    "sql_parameterized_query",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n_orders,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE)
             AS total_price
    FROM orders
    WHERE o_totalprice >= 1000.0 AND o_orderstatus = 'O'
    GROUP BY o_orderpriority
    """,
    tags=("sql", "api"),
)
def sql_parameterized_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized SQL (Spark 3.4+ named parameter markers): the
    query text carries ``:min_price`` / ``:status`` and values bind
    through ``spark.sql(..., args=...)`` — the injection-safe API
    programs should use instead of f-string SQL. The oracle runs the
    same query with the constants inlined, so binding must be
    value-exact (including the double comparison).

    Scale: parameters bind as literals BEFORE analysis, so pushdown
    and partition pruning see constants — plan quality is identical
    to inlined SQL (no prepared-statement opacity).
    """
    T(spark, sf_dir, "orders").createOrReplaceTempView("v_w26_orders_p")
    return spark.sql(
        """
        SELECT o_orderpriority,
               count(*) AS n_orders,
               CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE)
                 AS total_price
        FROM v_w26_orders_p
        WHERE o_totalprice >= :min_price AND o_orderstatus = :status
        GROUP BY o_orderpriority
        """,
        args={"min_price": 1000.0, "status": "O"},
    )


@query(
    "scalar_aes_roundtrip",
    oracle="""
    SELECT doc_id,
           substr(text, 1, 64) AS plain,
           CAST(length(substr(text, 1, 64)) AS INTEGER) AS n_chars_out,
           TRUE AS roundtrip_ok
    FROM documents
    """,
    tags=("scalar", "crypto"),
)
def scalar_aes_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level encryption surface: aes_encrypt → aes_decrypt with
    a 256-bit key must return the exact plaintext. Ciphertexts are
    intentionally NOT emitted (GCM draws a random IV per call, so
    they aren't deterministic — the point of the mode); the gate
    checks the decrypted value, length, and an equality flag against
    the raw column, which is precisely the contract at-rest
    encryption must satisfy.

    Scale: AES runs JVM-side per value inside codegen — no shuffle;
    key distribution (here a literal) is the real production concern,
    not throughput.
    """
    d = T(spark, sf_dir, "documents")
    key = F.lit("0123456789abcdef0123456789abcdef")  # 32 bytes = AES-256
    plain = F.substring("text", 1, 64)
    dec = F.aes_decrypt(
        F.aes_encrypt(plain.cast("binary"), key), key
    ).cast("string")
    return d.select(
        "doc_id",
        dec.alias("plain"),
        F.length(dec).cast("int").alias("n_chars_out"),
        (dec == plain).alias("roundtrip_ok"),
    )


@query(
    "scalar_hash_battery",
    oracle="""
    SELECT doc_id,
           md5(text) AS md5_hex,
           sha256(text) AS sha256_hex,
           substr(md5(text || lang), 1, 8) AS salted_prefix
    FROM documents
    """,
    tags=("scalar", "hash"),
)
def scalar_hash_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cryptographic hash surface: md5 and sha2-256 hex digests (the
    fingerprints every dedup/partition/PII pipeline leans on) must be
    byte-identical across engines — these are the same primitives
    dedup_exact_fingerprint and sample_weighted_hash build on, gated
    here directly, plus a salted-prefix pattern (the deterministic
    sampling key idiom).

    Scale: JVM-side codegen digests, zero shuffle; xxhash64 (the
    fast non-cryptographic sibling used by the MinHash/bucket
    operators) is Spark-internal and excluded from the cross-engine
    contract on purpose.
    """
    d = T(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("md5_hex"),
        F.sha2("text", 256).alias("sha256_hex"),
        F.substring(F.md5(F.concat("text", "lang")), 1, 8).alias("salted_prefix"),
    )


@query(
    "dq_psi_drift",
    oracle="""
    WITH bucketed AS (
      SELECT CAST(least(floor(o_totalprice / 50000.0), 5) AS INTEGER) AS bucket,
             o_orderkey % 2 = 0 AS in_a
      FROM orders
    ), dist AS (
      SELECT bucket,
             count(*) FILTER (WHERE in_a) AS c_a,
             count(*) FILTER (WHERE NOT in_a) AS c_b,
             sum(count(*) FILTER (WHERE in_a)) OVER () AS n_a,
             sum(count(*) FILTER (WHERE NOT in_a)) OVER () AS n_b
      FROM bucketed GROUP BY bucket
    ), terms AS (
      SELECT bucket,
             (c_a + 0.5) / (n_a + 3.0) AS p_a,
             (c_b + 0.5) / (n_b + 3.0) AS p_b
      FROM dist
    )
    SELECT count(*) AS n_buckets,
           CAST(round(sum(CAST((p_b - p_a) * ln(p_b / p_a) AS DECIMAL(28,12))), 6)
                AS DOUBLE) AS psi
    FROM terms
    """,
    tags=("dq", "drift"),
)
def dq_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between two cohorts (even vs odd
    order keys) over fixed-width price buckets — the MLOps drift
    metric run between every training snapshot and production window.
    Buckets are deterministic truncations (no interpolated quantile
    cuts to disagree on), proportions are Laplace-smoothed (+0.5 per
    bucket) so empty buckets can't produce ±inf, and the
    (pB−pA)·ln(pB/pA) terms are decimal-cast before the sum.

    Scale: one scan, one small aggregate keyed by ≤6 buckets, one
    6-row window — O(buckets) state; at 100 TB the same query runs
    with the cohort predicate swapped for snapshot partitions.
    """
    o = T(spark, sf_dir, "orders")
    bucket = F.least(F.floor(F.col("o_totalprice") / 50000.0), F.lit(5)).cast("int")
    dist = (
        o.select(bucket.alias("bucket"), (F.col("o_orderkey") % 2 == 0).alias("in_a"))
        .groupBy("bucket")
        .agg(
            F.count_if("in_a").alias("c_a"),
            F.count_if(~F.col("in_a")).alias("c_b"),
        )
    )
    wall = Window.partitionBy()
    terms = dist.select(
        "bucket",
        ((F.col("c_a") + 0.5) / (F.sum("c_a").over(wall) + 3.0)).alias("p_a"),
        ((F.col("c_b") + 0.5) / (F.sum("c_b").over(wall) + 3.0)).alias("p_b"),
    )
    return terms.agg(
        F.count("*").alias("n_buckets"),
        F.round(
            F.sum(
                ((F.col("p_b") - F.col("p_a")) * F.log(F.col("p_b") / F.col("p_a")))
                .cast("decimal(28,12)")
            ),
            6,
        )
        .cast("double")
        .alias("psi"),
    )


@query(
    "dq_luhn_checksum",
    oracle="""
    WITH nums AS (
      SELECT c_custkey,
             lpad(CAST(c_custkey * 7919 % 100000000 AS VARCHAR), 8, '0')
               || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0') AS digits
      FROM customer
    ), expanded AS (
      SELECT c_custkey, digits,
             CAST(substr(reverse(digits), i.i + 1, 1) AS INTEGER) AS d,
             i.i % 2 = 1 AS doubled
      FROM nums CROSS JOIN (SELECT CAST(range AS INTEGER) AS i FROM range(0, 12)) i
    ), summed AS (
      SELECT c_custkey, digits,
             sum(CASE WHEN doubled THEN
                   CASE WHEN d * 2 > 9 THEN d * 2 - 9 ELSE d * 2 END
                 ELSE d END) AS luhn_sum
      FROM expanded GROUP BY c_custkey, digits
    )
    SELECT c_custkey, digits,
           CAST(luhn_sum AS BIGINT) AS luhn_sum,
           luhn_sum % 10 = 0 AS luhn_valid
    FROM summed
    """,
    tags=("dq", "checksum"),
)
def dq_luhn_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Luhn (mod-10) checksum validation — the DQ gate for card/IMEI/
    account identifiers: 12-digit synthetic account numbers derive
    deterministically from custkey, then the classic
    double-every-second-digit-from-the-right sum decides validity.
    Pure integer arithmetic over an exploded digit table — both
    engines agree digit for digit.

    Scale: 12× row fan-out inside the scan stage (explode), one
    grouped sum keyed by customer — linear, and in production the
    digit loop folds into a single codegen expression (the exploded
    form here keeps the oracle trivially parallel).
    """
    c = T(spark, sf_dir, "customer")
    digits = F.concat(
        F.lpad((F.col("c_custkey") * 7919 % 100000000).cast("string"), 8, "0"),
        F.lpad((F.col("c_custkey") % 10000).cast("string"), 4, "0"),
    )
    nums = c.select("c_custkey", digits.alias("digits"))
    exp = nums.select(
        "c_custkey",
        "digits",
        F.explode(F.sequence(F.lit(0), F.lit(11))).alias("i"),
    ).select(
        "c_custkey",
        "digits",
        F.substring(F.reverse("digits"), F.col("i") + 1, 1).cast("int").alias("d"),
        (F.col("i") % 2 == 1).alias("doubled"),
    )
    summed = exp.groupBy("c_custkey", "digits").agg(
        F.sum(
            F.when(
                F.col("doubled"),
                F.when(F.col("d") * 2 > 9, F.col("d") * 2 - 9).otherwise(F.col("d") * 2),
            ).otherwise(F.col("d"))
        ).alias("luhn_sum")
    )
    return summed.select(
        "c_custkey",
        "digits",
        F.col("luhn_sum").cast("bigint").alias("luhn_sum"),
        (F.col("luhn_sum") % 10 == 0).alias("luhn_valid"),
    )
