"""Deduplication operators over ``documents`` (driver-mandated LLM-pipeline
surface; the reference has no dedup of any kind — SURVEY.md §2.B).

All four near-dup families are implemented with deterministic, oracle-
checkable hashing (md5 of seeded strings) so every query here gets a full
DuckDB hash-match, not a rows-only check:

- exact:       md5(text) group-dedup                      -> dedup_exact
- MinHash+LSH: shingle -> 16 md5-seeded min-hashes -> 4 bands of 4 ->
               band-bucket self-join                      -> dedup_minhash_lsh
- SimHash:     60-bit signature from per-token md5 bits (four 15-bit
               pigeonhole bands), hamming<=threshold pairs via
               bit_count(xor)                             -> dedup_simhash
- n-gram Jaccard: 3-token shingle sets, pair similarity via shingle-join
               (only pairs sharing >=1 shingle are ever materialized)
                                                          -> dedup_ngram_jaccard

Scale notes (100 TB):
- Exact dedup is a single hash-shuffle on a 16-byte digest — the canonical
  approach at any scale (map-side partial dedup via partial aggregation).
- MinHash LSH: cost is O(docs x perms) for signatures (one explode, one
  groupBy) and the candidate join touches only band-bucket collisions —
  never the full pair matrix. Band buckets are short strings -> cheap
  shuffle keys; hot buckets (boilerplate docs) are the skew case, handled
  by AQE skew-join splitting.
- n-gram Jaccard joins on shingle then aggregates per pair; worst case is a
  hot shingle (stopword trigram) — ``dedup_ngram_jaccard(max_doc_freq=K)``
  drops shingles appearing in more than K documents BEFORE the self-join,
  bounding per-key fan-out to O(K^2). The registered oracle query runs
  uncapped so its semantics stay plain Jaccard; production runs set K.
- SimHash pair search uses pigeonhole band blocking (hamming <= 3 over four
  15-bit bands => one band matches exactly): candidates come from an
  equi-join on band buckets, never the O(n^2) cross product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from n5_dask_spark.catalog import load_tables, widen
from n5_dask_spark.registry import register

# Tokenization shared by every text operator: ASCII-lowercase, collapse
# whitespace, split on single spaces. BOTH normalization steps are spelled
# out engine-portably:
# - The whitespace class is explicit because '\s' is not portable: Java
#   regex \s matches vertical tab (\x0B) but DuckDB's RE2 \s does not, so
#   documents containing \x0B would tokenize differently and fail every
#   downstream shingle/minhash/simhash oracle hash. Both classes below
#   reach their regex engine as [ \t\n\x0B\f\r] (= Java's \s); the Python
#   spellings differ because Spark SQL string literals consume one level
#   of backslash while DuckDB passes them to RE2 verbatim.
# - Lowercasing is ASCII-ONLY via translate (identical on both engines)
#   rather than lower(): Java's toLowerCase is context/locale-sensitive
#   where utf8proc is not — 'İ' (U+0130) lowers to 'i'+combining-dot on
#   the JVM but plain 'i' in DuckDB, and a word-final 'Σ' becomes 'ς' on
#   the JVM but 'σ' in DuckDB — so lower() diverges the engines on
#   non-ASCII text (differential fuzzing found 40/300 random-unicode
#   probes differing). translate leaves non-ASCII untouched on BOTH
#   engines: case-folding is deliberately ASCII-scoped, a documented
#   normalization choice that keeps tokenization engine-exact on ANY
#   input (the driver corpus itself is pure ASCII, so driver hashes are
#   unchanged).
_SPARK_WS = "[ \\\\t\\\\n\\\\x0B\\\\f\\\\r]"
_DUCK_WS = "[ \\t\\n\\x0B\\f\\r]"
_UPPER = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_LOWER = "abcdefghijklmnopqrstuvwxyz"


def spark_tokens_over(col: str) -> str:
    """Spark token-array expression over an arbitrary string expression."""
    lowered = f"translate({col}, '{_UPPER}', '{_LOWER}')"
    return f"split(regexp_replace({lowered}, '{_SPARK_WS}+', ' '), ' ')"


def duck_tokens_over(col: str) -> str:
    """DuckDB token-list expression over an arbitrary string expression."""
    lowered = f"translate({col}, '{_UPPER}', '{_LOWER}')"
    return f"string_split(regexp_replace({lowered}, '{_DUCK_WS}+', ' ', 'g'), ' ')"


def nul_escape(col: str) -> str:
    """Bijective NUL-byte escape, identical SQL on both engines: ESC=chr(1)
    doubles itself, NUL becomes ESC+chr(2). Identity on any string free of
    \\x00/\\x01 (the whole driver corpus), output always NUL-free.

    Why it exists: DuckDB v1.0.0's SORT comparator (ORDER BY / rank /
    list_sort — its sort keys are NUL-terminated) treats a string and its
    NUL-extension as EQUAL ('x' ties 'x\\x00', order falls to input order)
    while its scalar '<' and Spark everywhere compare full bytes — so any
    sort/rank whose key can carry an embedded NUL silently diverges between
    the engines. Sorting/ranking an ESCAPED key (chr(1)-chr(2) never tie)
    makes the lane unreachable; injectivity keeps distinct keys distinct.
    Probe-pinned in tests/test_oracle_parity.py."""
    return f"replace(replace({col}, chr(1), chr(1) || chr(1)), chr(0), chr(1) || chr(2))"


SPARK_TOKENS = spark_tokens_over("text")
DUCK_TOKENS = duck_tokens_over("text")

# Token COUNT without materializing the token array: split-after-collapse
# yields exactly (#whitespace runs + 1) tokens for ANY input — each run
# becomes one single-space separator, and split counts separators + 1
# (empty string: 0 runs -> 1 token = [''], same as size(split(...))).
# Counting the runs directly skips building both the collapsed string and
# the array, and case folding can't change a count, so the translate()
# drops out too. Used wherever only size(SPARK_TOKENS) was needed.
SPARK_N_TOKENS = f"(regexp_count(text, '{_SPARK_WS}+') + 1)"

# 3-token shingle expression over a `toks` column — ONE definition shared by
# _spark_shingles and dedup_minhash_lsh so the two can never drift.
SPARK_SHINGLE_EXPR = (
    "CASE WHEN size(toks) >= 3 THEN"
    " transform(sequence(0, size(toks) - 3),"
    " i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))"
    " ELSE array() END"
)

N_PERM = 16  # minhash permutations
N_BANDS = 4  # LSH bands (4 rows per band)


@register(
    "dedup_exact",
    oracle="""
    SELECT md5(text) AS content_hash,
           MIN(doc_id) AS keeper_doc_id,
           COUNT(*) AS n_copies
    FROM documents
    GROUP BY md5(text)
    ORDER BY content_hash
    """,
    doc="Exact content dedup: md5 group, keep lowest doc_id.",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("documents",))
    return (
        t["documents"]
        .groupBy(F.md5("text").alias("content_hash"))
        .agg(F.min("doc_id").alias("keeper_doc_id"), F.count(F.lit(1)).alias("n_copies"))
        .orderBy("content_hash")
    )


@register(
    "dedup_subset_key",
    oracle="""
    SELECT lang, source, MIN(doc_id) AS keeper_doc_id, COUNT(*) AS n_docs
    FROM documents
    GROUP BY lang, source
    ORDER BY lang, source
    """,
    doc="Key-subset dedup (dropDuplicates-by-columns semantics, deterministic keeper).",
)
def dedup_subset_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("documents",))
    return (
        t["documents"]
        .groupBy("lang", "source")
        .agg(F.min("doc_id").alias("keeper_doc_id"), F.count(F.lit(1)).alias("n_docs"))
        .orderBy("lang", "source")
    )


def _spark_shingles(df: DataFrame) -> DataFrame:
    """doc_id + exploded distinct 3-token shingles.

    Widens FIRST: local testdata arrives as one parquet split, and
    tokenization/shingling is CPU-heavy per row. Catalyst pushes derived
    filters below later repartitions, so the fan-out must happen before
    any expensive projection. ``widen`` is conditional — at scale the scan
    is already wide and no shuffle is added.
    """
    return (
        widen(df)
        .select(
            "doc_id",
            F.expr(SPARK_TOKENS).alias("toks"),
        )
        .select(
            "doc_id",
            F.array_distinct(
                F.expr(SPARK_SHINGLE_EXPR)
            ).alias("shingles"),
        )
        # explode_OUTER + null filter: plain explode adds an implicit
        # size(shingles)>0 filter that Catalyst pushes below the repartition,
        # re-evaluating the whole tokenize/shingle expression serially.
        .select("doc_id", F.explode_outer("shingles").alias("shingle"))
        .filter(F.col("shingle").isNotNull())
    )


# The flat/LEAD form instead of the obvious lateral
# `FROM toks, UNNEST(range(1, len(w)-1)) AS t(i) ... w[i]`: the lateral
# cross join duplicates the WHOLE token list for every generated row, so a
# single 24k-token document costs O(n^2) string copies — the long-document
# net measured >15 s per oracle on one such doc vs 0.15 s for this form
# (identical shingle sets, probe-verified). unnest+generate_subscripts zip
# linearly, and LEAD over (doc_id, position) rebuilds the 3-gram without
# ever re-touching the list.
# The window partitions on a PER-ROW id (rid), not doc_id: shingling is
# row-scoped like the Spark side (and the old lateral) — on a corpus with
# DUPLICATE doc_ids, partitioning by doc_id would interleave the two rows'
# token positions (ORDER BY i ties across rows) and synthesize shingles
# spanning texts, order-nondeterministically (duplicate-PK probe find).
# With unique doc_ids rid<->doc_id is 1:1 and the forms are identical.
DUCK_SHINGLES = f"""
    WITH toks AS (
      SELECT doc_id, ROW_NUMBER() OVER () AS rid, {DUCK_TOKENS} AS w FROM documents
    ), flat AS (
      SELECT doc_id, rid, unnest(w) AS tok, generate_subscripts(w, 1) AS i FROM toks
    ), sh0 AS (
      SELECT doc_id,
             tok || ' ' || LEAD(tok, 1) OVER (PARTITION BY rid ORDER BY i)
                 || ' ' || LEAD(tok, 2) OVER (PARTITION BY rid ORDER BY i) AS shingle
      FROM flat
    ), sh AS (
      SELECT DISTINCT doc_id, shingle FROM sh0 WHERE shingle IS NOT NULL
    )
"""


# The complete MinHash-LSH candidate-pair SELECT (no trailing ORDER BY).
# Exported because THREE oracles need the same pair graph: this query's,
# and the two connected-components clusterers (graph.py, relational2.py) —
# composing from one string keeps them from drifting when the
# tokenization, N_PERM or N_BANDS change.
DUCK_MINHASH_PAIRS = (
    DUCK_SHINGLES
    + f"""
    , hashes AS (
      SELECT doc_id, p, MIN(md5(CAST(p AS VARCHAR) || '|' || shingle)) AS minh
      FROM sh, UNNEST(range(0, {N_PERM})) AS perms(p)
      GROUP BY doc_id, p
    ), bands AS (
      SELECT doc_id, CAST(p // {N_PERM // N_BANDS} AS INT) AS band,
             STRING_AGG(minh, ',' ORDER BY p) AS band_sig
      FROM hashes GROUP BY doc_id, band
    )
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b ON a.band = b.band AND a.band_sig = b.band_sig
    WHERE a.doc_id < b.doc_id
    """
)


def minhash_per_band(documents: DataFrame) -> DataFrame:
    """documents -> one (doc_id, band, band_sig) row per non-empty band.

    Whole BAND signature computed columnar inside ONE projection chain
    (higher-order functions, JVM-side): no per-(shingle, perm) explode, no
    per-permutation shuffle. The only rows that ever shuffle downstream are
    1 per (doc, band) — doc_id + band_sig. Shared by the registered query
    and the documents-scale stress leg (tools/stress.py) so the stressed
    stage IS the graded stage, not a re-expression of it."""
    r = N_PERM // N_BANDS
    docs = (
        # repartition BEFORE the heavy projections: the single-file input
        # otherwise serializes tokenize/shingle/md5 onto one core (and pushed
        # filters would run below a later repartition anyway).
        widen(documents)
        .select("doc_id", F.expr(SPARK_TOKENS).alias("toks"))
        .select(
            "doc_id",
            F.array_distinct(
                F.expr(SPARK_SHINGLE_EXPR)
            ).alias("shingles"),
        )
    )
    # bands[b] = ','-join of the r min-hashes of band b, in permutation
    # order (matches the oracle's STRING_AGG ... ORDER BY p). NULL (not '')
    # when the doc has no shingles, so empty docs never share a bucket.
    bands_df = docs.select(
        "doc_id",
        F.expr(
            f"transform(sequence(0, {N_BANDS - 1}), b ->"
            " CASE WHEN size(shingles) = 0 THEN NULL ELSE"
            f" array_join(transform(sequence(b * {r}, b * {r} + {r - 1}),"
            " p -> array_min(transform(shingles,"
            " s -> md5(concat(CAST(p AS STRING), '|', s))))), ',') END)"
        ).alias("bands"),
    )
    # posexplode_OUTER on purpose: plain explode adds an implicit
    # `size(bands) > 0` filter that Catalyst pushes below the repartition
    # exchange, inlining (= re-evaluating) the whole md5 signature into a
    # single-task pre-shuffle stage. outer explode generates no such filter,
    # so the signature is computed exactly once, post-repartition.
    return bands_df.select(
        "doc_id", F.posexplode_outer("bands").alias("band", "band_sig")
    ).filter(F.col("band_sig").isNotNull())


def minhash_candidate_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct (doc_a, doc_b) MinHash-LSH candidate pairs, UNSORTED.

    r14 optimization (guide §2.4): the registered query's trailing
    orderBy adds a range-partitioning exchange — and range partitioning
    runs its own row-sampling pass first — that the connected-components
    consumers (graph.py, relational2.py) immediately destroy with their
    own shuffles. They consume this helper; the registered query below is
    exactly this plus the presentation sort, so its declared output is
    byte-identical."""
    t = load_tables(spark, sf_dir, ("documents",))
    per_band = minhash_per_band(t["documents"])
    # Bucket groupBy + in-bucket pair expansion instead of a bands⋈bands
    # self-join: ONE shuffle on (band, band_sig), signature subtree planned
    # once (a self-join re-reads — and without exchange reuse, re-computes —
    # it on both sides). Pair fan-out is O(K²) in the bucket size, same as
    # any LSH candidate generation; buckets are bounded by near-dup cluster
    # size, and AQE skew-split handles hot buckets' shuffle side. For
    # degenerate mega-clusters, run dedup_exact first or cluster via
    # dedup_connected_clusters on representative edges.
    buckets = (
        per_band.groupBy("band", "band_sig")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("docs"))
        .filter(F.size("docs") >= 2)
    )
    pairs = buckets.select(
        F.explode(
            F.expr(
                "flatten(transform(docs, (x, i) ->"
                " transform(slice(docs, i + 2, size(docs)),"
                " y -> named_struct('doc_a', x, 'doc_b', y))))"
            )
        ).alias("pair")
    )
    return pairs.select("pair.doc_a", "pair.doc_b").distinct()


@register(
    "dedup_minhash_lsh",
    oracle=DUCK_MINHASH_PAIRS + " ORDER BY doc_a, doc_b",
    doc=(
        "MinHash LSH near-dup candidates: 16 md5-seeded min-hashes, 4 bands "
        "of 4 rows; pairs sharing any full band signature. Deterministic "
        "(md5) so oracle-checkable."
    ),
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash_candidate_pairs(spark, sf_dir).orderBy("doc_a", "doc_b")


SIMHASH_BITS = 60  # < 63 so the bit-weighted sum can't overflow BIGINT
SIMHASH_MAX_HAMMING = 3

# Worker-lifetime token->bit-row memo for _simhash_signatures (r15, guide
# §4.5): lives at module level so a reused Python worker keeps it across
# Arrow batches and tasks. Capped; cleared outright when full (see the
# kernel docstring for why clear-all is safe and sufficient).
_SIMHASH_BIT_ROWS: dict = {}
_SIMHASH_MEMO_CAP = 1 << 16  # ~64k tokens x ~250 B/entry ~= 16 MB ceiling

# Per-token bit b (b in 0..59): nibble b//2 of md5(tok), bit b%2 of that
# nibble. Signature bit = sign of the +-1 vote sum over distinct tokens.
# Spark side computes this in ONE Arrow-batched pandas pass (below); the
# previous pure-SQL formulation needed a repartition barrier between the
# per-token md5 projection and the 60-bit vote expression purely to stop
# CollapseProject inlining the md5 transform once per bit — a data-scale
# exchange of (doc_id, 32-hex-per-token arrays) that the fused pass deletes.
def _simhash_signatures(toks):
    """Arrow series of distinct-token arrays -> int64 SimHash signatures
    (pd.Series in, pd.Series out; unannotated on purpose — pandas stays a
    lazy import here, and pandas_udf falls back to SERIES->SERIES).

    Bit-exact with the oracle's nibble scheme: hexdigest char b//2 is the
    high (b even: bit 0) / low (b odd: bit 1) vote source, because
    ``'%02x'`` renders the high nibble of digest byte k at hex index 2k.
    Vectorized per document: one (n_tokens x 60) bit matrix, vote sum =
    2*ones - n, signature = sum of weights where votes > 0. An empty or
    null token array votes 0 everywhere -> signature 0, matching the SQL
    aggregate over an empty list.

    r14 optimization (guide §4.2): token digests are memoized — corpus
    vocabulary is Zipfian, so the same stopword tokens recur across most
    documents, and the md5 calls (the kernel's dominant cost) collapse
    from O(total tokens) to O(distinct tokens seen). Per-token bit rows
    are cached and stacked per doc; the vote/weight arithmetic is
    unchanged, so signatures are identical.

    r15 (guide §4.5, VERDICT r14 item 7): the memo is a MODULE-LEVEL
    global instead of a per-call dict, so it survives across Arrow
    batches and — with the default spark.python.worker.reuse and this
    module shipped importable via addPyFile — across tasks of a reused
    worker; short batches at scale no longer rebuild the stopword rows
    per batch. Memory is bounded by _SIMHASH_MEMO_CAP distinct tokens
    (~60 B payload each); when full the memo is cleared outright — the
    Zipfian head repopulates within one document, and eviction choice
    cannot affect values (each row is a pure function of its token).
    """
    import hashlib

    import numpy as np
    import pandas as pd

    out = np.zeros(len(toks), dtype=np.int64)
    weights = np.int64(1) << np.arange(SIMHASH_BITS, dtype=np.int64)
    bit_rows = _SIMHASH_BIT_ROWS  # worker-lifetime memo (see docstring)

    def token_bits(tk: str) -> np.ndarray:
        row = bit_rows.get(tk)
        if row is None:
            dig = np.frombuffer(
                hashlib.md5(tk.encode("utf-8")).digest()[: SIMHASH_BITS // 4],
                dtype=np.uint8,
            )
            nib = np.empty(SIMHASH_BITS // 2, dtype=np.uint8)
            nib[0::2] = dig >> 4
            nib[1::2] = dig & 0x0F
            row = np.empty(SIMHASH_BITS, dtype=np.uint8)
            row[0::2] = nib & 1
            row[1::2] = (nib >> 1) & 1
            if len(bit_rows) >= _SIMHASH_MEMO_CAP:
                bit_rows.clear()
            bit_rows[tk] = row
        return row

    for i, arr in enumerate(toks):
        n = 0 if arr is None else len(arr)
        if n == 0:
            continue
        bits = np.stack([token_bits(tk) for tk in arr])
        votes = 2 * bits.sum(axis=0, dtype=np.int64) - n
        out[i] = weights[votes > 0].sum()
    return pd.Series(out)


_DUCK_SIMHASH = f"""
    list_sum(list_transform(range(0, {SIMHASH_BITS}), b ->
      CASE WHEN
        list_sum(list_transform(hexes, h ->
          CASE WHEN ((strpos('0123456789abcdef',
                             substr(h, CAST(b // 2 AS INT) + 1, 1)) - 1)
                     // (CASE WHEN b % 2 = 0 THEN 1 ELSE 2 END)) % 2 = 1
          THEN 1 ELSE -1 END)) > 0
      THEN (1::BIGINT << b) ELSE 0::BIGINT END))
"""


def simhash_bands(documents: DataFrame) -> DataFrame:
    """documents -> one (doc_id, simhash, band, bval) row per band.

    Pigeonhole blocking: with hamming <= 3 over 4 disjoint 15-bit bands, at
    least one band matches EXACTLY, so candidates come from an equi-join on
    (band index, band value) — never the full O(n^2) cross product. Shared
    by the registered query and the documents-scale stress leg
    (tools/stress.py). Scale bound worth knowing: bands are 15 bits, so
    past ~2^15 docs per corpus the buckets saturate pigeonhole-style and
    expected candidates grow ~n^2 * bands / 2^15 — at that point widen the
    signature (more bits per band), don't shard the groupBy."""
    sig_udf = F.pandas_udf(_simhash_signatures, "bigint")
    sigs = (
        widen(documents)  # narrow local scans fan out for tokenize
        .select("doc_id", F.array_distinct(F.expr(SPARK_TOKENS)).alias("toks"))
        .select("doc_id", sig_udf("toks").alias("simhash"))
    )
    n_bands = SIMHASH_MAX_HAMMING + 1
    width = SIMHASH_BITS // n_bands
    return sigs.select(
        "doc_id",
        "simhash",
        F.explode(
            F.expr(
                f"transform(sequence(0, {n_bands - 1}), b -> struct(b AS band,"
                f" (shiftright(simhash, b * {width}) % shiftleft(CAST(1 AS BIGINT), {width})) AS bval))"
            )
        ).alias("bb"),
    ).select("doc_id", "simhash", F.col("bb.band").alias("band"), F.col("bb.bval").alias("bval"))


@register(
    "dedup_simhash",
    oracle=f"""
    WITH sigs AS (
      SELECT doc_id, CAST({_DUCK_SIMHASH} AS BIGINT) AS simhash
      FROM (SELECT doc_id,
                   list_transform(list_distinct({DUCK_TOKENS}), tk -> md5(tk)) AS hexes
            FROM documents)
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
    FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= {SIMHASH_MAX_HAMMING}
    ORDER BY doc_a, doc_b
    """,
    doc=(
        "SimHash near-dup: 60-bit signature (md5-nibble bit votes over "
        "distinct tokens), pairs with hamming <= 3. Signature computed in "
        "one Arrow-batched pandas pass fused into the scan stage — no "
        "per-(token, bit) explode and no exchange before the band buckets."
    ),
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("documents",))
    # The exact hamming filter below prunes the band-bucket candidates;
    # results are provably identical to the brute-force pair join the
    # oracle computes.
    bands = simhash_bands(t["documents"])
    # Bucket groupBy + in-bucket pair expansion, same pattern as
    # dedup_minhash_lsh and for the same reason: a bands⋈bands self-join
    # re-reads — and without exchange reuse, RE-COMPUTES — the expensive
    # 60-bit signature aggregate on both sides. One shuffle on (band, bval);
    # array_sort on the struct orders by doc_id, so x < y within a bucket.
    buckets = (
        bands.groupBy("band", "bval")
        .agg(F.array_sort(F.collect_list(F.struct("doc_id", "simhash"))).alias("members"))
        .filter(F.size("members") >= 2)
    )
    pairs = buckets.select(
        F.explode(
            F.expr(
                "flatten(transform(members, (x, i) ->"
                " transform(slice(members, i + 2, size(members)),"
                " y -> named_struct('doc_a', x.doc_id, 'sig_a', x.simhash,"
                " 'doc_b', y.doc_id, 'sig_b', y.simhash))))"
            )
        ).alias("p")
    )
    return (
        pairs.select(
            F.col("p.doc_a").alias("doc_a"),
            F.col("p.doc_b").alias("doc_b"),
            F.bit_count(F.col("p.sig_a").bitwiseXOR(F.col("p.sig_b"))).cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= SIMHASH_MAX_HAMMING)
        .distinct()  # a pair may share several bands
        .orderBy("doc_a", "doc_b")
    )


@register(
    "dedup_ngram_jaccard",
    oracle=DUCK_SHINGLES
    + """
    , sizes AS (
      SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b,
           ROUND(CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) >= 0.12
    ORDER BY doc_a, doc_b
    """,
    doc=(
        "n-gram (3-token shingle) Jaccard similarity >= 0.12; intersection "
        "via shingle self-join so only colliding pairs materialize."
    ),
)
def dedup_ngram_jaccard(
    spark: SparkSession, sf_dir: str, max_doc_freq: int | None = None
) -> DataFrame:
    """``max_doc_freq``: document-frequency cap on shingles entering the
    self-join. A shingle appearing in d documents contributes O(d^2) joined
    pairs — at 100 TB one stopword trigram is a quadratic blow-up on a
    single key, so production runs cap d (pairs that ONLY share ultra-common
    shingles are noise anyway; Jaccard is then a slight underestimate, the
    standard near-dup trade). ``None`` keeps exact Jaccard for the oracle-
    gated query. Set-size denominators always use the UNCAPPED sets so the
    capped variant only loses intersection mass, never inflates it."""
    t = load_tables(spark, sf_dir, ("documents",))
    sh = _spark_shingles(t["documents"])
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    joinable = sh
    if max_doc_freq is not None:
        rare = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df_count"))
            .filter(F.col("df_count") <= max_doc_freq)
            .select("shingle")
        )
        # shuffle equi-join on shingle: both sides already hash-partition on
        # the same key for the groupBy, so no extra exchange materializes
        joinable = sh.join(rare, "shingle")
    a = joinable.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = joinable.select(F.col("doc_id").alias("doc_b"), F.col("shingle").alias("shingle_b"))
    inter = (
        a.join(b, (F.col("shingle") == F.col("shingle_b")) & (F.col("doc_a") < F.col("doc_b")))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    # no broadcast hint: sizes is one row per DOCUMENT (fact-derived) — AQE
    # broadcasts it when small, shuffles when the corpus is 100 TB
    sa = sizes.select(F.col("doc_id").alias("da"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("db"), F.col("n").alias("nb"))
    jac = F.col("n_common").cast("double") / (F.col("na") + F.col("nb") - F.col("n_common"))
    return (
        inter.join(sa, F.col("doc_a") == F.col("da"))
        .join(sb, F.col("doc_b") == F.col("db"))
        .filter(jac >= 0.12)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
        .orderBy("doc_a", "doc_b")
    )
