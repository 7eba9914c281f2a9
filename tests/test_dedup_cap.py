"""Document-frequency cap on the n-gram Jaccard shingle join.

At 100 TB a shingle appearing in d documents fans the self-join out to
O(d^2) pairs on one shuffle key; ``max_doc_freq`` must prune such shingles
BEFORE the join. These tests build a synthetic corpus with one deliberately
hot shingle and assert the cap (a) bounds the candidate-pair count and
(b) never inflates similarity (capped jaccard <= uncapped jaccard).
"""

from __future__ import annotations

import pandas as pd
import pytest


HOT = "zz yy xx"  # one trigram shared by EVERY doc -> df = n_docs


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    """documents.parquet where all 12 docs share the HOT trigram but only
    docs 0/1 share any substantial real content."""
    d = tmp_path_factory.mktemp("capcorpus")
    rows = []
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    for i in range(12):
        if i in (0, 1):
            text = f"{base} {HOT}"  # near-duplicate pair
        else:
            uniq = " ".join(f"tok{i}w{j}" for j in range(10))
            text = f"{uniq} {HOT}"
        rows.append((i, text, "en", f"src{i}", len(text)))
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source", "n_chars"])
    pdf.to_parquet(d / "documents.parquet", index=False)
    return str(d)


def _pairs(df):
    return {(r.doc_a, r.doc_b): r.jaccard for r in df.collect()}


def test_uncapped_join_sees_hot_shingle_pairs(spark, corpus_dir):
    from n5_dask_spark.operators.dedup import dedup_ngram_jaccard

    # every doc pair shares HOT, so the join materializes all C(12,2)=66
    # candidate pairs before the threshold filter; only (0,1) survives 0.12
    out = _pairs(dedup_ngram_jaccard(spark, corpus_dir))
    assert (0, 1) in out and out[(0, 1)] > 0.8


def test_cap_prunes_hot_shingle_and_bounds_pairs(spark, corpus_dir):
    from n5_dask_spark.operators.dedup import _spark_shingles, dedup_ngram_jaccard
    from n5_dask_spark.catalog import load_tables
    from pyspark.sql import functions as F

    # cap 3 < df(HOT)=12: the hot shingle must not enter the join at all.
    # Candidate pairs (pre-threshold) are then bounded by sum over surviving
    # shingles of C(df,2) = C(2,2 of each shared real trigram) — i.e. only
    # genuinely co-occurring content creates pairs.
    sh = _spark_shingles(load_tables(spark, corpus_dir, ("documents",))["documents"])
    hot_df = sh.filter(F.col("shingle") == HOT).count()
    assert hot_df == 12

    out = _pairs(dedup_ngram_jaccard(spark, corpus_dir, max_doc_freq=3))
    assert (0, 1) in out  # the real near-dup pair survives the cap
    assert set(out) == {(0, 1)}  # hot-shingle-only pairs never materialize


def test_cap_never_inflates_similarity(spark, corpus_dir):
    from n5_dask_spark.operators.dedup import dedup_ngram_jaccard

    uncapped = _pairs(dedup_ngram_jaccard(spark, corpus_dir))
    capped = _pairs(dedup_ngram_jaccard(spark, corpus_dir, max_doc_freq=3))
    assert set(capped) <= set(uncapped)
    for pair, jac in capped.items():
        assert jac <= uncapped[pair] + 1e-9


def test_tuned_session_enables_aqe_skew_handling(spark):
    """Conf gate for the scale claims in dedup.py's docstrings: the LSH
    bucket shuffle and the shingle join lean on AQE skew splitting, so the
    tuned session (and tune_session on a driver-owned session) must keep
    adaptive execution + skew-join splitting on."""
    from n5_dask_spark.session import tune_session

    tune_session(spark)
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled") == "true"


@pytest.fixture(scope="module")
def boilerplate_dir(tmp_path_factory):
    """1000 byte-identical boilerplate docs (one mega-cluster) plus 5
    distinct docs: the degenerate hot-bucket shape dedup.py's docstring
    promises survives — every duplicate lands in the SAME (band, band_sig)
    bucket in all 4 bands."""
    d = tmp_path_factory.mktemp("hotbucket")
    boiler = "terms of service apply to all content on this page please read carefully"
    rows = [(i, boiler, "en", "tpl", len(boiler)) for i in range(1000)]
    for i in range(1000, 1005):
        text = " ".join(f"unique{i}tok{j}" for j in range(12))
        rows.append((i, text, "en", f"src{i}", len(text)))
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source", "n_chars"])
    pdf.to_parquet(d / "documents.parquet", index=False)
    return str(d)


def test_minhash_lsh_survives_hot_bucket(spark, boilerplate_dir):
    """One doc duplicated 1000x is the worst LSH case: a single bucket of
    1000 docs whose in-bucket expansion emits C(1000,2) = 499500 pairs per
    band. The bucket-groupBy + columnar pair expansion must complete it in
    bounded time (no per-pair shuffle, no self-join re-computation) and emit
    exactly the mega-cluster's pairs — the documented escape hatch for even
    bigger clusters is dedup_exact first, not this path silently dying."""
    import itertools
    import time

    from n5_dask_spark.operators.dedup import dedup_minhash_lsh

    t0 = time.monotonic()
    out = dedup_minhash_lsh(spark, boilerplate_dir)
    n_pairs = out.count()
    elapsed = time.monotonic() - t0
    assert n_pairs == len(list(itertools.combinations(range(1000), 2)))  # 499500
    # sanity ceiling: ~2M exploded rows through one distinct on local[8];
    # an accidental self-join or per-pair shuffle blows far past this
    assert elapsed < 120, f"hot-bucket LSH took {elapsed:.1f}s"
    # the distinct docs must not pair with the mega-cluster or each other
    cross = out.filter("doc_a >= 1000 OR doc_b >= 1000").count()
    assert cross == 0


def test_tokenizer_whitespace_class_matches_across_engines(spark):
    """Regression: Java \\s matches vertical tab, RE2's does not — the
    shared tokenization now spells the class explicitly on both engines.
    Probe strings cover \\x0B, runs of mixed whitespace, and the letters
    x/0/B (which a mis-escaped class would treat as whitespace)."""
    import duckdb

    from n5_dask_spark.operators.dedup import DUCK_TOKENS, SPARK_TOKENS

    probes = [
        "a" + chr(11) + "b  c",
        "box 0 Bob",
        "tab\there\nand\r more",
        "",
        "  edge  ",
    ]
    sdf = spark.createDataFrame([(p,) for p in probes], "text string")
    spark_toks = [r["t"] for r in sdf.selectExpr(SPARK_TOKENS + " AS t").collect()]
    con = duckdb.connect()
    duck_toks = [
        con.execute(f"SELECT {DUCK_TOKENS} FROM (SELECT ? AS text)", [p]).fetchone()[0]
        for p in probes
    ]
    assert spark_toks == duck_toks
    assert spark_toks[0] == ["a", "b", "c"]
    assert spark_toks[1] == ["box", "0", "bob"]


def test_tokenization_engine_parity_on_random_unicode(spark):
    """Differential fuzz of the shared tokenizer: on random printable +
    non-ASCII probes (Turkish dotted I, Greek sigma, ligatures, CJK, RTL,
    math alphanumerics, exotic spaces) Spark and DuckDB must tokenize
    IDENTICALLY. With lower() this failed 40/300 probes — Java's
    toLowerCase is context/locale-sensitive ('İ' -> 'i'+combining dot,
    word-final 'Σ' -> 'ς') where utf8proc is not; ASCII-scoped translate
    lowering is engine-exact by construction, and this test keeps it so."""
    import random
    import string

    import duckdb

    from n5_dask_spark.operators.dedup import DUCK_TOKENS, SPARK_TOKENS

    rng = random.Random(7)
    pool = string.printable + "ÀÉÎÕÜßàéîõü İıΣσς Ǆǅǆ 中文 אבג ٦٧ 𝔘𝔫   ​"
    probes = ["".join(rng.choice(pool) for _ in range(rng.randrange(0, 40))) for _ in range(300)]
    sdf = spark.createDataFrame([(p,) for p in probes], "text string")
    spark_toks = [r["t"] for r in sdf.selectExpr(SPARK_TOKENS + " AS t").collect()]
    con = duckdb.connect()
    for p, st in zip(probes, spark_toks):
        dt = con.execute(f"SELECT {DUCK_TOKENS} FROM (SELECT ? AS text)", [p]).fetchone()[0]
        assert st == dt, (repr(p), st, dt)


def test_token_count_shortcut_equals_materialized_split(spark):
    """SPARK_N_TOKENS (whitespace-run count + 1, no collapsed string and no
    token array) must equal size(SPARK_TOKENS) on ANY input — split after
    run-collapse yields exactly one separator per run, so counts agree on
    empty strings, pure-whitespace strings, and leading/trailing runs. The
    cheap form feeds packing/clean-corpus/bpe; this pins the equivalence."""
    import random
    import string

    from n5_dask_spark.operators.dedup import SPARK_N_TOKENS, SPARK_TOKENS

    rng = random.Random(9)
    pool = string.printable + "中𝔘 ß\t\n\x0b\f\r"
    probes = ["", " ", "  \t\n ", "a", " a ", "\ta\nb\r"] + [
        "".join(rng.choice(pool) for _ in range(rng.randrange(0, 40))) for _ in range(300)
    ]
    sdf = spark.createDataFrame([(p,) for p in probes], "text string")
    rows = sdf.selectExpr(
        f"size({SPARK_TOKENS}) AS via_split", f"{SPARK_N_TOKENS} AS via_count"
    ).collect()
    for p, r in zip(probes, rows):
        assert r["via_split"] == r["via_count"], repr(p)


def test_simhash_signature_engine_parity_on_random_unicode():
    """Differential fuzz of the fused Python SimHash signature against the
    DuckDB vote expression (the oracle's source of truth): on random
    unicode token arrays — including empty strings, non-ASCII and empty
    arrays — the Arrow-side ``_simhash_signatures`` must reproduce the
    SQL nibble/vote scheme bit-for-bit. This is the cross-engine contract
    the r7 rewrite moved from a shared SQL string into Python."""
    import random
    import string

    import duckdb
    import pandas as pd

    from n5_dask_spark.operators.dedup import _DUCK_SIMHASH, _simhash_signatures

    rng = random.Random(13)
    pool = string.printable + "ÀßΣσς中文אבג٦"
    arrays = [
        list(
            dict.fromkeys(  # distinct, order-preserving (votes are order-free)
                "".join(rng.choice(pool) for _ in range(rng.randrange(0, 12)))
                for _ in range(rng.randrange(0, 25))
            )
        )
        for _ in range(200)
    ] + [[], [""]]
    got = _simhash_signatures(pd.Series(arrays)).tolist()
    con = duckdb.connect()
    sql = f"SELECT CAST({_DUCK_SIMHASH} AS BIGINT) FROM (SELECT list_transform(?, tk -> md5(tk)) AS hexes)"
    for arr, g in zip(arrays, got):
        want = con.execute(sql, [arr]).fetchone()[0]
        assert g == (want or 0), (arr, g, want)


def test_regex_operators_engine_parity_on_random_unicode(spark):
    """Same differential-fuzz contract for the other shared regex pairs:
    the BPE pre-tokenizer count and the PII scrub replacement must agree
    across Java regex and RE2 on random unicode (their character classes
    are deliberately ASCII-explicit, so non-ASCII runs behave identically
    — this keeps them that way)."""
    import random
    import string

    import duckdb

    from pyspark.sql import functions as F

    from n5_dask_spark.operators.text2 import BPE_PATTERN

    rng = random.Random(11)
    pool = string.printable + "ÀÉßΣσ 中文 𝔘𝔫 don't it's we're ١٢٣  ​"
    probes = ["".join(rng.choice(pool) for _ in range(rng.randrange(0, 60))) for _ in range(300)]
    sdf = spark.createDataFrame([(p,) for p in probes], "text string")
    con = duckdb.connect()

    s_counts = [
        r["n"]
        for r in sdf.select(
            F.size(F.regexp_extract_all("text", F.lit(BPE_PATTERN), 0)).alias("n")
        ).collect()
    ]
    d_pat = BPE_PATTERN.replace("'", "''")
    for p, sc in zip(probes, s_counts):
        dc = con.execute(
            f"SELECT len(regexp_extract_all(text, '{d_pat}')) FROM (SELECT ? AS text)", [p]
        ).fetchone()[0]
        assert sc == dc, (repr(p), sc, dc)

    s_hashes = [
        r["h"]
        for r in sdf.select(
            F.md5(
                F.regexp_replace(
                    F.regexp_replace("text", "[a-zA-Z0-9._]+@[a-zA-Z0-9.]+", "<EMAIL>"),
                    "[0-9]{3}[- ][0-9]{4}",
                    "<PHONE>",
                )
            ).alias("h")
        ).collect()
    ]
    for p, sh in zip(probes, s_hashes):
        dh = con.execute(
            "SELECT md5(regexp_replace(regexp_replace(text,"
            " '[a-zA-Z0-9._]+@[a-zA-Z0-9.]+', '<EMAIL>', 'g'),"
            " '[0-9]{3}[- ][0-9]{4}', '<PHONE>', 'g')) FROM (SELECT ? AS text)",
            [p],
        ).fetchone()[0]
        assert sh == dh, repr(p)


def test_levenshtein_ascii_parity_and_documented_unicode_boundary(spark):
    """Spark's levenshtein counts CODEPOINTS; DuckDB's counts UTF-8 BYTES
    (differential fuzzing: 136/300 random probes with non-ASCII diverged).
    The engines agree exactly on ASCII — which is what
    fuzzy_match_levenshtein's p_name data is — so this pins the ASCII
    parity AND the known unicode boundary so neither silently moves."""
    import random
    import string

    import duckdb

    from pyspark.sql import functions as F

    rng = random.Random(13)
    pairs = [
        (
            "".join(rng.choice(string.printable) for _ in range(rng.randrange(0, 15))),
            "".join(rng.choice(string.printable) for _ in range(rng.randrange(0, 15))),
        )
        for _ in range(300)
    ]
    sdf = spark.createDataFrame(pairs, "a string, b string")
    got = [r["d"] for r in sdf.select(F.levenshtein("a", "b").alias("d")).collect()]
    con = duckdb.connect()
    for (a, b), sd in zip(pairs, got):
        dd = con.execute("SELECT levenshtein(?, ?)", [a, b]).fetchone()[0]
        assert sd == dd, (repr(a), repr(b), sd, dd)
    # the documented boundary: multi-byte codepoints diverge (bytes vs
    # codepoints) — if an engine upgrade ever makes these agree, the
    # ASCII-scoped contract note in relational3.py can be dropped
    assert spark.createDataFrame([("À", "")], "a string, b string").select(
        F.levenshtein("a", "b").alias("d")
    ).collect()[0]["d"] == 1
    assert con.execute("SELECT levenshtein('À', '')").fetchone()[0] == 2


def test_string_funcs_parity_scope(spark):
    """upper(): Java maps 'ß' -> 'SS' where utf8proc gives 'ẞ' — ASCII-only
    parity (pinned below); substring() and length() are codepoint-based on
    BOTH engines and agree on arbitrary unicode (300-probe fuzz)."""
    import random
    import string

    import duckdb

    from pyspark.sql import functions as F

    rng = random.Random(17)
    pool = string.printable + "àéîßσς İı中𝔘"
    probes = ["".join(rng.choice(pool) for _ in range(rng.randrange(0, 20))) for _ in range(300)]
    sdf = spark.createDataFrame([(p,) for p in probes], "t string")
    rows = sdf.select(
        F.upper("t").alias("u"), F.substring("t", 1, 8).alias("s"), F.length("t").alias("l")
    ).collect()
    con = duckdb.connect()
    for p, r in zip(probes, rows):
        u, s, n = con.execute("SELECT UPPER(?), SUBSTRING(?,1,8), LENGTH(?)", [p, p, p]).fetchone()
        assert r["s"] == s and r["l"] == n, repr(p)  # portable on any input
        if p.isascii():
            assert r["u"] == u, repr(p)  # upper parity is ASCII-scoped
    # the documented upper() boundary
    assert sdf.sparkSession.createDataFrame([("ß",)], "t string").select(
        F.upper("t").alias("u")
    ).collect()[0]["u"] == "SS"
    assert con.execute("SELECT UPPER('ß')").fetchone()[0] == "ẞ"


def test_lsh_literal_planes_match_seed_expression(spark):
    """random_hyperplane_lsh embeds a driver-computed plane literal; its
    buckets must stay bit-identical to the original md5-seeded in-plan
    expression (which cost n_planes x dim md5s PER ROW — ~1.3e9 calls at
    5M vectors, found by the similarity stress leg timing out). Pins both
    the Python/SQL md5-scaling equivalence and repr()'s exact double
    round-trip through the SQL literal parser."""
    from pyspark.sql import functions as F

    from n5_dask_spark.catalog import load_tables
    from n5_dask_spark.operators.similarity import lsh_planes, random_hyperplane_lsh
    from tests.conftest import SF_SMALL

    new = {
        r["vec_id"]: r["bucket"]
        for r in random_hyperplane_lsh(spark, SF_SMALL).collect()
    }
    t = load_tables(spark, SF_SMALL, ("embeddings",))
    dim = t["embeddings"].select(F.size("embedding").alias("d")).first()["d"]
    n_planes = 16
    plane = F.expr(
        f"transform(sequence(0, {n_planes - 1}), p -> transform(sequence(0, {dim - 1}),"
        " d -> CAST(conv(substring(md5(concat(p, '|', d)), 1, 8), 16, 10) AS DOUBLE)"
        " / 4294967296.0 * 2.0 - 1.0))"
    )
    sig = F.expr(
        f"aggregate(sequence(0, {n_planes - 1}), CAST(0 AS BIGINT), (acc, p) -> acc + "
        "CASE WHEN aggregate(zip_with(planes[p], embedding, (w, x) -> w * CAST(x AS DOUBLE)),"
        " CAST(0.0 AS DOUBLE), (a, v) -> a + v) > 0"
        " THEN shiftleft(CAST(1 AS BIGINT), p) ELSE CAST(0 AS BIGINT) END)"
    )
    old = {
        r["vec_id"]: r["bucket"]
        for r in t["embeddings"]
        .withColumn("planes", plane)
        .select("vec_id", sig.alias("bucket"))
        .collect()
    }
    assert new and new == old
    # and the Python matrix itself reproduces one SQL-computed value
    sql_v = spark.sql(
        "SELECT CAST(conv(substring(md5('3|7'), 1, 8), 16, 10) AS DOUBLE)"
        " / 4294967296.0 * 2.0 - 1.0 AS v"
    ).first()["v"]
    assert lsh_planes(4, 8)[3][7] == sql_v


def test_round_double_repr_boundary_is_characterized(spark):
    """Documentation pin for the registry's ROUND(double) boundary note:
    Spark rounds the shortest decimal repr (BigDecimal.valueOf), DuckDB
    the binary value, so a double whose repr terminates in '...5' at
    scale s+1 while its binary value sits below the half diverges — and
    values without such a repr agree. If either engine changes behavior,
    this test localizes it before a driver hash flip does."""
    import duckdb

    from pyspark.sql import functions as F

    # -2.445 as a double is -2.44499999999999995...; repr is '-2.445'
    probes = [(-2.445, 2, -2.45, -2.44), (0.00015, 4, 0.0002, 0.0001)]
    con = duckdb.connect()
    for v, s, spark_want, duck_want in probes:
        got_s = (
            spark.createDataFrame([(v,)], "v double")
            .select(F.round("v", s).alias("r"))
            .first()["r"]
        )
        got_d = con.execute(f"SELECT round(CAST(? AS DOUBLE), {s})", [v]).fetchone()[0]
        assert got_s == spark_want and got_d == duck_want, (v, s, got_s, got_d)
    # off-boundary values agree (the overwhelmingly common case)
    import random

    rng = random.Random(19)
    vals = [rng.uniform(-1000, 1000) for _ in range(100)]
    rows = (
        spark.createDataFrame([(v,) for v in vals], "v double")
        .select(F.round("v", 6).alias("r"))
        .collect()
    )
    for v, r in zip(vals, rows):
        assert r["r"] == con.execute("SELECT round(CAST(? AS DOUBLE), 6)", [v]).fetchone()[0]


def test_simhash_memo_is_cross_call_and_capped():
    """r15 (guide §4.5): the token bit-row memo survives across kernel
    calls (worker-lifetime), stays bounded by _SIMHASH_MEMO_CAP, and its
    state can never change signature values (pure function of the token)."""
    import pandas as pd

    from n5_dask_spark.operators import dedup

    dedup._SIMHASH_BIT_ROWS.clear()
    arrays = [["alpha", "beta"], ["beta", "gamma"]]
    cold = dedup._simhash_signatures(pd.Series(arrays)).tolist()
    assert set(dedup._SIMHASH_BIT_ROWS) == {"alpha", "beta", "gamma"}
    warm = dedup._simhash_signatures(pd.Series(arrays)).tolist()  # memo hits
    assert warm == cold

    # cap: force an overflow clear, values still identical
    old_cap = dedup._SIMHASH_MEMO_CAP
    try:
        dedup._SIMHASH_MEMO_CAP = 2
        dedup._SIMHASH_BIT_ROWS.clear()
        capped = dedup._simhash_signatures(pd.Series(arrays)).tolist()
        assert capped == cold
        assert len(dedup._SIMHASH_BIT_ROWS) <= 2
    finally:
        dedup._SIMHASH_MEMO_CAP = old_cap
        dedup._SIMHASH_BIT_ROWS.clear()
