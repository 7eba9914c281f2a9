"""Every registered query must match its DuckDB oracle exactly at sf0.001
(the driver's gate runs the same comparison at sf0.01)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMALL


def _all_query_names():
    from n5_dask_spark.registry import load_all

    return sorted(load_all().keys())


@pytest.mark.parametrize("name", _all_query_names())
def test_query_matches_oracle(spark, name):
    from tests.oracle_harness import compare_query

    result = compare_query(spark, name, SF_SMALL)
    assert result["match"], result


@pytest.mark.parametrize("seed", [3, 17, 91])
def test_asof_union_plan_matches_duckdb_asof_on_randomized_ties(spark, seed, tmp_path):
    """Differential fuzz of the union + last_value asof rewrite against
    DuckDB's NATIVE ASOF JOIN on adversarial data the driver tables don't
    exercise densely: timestamps drawn from a 12-value pool so event.ts ==
    orderdate ties are common (the >= inclusive bound), several orders per
    (user, date) (max-orderkey dedup), users with events but no orders and
    vice versa, and NULL event timestamps.

    NULL-ts boundary (found by this fuzz): this engine drops NULL-ts
    events — the SQL-predicate reading (NULL >= x is never true), and what
    the pre-rewrite join formulation did too — but DuckDB's sort-based
    ASOF JOIN *matches* them to the user's LATEST order (a NULLS-LAST
    artifact of its merge path). The registered oracle is unaffected (the
    driver's events.ts is never null; any null would have failed every
    prior round's hash gate), so the fuzz compares against DuckDB on the
    null-filtered stream and pins our drop semantics separately."""
    import datetime
    import random

    import duckdb
    import pandas as pd

    from n5_dask_spark.operators.relational import join_asof

    rng = random.Random(seed)
    pool = [datetime.datetime(2024, 3, 1) + datetime.timedelta(hours=6 * k) for k in range(12)]
    orders = pd.DataFrame(
        {
            "o_orderkey": range(150),
            "o_custkey": [rng.randrange(0, 25) for _ in range(150)],  # 20-24: no events
            "o_orderdate": [rng.choice(pool) for _ in range(150)],
        }
    )
    events = pd.DataFrame(
        {
            "event_id": range(200),
            "user_id": [rng.randrange(0, 20) if i % 7 else 99 for i in range(200)],  # 99: no orders
            "ts": [None if i % 31 == 0 else rng.choice(pool) for i in range(200)],
            "event_type": [rng.choice(["purchase", "view"]) for _ in range(200)],
        }
    )
    # micro-second timestamps: pandas' default ns unit writes
    # TIMESTAMP(NANOS), which only the events read path is specified to
    # accept (the driver's events.parquet quirk) — orders must stay MICROS
    orders.astype({"o_orderdate": "datetime64[us]"}).to_parquet(tmp_path / "orders.parquet")
    events.astype({"ts": "datetime64[us]"}).to_parquet(tmp_path / "events.parquet")

    got = [
        (r["event_id"], r["user_id"], r["ts"], r["o_orderkey"], r["o_orderdate"])
        for r in join_asof(spark, str(tmp_path)).collect()
    ]
    con = duckdb.connect()
    con.register("orders_pd", orders)
    con.register("events_pd", events)
    want = con.execute(
        """
        WITH od AS (
          SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS o_orderkey
          FROM orders_pd GROUP BY o_custkey, o_orderdate
        )
        SELECT e.event_id, e.user_id, e.ts, od.o_orderkey, od.o_orderdate
        FROM (SELECT * FROM events_pd
              WHERE event_type = 'purchase' AND ts IS NOT NULL) e
        ASOF JOIN od ON e.user_id = od.o_custkey AND e.ts >= od.o_orderdate
        ORDER BY e.event_id
        """
    ).fetchall()
    assert got == [tuple(r) for r in want]
    null_ids = set(events.loc[events["ts"].isna(), "event_id"])
    assert null_ids and not null_ids & {g[0] for g in got}  # drop semantics pinned


# byte-contract family: the multimodal oracles use ascii()/substr as BYTE
# accessors, a documented ASCII-only equivalence (payload bytes vs
# codepoints diverge on non-ASCII text by design) — excluded from the
# unicode doc net, covered by the degenerate-ASCII net below. Every
# multimodal_* query must be listed here so it lands in exactly one net.
BYTE_CONTRACT = {
    "multimodal_feature_extract",
    "multimodal_png_decode",
    "multimodal_metadata_stats",
    "multimodal_frame_sample",
    "multimodal_resize",
    "multimodal_audio_frame_energy",
}


def _doc_only_query_names():
    """Registered queries whose oracle reads ONLY the documents table —
    runnable against an arbitrary synthetic corpus."""
    from n5_dask_spark.registry import load_all

    others = ("region", "nation", "customer", "supplier", "lineitem", "orders", "events", "embeddings", "'part'", " part ")
    out = []
    for n, q in load_all().items():
        if q.oracle and "documents" in q.oracle and n not in BYTE_CONTRACT:
            if not any(t in q.oracle for t in others):
                out.append(n)
    return sorted(out)


def run_unicode_doc_net(spark, tmp_path, seed):
    """Body of the unicode documents net, seed-parameterized for sweeps;
    the pytest wrapper below pins seed 5.

    Regression net for the whole documents family: every doc-only
    registered query runs against its OWN registered oracle on a random
    corpus the driver tables don't resemble — unicode suffixes, EMPTY
    texts, exact and near duplicates. This harness is what caught
    text_quality_score's ANSI divide-by-zero crash on empty documents
    (r7); it keeps every tokenizer/shingle/ratio contract engine-exact on
    arbitrary input, not just the ASCII driver corpus."""
    import os
    import random
    import string

    import duckdb
    import pandas as pd

    from n5_dask_spark.registry import load_all
    from tests.oracle_harness import canon_rows

    rng = random.Random(seed)
    pool_words = [
        "".join(rng.choice(string.ascii_letters) for _ in range(rng.randrange(1, 8)))
        for _ in range(200)
    ]
    # BMP multilingual + the lanes only hostile text exercises: astral-plane
    # surrogate pairs (emoji, math alphanumerics, a ZWJ family sequence),
    # combining marks (both on a base and BARE), unicode separators that are
    # NOT in the contracted ASCII whitespace class (NBSP, U+2028/U+2029 —
    # they must stay INSIDE tokens on both engines), and literal ASCII
    # whitespace-class chars (\x0B \f \r) that must collapse on both,
    # plus \x00/\x01/\x02: the NUL-byte sort lane (DuckDB's sort
    # comparator ties a string with its NUL-extension; the three
    # token-sorting queries key on nul_escape) and the escape's own
    # alphabet, so the bijection itself stays under fuzz.
    uni = (
        "ÀßΣσς中文אבג٦ İı"
        "😀🇺🇸𝔘𝕏𝟘👩‍👩‍👧é́"
        "́‍   \x0b\f\r\x00\x01\x02"
    )
    texts = []
    for i in range(150):
        if i % 37 == 1 and texts:
            texts.append(texts[-1])  # exact duplicate
        elif i % 41 == 2 and texts:
            texts.append(texts[-1] + " zz")  # near duplicate
        else:
            words = [rng.choice(pool_words) for _ in range(rng.randrange(0, 30))]
            if rng.random() < 0.3 and words:
                words[rng.randrange(len(words))] += rng.choice(uni)
            texts.append(" ".join(words))
    df = pd.DataFrame(
        {
            "doc_id": range(150),
            "text": texts,
            "lang": [rng.choice(["en", "de", "fr"]) for _ in range(150)],
            "source": [rng.choice(["web", "book", "code"]) for _ in range(150)],
        }
    )
    df["n_chars"] = df["text"].str.len().astype("int64")
    path = os.path.join(str(tmp_path), "documents.parquet")
    df.to_parquet(path)

    names = _doc_only_query_names()
    assert len(names) >= 15  # the family must stay covered
    reg = load_all()
    bad = []
    for n in names:
        q = reg[n]
        sdf = q.fn(spark, str(tmp_path))
        sc, sr = canon_rows(list(sdf.columns), [tuple(r) for r in sdf.collect()])
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM '{path}'")
        cur = con.execute(q.oracle)
        dc, dr = canon_rows([x[0] for x in cur.description], [tuple(r) for r in cur.fetchall()])
        con.close()
        if sc != dc or sr != dr:
            bad.append(n)
    assert not bad, bad


def test_doc_queries_match_oracles_on_random_unicode_corpus(spark, tmp_path):
    run_unicode_doc_net(spark, tmp_path, 5)


def run_longdoc_net(spark, tmp_path, seed):
    """Long/degenerate-LENGTH lane for the documents family (r9 pass-5
    net; seed-parameterized like the other run_* bodies). Every other
    net draws documents under ~400 chars, but production web corpora
    carry multi-hundred-KB rows — and several operators are superlinear
    per row (shingle expansion, token sorts, signature loops). Fixed
    degenerate shapes included regardless of seed:

    - a single ~120k-char token (NO whitespace anywhere — token arrays
      with one giant element; n_tokens = 1 via the regexp_count path),
    - a mega-term-frequency doc (one token repeated 24k times — all
      shingles identical, doc-frequency caps and array_distinct lanes),
    - whitespace-ONLY documents (unreachable by any word-join generator:
      the collapse-then-split tokenizer must yield ['',''] on BOTH
      engines, and SPARK_N_TOKENS must agree),
    - leading/trailing whitespace (empty edge tokens),
    - a ~24k-token document plus its near- and exact-duplicates (the
      dedup family's pair lanes at 100x the usual row size).
    """
    import os
    import random
    import string

    import duckdb
    import pandas as pd

    from n5_dask_spark.registry import load_all
    from tests.oracle_harness import canon_rows

    rng = random.Random(seed)
    pool = [
        "".join(rng.choice(string.ascii_letters) for _ in range(rng.randrange(1, 10)))
        for _ in range(500)
    ]
    big_words = [rng.choice(pool) for _ in range(24_000)]
    near_words = list(big_words)
    near_words[rng.randrange(len(near_words))] = "zzzzqqqq"
    big = " ".join(big_words)
    texts = [
        "a" * 120_000,
        ("spam " * 24_000).strip(),
        " ",
        " \t\n\x0b\f\r" * 40,
        "\n" * 500,
        "   leading and trailing   ",
        "",
        big,
        " ".join(near_words),
        big,
    ]
    for _ in range(20):
        words = [rng.choice(pool) for _ in range(rng.randrange(200, 3000))]
        texts.append(" ".join(words))
    df = pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": [rng.choice(["en", "de", "fr"]) for _ in texts],
            "source": [rng.choice(["web", "book", "code"]) for _ in texts],
        }
    )
    df["n_chars"] = df["text"].str.len().astype("int64")
    path = os.path.join(str(tmp_path), "documents.parquet")
    df.to_parquet(path)

    names = _doc_only_query_names()
    assert len(names) >= 15
    reg = load_all()
    bad = []
    for n in names:
        q = reg[n]
        sdf = q.fn(spark, str(tmp_path))
        sc, sr = canon_rows(list(sdf.columns), [tuple(r) for r in sdf.collect()])
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM '{path}'")
        cur = con.execute(q.oracle)
        dc, dr = canon_rows([x[0] for x in cur.description], [tuple(r) for r in cur.fetchall()])
        con.close()
        if sc != dc or sr != dr:
            bad.append(n)
    assert not bad, bad


@pytest.mark.slow  # ~7.4 min: superlinear-length stress corpus over every doc query
def test_doc_queries_match_oracles_on_long_documents(spark, tmp_path):
    run_longdoc_net(spark, tmp_path, 17)


def test_stat_queries_on_single_row_corpora(spark, tmp_path):
    """n=1 is its own boundary, distinct from empty: sampled statistics
    (stddev_samp, corr, rank/(n-1)) go NULL on a NON-empty input. The r9
    single-row probe ran ALL 134 oracled non-fixture queries on 1-row
    tables across every family: 134/134 engine-equal, zero crashes —
    after fixing udf_pandas_zscore, which float(None)'d sigma
    (stddev_samp's n-1 = 0). This pins that fix plus the other
    statistic/ranking/similarity shapes the lane stresses; re-run the
    full probe (the same corpus, all names) after touching any stats
    aggregation."""
    import datetime
    import os

    import duckdb
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from n5_dask_spark.registry import load_all
    from tests.oracle_harness import canon_rows

    d = str(tmp_path)
    ts = datetime.datetime(2024, 3, 1, 12)
    pd.DataFrame(
        {"doc_id": [0], "text": ["hello world text"], "lang": ["en"], "source": ["web"], "n_chars": [16]}
    ).to_parquet(os.path.join(d, "documents.parquet"))
    pd.DataFrame(
        {"event_id": [0], "ts": [ts], "user_id": [3], "event_type": ["purchase"], "value": [1.5], "props": ['{"a":1}']}
    ).astype({"ts": "datetime64[us]"}).to_parquet(os.path.join(d, "events.parquet"))
    pd.DataFrame(
        {"o_orderkey": [0], "o_custkey": [0], "o_orderstatus": ["O"], "o_totalprice": [1000.0], "o_orderdate": [ts], "o_orderpriority": ["1-URGENT"]}
    ).astype({"o_orderdate": "datetime64[us]"}).to_parquet(os.path.join(d, "orders.parquet"))
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([0], pa.int64()),
                "embedding": pa.array([[0.5, -0.25, 0.125]], pa.list_(pa.float32())),
                "label": pa.array([2], pa.int32()),
            }
        ),
        os.path.join(d, "embeddings.parquet"),
    )
    pd.DataFrame(
        {"l_orderkey": [0], "l_partkey": [0], "l_suppkey": [0], "l_linenumber": pd.array([1], dtype="int32"), "l_quantity": [25.0], "l_extendedprice": [500.0], "l_discount": [0.05], "l_tax": [0.04], "l_returnflag": ["A"], "l_linestatus": ["O"], "l_shipdate": [ts]}
    ).astype({"l_shipdate": "datetime64[us]"}).to_parquet(os.path.join(d, "lineitem.parquet"))

    reps = [
        "udf_pandas_zscore",  # the fixed n=1 crash (sigma NULL)
        "agg_stats",  # stddev/variance outputs at n=1
        "window_running_sum",  # frame over a single row
        "knn_bruteforce_cosine",  # top-k with one vector (self-pair rules)
        "dedup_minhash_lsh",  # bucketing with nothing to pair
        "events_session_window",  # one-event session
    ]
    reg = load_all()
    tables = ("lineitem", "orders", "events", "documents", "embeddings")
    bad = []
    for n in reps:
        q = reg[n]
        sdf = q.fn(spark, d)
        sc, sr = canon_rows(list(sdf.columns), [tuple(r) for r in sdf.collect()])
        con = duckdb.connect()
        for t in tables:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{os.path.join(d, t + '.parquet')}'")
        cur = con.execute(q.oracle)
        dc, dr = canon_rows([x[0] for x in cur.description], [tuple(r) for r in cur.fetchall()])
        con.close()
        if sc != dc or sr != dr:
            bad.append(n)
    assert not bad, bad


def test_doc_queries_on_empty_corpus(spark, tmp_path):
    """A 0-row documents table is a legal production state (an empty day
    of a date-partitioned corpus), and no net drew it: every generator
    produces >=1 row. The r9 empty-corpus probe found the text/pipeline/
    sampling/multimodal doc queries all engine-equal (0 rows both sides —
    the driver-side 1-row-aggregate collects are guarded), but the
    corpus-DERIVED fixture family (voxel value = md5(i ':' lang(doc
    i % n_docs))) hit `i % 0`: DuckDB's `% 0 -> NULL` silently emptied
    the oracles while Spark variously short-circuited, built an all-zeros
    OME volume (64 rows vs 0 — a silent hash flip), or crashed in a
    worker. _voxels now refuses loudly; this test pins BOTH halves.

    NOTE the schema: an empty pandas `object` column round-trips through
    parquet as INT32, which binds `text` as an integer on BOTH engines —
    the table must be written with an explicit arrow schema.
    """
    import os

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from n5_dask_spark.registry import load_all
    from tests.oracle_harness import canon_rows

    schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("text", pa.string()),
            ("lang", pa.string()),
            ("source", pa.string()),
            ("n_chars", pa.int64()),
        ]
    )
    path = os.path.join(str(tmp_path), "documents.parquet")
    pq.write_table(pa.table({n: [] for n in schema.names}, schema=schema), path)

    names = sorted(set(_doc_only_query_names()) | BYTE_CONTRACT)
    fixture = {n for n in names if n.startswith(("n5_", "tiff_", "ome_"))}
    assert len(fixture) >= 10  # the guard must keep covering the family
    reg = load_all()
    bad = []
    for n in names:
        q = reg[n]
        if n in fixture:
            with pytest.raises(ValueError, match="documents table .* is empty"):
                q.fn(spark, str(tmp_path)).collect()
            continue
        sdf = q.fn(spark, str(tmp_path))
        sc, sr = canon_rows(list(sdf.columns), [tuple(r) for r in sdf.collect()])
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM '{path}'")
        cur = con.execute(q.oracle)
        dc, dr = canon_rows([x[0] for x in cur.description], [tuple(r) for r in cur.fetchall()])
        con.close()
        if sc != dc or sr != dr:
            bad.append(n)
    assert not bad, bad


def test_event_embedding_queries_on_empty_tables(spark, tmp_path):
    """Empty-table lane for the events/orders and embeddings families
    (companion to the doc-family empty-corpus net above). The r9 probe
    found and fixed two real crashes on legal corpora — udf_pandas_zscore
    float(None)'d its collected stats (mu NULL on an empty table; sigma
    NULL even on a SINGLE-row one, stddev_samp's n-1 = 0) and
    formats_partitioned_pruning's read-back of an empty partitioned write
    threw UNABLE_TO_INFER_SCHEMA (now reads with the writer's schema) —
    and characterized one engine-level boundary: Spark's Expand-based
    grouping sets emit ZERO rows on empty input where the standard
    (DuckDB, Postgres) emits the () grand-total row. r11 CLOSED that
    boundary — agg_rollup/agg_cube now build the () set as a global-agg
    union leg (relational.py), so EVERYTHING here must be engine-equal.
    """
    import os

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from n5_dask_spark.registry import load_all
    from tests.oracle_harness import canon_rows

    ev = pa.schema(
        [
            ("event_id", pa.int64()),
            ("ts", pa.timestamp("us")),
            ("user_id", pa.int64()),
            ("event_type", pa.string()),
            ("value", pa.float64()),
            ("props", pa.string()),
        ]
    )
    od = pa.schema(
        [
            ("o_orderkey", pa.int64()),
            ("o_custkey", pa.int64()),
            ("o_orderstatus", pa.string()),
            ("o_totalprice", pa.float64()),
            ("o_orderdate", pa.timestamp("us")),
            ("o_orderpriority", pa.string()),
        ]
    )
    em = pa.schema(
        [
            ("vec_id", pa.int64()),
            ("embedding", pa.list_(pa.float32())),
            ("label", pa.int32()),
        ]
    )
    cu = pa.schema(
        [("c_custkey", pa.int64()), ("c_name", pa.string()), ("c_mktsegment", pa.string())]
    )
    for fname, schema in (("events", ev), ("orders", od), ("embeddings", em), ("customer", cu)):
        pq.write_table(
            pa.table({n: [] for n in schema.names}, schema=schema),
            os.path.join(str(tmp_path), f"{fname}.parquet"),
        )

    reg = load_all()
    ev_others = ("region", "nation", "customer", "supplier", "lineitem", "documents", "embeddings", "part ")
    emb_others = ("documents", "lineitem", "orders", "events", "customer", "supplier")
    names = sorted(
        n
        for n, q in reg.items()
        if q.oracle
        and "stream" not in n
        and (
            (("events" in q.oracle or "orders" in q.oracle) and not any(t in q.oracle for t in ev_others))
            or ("embeddings" in q.oracle and not any(t in q.oracle for t in emb_others))
        )
    )
    assert len(names) >= 30
    # streaming: the r9 probe ran ALL 10 streaming queries green on the
    # empty source (no batches -> no state -> no output; the oracles are
    # equally empty). Pin one representative per job shape to keep suite
    # runtime bounded; any regression in empty-source handling is shared
    # machinery (jobs.py staging, watermark derivation), not per-query.
    names += [
        "streaming_session_window",
        "streaming_incremental_restart",
        "streaming_stream_stream_join",
        "streaming_watermark_append",
    ]
    # r11: agg_rollup now emits the () grand-total row on empty input
    # (global-agg union leg, relational.py) — full parity, the old
    # Spark-native-rollup divergence carve-out is gone
    bad = []
    for n in names:
        q = reg[n]
        sdf = q.fn(spark, str(tmp_path))
        sc, sr = canon_rows(list(sdf.columns), [tuple(r) for r in sdf.collect()])
        con = duckdb.connect()
        for t in ("events", "orders", "embeddings"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{os.path.join(str(tmp_path), t + '.parquet')}'"
            )
        cur = con.execute(q.oracle)
        dc, dr = canon_rows([x[0] for x in cur.description], [tuple(r) for r in cur.fetchall()])
        con.close()
        if sc != dc or sr != dr:
            bad.append(n)
    assert not bad, bad


def run_event_tie_dense_net(spark, tmp_path, seed):
    """Body of the events/orders tie-dense net, seed-parameterized for
    sweeps; the pytest wrapper below pins seed 11.

    Companion net over the events/orders family: random data drawn from
    tiny value pools (10 timestamps, 3 prices, 3 values) so every ranking,
    window frame and session boundary is packed with TIES. This puts the
    registry's 'all rankings carry a total-order tiebreaker' discipline
    under load — a query relying on incidental order in the driver tables
    diverges from its oracle here."""
    import datetime
    import os
    import random

    import duckdb
    import pandas as pd

    from n5_dask_spark.registry import load_all
    from tests.oracle_harness import canon_rows

    reg = load_all()
    others = ("region", "nation", "customer", "supplier", "lineitem", "documents", "embeddings", "part ")
    names = sorted(
        n
        for n, q in reg.items()
        if q.oracle
        and ("events" in q.oracle or "orders" in q.oracle)
        and not any(t in q.oracle for t in others)
        and "stream" not in n
        and n != "join_asof"  # has its own randomized fuzz above
    )
    assert len(names) >= 12
    rng = random.Random(seed)
    pool = [datetime.datetime(2024, 1, 1) + datetime.timedelta(hours=6 * k) for k in range(10)]
    events = pd.DataFrame(
        {
            "event_id": range(400),
            "ts": [rng.choice(pool) for _ in range(400)],
            "user_id": [rng.randrange(0, 12) for _ in range(400)],
            "event_type": [rng.choice(["purchase", "view", "click"]) for _ in range(400)],
            "value": [float(rng.choice([0.0, 1.5, 2.5])) for _ in range(400)],
            "props": [rng.choice(['{"a":1}', '{"b":2}', ""]) for _ in range(400)],
        }
    )
    orders = pd.DataFrame(
        {
            "o_orderkey": range(300),
            "o_custkey": [rng.randrange(0, 12) for _ in range(300)],
            "o_orderstatus": [rng.choice(["O", "F", "P"]) for _ in range(300)],
            "o_totalprice": [float(rng.choice([10.0, 20.0, 30.0])) for _ in range(300)],
            "o_orderdate": [rng.choice(pool) for _ in range(300)],
            "o_orderpriority": [rng.choice(["1-URGENT", "3-MEDIUM", "5-LOW"]) for _ in range(300)],
        }
    )
    events.astype({"ts": "datetime64[us]"}).to_parquet(tmp_path / "events.parquet")
    orders.astype({"o_orderdate": "datetime64[us]"}).to_parquet(tmp_path / "orders.parquet")
    bad = []
    for n in names:
        q = reg[n]
        sdf = q.fn(spark, str(tmp_path))
        sc, sr = canon_rows(list(sdf.columns), [tuple(r) for r in sdf.collect()])
        con = duckdb.connect()
        for t in ("events", "orders"):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{os.path.join(str(tmp_path), t + '.parquet')}'")
        cur = con.execute(q.oracle)
        dc, dr = canon_rows([x[0] for x in cur.description], [tuple(r) for r in cur.fetchall()])
        con.close()
        if sc != dc or sr != dr:
            bad.append(n)
    assert not bad, bad


def test_event_order_queries_match_oracles_on_tie_dense_data(spark, tmp_path):
    run_event_tie_dense_net(spark, tmp_path, 11)


def test_tpch_family_on_empty_minidb(spark, tmp_path):
    """Empty-table lane for the whole relational family: all 7 TPC-H
    tables written 0-row with the REAL testdata schemas (int32 region/
    nation keys included), every minidb-net query run against its own
    oracle. r9 probe result: 73/75 engine-equal with ZERO crashes (scalar
    subqueries, UDTF, top-k, set ops, windows and joins all survive empty
    input); the two grouping-set divergences were CLOSED in r11 (the ()
    grand-total set is now a global-agg union leg, relational.py), so the
    pin is 75/75 engine-equal."""
    import os

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from n5_dask_spark.registry import load_all
    from tests.oracle_harness import canon_rows

    reg = load_all()
    tpch = ("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
    names = sorted(
        n
        for n, q in reg.items()
        if q.oracle
        and not any(x in q.oracle for x in ("documents", "embeddings", "events"))
        and any(t in q.oracle for t in tpch)
        and "stream" not in n
        and "n5" not in n
        and "tif" not in n
        and "formats" not in n
        and "bucketed" not in n
    )
    assert len(names) >= 60
    for t in tpch:
        sch = pq.read_schema(f"/root/testdata/sf0.001/{t}.parquet")
        sch = pa.schema([(f.name, f.type) for f in sch])
        pq.write_table(
            pa.table({f.name: [] for f in sch}, schema=sch),
            os.path.join(str(tmp_path), f"{t}.parquet"),
        )
    # r11: agg_rollup/agg_cube grand-total rows now match the oracle on
    # empty input (global-agg union leg, relational.py); no carve-out left
    bad = []
    for n in names:
        q = reg[n]
        sdf = q.fn(spark, str(tmp_path))
        sc, sr = canon_rows(list(sdf.columns), [tuple(r) for r in sdf.collect()])
        con = duckdb.connect()
        for t in tpch:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{os.path.join(str(tmp_path), t + '.parquet')}'"
            )
        cur = con.execute(q.oracle)
        dc, dr = canon_rows([x[0] for x in cur.description], [tuple(r) for r in cur.fetchall()])
        con.close()
        if sc != dc or sr != dr:
            bad.append(n)
    assert not bad, bad


def run_tpch_minidb_net(spark, base_dir, seed):
    """Body of the TPC-H tie-dense net, seed-parameterized so ad-hoc
    multi-seed sweeps (tools, driver-sim sessions) reuse the exact graded
    generator instead of a drifting copy. Returns the list of queries that
    diverged from their oracle (empty = green)."""
    import datetime
    import os
    import random

    import duckdb
    import pandas as pd

    from n5_dask_spark.registry import load_all
    from tests.oracle_harness import canon_rows

    reg = load_all()
    tpch = ("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
    names = sorted(
        n
        for n, q in reg.items()
        if q.oracle
        and not any(x in q.oracle for x in ("documents", "embeddings", "events"))
        and any(t in q.oracle for t in tpch)
        and "stream" not in n
        and "n5" not in n
        and "tif" not in n
        and "formats" not in n  # write staging dirs, covered elsewhere
        and "bucketed" not in n  # persists warehouse tables, covered elsewhere
    )
    assert len(names) >= 60
    rng = random.Random(seed)
    dates = [datetime.datetime(2024, 1, 1) + datetime.timedelta(days=30 * k) for k in range(8)]
    nc, ns, np_, no, nl = 60, 20, 40, 200, 800
    tables = {
        "region": pd.DataFrame(
            {"r_regionkey": range(5), "r_name": [f"REGION{i}" for i in range(5)]}
        ),
        "nation": pd.DataFrame(
            {
                "n_nationkey": range(25),
                "n_name": [f"NATION{i:02d}" for i in range(25)],
                "n_regionkey": [i % 5 for i in range(25)],
            }
        ),
        "customer": pd.DataFrame(
            {
                "c_custkey": range(nc),
                "c_name": [f"Cust{i}" for i in range(nc)],
                "c_nationkey": [rng.randrange(25) for _ in range(nc)],
                "c_acctbal": [float(rng.choice([100.0, 200.0])) for _ in range(nc)],
                "c_mktsegment": [rng.choice(["BUILDING", "AUTOMOBILE", "MACHINERY"]) for _ in range(nc)],
            }
        ),
        "supplier": pd.DataFrame(
            {
                "s_suppkey": range(ns),
                "s_name": [f"Supp{i}" for i in range(ns)],
                "s_nationkey": [rng.randrange(25) for _ in range(ns)],
                "s_acctbal": [float(rng.choice([50.0, 150.0])) for _ in range(ns)],
            }
        ),
        "part": pd.DataFrame(
            {
                "p_partkey": range(np_),
                "p_name": [f"part name {i}" for i in range(np_)],
                "p_brand": [rng.choice(["Brand#1", "Brand#2", "Brand#3"]) for _ in range(np_)],
                "p_type": [
                    rng.choice(["PROMO BRUSHED", "STANDARD POLISHED", "ECONOMY ANODIZED"])
                    for _ in range(np_)
                ],
                "p_size": [rng.choice([5, 15, 25]) for _ in range(np_)],
                "p_retailprice": [float(rng.choice([910.0, 940.0, 970.0])) for _ in range(np_)],
            }
        ),
        "orders": pd.DataFrame(
            {
                "o_orderkey": range(no),
                "o_custkey": [rng.randrange(nc) for _ in range(no)],
                "o_orderstatus": [rng.choice(["O", "F", "P"]) for _ in range(no)],
                "o_totalprice": [float(rng.choice([1000.0, 2000.0, 3000.0])) for _ in range(no)],
                "o_orderdate": [rng.choice(dates) for _ in range(no)],
                "o_orderpriority": [rng.choice(["1-URGENT", "3-MEDIUM", "5-LOW"]) for _ in range(no)],
            }
        ),
        "lineitem": pd.DataFrame(
            {
                "l_orderkey": [rng.randrange(no) for _ in range(nl)],
                "l_partkey": [rng.randrange(np_) for _ in range(nl)],
                "l_suppkey": [rng.randrange(ns) for _ in range(nl)],
                "l_linenumber": [i % 7 + 1 for i in range(nl)],
                "l_quantity": [float(rng.choice([1.0, 25.0, 49.0])) for _ in range(nl)],
                "l_extendedprice": [float(rng.choice([100.0, 500.0, 900.0])) for _ in range(nl)],
                "l_discount": [float(rng.choice([0.0, 0.05, 0.1])) for _ in range(nl)],
                "l_tax": [float(rng.choice([0.0, 0.04])) for _ in range(nl)],
                "l_returnflag": [rng.choice(["A", "N", "R"]) for _ in range(nl)],
                "l_linestatus": [rng.choice(["O", "F"]) for _ in range(nl)],
                "l_shipdate": [rng.choice(dates) for _ in range(nl)],
            }
        ),
    }
    for name, df in tables.items():
        for c in df.columns:
            if df[c].dtype.kind == "M":
                df[c] = df[c].astype("datetime64[us]")
        df.to_parquet(os.path.join(base_dir, f"{name}.parquet"))
    bad = []
    for n in names:
        q = reg[n]
        sdf = q.fn(spark, str(base_dir))
        sc, sr = canon_rows(list(sdf.columns), [tuple(r) for r in sdf.collect()])
        con = duckdb.connect()
        for t in tpch:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{os.path.join(str(base_dir), t + '.parquet')}'")
        cur = con.execute(q.oracle)
        dc, dr = canon_rows([x[0] for x in cur.description], [tuple(r) for r in cur.fetchall()])
        con.close()
        if sc != dc or sr != dr:
            bad.append(n)
    return bad


def test_tpch_family_matches_oracles_on_tie_dense_minidb(spark, tmp_path):
    """Third net: a consistent random TPC-H mini-database (valid FKs, tiny
    value pools so min-cost/top-supplier/rank boundaries are packed with
    ties) through every relational-family registered query vs its own
    oracle — ~75 queries. Proves the determinism discipline (decimal-exact
    aggregation, total-order tiebreakers, engine-portable functions) holds
    on data the driver tables don't resemble, not just on one lucky
    corpus."""
    assert run_tpch_minidb_net(spark, str(tmp_path), 23) == []


def run_embedding_adversarial_net(spark, tmp_path, seed):
    """Body of the adversarial-embeddings net, seed-parameterized for
    sweeps; the pytest wrapper below pins seed 7.

    Fourth net: the embeddings family on 16-dim random vectors (the
    driver's are 64-dim — this alone caught array_funcs' hard-coded
    element_at(embedding, 64), an ANSI ArrayIndexOutOfBounds on any other
    width) with a planted ZERO vector (the cosine = 0.0 convention
    end-to-end), an exact-duplicate pair and a colinear pair (cosine 1.0
    rank ties). Vectors are uniform-width and non-empty except one empty
    row exercised on array_funcs only — ragged/empty embeddings are
    malformed embedder output, a documented data contract for the pair
    queries (DuckDB's list_cosine_similarity errors outright on length
    mismatch)."""
    import os
    import random

    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from n5_dask_spark.registry import load_all
    from tests.oracle_harness import canon_rows

    reg = load_all()
    others = ("documents", "lineitem", "orders", "events", "customer", "supplier")
    names = sorted(
        n
        for n, q in reg.items()
        if q.oracle and "embeddings" in q.oracle and not any(t in q.oracle for t in others)
        and "stream" not in n
    )
    assert "knn_bruteforce_cosine" in names and "array_funcs" in names

    rng = np.random.default_rng(seed)
    n_vec, dim = 120, 16
    emb = (rng.random((n_vec, dim), dtype=np.float32) * 2 - 1).astype(np.float32)
    emb[5] = 0.0
    emb[17] = emb[16]
    emb[33] = emb[32] * 0.5

    def write(path, vectors):
        tbl = pa.table(
            {
                "vec_id": pa.array(range(len(vectors)), pa.int64()),
                "embedding": pa.array([list(map(float, r)) for r in vectors], pa.list_(pa.float32())),
                "label": pa.array([int(i % 7) for i in range(len(vectors))], pa.int32()),
            }
        )
        os.makedirs(path, exist_ok=True)
        pq.write_table(tbl, os.path.join(path, "embeddings.parquet"))

    write(str(tmp_path / "main"), [list(map(float, r)) for r in emb])
    # narrow corpus: uniform dim-3 vectors keep pair cosines in contract
    # while starving every fixed-leading-dims assumption — this pass (as a
    # sweep) caught SPARK_BUCKET's bare 0-based embedding[d] over dims
    # 0..7, an ANSI ArrayIndexOutOfBounds on any corpus narrower than 8
    # where DuckDB's 1-based NULL subscript just contributes 0
    emb3 = (rng.random((60, 3), dtype=np.float32) * 2 - 1).astype(np.float32)
    emb3[5] = 0.0
    write(str(tmp_path / "narrow"), [list(map(float, r)) for r in emb3])
    bad = []
    for n in names:
        for table in ("main", "narrow"):
            q = reg[n]
            sdf = q.fn(spark, str(tmp_path / table))
            sc, sr = canon_rows(list(sdf.columns), [tuple(r) for r in sdf.collect()])
            con = duckdb.connect()
            con.execute(
                f"CREATE VIEW embeddings AS SELECT * FROM '{tmp_path / table / 'embeddings.parquet'}'"
            )
            cur = con.execute(q.oracle)
            dc, dr = canon_rows([x[0] for x in cur.description], [tuple(r) for r in cur.fetchall()])
            con.close()
            if sc != dc or sr != dr:
                bad.append((n, table))
    assert not bad, bad

    # empty-vector row: array_funcs must yield NULL first/last/sum like the
    # oracle, never an INVALID_INDEX error
    write(str(tmp_path / "empty"), [[1.0, 2.0], []])
    row = {r["vec_id"]: r for r in reg["array_funcs"].fn(spark, str(tmp_path / "empty")).collect()}
    assert row[1]["dim"] == 0 and row[1]["first_val"] is None
    assert row[1]["last_val"] is None and row[1]["vec_sum"] is None

    # short-vector rows on the AGGREGATE-ONLY subscripting queries: one
    # width-1 and one empty vector among width-2 rows. try_element_at
    # yields NULL (SUM skips it) exactly like DuckDB's embedding[i] — the
    # query must hash-match its oracle, not ANSI-throw on the short row.
    write(str(tmp_path / "short"), [[1.0, 2.0], [3.0], [], [5.0, 7.0], [9.0, 11.0]])
    for agg_name in ("array_label_centroids",):
        q = reg[agg_name]
        sdf = q.fn(spark, str(tmp_path / "short"))
        sc, sr = canon_rows(list(sdf.columns), [tuple(r) for r in sdf.collect()])
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW embeddings AS SELECT * FROM '{tmp_path / 'short' / 'embeddings.parquet'}'"
        )
        cur = con.execute(q.oracle)
        dc, dr = canon_rows([x[0] for x in cur.description], [tuple(r) for r in cur.fetchall()])
        con.close()
        assert (sc, sr) == (dc, dr), agg_name
    # knn_ivf_probe's centroid/distance legs share the same convention: a
    # short vector must not kill the job (ranking on malformed pairs stays
    # out of contract — pair cosine needs uniform width on both engines).
    reg["knn_ivf_probe"].fn(spark, str(tmp_path / "short")).collect()


def test_embedding_queries_match_oracles_on_adversarial_vectors(spark, tmp_path):
    run_embedding_adversarial_net(spark, tmp_path, 7)


def test_ansi_division_conventions_on_degenerate_data(spark, tmp_path):
    """Spark 4 runs ANSI mode, where ANY division by zero — double included
    — throws and kills the whole job. Legal-at-scale degenerate rows must
    therefore never reach a bare `/`: an EMPTY document (text_quality_
    score's punct_ratio), a stratum with MAD = 0 (pipeline_outlier_filter;
    >=50% of docs sharing one length), and a ZERO embedding vector
    (cosine). Each is pinned here to the engine-agreed convention the
    DuckDB oracle produces: NULL ratio, not-an-outlier, cosine 0.0."""
    import pandas as pd

    from n5_dask_spark.operators.similarity import cosine_col
    from n5_dask_spark.registry import load_all

    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": ["", "same len", "not same"],  # empty + constant-length stratum
            "lang": ["xx", "yy", "yy"],
            "source": ["s", "s", "s"],
        }
    )
    docs["n_chars"] = docs["text"].str.len().astype("int64")
    docs.to_parquet(tmp_path / "documents.parquet")
    reg = load_all()

    rows = {r["doc_id"]: r for r in reg["text_quality_score"].fn(spark, str(tmp_path)).collect()}
    assert rows[0]["n_chars"] == 0 and rows[0]["punct_ratio"] is None

    out = {r["lang"]: r for r in reg["pipeline_outlier_filter"].fn(spark, str(tmp_path)).collect()}
    assert out["xx"]["n_outliers"] == 0 and out["yy"]["n_outliers"] == 0  # MAD=0 strata

    zero = spark.createDataFrame([([0.0, 0.0], [1.0, 2.0])], "a array<double>, b array<double>")
    assert zero.select(cosine_col("a", "b").alias("c")).collect()[0]["c"] == 0.0


def run_streaming_tie_dense_net(spark, tmp_path, seed):
    """Body of the streaming tie-dense net, seed-parameterized (the
    run_tpch_minidb_net protocol) so ad-hoc multi-seed sweeps reuse the
    exact graded generators; the pytest wrapper below pins seed 13.

    Fifth net: the streaming family (the four batch nets deliberately
    exclude ``stream*``, so these 10 rows otherwise hold only driver-corpus
    greens). Timestamps come from an HOUR-ALIGNED pool, so the classic
    stateful bug sites all get exact collisions: events exactly ON 1h/1d
    window edges, session gaps of exactly 8h (the >= boundary between
    merge and new-session), purchases exactly AT the stream-stream global
    watermark (the oracle's strict ``p.ts < wm`` cutoff), and windows
    whose end lands exactly on the append-mode watermark (max ts - 6h).
    Tiny user/value/type pools pile ties onto every groupBy key. All three
    event types are guaranteed present (an absent side would stall the
    stream-stream watermark at epoch while DuckDB's LEAST skips NULLs — a
    legal divergence this net keeps out of scope)."""
    import datetime
    import os
    import random

    import duckdb
    import pandas as pd

    from n5_dask_spark.registry import load_all
    from tests.oracle_harness import canon_rows

    reg = load_all()
    names = sorted(n for n in reg if n.startswith("streaming_") and reg[n].oracle)
    assert len(names) >= 8
    rng = random.Random(seed)
    base = datetime.datetime(2024, 3, 1)
    # hours chosen so 8h session gaps, 1h tumbling edges, the 6h append
    # watermark and the 2h join watermark all land exactly on pool points:
    # with max ts = h31, the append watermark is h25 (window [24,25) ends
    # exactly ON it) and the stream-stream global watermark is h29
    # (purchases exactly AT the strict p.ts < wm cutoff exist)
    pool = [
        base + datetime.timedelta(hours=k)
        for k in (0, 1, 2, 8, 9, 16, 17, 24, 25, 29, 30, 31)
    ]
    n = 400
    events = pd.DataFrame(
        {
            "event_id": range(n),
            "ts": [rng.choice(pool) for _ in range(n)],
            "user_id": [rng.randrange(0, 10) for _ in range(n)],
            "event_type": [rng.choice(["purchase", "view", "click"]) for _ in range(n)],
            "value": [float(rng.choice([0.0, 1.5, 2.5])) for _ in range(n)],
            "props": [rng.choice(['{"a":1}', "", '{"b":2}']) for _ in range(n)],
        }
    )
    assert set(events["event_type"]) == {"purchase", "view", "click"}
    customer = pd.DataFrame(
        {
            "c_custkey": range(8),  # user_id 8-9 deliberately dimensionless
            "c_name": [f"Customer#{i}" for i in range(8)],
            "c_mktsegment": [rng.choice(["BUILDING", "MACHINERY"]) for _ in range(8)],
        }
    )
    events.astype({"ts": "datetime64[us]"}).to_parquet(tmp_path / "events.parquet")
    customer.to_parquet(tmp_path / "customer.parquet")
    bad = []
    for name in names:
        q = reg[name]
        sdf = q.fn(spark, str(tmp_path))
        sc, sr = canon_rows(list(sdf.columns), [tuple(r) for r in sdf.collect()])
        con = duckdb.connect()
        for t in ("events", "customer"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{os.path.join(str(tmp_path), t + '.parquet')}'"
            )
        cur = con.execute(q.oracle)
        dc, dr = canon_rows([x[0] for x in cur.description], [tuple(r) for r in cur.fetchall()])
        con.close()
        if sc != dc or sr != dr:
            bad.append(name)
    assert not bad, bad


def test_streaming_queries_match_oracles_on_tie_dense_boundaries(spark, tmp_path):
    run_streaming_tie_dense_net(spark, tmp_path, 13)


def run_multimodal_ascii_net(spark, tmp_path, seed):
    """Body of the degenerate-ASCII multimodal net, seed-parameterized for
    multi-seed sweeps; the pytest wrapper below pins seed 29. The fixed
    boundary lengths are always included regardless of seed.

    Sixth net: the multimodal byte-contract family (excluded from the
    random-unicode doc net BY DESIGN — its oracles use ascii()/substr as
    byte accessors, an ASCII-only equivalence) on a corpus that honors the
    contract but is adversarial everywhere else: EMPTY texts, 1-3 char
    texts, lengths exactly straddling every internal boundary (the PNG
    16-byte row, the 80-byte frame, the 256-byte image cap), and random
    printable ASCII with tabs/newlines. First run caught two real
    empty-payload divergences (feature_extract's ascii('')=0 vs the
    Python -1 sentinel; resize dropping the empty doc the Python side
    emits). Also runs n5_region_tif_checksum — documents-dependent but
    shut out of the doc net because its oracle mentions the WORD 'region'
    (the N5 region read, not the TPC-H table)."""
    import os
    import random
    import string

    import duckdb
    import pandas as pd

    from n5_dask_spark.registry import load_all
    from tests.oracle_harness import canon_rows

    reg = load_all()
    reg_names = set(load_all())
    missing = {n for n in reg_names if n.startswith("multimodal_")} - BYTE_CONTRACT
    assert not missing, f"new multimodal queries must join BYTE_CONTRACT: {missing}"
    names = sorted(BYTE_CONTRACT) + ["n5_region_tif_checksum"]
    rng = random.Random(seed)
    pool = string.ascii_letters + string.digits + string.punctuation + " \t\n"
    fixed = [0, 1, 2, 3, 15, 16, 17, 79, 80, 81, 159, 160, 255, 256, 257, 320]
    lengths = fixed + [rng.randrange(0, 400) for _ in range(150 - len(fixed))]
    rng.shuffle(lengths)
    texts = ["".join(rng.choice(pool) for _ in range(L)) for L in lengths]
    df = pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": [rng.choice(["en", "de", "", "x" * 30]) for _ in texts],
            "source": [rng.choice(["web", "book"]) for _ in texts],
        }
    )
    df["n_chars"] = df["text"].str.len().astype("int64")
    path = os.path.join(str(tmp_path), "documents.parquet")
    df.to_parquet(path)
    bad = []
    for n in names:
        q = reg[n]
        sdf = q.fn(spark, str(tmp_path))
        sc, sr = canon_rows(list(sdf.columns), [tuple(r) for r in sdf.collect()])
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM '{path}'")
        cur = con.execute(q.oracle)
        dc, dr = canon_rows([x[0] for x in cur.description], [tuple(r) for r in cur.fetchall()])
        con.close()
        if sc != dc or sr != dr:
            bad.append(n)
    assert not bad, bad


def test_multimodal_queries_match_oracles_on_degenerate_ascii_corpus(spark, tmp_path):
    run_multimodal_ascii_net(spark, tmp_path, 29)


def test_date_funcs_match_oracle_on_extreme_dates_and_date_typed_column(spark, tmp_path):
    """Extreme-date probe (r9): scalar_date_funcs vs its oracle on a
    DATE-typed o_orderdate column (the driver corpus stores timestamp[us],
    so this exercises the type lane the corpus never does) spanning year
    1, the 1582 Julian->Gregorian cutover week (both engines are
    proleptic — the skipped days exist), leap days, and 9999. The probe
    found due_date's type divergence: on DATE input Spark's
    date + INTERVAL stays DATE while DuckDB promotes to TIMESTAMP — both
    sides now cast to TIMESTAMP first."""
    import datetime
    import os

    import duckdb
    import pandas as pd

    from n5_dask_spark.registry import load_all
    from tests.oracle_harness import canon_rows

    dates = [
        datetime.date(1, 1, 1), datetime.date(1, 12, 31),
        datetime.date(1582, 10, 4), datetime.date(1582, 10, 15),
        datetime.date(1752, 9, 2), datetime.date(1899, 12, 31),
        datetime.date(1900, 2, 28), datetime.date(1970, 1, 1),
        datetime.date(2000, 2, 29), datetime.date(2024, 12, 31),
        datetime.date(9999, 9, 30),  # +90d stays inside the calendar
    ]
    orders = pd.DataFrame(
        {
            "o_orderkey": range(1, len(dates) + 1),
            "o_orderdate": dates,  # pandas date objects -> parquet DATE
            "o_custkey": [1] * len(dates),
            "o_totalprice": [1.0] * len(dates),
        }
    )
    path = os.path.join(str(tmp_path), "orders.parquet")
    orders.to_parquet(path)
    q = load_all()["scalar_date_funcs"]
    sdf = q.fn(spark, str(tmp_path))
    sc, sr = canon_rows(list(sdf.columns), [tuple(r) for r in sdf.collect()])
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM '{path}'")
    cur = con.execute(q.oracle)
    dc, dr = canon_rows([x[0] for x in cur.description], [tuple(r) for r in cur.fetchall()])
    con.close()
    assert sc == dc and sr == dr


def test_json_extract_matches_oracle_on_adversarial_props(spark, tmp_path):
    """Adversarial-JSON probe (r9): events_json_extract vs its oracle on
    props the driver corpus and nets never produce — floats, scientific
    notation, string-typed numbers, nested objects, array roots, int32
    and bigint overflow, -0, leading zeros (invalid JSON), unquoted keys,
    empty and non-JSON strings. The probe found the old regexp oracle
    matching nested "k" tokens and truncating floats where Spark's typed
    from_json yields NULL; the oracle now uses real JSON-path semantics
    with an integer-token guard. Duplicate keys stay out of contract
    (Jackson last-wins vs yyjson first-wins; JSON leaves it undefined)."""
    import os

    import duckdb
    import pandas as pd

    from n5_dask_spark.registry import load_all
    from tests.oracle_harness import canon_rows

    props = [
        '{"k": 5}', '{"k":-5}', '{"k": 0}', '{"k": -0}', '{"k": 1.5}',
        '{"k": "12"}', '{"k": null}', '{"k": true}', '{"k": 1e2}',
        '{"k": 007}', '{"k": 2147483648}', '{"k": -2147483648}',
        '{"k": 99999999999999999999}', '{"j": {"k": 7}}', '[{"k": 1}]',
        '{"kk": 3}', '{k: 5}', '', 'not json', '{"k": []}',
        '{"a": 1, "k": 42}', '{"k": 5, "a": 1}', '   {"k": 9}   ',
        # r9 parser-leniency probe additions — all engine-agreed: raw
        # control chars in strings invalidate on both (Jackson and yyjson
        # reject unescaped NUL/tab/newline), escaped \\u0000 parses on
        # both, single quotes now rejected on both (allowSingleQuotes
        # =false), BOM/hex/leading-plus/NaN/comments invalid on both,
        # deep nesting fine on both
        '{"k": 1\x00}', '{"a":"b\x00c","k":2}', '{"a":"b\\u0000c","k":3}',
        '{"a":"tab\there","k":4}', '{"a":"nl\nhere","k":5}',
        "{'k': 10}", '﻿{"k":7}', '{"k": 0x10}', '{"k": +8}',
        '{"k":NaN}', '{"k":11 /*c*/}',
        '{"k":6,"a":' + '{"b":' * 400 + '1' + '}' * 400 + '}',
    ]
    events = pd.DataFrame(
        {
            "event_id": range(len(props)),
            "ts": pd.to_datetime(["2024-03-01"] * len(props)).astype("datetime64[us]"),
            "user_id": [1] * len(props),
            "event_type": ["view"] * len(props),
            "value": [1.0] * len(props),
            "props": props,
        }
    )
    events.to_parquet(os.path.join(str(tmp_path), "events.parquet"))
    q = load_all()["events_json_extract"]
    sdf = q.fn(spark, str(tmp_path))
    sc, sr = canon_rows(list(sdf.columns), [tuple(r) for r in sdf.collect()])
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{os.path.join(str(tmp_path), 'events.parquet')}'"
    )
    cur = con.execute(q.oracle)
    dc, dr = canon_rows([x[0] for x in cur.description], [tuple(r) for r in cur.fetchall()])
    con.close()
    assert sc == dc and sr == dr


def test_csv_roundtrip_matches_oracle_on_hostile_strings(spark, tmp_path):
    """Hostile-string probe (r9): the format roundtrips vs their oracle on
    lang values the doc net never draws — empty string, embedded
    comma/quote/newline, leading/trailing whitespace, tabs, unicode, and
    the literal string 'NULL'. The probe found THREE real CSV lanes:
    Spark's CSV writer trims whitespace by default, '' read back as NULL,
    and embedded newlines split records without multiLine — all fixed via
    the roundtrip's explicit option contract. The one documented residual
    (pinned below): a literal \\N — the nullValue sentinel — still maps
    to NULL on read; Spark matches nullValue after unquoting, so no
    quoting convention can protect it (the Hive/MySQL-export limitation)."""
    import os

    import duckdb
    import pandas as pd

    from n5_dask_spark.registry import load_all
    from tests.oracle_harness import canon_rows

    langs = [
        "en", "", "with,comma", 'with"quote', "with\nnewline", "uñicode",
        "  padded  ", "x" * 30, "NULL", "\t tab",
    ]
    docs = pd.DataFrame(
        {
            "doc_id": range(len(langs) * 3),
            "text": ["t"] * len(langs) * 3,
            "lang": langs * 3,
            "source": ["web"] * len(langs) * 3,
        }
    )
    docs["n_chars"] = docs["text"].str.len().astype("int64")
    path = os.path.join(str(tmp_path), "documents.parquet")
    docs.to_parquet(path)
    reg = load_all()
    for name in ("formats_csv_roundtrip", "formats_json_roundtrip", "formats_orc_roundtrip"):
        q = reg[name]
        sdf = q.fn(spark, str(tmp_path))
        sc, sr = canon_rows(list(sdf.columns), [tuple(r) for r in sdf.collect()])
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM '{path}'")
        cur = con.execute(q.oracle)
        dc, dr = canon_rows([x[0] for x in cur.description], [tuple(r) for r in cur.fetchall()])
        con.close()
        assert (sc, sr) == (dc, dr), name

    # the documented sentinel boundary: literal \N reads back as NULL
    docs2 = docs.copy()
    docs2["lang"] = ["\\N"] * len(docs2)
    docs2.to_parquet(path)
    rows = reg["formats_csv_roundtrip"].fn(spark, str(tmp_path)).collect()
    assert len(rows) == 1 and rows[0]["lang"] is None


def test_embedding_stats_match_oracles_on_nonfinite_vectors(spark, tmp_path):
    """Non-finite-embedding probe (r9): NaN/Inf elements and empty vectors
    — legal-at-scale embedder failures — through the two single-vector
    statistics queries. The probe found embedding_quantize_int8
    ANSI-killing the whole job on one NaN row (bare CAST(NaN AS INT), on
    BOTH engines) and empty vectors diverging (Spark aggregate seed 0 vs
    DuckDB list_sum NULL); malformed vectors now keep their row with NULL
    stats. embedding_dimension_stats crashed DuckDB's decimal cast on
    NaN; stats now run over finite elements only on both engines. The
    PAIR-cosine queries (knn_*, near-dup) keep non-finite vectors out of
    contract like ragged ones — pair ranking with NaN has no portable
    order."""
    import os

    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from n5_dask_spark.registry import load_all
    from tests.oracle_harness import canon_rows

    rng = np.random.default_rng(3)
    emb_rows = [list(map(float, (rng.random(8) * 2 - 1).astype(np.float32))) for _ in range(40)]
    emb_rows[3][2] = float("nan")
    emb_rows[7][0] = float("inf")
    emb_rows[11][5] = float("-inf")
    emb_rows[15] = []
    emb_rows[19] = [float("nan")] * 8
    tbl = pa.table(
        {
            "vec_id": pa.array(range(len(emb_rows)), pa.int64()),
            "embedding": pa.array(emb_rows, pa.list_(pa.float32())),
            "label": pa.array([i % 7 for i in range(len(emb_rows))], pa.int32()),
        }
    )
    path = os.path.join(str(tmp_path), "embeddings.parquet")
    pq.write_table(tbl, path)
    reg = load_all()
    for name in ("embedding_quantize_int8", "embedding_dimension_stats"):
        q = reg[name]
        sdf = q.fn(spark, str(tmp_path))
        sc, sr = canon_rows(list(sdf.columns), [tuple(r) for r in sdf.collect()])
        con = duckdb.connect()
        con.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{path}'")
        cur = con.execute(q.oracle)
        dc, dr = canon_rows([x[0] for x in cur.description], [tuple(r) for r in cur.fetchall()])
        con.close()
        assert (sc, sr) == (dc, dr), name
        # malformed rows kept, stats NULLed (not dropped, not a crash)
        if name == "embedding_quantize_int8":
            assert len(sr) == 40 and any(None in r for r in sr)


def test_dsum_nonfinite_boundary_is_characterized(spark):
    """Pins the r9-probed dsum asymmetry the registry notes document:
    CAST(NaN AS DECIMAL) is NULL on Spark (the row silently leaves the
    sum) but an error on DuckDB — so decimal-exact aggregated columns
    (money, event values) are contractually finite. If either engine
    changes this behavior, this test flips and the contract note must be
    revisited."""
    import duckdb
    import pytest

    from pyspark.sql import functions as F

    df = spark.createDataFrame([(1.0,), (float("nan",),)], "v double")
    got = df.agg(
        F.expr("CAST(SUM(CAST(v AS DECIMAL(18,6))) AS DOUBLE)").alias("s")
    ).collect()[0]["s"]
    assert got == 1.0  # Spark: NaN -> NULL decimal -> skipped by SUM
    with pytest.raises(duckdb.Error):
        duckdb.sql(
            "SELECT CAST(SUM(CAST(v AS DECIMAL(18,6))) AS DOUBLE)"
            " FROM (VALUES (1.0), (CAST('nan' AS DOUBLE))) t(v)"
        ).fetchone()


def test_partitioned_pruning_matches_oracle_on_hostile_partition_values(spark, tmp_path):
    """Hostile partition-value probe (r9, clean): o_orderpriority values
    containing '/', '=', spaces, unicode and '%' go through
    partitionBy's Hive-style directory escaping and read back exactly —
    the escaped-path decode agrees with the parquet oracle, and the
    pruned filter still selects the right two partitions."""
    import os

    import duckdb
    import pandas as pd

    from n5_dask_spark.registry import load_all
    from tests.oracle_harness import canon_rows

    pris = ["1-URGENT", "2-HIGH", "3/SLASH", "4=EQ", "5 SP ACE", "6-üni", "7:colon", "8%pct"]
    orders = pd.DataFrame(
        {
            "o_orderkey": range(len(pris) * 5),
            "o_totalprice": [100.5] * len(pris) * 5,
            "o_orderpriority": pris * 5,
            "o_custkey": [1] * len(pris) * 5,
            "o_orderdate": pd.to_datetime(["2024-01-01"] * len(pris) * 5).astype(
                "datetime64[us]"
            ),
        }
    )
    path = os.path.join(str(tmp_path), "orders.parquet")
    orders.to_parquet(path)
    q = load_all()["formats_partitioned_pruning"]
    sdf = q.fn(spark, str(tmp_path))
    sc, sr = canon_rows(list(sdf.columns), [tuple(r) for r in sdf.collect()])
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM '{path}'")
    cur = con.execute(q.oracle)
    dc, dr = canon_rows([x[0] for x in cur.description], [tuple(r) for r in cur.fetchall()])
    con.close()
    assert (sc, sr) == (dc, dr)


def test_negative_zero_round_asymmetry_engine_level(spark):
    """Engine-level pin of the sign-of-zero ROUND asymmetry (r9 probe):
    Spark's ROUND(double, s) goes through java.math.BigDecimal, which has
    no negative zero, so any input in (-0.5*10^-s, 0] rounds to +0.0 —
    while DuckDB rounds the binary value in C and keeps the sign (-0.0).
    The driver's value hash stringifies cells ("-0.0" != "0.0"), so any
    SURFACED rounded column whose input can be tiny-negative is a hash
    flip waiting on corpus luck. Same asymmetry for CEIL/FLOOR of
    (-1, 0]: Spark returns BIGINT 0 (cast +0.0) where DuckDB's C ceil
    keeps -0.0. Normalization contract pinned here: `x + 0.0` maps -0.0
    to +0.0 (IEEE round-to-nearest) and is the identity on every other
    value, on both engines — every negative-capable surfaced round in an
    oracle spells it."""
    import math

    import duckdb

    from pyspark.sql import functions as F

    row = spark.range(1).select(
        F.round(F.lit(-1e-9), 6).alias("r"),
        F.ceil(F.lit(-0.3)).cast("double").alias("c"),
    ).collect()[0]
    assert math.copysign(1.0, row["r"]) > 0  # Spark round: +0.0
    assert math.copysign(1.0, row["c"]) > 0  # Spark ceil->bigint: +0.0

    d = duckdb.sql(
        "SELECT round(-1e-9::DOUBLE, 6), ceil(-0.3::DOUBLE),"
        " round(-1e-9::DOUBLE, 6) + 0.0, ceil(-0.3::DOUBLE) + 0.0"
    ).fetchone()
    assert math.copysign(1.0, d[0]) < 0  # DuckDB round keeps -0.0
    assert math.copysign(1.0, d[1]) < 0  # DuckDB ceil keeps -0.0
    assert math.copysign(1.0, d[2]) > 0  # + 0.0 normalizes
    assert math.copysign(1.0, d[3]) > 0


def test_surfaced_rounds_are_negative_zero_normalized(spark, tmp_path):
    """Negative-zero probe net (r9): crafted corpora force a tiny-negative
    value into every negative-capable SURFACED round/ceil/floor site —
    cosine of near-orthogonal embeddings, covariance of anti-correlated
    micro-balances, interpolated medians, z-scores a hair under the mean,
    balances in (-0.5, 0) — and every affected query must hash-match its
    oracle under the sign-of-zero-aware canon. Before the `+ 0.0`
    normalization convention this net failed on 11 queries."""
    import os

    import duckdb
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from n5_dask_spark.registry import load_all
    from tests.oracle_harness import canon_rows

    base = str(tmp_path)
    f32 = np.float32
    z7 = [0.0] * 7
    vecs = [
        [1.0] + [0.0] * 8,            # v0: bucket 1
        [-1e-10, 1.0] + z7,           # v1: dot(v0,v1) = -1e-10 -> cosine -0.0 lane
        [-1e-9] * 9,                  # v2: lone label -> centroid -1e-9 lane
        [1.0] + [0.0] * 7 + [-2e-10], # v3: bucket 1 (dim 9 not in the sign bits)
        [1e-10] + [0.0] * 7 + [1.0],  # v4: bucket 1; dot(v3,v4) = -1e-10
    ]
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(5), pa.int64()),
                "embedding": pa.array([[f32(x) for x in v] for v in vecs], pa.list_(pa.float32())),
                "label": pa.array([0, 0, 1, 2, 2], pa.int32()),
            }
        ),
        os.path.join(base, "embeddings.parquet"),
    )
    pd.DataFrame(
        {
            "s_suppkey": pd.array([0, 1], dtype="int64"),
            "s_name": ["a", "b"],
            "s_nationkey": pd.array([0, 0], dtype="int32"),
            "s_acctbal": [-0.04, -0.3],  # round_bal / ceil_bal -0.0 lanes
        }
    ).to_parquet(os.path.join(base, "supplier.parquet"))
    pd.DataFrame(
        {
            "c_custkey": pd.array([0, 1], dtype="int64"),
            "c_name": ["c0", "c1"],
            "c_nationkey": pd.array([0, 0], dtype="int32"),
            "c_acctbal": [2e-7, -4e-7],  # median interpolates to -1e-7
            "c_mktsegment": ["BUILDING", "BUILDING"],
        }
    ).to_parquet(os.path.join(base, "customer.parquet"))
    pd.DataFrame(
        {
            "o_orderkey": pd.array(range(4), dtype="int64"),
            "o_custkey": pd.array([0, 1, 0, 1], dtype="int64"),
            "o_orderstatus": ["O"] * 4,
            # covar_samp(total, bal) = -1e-6 -> ROUND(.,4) -0.0 lane;
            # order 3 sits 1e-9 under the decimal-exact mean -> zscore
            # in (-5e-7, 0)
            "o_totalprice": [10.0, 20.0, 15.0, 15.0 - 1e-9],
            "o_orderdate": pd.to_datetime(["2024-01-01"] * 4).astype("datetime64[us]"),
            "o_orderpriority": ["1-URGENT"] * 4,
        }
    ).to_parquet(os.path.join(base, "orders.parquet"))
    pd.DataFrame(
        {
            "l_orderkey": pd.array([0], dtype="int64"),
            "l_partkey": pd.array([0], dtype="int64"),
            "l_suppkey": pd.array([0], dtype="int64"),
            "l_linenumber": pd.array([1], dtype="int32"),
            "l_quantity": [1.0],
            "l_extendedprice": [-2e-7],  # bucket-0 lo/hi and percentile -0.0 lanes
            "l_discount": [0.0],
            "l_tax": [0.0],
            "l_returnflag": ["A"],
            "l_linestatus": ["O"],
            "l_shipdate": pd.to_datetime(["2024-01-01"]).astype("datetime64[us]"),
        }
    ).to_parquet(os.path.join(base, "lineitem.parquet"))

    names = [
        "agg_approx_quantiles",
        "agg_corr_covar",
        "agg_histogram_numeric",
        "agg_median_percentile",
        "array_funcs",
        "array_label_centroids",
        "embedding_dimension_stats",
        "knn_bruteforce_cosine",
        "knn_ivf_probe",
        "knn_signbucket_lsh",
        "scalar_math_funcs",
        "udf_pandas_zscore",
    ]
    reg = load_all()
    bad = []
    for n in names:
        q = reg[n]
        sdf = q.fn(spark, base)
        sc, sr = canon_rows(list(sdf.columns), [tuple(r) for r in sdf.collect()])
        con = duckdb.connect()
        for t in ("embeddings", "supplier", "customer", "orders", "lineitem"):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{os.path.join(base, t + '.parquet')}'")
        cur = con.execute(q.oracle)
        dc, dr = canon_rows([x[0] for x in cur.description], [tuple(r) for r in cur.fetchall()])
        con.close()
        if sc != dc or sr != dr:
            bad.append(n)
    assert not bad, bad


def test_stored_negative_zero_group_key_is_the_documented_boundary(spark):
    """Characterization pin for the one lane the `+ 0.0` convention does
    NOT cover (registry determinism notes): a STORED -0.0 surfaced as a
    raw GROUP BY key. Spark's NormalizeFloatingNumbers rewrites float
    grouping keys, so the merged ±0.0 group SURFACES +0.0; DuckDB merges
    too but keys the group by first occurrence and can surface -0.0.
    Rankings are safe on both engines: window order keys treat ±0.0 as
    ties (Spark normalizes them as well) and the stored cell value passes
    through untouched. Kept as a data contract — stored money doubles are
    never negative zero (no parquet writer in this corpus's lineage
    produces one; it only arises from computed negative underflow) — on
    the same footing as the dsum non-finite lane. Any future hash flip on
    q10_returned_items / q18_large_volume_customer checks this first."""
    import math

    import duckdb

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(-0.0,), (0.0,)], "v double")
    [(k, n)] = [(r["v"], r["count"]) for r in df.groupBy("v").count().collect()]
    assert n == 2 and math.copysign(1.0, k) > 0  # Spark: merged, surfaces +0.0

    [(dk, dn)] = duckdb.sql(
        "SELECT v, count(*) FROM (VALUES (-0.0::DOUBLE), (0.0::DOUBLE)) t(v) GROUP BY v"
    ).fetchall()
    assert dn == 2 and math.copysign(1.0, dk) < 0  # DuckDB: merged, first-seen -0.0

    # rankings tie on both engines (the rank-only raw-double queries are safe)
    ranks = sorted(
        r["rk"] for r in df.select(F.rank().over(Window.orderBy("v")).alias("rk")).collect()
    )
    dranks = sorted(
        r[0] for r in duckdb.sql(
            "SELECT rank() OVER (ORDER BY v) FROM (VALUES (-0.0::DOUBLE), (0.0::DOUBLE)) t(v)"
        ).fetchall()
    )
    assert ranks == [1, 1] == dranks


def test_dsum_magnitude_bound_refuses_loudly_on_both_engines(spark):
    """Completes the dsum data contract alongside the non-finite pin:
    a value with more than 12 integer digits overflows the
    CAST(x AS DECIMAL(18,6)) addend on BOTH engines, and both refuse
    LOUDLY (Spark ANSI NUMERIC_VALUE_OUT_OF_RANGE, DuckDB
    ConversionException) — no silent divergence, so unlike the NaN lane
    this needs no oracle guard: the job fails identically on either
    engine. Contract: decimal-exact aggregated columns are finite AND
    |x| < 1e12."""
    import duckdb
    import pytest

    df = spark.createDataFrame([(1e13,), (1.0,)], "v double")
    with pytest.raises(Exception, match="NUMERIC_VALUE_OUT_OF_RANGE"):
        df.selectExpr("CAST(SUM(CAST(v AS DECIMAL(18,6))) AS DOUBLE) AS s").collect()
    with pytest.raises(duckdb.Error):
        duckdb.sql(
            "SELECT CAST(SUM(CAST(v AS DECIMAL(18,6))) AS DOUBLE)"
            " FROM (VALUES (1e13), (1.0)) t(v)"
        ).fetchone()


def test_floor_ceil_clamp_boundary_engine_level(spark):
    """Engine-level pin of the floor/ceil magnitude boundary (r9 pass-5
    probe): Spark's floor/ceil(double) return BIGINT and SILENTLY CLAMP
    to +/-Long.MAX at |x| >= 2^63 — even under ANSI — while DuckDB's
    double-returning FLOOR/CEIL keep the true value. A silent VALUE
    divergence (worse than the loud dsum lane), closed in
    scalar_math_funcs by guarding the builtin to |x| < 2^63 and passing
    the value through beyond it (every double at |x| >= 2^63 > 2^52 is
    already integral, so floor(x) = ceil(x) = x there)."""
    import duckdb

    r = spark.sql("SELECT floor(1e308d) AS f, ceil(-1e308d) AS c").collect()[0]
    assert r.f == 9223372036854775807  # the silent clamp this pin documents
    assert r.c == -9223372036854775808
    d = duckdb.sql("SELECT FLOOR(1e308::DOUBLE), CEIL(-1e308::DOUBLE)").fetchone()
    assert d == (1e308, -1e308)


def test_math_funcs_match_oracle_on_extreme_magnitudes(spark, tmp_path):
    """scalar_math_funcs on a supplier corpus of extreme balances — the
    clamp boundary above plus every magnitude lane no net draws: +/-0.0,
    denormals, the exact 2^63 boundary from both sides, and +/-1e308.
    Before the floor/ceil guard, every |bal| >= 2^63 row hash-flipped
    silently (Spark surfaced 9.223372036854776e18 for floor(1e308));
    ROUND-at-6dp itself was probe-verified engine-equal at these
    magnitudes (sqrt is IEEE correctly-rounded; ln lands at O(100) where
    6dp absorbs libm's 1 ulp)."""
    import os

    import duckdb
    import pandas as pd

    from n5_dask_spark.registry import load_all
    from tests.oracle_harness import canon_rows

    bals = [
        0.0,
        -0.0,
        5e-324,
        -5e-324,
        2.5,
        -2.5,
        123.456,
        9223372036854774784.0,  # largest double below 2^63: builtin lane
        -9223372036854774784.0,
        9223372036854775808.0,  # exactly 2^63: first pass-through value
        9.3e18,
        -9.3e18,
        1e308,
        -1e308,
    ]
    df = pd.DataFrame(
        {
            "s_suppkey": range(1, len(bals) + 1),
            "s_name": [f"Supplier#{i}" for i in range(len(bals))],
            "s_nationkey": pd.array([i % 5 for i in range(len(bals))], dtype="int32"),
            "s_acctbal": bals,
        }
    )
    path = os.path.join(str(tmp_path), "supplier.parquet")
    df.to_parquet(path)
    q = load_all()["scalar_math_funcs"]
    sdf = q.fn(spark, str(tmp_path))
    sc, sr = canon_rows(list(sdf.columns), [tuple(r) for r in sdf.collect()])
    con = duckdb.connect()
    con.execute(f"CREATE VIEW supplier AS SELECT * FROM '{path}'")
    cur = con.execute(q.oracle)
    dc, dr = canon_rows([x[0] for x in cur.description], [tuple(r) for r in cur.fetchall()])
    con.close()
    assert sc == dc
    assert sr == dr, [(a, b) for a, b in zip(sr, dr) if a != b][:4]


def test_nul_extension_sort_tie_engine_level(spark):
    """Engine-level pin of the NUL-byte sort boundary (r9 NUL probe):
    DuckDB v1.0.0's SORT comparator — ORDER BY, rank, list_sort, whose
    sort keys are NUL-terminated — treats a string and its NUL-extension
    as EQUAL ('x' ties 'x\\x00'; list_sort falls back to input order,
    rank assigns the same rank) even though its own scalar '<' compares
    full bytes ('x' < 'x\\x00' is true). Spark compares full bytes
    everywhere. GROUP BY / equality stay byte-strict on BOTH engines
    (hashing, not the sort path), which is why only sorted/ranked keys
    are exposed. nul_escape (dedup.py) closes the lane: its output is
    NUL-free, so both comparators agree; identity on \\x00/\\x01-free
    input; injective, so distinct tokens stay distinct."""
    import duckdb

    from pyspark.sql import functions as F

    from n5_dask_spark.operators.dedup import nul_escape

    con = duckdb.connect()
    # scalar comparison is strict...
    assert con.execute("SELECT 'x' < ('x' || chr(0))").fetchone()[0] is True
    # ...but the sort comparator ties: list_sort keeps INPUT order both ways
    assert con.execute("SELECT list_sort(['x' || chr(0), 'x'])").fetchone()[0] == ["x\x00", "x"]
    assert con.execute("SELECT list_sort(['x', 'x' || chr(0)])").fetchone()[0] == ["x", "x\x00"]
    # rank over the pair ties them; group-by keeps them distinct
    assert con.execute(
        "SELECT rank() OVER (ORDER BY s) FROM (VALUES ('x'), ('x'||chr(0))) t(s)"
    ).fetchall() == [(1,), (1,)]
    assert con.execute(
        "SELECT COUNT(*) FROM (SELECT s FROM (VALUES ('x'), ('x'||chr(0))) t(s) GROUP BY s)"
    ).fetchone()[0] == 2
    # Spark: strict binary order in array_sort (prefix sorts first)
    got = spark.range(1).select(
        F.array_sort(F.array(F.lit("x\x00"), F.lit("x"))).alias("a")
    ).collect()[0]["a"]
    assert got == ["x", "x\x00"]
    # the escape closes the tie on the DuckDB side and is the identity
    # on NUL/ESC-free strings on both engines
    esc_ext = nul_escape("'x' || chr(0)")
    esc_plain = nul_escape("'plain'")
    esc_pair = con.execute(f"SELECT list_sort([{esc_ext}, 'x'])").fetchone()[0]
    assert esc_pair == ["x", "x\x01\x02"]
    assert con.execute(f"SELECT {esc_plain}").fetchone()[0] == "plain"
    assert spark.range(1).selectExpr(f"{esc_plain} AS e").collect()[0]["e"] == "plain"
    con.close()


def test_token_sort_queries_match_oracles_on_nul_bytes(spark, tmp_path):
    """NUL-byte probe net (r9 fourth pass): a crafted corpus plants the
    exact divergence lanes — a document whose token set holds both 'x'
    and its NUL-extension with the extension appearing FIRST (so DuckDB's
    tie-keeps-input-order list_sort and Spark's strict array_sort would
    join different canonical strings), frequency-TIED token pairs at the
    top-k boundary of the tf/tfidf rankings (so a raw-token row_number
    tiebreak would surface different (rk, tok) rows), plus \\x01/\\x02
    literals to exercise the escape's bijectivity. Before the
    nul_escape sort keys, text_fingerprint hash-flipped on this corpus
    (found live by the r9 NUL family probe); all three queries must now
    hash-match their oracles. The 42 other doc-family queries are
    NUL-safe by construction (byte-strict groupBy/equality) and stay
    netted via the unicode doc net's NUL lanes."""
    import os

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from n5_dask_spark.registry import load_all
    from tests.oracle_harness import canon_rows

    texts = [
        "l\x00 l reqm stpk",        # extension BEFORE base: list_sort tie lane
        "x\x00 x x\x00 x zz",       # tied freq (2 each) inside one source
        "y\x01 y\x01\x02 y",        # escape-char literals: bijectivity lane
        "x\x00 x plain words",      # spread the tie across docs
        "\x00 lone nul token",      # a token that IS a single NUL
        "plain ascii control doc",  # NUL-free control
    ]
    d = str(tmp_path)
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(texts), pa.string()),
            "source": pa.array(["web"] * len(texts), pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, os.path.join(d, "documents.parquet"))

    reg = load_all()
    for name in ("text_fingerprint", "text_tf_top_terms", "text_tfidf_top_terms"):
        q = reg[name]
        sdf = q.fn(spark, d)
        sc, sr = canon_rows(list(sdf.columns), [tuple(r) for r in sdf.collect()])
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'")
        cur = con.execute(q.oracle)
        dc, dr = canon_rows([x[0] for x in cur.description], [tuple(r) for r in cur.fetchall()])
        con.close()
        assert sc == dc, name
        assert sr == dr, (name, sr[:3], dr[:3])


def test_bigint_sum_overflow_boundary_is_characterized(spark):
    """BIGINT-sum overflow contract (r9 probe), the integer sibling of the
    dsum magnitude bound: every surfaced integer sum spells
    CAST(SUM(x) AS BIGINT) in its oracle, so a FINAL total beyond int64
    fails LOUDLY and engine-equally — Spark's long accumulator throws
    ARITHMETIC_OVERFLOW, DuckDB accumulates in HUGEINT and throws
    ConversionException casting the result down. The asymmetric residual
    is a TRANSIENT overflow with an in-range final total (mixed signs):
    Spark throws, partition-order-dependently, where DuckDB's int128
    silently succeeds — out of contract (registry notes); unreachable on
    this corpus's non-negative summed integers, where the running sum is
    monotone and transient == final."""
    import duckdb
    import pytest

    big = 6_000_000_000_000_000_000  # 2*big > 2^63-1 > big
    # final-total overflow: loud on BOTH engines
    df = spark.createDataFrame([(big,), (big,)], "v bigint")
    with pytest.raises(Exception, match="ARITHMETIC_OVERFLOW"):
        df.selectExpr("SUM(v)").collect()
    with pytest.raises(duckdb.Error):
        duckdb.sql(f"SELECT CAST(SUM(v) AS BIGINT) FROM (VALUES ({big}), ({big})) t(v)").fetchone()
    # transient lane: DuckDB silently succeeds (HUGEINT accumulator)...
    got = duckdb.sql(
        f"SELECT CAST(SUM(v) AS BIGINT) FROM (VALUES ({big}), ({big}), ({-big})) t(v)"
    ).fetchone()[0]
    assert got == big
    # ...where Spark's sequential long accumulator (single partition, so
    # the order is pinned) crosses 2^63 mid-stream and throws
    df3 = spark.createDataFrame([(big,), (big,), (-big,)], "v bigint").coalesce(1)
    with pytest.raises(Exception, match="ARITHMETIC_OVERFLOW"):
        df3.selectExpr("SUM(v)").collect()


def test_json_parser_leniency_lanes_are_the_documented_boundary(spark):
    """Characterization pin of the two JSON lanes kept OUT OF CONTRACT
    (r9 parser-leniency probe, registry notes + events.py oracle):
    (1) trailing content after the first document — Jackson (Spark
    from_json) stops at the end of the first value and parses it, yyjson
    (DuckDB) requires the whole string to be exactly one document and
    calls it invalid; (2) trailing commas — yyjson accepts them, Jackson
    rejects. Both are grammar-extension choices with no engine knob to
    align them (Jackson has no strict-trailing option under from_json;
    DuckDB doesn't expose yyjson flags). Machine-serialized event props
    produce neither. If either assert flips after an engine upgrade,
    revisit the contract note before touching any oracle."""
    import duckdb

    from pyspark.sql import functions as F

    cases = ['{"k":1}\x00', '{"k":1}{"k":2}', '{"k": 9,}']
    df = spark.createDataFrame([(i, c) for i, c in enumerate(cases)], "i int, p string")
    got = {
        r.i: r.k
        for r in df.select(
            "i",
            F.from_json("p", "k INT", {"allowSingleQuotes": "false"}).getField("k").alias("k"),
        ).collect()
    }
    assert got[0] == 1 and got[1] == 1  # Jackson: first document wins
    assert got[2] is None  # Jackson rejects trailing comma
    con = duckdb.connect()
    valid = [
        con.execute("SELECT json_valid(?)", [c]).fetchone()[0] for c in cases
    ]
    con.close()
    assert valid == [False, False, True]  # yyjson: exact opposite leniencies


def test_surfaced_timestamps_are_ntz_and_harness_catches_ltz(spark):
    """Surfaced-timestamp convention pin (r9 process-TZ gate): PySpark's
    collect() converts an LTZ timestamp via datetime.fromtimestamp — the
    PYTHON PROCESS timezone, which the tuned UTC SESSION zone does not
    govern — while TIMESTAMP_NTZ collects timezone-independently. Running
    the full gate with TZ=America/New_York exported before JVM launch
    flipped exactly one query: join_asof surfaced o_orderdate as LTZ
    (every other registered output was already NTZ). Pins the fix plus
    the harness guard that now fails ANY surfaced LTZ loudly, so the
    convention is enforced on every future gate/net run rather than only
    on TZ-hostile hosts."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import TimestampNTZType

    from n5_dask_spark.registry import load_all
    from tests.oracle_harness import _has_ltz

    sdf = load_all()["join_asof"].fn(spark, "/root/testdata/sf0.001")
    assert isinstance(sdf.schema["o_orderdate"].dataType, TimestampNTZType)
    assert not any(_has_ltz(f.dataType) for f in sdf.schema.fields)
    # the guard sees LTZ even nested inside structs/arrays
    probe = spark.range(1).select(
        F.struct(F.current_timestamp().alias("t")).alias("s"),
        F.array(F.lit(1)).alias("a"),
    )
    assert _has_ltz(probe.schema["s"].dataType)
    assert not _has_ltz(probe.schema["a"].dataType)


def test_nul_in_window_partition_key_is_the_documented_boundary(spark, tmp_path):
    """Characterization pin: DuckDB's NUL-terminated sort comparator also
    leaks into window partition-BOUNDARY detection. On a parquet corpus
    whose o_orderpriority pool holds both '1-URGENT' and its
    NUL-extension, window_range_between's oracle MERGES the two window
    partitions (frame counts span both) while Spark keeps them separate
    — and the merge is hash-group-adjacency-dependent (a VALUES-based
    repro of the same rows stays split). Every registered window
    partitions on ints, md5 hex, or machine-enum contract strings, so
    the lane is data contract (registry notes); this pin exists so an
    engine upgrade that changes either side is noticed before any
    contract note goes stale."""
    import datetime
    import os
    import random

    import duckdb
    import pandas as pd

    from n5_dask_spark.registry import load_all

    rng = random.Random(3)
    pool = [datetime.datetime(2024, 1, 1) + datetime.timedelta(hours=6 * k) for k in range(10)]
    orders = pd.DataFrame(
        {
            "o_orderkey": range(300),
            "o_custkey": [rng.randrange(0, 12) for _ in range(300)],
            "o_orderstatus": [rng.choice(["O", "F"]) for _ in range(300)],
            "o_totalprice": [float(rng.choice([10.0, 20.0, 30.0])) for _ in range(300)],
            "o_orderdate": [rng.choice(pool) for _ in range(300)],
            "o_orderpriority": [
                rng.choice(["1-URGENT", "1-URGENT\x00", "5-LOW"]) for _ in range(300)
            ],
        }
    )
    orders.astype({"o_orderdate": "datetime64[us]"}).to_parquet(tmp_path / "orders.parquet")
    q = load_all()["window_range_between"]

    sizes = orders[orders.o_custkey < 50].o_orderpriority.value_counts()
    both = int(sizes["1-URGENT"] + sizes["1-URGENT\x00"])
    # Spark: per-key partitions — no frame count can reach the merged size
    srows = q.fn(spark, str(tmp_path)).collect()
    s_max = max(r.n_within_1000 for r in srows if r.o_orderpriority.startswith("1-URGENT"))
    assert s_max == int(sizes["1-URGENT\x00"])  # the larger of the two, alone
    # DuckDB: the two partitions merge — the max frame spans BOTH keys
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM '{tmp_path / 'orders.parquet'}'")
    drows = con.execute(q.oracle).fetchall()
    con.close()
    d_max = max(r[3] for r in drows if r[1].startswith("1-URGENT"))
    assert d_max == both


def test_partitioned_write_refuses_nul_partition_values_loudly(spark, tmp_path):
    """A NUL byte in a partition-column value kills the partitioned write
    LOUDLY: Spark's Hive path escaping leaves the raw NUL in the
    directory name ('p=a<NUL>b') and the filesystem rejects it (Mkdirs
    failure -> TASK_WRITE_FAILED). Loud is correct — a NUL in an enum
    partition column is corrupt data, and silently escaping it would
    just defer the surprise to the read side — so
    formats_partitioned_pruning carries no guard (registry notes)."""
    import pytest

    df = spark.createDataFrame([(1, "a\x00b"), (2, "ok")], "k int, p string").coalesce(1)
    with pytest.raises(Exception, match="TASK_WRITE_FAILED"):
        df.write.mode("overwrite").partitionBy("p").parquet(str(tmp_path / "out"))


def test_partitioned_write_conflates_empty_string_with_null(spark, tmp_path):
    """Characterization pin of the Hive-layout NULL conflation (r9 probe):
    a partitioned write maps an empty-string partition value onto the
    same __HIVE_DEFAULT_PARTITION__ directory as NULL, so '' reads back
    as NULL — a silent roundtrip mutation inherent to encoding values in
    directory NAMES (a name can't be empty). formats_partitioned_pruning
    is immune: its partition-column IN-filter drops '' and NULL alike
    before anything is compared. Registry notes carry the partition-
    column contract (non-empty, NUL-free, not the sentinel)."""
    df = spark.createDataFrame([(1, ""), (2, "ok"), (3, None)], "k int, p string").coalesce(1)
    out = str(tmp_path / "part")
    df.write.mode("overwrite").partitionBy("p").parquet(out)
    back = sorted(
        (r.k, r.p) for r in spark.read.schema(df.schema).parquet(out).collect()
    )
    assert back == [(1, None), (2, "ok"), (3, None)]  # '' came back as NULL


# Queries that CANNOT stay engine-equal when the driver's DOUBLE measure
# columns arrive physically narrowed to float32 — every one does arithmetic
# on a narrowed measure (decimal-exact sums: CAST(float32 AS DECIMAL) takes
# different routes — Spark scales the shortest repr, DuckDB scales in
# float32 arithmetic, the r8 embeddings find generalized; quantile/median
# interpolation and pandas-UDF statistics: numpy propagates float32 through
# the arithmetic where DuckDB computes in double). Frozen by the narrow-
# schema net below; see its docstring for the contract and upgrade path.
NARROW_DIVERGENT = {
    "agg_approx_quantiles",
    "agg_filter_clause",
    "agg_median_percentile",
    "agg_rollup",
    "events_session_window",
    "events_sliding_window",
    "events_tumbling_window",
    "formats_partitioned_pruning",
    "join_bucketed_colocated",
    "join_range_binned",
    "join_salted",
    "pivot_segment_by_year",
    "q1_pricing_summary",
    "q2_min_cost_supplier",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q9_product_profit",
    "q10_returned_items",
    "q11_important_value",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    "q19_discounted_revenue",
    "q22_global_sales_opportunity",
    "streaming_session_window",
    "streaming_static_dim_join",
    "streaming_stateful_running_totals",
    "streaming_tumbling_agg",
    "udaf_applyinpandas_minmax_scale",
    "udf_pandas_zscore",
    "udtf_fee_schedule",
    "upsert_orders_snapshot",
    "window_running_sum",
}


@pytest.mark.slow  # ~2.5 min: whole-registry sweep on a narrowed physical schema
def test_queries_characterized_on_narrow_physical_schema(spark, tmp_path):
    """Physical-schema robustness net (r9 pass 5). The driver has
    regenerated testdata with a different parquet PHYSICAL encoding
    before (r4: events.ts arrived TIMESTAMP(NANOS) and every read path
    adapted), so this net asks the generalized question: which queries
    survive the same LOGICAL schema arriving physically narrowed —
    every BIGINT as int32, every DOUBLE measure as float32?

    Answer, frozen here: all ~126 structural queries pass untouched
    (joins/windows/group-bys on int32 keys, the whole text/dedup/
    similarity/multimodal/N5 families — narrowing keys breaks NOTHING),
    while the NARROW_DIVERGENT set above — exactly the queries doing
    arithmetic on a narrowed MEASURE — splits between the engines for
    documented reasons (float32->DECIMAL cast routes, float32-propagating
    numpy statistics, interpolation precision).

    Contract: TESTDATA.md declares measures DOUBLE and keys BIGINT; a
    regen to float32 would be a LOGICAL precision change, unlike the
    in-contract NANOS encoding change. If it ever happens, the upgrade
    path is the r8 fix generalized: hop CAST(col AS DOUBLE) before every
    DECIMAL addend on both engines (a no-op on double columns) and pin
    pandas UDF inputs to float64 — this net then moves those queries to
    the passing side and shrinks the frozen set."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from n5_dask_spark.catalog import TABLES
    from tests.oracle_harness import compare_query

    src = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")
    for t in TABLES:
        tab = pq.read_table(os.path.join(src, f"{t}.parquet"))
        fields = [
            pa.field(f.name, pa.int32())
            if pa.types.is_int64(f.type)
            else pa.field(f.name, pa.float32())
            if pa.types.is_float64(f.type)
            else f
            for f in tab.schema
        ]
        # pyarrow cast checks overflow: an out-of-range key fails LOUDLY
        pq.write_table(tab.cast(pa.schema(fields)), os.path.join(str(tmp_path), f"{t}.parquet"))

    from n5_dask_spark.registry import load_all

    failed = set()
    for name, q in load_all().items():
        if q.oracle is None:
            continue
        if not compare_query(spark, name, str(tmp_path))["match"]:
            failed.add(name)
    assert failed == NARROW_DIVERGENT, {
        "newly_divergent": sorted(failed - NARROW_DIVERGENT),
        "newly_robust": sorted(NARROW_DIVERGENT - failed),
    }


def test_doc_queries_characterized_on_duplicate_doc_ids(spark, tmp_path):
    """Duplicate-PRIMARY-KEY probe (r9 pass 5): every net generates unique
    doc_ids, but corrupt upstream keying is a real production state. On a
    corpus where three ids each carry TWO different texts (including one
    id whose rows share a shingle, and an identical text under two
    DIFFERENT ids):

    - the corpus-derived N5/TIFF/OME fixture family REFUSES LOUDLY at its
      shared derivation point (`_voxels`: the doc_id = i % n_docs join
      fans out per duplicate and the engines resolved the ambiguity
      differently — this probe originally found all 13 hash-flipping
      SILENTLY, same class as the empty-corpus lane);
    - the shingle/bigram oracles stay engine-equal: the flat/LEAD rewrite
      partitions on a PER-ROW id, so duplicate doc_ids can never
      interleave token positions across rows (this probe caught the
      first rewrite partitioning by doc_id doing exactly that);
    - exactly the three minhash pair-graph queries diverge, pinned here
      as the documented data contract: Spark computes signatures PER ROW
      (the fused Arrow signature) while the oracle merges shingles PER
      doc_id before hashing — under duplicate ids those are genuinely
      different semantics with no canonical answer (is a doc-id with two
      texts one document or two?). doc_id is the dedup unit; uniqueness
      is the upstream contract, like NUL-free enums for partition
      columns. Everything else in the family is engine-equal unchanged.
    """
    import os

    import duckdb
    import pandas as pd

    from n5_dask_spark.registry import load_all
    from tests.oracle_harness import canon_rows

    rows = [
        (0, "alpha beta gamma", "en", "web"),
        (0, "delta epsilon", "de", "book"),
        (1, "alpha beta gamma", "en", "web"),
        (1, "zeta eta theta iota", "fr", "web"),
        (2, "kappa", "en", "code"),
        (3, "lambda mu nu", "de", "book"),
        (3, "xi omicron pi alpha", "fr", "web"),
        (4, "rho sigma", "en", "web"),
        (5, "aaa bbb ccc ddd", "en", "web"),
        (5, "aaa bbb ccc eee", "en", "web"),
    ]
    df = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source"])
    df["n_chars"] = df["text"].str.len().astype("int64")
    path = os.path.join(str(tmp_path), "documents.parquet")
    df.to_parquet(path)

    reg = load_all()
    divergent, refused = set(), set()
    for n in _doc_only_query_names():
        q = reg[n]
        try:
            sdf = q.fn(spark, str(tmp_path))
            sc, sr = canon_rows(list(sdf.columns), [tuple(r) for r in sdf.collect()])
        except ValueError as e:
            assert "duplicate doc_ids" in str(e), (n, str(e))
            refused.add(n)
            continue
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM '{path}'")
        cur = con.execute(q.oracle)
        dc, dr = canon_rows([x[0] for x in cur.description], [tuple(r) for r in cur.fetchall()])
        con.close()
        if sc != dc or sr != dr:
            divergent.add(n)
    assert divergent == {"dedup_minhash_lsh", "dedup_cc_star", "dedup_connected_clusters"}, divergent
    assert len(refused) >= 10  # the whole fixture family refuses loudly


def test_voxels_null_doc_id_refused(spark, tmp_path):
    """NULL-doc_id probe (r10 ADVICE closure): NULL ids never match the
    `doc_id = i % n_docs` join, silently dropping their voxels — and
    countDistinct ignores NULLs, so before r10 a NULL-id corpus tripped
    the DUPLICATE branch with a misleading message. `_voxels` now refuses
    with a dedicated NULL-doc_id error; a corpus whose non-NULL ids are
    unique must name NULLs, not duplicates."""
    import os

    import pandas as pd
    import pytest

    from n5_dask_spark.operators.n5oracle import _voxels

    df = pd.DataFrame(
        {
            "doc_id": pd.array([0, 1, None, 3], dtype="Int64"),
            "text": ["alpha", "beta", "gamma", "delta"],
            "lang": ["en", "de", "fr", "en"],
            "source": ["web", "book", "web", "code"],
            "n_chars": pd.array([5, 4, 5, 5], dtype="int64"),
        }
    )
    df.to_parquet(os.path.join(str(tmp_path), "documents.parquet"))
    with pytest.raises(ValueError, match="NULL doc_ids"):
        _voxels(spark, str(tmp_path))


def test_event_order_queries_match_oracles_on_extreme_timestamps(spark, tmp_path):
    """Extreme-timestamp probe (r9 pass 5): pre-epoch times (1965; the
    last microsecond of 1969), the epoch itself, the 1582 cutover week,
    year 1, year 9999, all through the batch events/orders family — no
    net draws times outside the 2024-ish telemetry band. 26 of 27
    queries are engine-equal unchanged (window bucketing FLOORS on both
    engines, so pre-epoch events land in the right hour; proleptic
    Gregorian agreement was already pinned by the r9 date probe).

    The one boundary, pinned here: scalar_date_funcs' due_date
    (o_orderdate + 90 days) OVERFLOWS the Python datetime ceiling when
    o_orderdate sits within 90 days of 9999-12-31 — Spark's collect()
    raises ValueError (loud) while DuckDB's client silently degrades
    the cell to a STRING ('10000-03-29 12:00:00'), a type flip the
    driver hash would catch but never a silent value agreement. Data
    contract: date-arithmetic outputs must stay within year 9999
    (o_orderdate <= 9999-10-02 for +90d); real order data sits
    millennia inside it."""
    import os
    from datetime import datetime

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from n5_dask_spark.registry import load_all
    from tests.oracle_harness import canon_rows

    ts_pool = [
        datetime(1965, 3, 15, 14, 30, 7, 123456),
        datetime(1969, 12, 31, 23, 59, 59, 999999),
        datetime(1970, 1, 1, 0, 0, 0),
        datetime(1970, 1, 1, 0, 59, 59),
        datetime(1, 1, 5, 3, 4, 5),
        datetime(1582, 10, 12, 6, 0, 0),
        datetime(9999, 12, 30, 12, 0, 0),
        datetime(2024, 5, 5, 10, 0, 0),
    ]
    import random

    rng = random.Random(3)
    rows = [
        (
            i,
            ts_pool[i % len(ts_pool)],
            i % 7,
            ["click", "view", "purchase"][i % 3],
            round(rng.uniform(-50, 150), 2),
            '{"k": %d}' % (i % 5),
        )
        for i in range(64)
    ]
    ev = pa.schema(
        [
            ("event_id", pa.int64()),
            ("ts", pa.timestamp("us")),
            ("user_id", pa.int64()),
            ("event_type", pa.string()),
            ("value", pa.float64()),
            ("props", pa.string()),
        ]
    )
    pq.write_table(
        pa.table({n: [r[j] for r in rows] for j, n in enumerate(ev.names)}, schema=ev),
        os.path.join(str(tmp_path), "events.parquet"),
    )
    od = pa.schema(
        [
            ("o_orderkey", pa.int64()),
            ("o_custkey", pa.int64()),
            ("o_orderstatus", pa.string()),
            ("o_totalprice", pa.float64()),
            ("o_orderdate", pa.timestamp("us")),
            ("o_orderpriority", pa.string()),
        ]
    )
    orows = [
        (
            i,
            i % 7,
            "OF"[i % 2],
            round(rng.uniform(100, 9000), 2),
            ts_pool[i % len(ts_pool)],
            ["1-URGENT", "2-HIGH", "3-MEDIUM"][i % 3],
        )
        for i in range(24)
    ]
    pq.write_table(
        pa.table({n: [r[j] for r in orows] for j, n in enumerate(od.names)}, schema=od),
        os.path.join(str(tmp_path), "orders.parquet"),
    )

    reg = load_all()
    ev_others = (
        "region",
        "nation",
        "customer",
        "supplier",
        "lineitem",
        "documents",
        "embeddings",
        "part ",
    )
    names = sorted(
        n
        for n, q in reg.items()
        if q.oracle
        and "stream" not in n
        and ("events" in q.oracle or "orders" in q.oracle)
        and not any(t in q.oracle for t in ev_others)
    )
    assert len(names) >= 25
    bad = []
    for n in names:
        q = reg[n]
        if n == "scalar_date_funcs":
            # the pinned boundary: due_date crosses year 9999
            with pytest.raises(ValueError, match="year 10000 is out of range"):
                q.fn(spark, str(tmp_path)).collect()
            continue
        sdf = q.fn(spark, str(tmp_path))
        sc, sr = canon_rows(list(sdf.columns), [tuple(r) for r in sdf.collect()])
        con = duckdb.connect()
        for t in ("events", "orders"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{os.path.join(str(tmp_path), t + '.parquet')}'"
            )
        cur = con.execute(q.oracle)
        dc, dr = canon_rows([x[0] for x in cur.description], [tuple(r) for r in cur.fetchall()])
        con.close()
        if sc != dc or sr != dr:
            bad.append(n)
    assert not bad, bad
    # the DuckDB half of the pin: past the Python ceiling the client
    # silently degrades to a STRING instead of raising
    assert isinstance(
        duckdb.sql("SELECT TIMESTAMP '9999-12-30 12:00:00' + INTERVAL 90 DAY").fetchone()[0],
        str,
    )


def test_doc_queries_match_oracles_on_null_rows(spark, tmp_path):
    """NULL-row probe (r9 pass 5): every net emits non-null strings, but
    nullable columns are the parquet default and NULL text/lang/source
    rows are ordinary dirty data. The whole doc family is engine-equal
    on them — both engines propagate NULL identically through the
    tokenizer stack (split/regexp on NULL -> NULL, md5(NULL) group key,
    NULL-safe grouping) — EXCEPT the corpus-derived fixture family,
    where md5(i ':' NULL) -> NULL -> NaN voxels hit numpy's
    astype(uint8) as PLATFORM GARBAGE (this probe caught
    ome_channels_zprofile hash-flipping silently with a RuntimeWarning
    from tiffops); `_voxels` now refuses NULL lang loudly alongside its
    empty-corpus and duplicate-id refusals."""
    import os

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from n5_dask_spark.registry import load_all
    from tests.oracle_harness import canon_rows

    sch = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("text", pa.string()),
            ("lang", pa.string()),
            ("source", pa.string()),
            ("n_chars", pa.int64()),
        ]
    )
    rows = [
        (0, "alpha beta gamma delta", "en", "web", 22),
        (1, None, "en", "web", 0),
        (2, "epsilon zeta", None, "book", 12),
        (3, "eta theta iota kappa", "de", None, 20),
        (4, None, None, None, 0),
        (5, "lambda mu nu xi", "fr", "web", 15),
        (6, "alpha beta gamma delta", "en", "web", 22),
    ]
    path = os.path.join(str(tmp_path), "documents.parquet")
    pq.write_table(
        pa.table({n: [r[j] for r in rows] for j, n in enumerate(sch.names)}, schema=sch), path
    )
    reg = load_all()
    bad, refused = [], 0
    for n in _doc_only_query_names():
        q = reg[n]
        try:
            sdf = q.fn(spark, str(tmp_path))
            sc, sr = canon_rows(list(sdf.columns), [tuple(r) for r in sdf.collect()])
        except ValueError as e:
            assert "NULL lang rows" in str(e), (n, str(e))
            refused += 1
            continue
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM '{path}'")
        cur = con.execute(q.oracle)
        dc, dr = canon_rows([x[0] for x in cur.description], [tuple(r) for r in cur.fetchall()])
        con.close()
        if sc != dc or sr != dr:
            bad.append(n)
    assert not bad, bad
    assert refused >= 10  # the fixture family refuses loudly


def test_event_order_queries_characterized_on_null_rows(spark, tmp_path):
    """NULL-row probe for the events/orders family (r9 pass 5): NULL ts,
    user_id, event_type, value, props, o_orderdate, o_custkey,
    o_totalprice scattered through ordinary 2024 telemetry — dirty-data
    lanes no net draws (generators emit non-null columns).

    Found and FIXED in-round: both Python-extension queries CRASHED in
    every executor on one NULL o_totalprice (udf_sql_registered's bare
    `total < 100000` and udtf_fee_schedule's `total * 0.01` raised
    TypeError — one dirty row killing a 100-TB job). Both now mirror
    their oracles' SQL semantics exactly: CASE's ELSE catches NULL
    ('L'); GREATEST(NULL, 0) is NULL-skipping 0 on BOTH engines, so a
    NULL price yields fee rows (NULL, 0.0, 0.0).

    Frozen as the NULL-KEY data contract (the registry determinism
    notes' nullable-key rule, now empirically confirmed): rank/window
    queries whose ORDER BY key can be NULL split on default null
    ordering (Spark NULLS FIRST vs DuckDB NULLS LAST); Spark's
    window()/session_window DROP NULL event times where time_bucket
    keeps a NULL bucket; join_asof's running-last and min_by/max_by
    have engine-specific NULL placement. All driver columns carrying
    those keys are non-null; the probe pins the exact divergent set so
    any drift — a fix or a new leak — surfaces."""
    import os
    import random
    from datetime import datetime

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from n5_dask_spark.registry import load_all
    from tests.oracle_harness import canon_rows

    rng = random.Random(9)
    ev = pa.schema(
        [
            ("event_id", pa.int64()),
            ("ts", pa.timestamp("us")),
            ("user_id", pa.int64()),
            ("event_type", pa.string()),
            ("value", pa.float64()),
            ("props", pa.string()),
        ]
    )
    rows = []
    for i in range(40):
        t = datetime(2024, 3, 1 + i % 5, 8 + (i // 5) % 10, 7 * (i % 8))
        rows.append(
            (
                i,
                None if i % 13 == 3 else t,
                None if i % 11 == 4 else i % 6,
                None if i % 17 == 5 else ["click", "view", "purchase"][i % 3],
                None if i % 7 == 6 else round(rng.uniform(-50, 150), 2),
                None if i % 19 == 7 else '{"k": %d}' % (i % 5),
            )
        )
    pq.write_table(
        pa.table({n: [r[j] for r in rows] for j, n in enumerate(ev.names)}, schema=ev),
        os.path.join(str(tmp_path), "events.parquet"),
    )
    od = pa.schema(
        [
            ("o_orderkey", pa.int64()),
            ("o_custkey", pa.int64()),
            ("o_orderstatus", pa.string()),
            ("o_totalprice", pa.float64()),
            ("o_orderdate", pa.timestamp("us")),
            ("o_orderpriority", pa.string()),
        ]
    )
    orows = [
        (
            i,
            None if i % 9 == 2 else i % 6,
            None if i % 11 == 3 else "OF"[i % 2],
            None if i % 7 == 4 else round(rng.uniform(100, 9000), 2),
            None if i % 13 == 5 else datetime(2024, 3, 1 + i % 6, 12, 0),
            ["1-URGENT", "2-HIGH", "3-MEDIUM"][i % 3],
        )
        for i in range(20)
    ]
    pq.write_table(
        pa.table({n: [r[j] for r in orows] for j, n in enumerate(od.names)}, schema=od),
        os.path.join(str(tmp_path), "orders.parquet"),
    )

    reg = load_all()
    ev_others = (
        "region",
        "nation",
        "customer",
        "supplier",
        "lineitem",
        "documents",
        "embeddings",
        "part ",
    )
    names = sorted(
        n
        for n, q in reg.items()
        if q.oracle
        and "stream" not in n
        and ("events" in q.oracle or "orders" in q.oracle)
        and not any(t in q.oracle for t in ev_others)
    )
    divergent = set()
    for n in names:
        q = reg[n]
        sdf = q.fn(spark, str(tmp_path))
        sc, sr = canon_rows(list(sdf.columns), [tuple(r) for r in sdf.collect()])
        con = duckdb.connect()
        for t in ("events", "orders"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{os.path.join(str(tmp_path), t + '.parquet')}'"
            )
        cur = con.execute(q.oracle)
        dc, dr = canon_rows([x[0] for x in cur.description], [tuple(r) for r in cur.fetchall()])
        con.close()
        if sc != dc or sr != dr:
            divergent.add(n)
    assert divergent == {
        "agg_argminmax_bool",
        "events_session_window",
        "events_sessionization_funnel",
        "events_sliding_window",
        "events_tumbling_window",
        "join_asof",
        "window_first_last",
        "window_lag_lead",
        "window_row_number",
        "window_running_sum",
    }, divergent


def test_embedding_queries_match_oracles_on_null_rows(spark, tmp_path):
    """Completes the r9 NULL-row probe family: NULL vec_id, NULL label
    and NULL embedding arrays scattered through an 8-dim corpus — all
    8 embeddings-family queries engine-equal with no guard changes (the
    r8 NULL-cosine convention and the finite-element guards already
    carry the lane)."""
    import os

    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from n5_dask_spark.registry import load_all
    from tests.oracle_harness import canon_rows

    rng = np.random.default_rng(5)
    n, dim = 60, 8
    emb = (rng.random((n, dim), dtype=np.float32) * 2 - 1).astype(np.float32)
    sch = pa.schema(
        [("vec_id", pa.int64()), ("embedding", pa.list_(pa.float32())), ("label", pa.int32())]
    )
    path = os.path.join(str(tmp_path), "embeddings.parquet")
    pq.write_table(
        pa.table(
            {
                "vec_id": [None if i % 13 == 4 else i for i in range(n)],
                "embedding": [None if i % 17 == 9 else emb[i].tolist() for i in range(n)],
                "label": [None if i % 11 == 6 else int(i % 5) for i in range(n)],
            },
            schema=sch,
        ),
        path,
    )
    reg = load_all()
    others = ("documents", "lineitem", "orders", "events", "customer", "supplier")
    names = sorted(
        nm
        for nm, q in reg.items()
        if q.oracle
        and "embeddings" in q.oracle
        and not any(t in q.oracle for t in others)
        and "stream" not in nm
    )
    assert len(names) >= 8
    bad = []
    for nm in names:
        q = reg[nm]
        sdf = q.fn(spark, str(tmp_path))
        sc, sr = canon_rows(list(sdf.columns), [tuple(r) for r in sdf.collect()])
        con = duckdb.connect()
        con.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{path}'")
        cur = con.execute(q.oracle)
        dc, dr = canon_rows([x[0] for x in cur.description], [tuple(r) for r in cur.fetchall()])
        con.close()
        if sc != dc or sr != dr:
            bad.append(nm)
    assert not bad, bad


def test_tpch_family_characterized_on_null_rows(spark, tmp_path):
    """NULL-row probe for the TPC-H family (r9 pass 5): every NULLABLE
    non-key column of every table gets ~1/13 NULLs injected over the
    sf0.001 corpus — ordinary dirty warehouse data the tie-dense minidb
    net never draws (it emits valid non-null rows).

    Found and FIXED in-round: scalar_map_funcs CRASHED in every executor
    on one NULL o_orderstatus (Spark NULL_MAP_KEY — a map key cannot be
    NULL; both sides now drop NULL statuses before the map is built),
    and scalar_string_funcs' oracle used DuckDB's CONCAT — which is
    NULL-SKIPPING ('/Brand#10' from a NULL p_type) where Spark's concat
    propagates NULL; the oracle now spells `||`, NULL-propagating on
    both engines.

    The six remaining divergences are the same frozen nullable-key
    contract the events NULL probe pins (default null ordering in
    rank/window ORDER BY keys, min_by/max_by NULL placement) — all
    driver columns carrying those keys are non-null; 71 of 77 queries
    including every TPC-H Qnn are engine-equal on dirty data
    unchanged."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from n5_dask_spark.catalog import TABLES
    from n5_dask_spark.registry import load_all
    from tests.oracle_harness import compare_query

    src = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")
    rng = np.random.default_rng(7)
    keys = {
        "r_regionkey",
        "n_nationkey",
        "c_custkey",
        "s_suppkey",
        "p_partkey",
        "o_orderkey",
        "l_orderkey",
        "l_linenumber",
        "event_id",
        "doc_id",
        "vec_id",
    }
    for t in TABLES:
        tab = pq.read_table(os.path.join(src, f"{t}.parquet"))
        cols = {}
        for f in tab.schema:
            col = tab[f.name]
            if f.name in keys:
                cols[f.name] = col
            else:
                mask = pa.array(rng.random(len(tab)) < 1 / 13)
                cols[f.name] = pc.if_else(mask, pa.nulls(len(tab), f.type), col.combine_chunks())
        pq.write_table(
            pa.table(cols, schema=tab.schema), os.path.join(str(tmp_path), f"{t}.parquet")
        )

    reg = load_all()
    tpch = ("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
    names = sorted(
        n
        for n, q in reg.items()
        if q.oracle
        and "stream" not in n
        and any(f"FROM {t}" in q.oracle or f"JOIN {t}" in q.oracle or f" {t}" in q.oracle for t in tpch)
        and "documents" not in q.oracle
        and "events" not in q.oracle
        and "embeddings" not in q.oracle
    )
    assert len(names) >= 70
    divergent = {n for n in names if not compare_query(spark, n, str(tmp_path))["match"]}
    assert divergent == {
        "agg_argminmax_bool",
        "window_distribution_funcs",
        "window_first_last",
        "window_ntile",
        "window_row_number",
        "window_running_sum",
    }, divergent


def test_cosine_prenorm_bit_identity(spark):
    """r14 optimization pin: the norm-precomputed cosine (norm_col +
    cosine_prenorm_col) is BIT-identical to the inline COSINE expression
    on every lane — random vectors, zero vectors, NULL arrays, empty
    arrays, mismatched lengths, negative and denormal-ish values. The
    optimization moves the sqrt(sum(x^2)) subtree from per-pair to
    per-row; same expression, same doubles, so equality must be exact
    (==, not approx)."""
    import random

    from pyspark.sql import functions as F

    from n5_dask_spark.operators.similarity import (
        cosine_col,
        cosine_prenorm_col,
        norm_col,
    )

    rng = random.Random(1414)
    rows = []
    for i in range(200):
        dim_a = rng.choice([0, 3, 8, 8, 8, 17])
        dim_b = rng.choice([0, 3, 8, 8, 8, 17])
        a = [rng.uniform(-2, 2) * 10 ** rng.randint(-12, 3) for _ in range(dim_a)]
        b = [rng.uniform(-2, 2) * 10 ** rng.randint(-12, 3) for _ in range(dim_b)]
        if i % 13 == 0:
            a = [0.0] * dim_a  # zero vector -> cosine 0.0 convention
        if i % 17 == 0:
            a = None  # NULL array -> NULL cosine
        if i % 19 == 0:
            b = None
        rows.append((i, a, b))
    df = spark.createDataFrame(rows, "id long, a array<float>, b array<float>")
    # build prenorm against materialized norm columns, exactly as the
    # queries do (norm computed in a prior projection)
    withn = df.select("id", "a", "b", norm_col("a").alias("na"), norm_col("b").alias("nb"))
    out = withn.select(
        "id",
        cosine_col("a", "b").alias("inline"),
        cosine_prenorm_col("a", "b", "na", "nb").alias("prenorm"),
    ).collect()
    assert len(out) == 200
    for r in out:
        # exact equality including None; -0.0 vs 0.0 would differ via str
        assert str(r["inline"]) == str(r["prenorm"]), (r["id"], r["inline"], r["prenorm"])
