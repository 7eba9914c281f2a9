"""DuckDB oracle-contract pins (r14 — the deferred r13 verdict probe #6a).

The correctness gate compares every registered query against DuckDB SQL.
That makes the DuckDB behaviors those oracles lean on part of the
CONTRACT: a DuckDB upgrade that changes any of them would scatter hash
mismatches across the 161-query gate with no hint of the cause. Vendoring
a second DuckDB for a true version-skew A/B is not possible in this
container (no installs), so this suite does the next best thing — it
freezes each leaned-on behavior as ONE tiny literal-input pin that names
its dependents. After an upgrade, a failure here reads "quantile
interpolation changed, re-derive agg_median_percentile's oracle" instead
of 23 anonymous hash failures.

Pure DuckDB — no Spark session, runs in milliseconds.
"""

from __future__ import annotations

import duckdb
import pytest


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


def one(con, sql):
    return con.sql(sql).fetchall()[0]


def test_md5_is_lowercase_hex(con):
    # dependents: every md5-threshold sampler (sample_stratified_hash,
    # pipeline_train_val_split), dedup signatures, multimodal digests,
    # n5 fixture checksums — threshold comparisons are LEXICOGRAPHIC on
    # this exact lowercase-hex rendering
    assert one(con, "SELECT md5('abc')") == ("900150983cd24fb0d6963f7d28e17f72",)
    assert one(con, "SELECT md5('')") == ("d41d8cd98f00b204e9800998ecf8427e",)


def test_quantile_cont_interpolates_on_double_but_quantizes_on_decimal(con):
    # dependents: agg_median_percentile, agg_approx_quantiles,
    # pipeline quantile stages. The corpus stores money columns as DOUBLE
    # (TESTDATA parquet), so quantile_cont linearly interpolates exactly
    # like Spark's percentile. Over DECIMAL input DuckDB quantizes the
    # interpolated value back to the input scale (1.75 -> 1.7) — if the
    # tables ever switch to DECIMAL, every quantile oracle needs an
    # explicit CAST(x AS DOUBLE) or the gate diverges on even-count groups.
    dbl = one(con, """
        SELECT quantile_cont(x, 0.5), quantile_cont(x, 0.25), median(x)
        FROM (VALUES (CAST(1 AS DOUBLE)), (2), (3), (4)) t(x)
    """)
    assert dbl == (2.5, 1.75, 2.5)
    dec = one(con, """
        SELECT quantile_cont(x, 0.25), median(x)
        FROM (VALUES (CAST(1.0 AS DECIMAL(2,1))), (2.0), (3.0), (4.0)) t(x)
    """)
    assert [float(v) for v in dec] == [1.7, 2.0]  # the quantization trap


def test_ntile_gives_remainder_to_leading_buckets(con):
    # dependents: sample_per_group ntile legs, window_ntile,
    # tpch_extra ntile segments — bucket SIZES are part of the hash
    rows = con.sql("""
        SELECT nt, COUNT(*) FROM (
            SELECT ntile(3) OVER (ORDER BY i) AS nt FROM range(7) t(i)
        ) GROUP BY nt ORDER BY nt
    """).fetchall()
    assert rows == [(1, 3), (2, 2), (3, 2)]


def test_levenshtein_counts_utf8_bytes_not_codepoints(con):
    # dependents: fuzzy_match_levenshtein — its registry note scopes the
    # contract to ASCII columns BECAUSE of this (Spark counts codepoints;
    # 'é' is two UTF-8 bytes, so the engines disagree off-ASCII). If this
    # pin flips to (3, 1, 3), DuckDB went codepoint-based and the ASCII
    # scoping note (relational3.py) can be lifted.
    assert one(
        con, "SELECT levenshtein('kitten','sitting'), levenshtein('é','e'), levenshtein('','abc')"
    ) == (3, 2, 3)


def test_sample_statistics_definitions(con):
    # dependents: agg_stats, agg_corr_covar, udf_pandas_zscore — sample
    # (n-1) vs population (n) denominators, and NULL (not 0 or NaN) for
    # single-row sample stats / constant-input corr
    s, v, p = one(con, """
        SELECT stddev_samp(x), var_samp(x), stddev_pop(x)
        FROM (VALUES (CAST(1 AS DOUBLE)), (2), (3), (4)) t(x)
    """)
    assert abs(v - 5.0 / 3.0) < 1e-12
    assert abs(s - v ** 0.5) < 1e-12
    assert abs(p - (1.25) ** 0.5) < 1e-12
    assert one(con, "SELECT stddev_samp(x), corr(x, x) FROM (VALUES (CAST(1 AS DOUBLE))) t(x)") \
        == (None, None)
    c, cs, cp = one(con, """
        SELECT ROUND(corr(x,y),6), ROUND(covar_samp(x,y),6), ROUND(covar_pop(x,y),6)
        FROM (VALUES (CAST(1 AS DOUBLE), CAST(2 AS DOUBLE)), (2, 4.5), (3, 5.5)) t(x,y)
    """)
    assert (float(c), float(cs), float(cp)) == (0.970725, 1.75, 1.166667)


def test_string_agg_respects_order_clause(con):
    # dependents: listagg_nations_per_region, the multimodal resize
    # oracle (md5 over string_agg(ch,'' ORDER BY i)) — aggregation order
    # is the hashed value itself
    assert one(con, """
        SELECT string_agg(ch, '' ORDER BY i DESC)
        FROM (VALUES ('a',1),('b',2),('c',3)) t(ch,i)
    """) == ("cba",)


def test_regexp_extract_empty_string_on_no_match(con):
    # dependents: scalar_url_funcs-family oracles (relational5.py), text
    # regex legs — Spark's regexp_extract ALSO returns '' on no match,
    # and both sides surface '' (not NULL); a flip to NULL here breaks
    # the convention silently
    assert one(con, """
        SELECT regexp_extract('https://ex.com/p?x=1', '^https?://([^/]+)/', 1),
               regexp_extract('nomatch', 'ref=([0-9]+)', 1)
    """) == ("ex.com", "")
    assert one(con, "SELECT regexp_extract_all('a1b22c333', '([0-9]+)')") == (["1", "22", "333"],)


def test_date_and_epoch_conventions(con):
    # dependents: window date_trunc legs, events epoch_us arithmetic
    import datetime
    assert one(con, """
        SELECT date_trunc('month', DATE '1995-03-17'),
               epoch_us(TIMESTAMP '1970-01-01 00:00:01')
    """) == (datetime.date(1995, 3, 1), 1_000_000)


def test_round_is_half_away_from_zero_on_both_types(con):
    # dependents: every ROUND(x, 6) oracle column. Spark's ROUND is
    # HALF_UP (away from zero) — the engines agree TODAY on both DECIMAL
    # and DOUBLE; a DuckDB move to banker's rounding would surface as
    # exactly-0.000001-off hash mismatches on midpoint values
    dec = one(con, "SELECT ROUND(2.5), ROUND(3.5), ROUND(-2.5), ROUND(2.675, 2)")
    assert [float(v) for v in dec] == [3.0, 4.0, -3.0, 2.68]
    assert one(con, "SELECT ROUND(CAST(2.5 AS DOUBLE)), ROUND(CAST(3.5 AS DOUBLE))") == (3.0, 4.0)


def test_division_and_null_concat_conventions(con):
    # dependents: every ratio oracle (/ is float division even on
    # integers — matches Spark); '||' propagates NULL while concat()
    # skips it — fingerprint oracles use '||' deliberately
    assert one(con, "SELECT 7/2, 7//2, CAST(7 AS BIGINT)/CAST(2 AS BIGINT)") == (3.5, 3, 3.5)
    assert one(con, "SELECT 'a' || NULL, concat('a', NULL)") == (None, "a")
    assert one(con, "SELECT substr('abcdef', 1, 4)") == ("abcd",)
    assert one(con, "SELECT CAST(42 AS VARCHAR), CAST(-7 AS VARCHAR)") == ("42", "-7")


def test_default_null_order_is_nulls_last_both_directions(con):
    # DuckDB defaults to NULLS LAST for ASC *and* DESC; Spark defaults to
    # NULLS FIRST on ASC. This is WHY oracles with LIMIT/top-k over
    # nullable keys spell NULLS FIRST explicitly (join_asof, the gid
    # rollup oracles) — an oracle added without the explicit clause is
    # only green while its key is non-null. If DuckDB's default changes,
    # revisit those clauses rather than trusting the new default.
    assert con.sql("SELECT x FROM (VALUES (2),(NULL),(1)) t(x) ORDER BY x").fetchall() \
        == [(1,), (2,), (None,)]
    assert con.sql("SELECT x FROM (VALUES (2),(NULL),(1)) t(x) ORDER BY x DESC").fetchall() \
        == [(2,), (1,), (None,)]
