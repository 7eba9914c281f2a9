"""tools/gen_sf1.py — the bench's sf1 leg depends on this generator, so
its invariants are pinned: exact xN row counts, referential integrity
across every FK edge after key-offsetting, unique surrogate keys (the
N5/fixture family refuses duplicate doc_ids), and idempotence via the
manifest marker."""

from __future__ import annotations

import importlib.util
import os

import duckdb


def _gen():
    path = os.path.join(os.path.dirname(__file__), "..", "tools", "gen_sf1.py")
    spec = importlib.util.spec_from_file_location("n5ds_gen_sf1", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_gen_sf1_scales_and_preserves_integrity(spark, tmp_path):
    gen = _gen()
    src = "/root/testdata/sf0.001"
    out = gen.ensure_sf1(spark, src=src, out=str(tmp_path / "sfx"), replicas=3)
    con = duckdb.connect()

    def q(sql):
        return con.sql(sql.format(out=out, src=src)).fetchone()

    # exact x3 row counts; dims stay fixed
    for t, mult in [("lineitem", 3), ("orders", 3), ("customer", 3),
                    ("documents", 3), ("embeddings", 3), ("events", 3),
                    ("region", 1), ("nation", 1)]:
        n_src = q(f"SELECT count(*) FROM '{{src}}/{t}.parquet'")[0]
        n_out = q(f"SELECT count(*) FROM '{{out}}/{t}.parquet/*.parquet'")[0]
        assert n_out == n_src * mult, (t, n_src, n_out)

    # FK integrity after offsetting: zero orphans on every edge
    for child, ckey, parent, pkey in [
        ("lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("lineitem", "l_partkey", "part", "p_partkey"),
        ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
        ("orders", "o_custkey", "customer", "c_custkey"),
    ]:
        orphans = q(
            f"SELECT count(*) FROM '{{out}}/{child}.parquet/*.parquet' c "
            f"LEFT JOIN '{{out}}/{parent}.parquet/*.parquet' p "
            f"ON c.{ckey} = p.{pkey} WHERE p.{pkey} IS NULL"
        )[0]
        assert orphans == 0, (child, ckey, orphans)

    # surrogate keys stay unique (the fixture family refuses dup doc_ids)
    for t, k in [("documents", "doc_id"), ("embeddings", "vec_id"),
                 ("customer", "c_custkey"), ("orders", "o_orderkey")]:
        n, d = q(
            f"SELECT count(*), count(DISTINCT {k}) "
            f"FROM '{{out}}/{t}.parquet/*.parquet'"
        )
        assert n == d, (t, n, d)

    # idempotence: second call is a no-op returning the same dir
    assert gen.ensure_sf1(spark, src=src, out=out, replicas=3) == out
    assert os.path.exists(os.path.join(out, gen.MARKER))
