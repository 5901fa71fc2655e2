"""Q7/Q8-shaped multi-join queries vs their DuckDB oracles at sf0.001."""

import os

import duckdb
import numpy as np
import pytest

SF = "/root/testdata/sf0.01"  # sf0.001 has no NATION_1/2 suppliers at all
TABLES = ["region", "nation", "customer", "supplier", "orders", "lineitem"]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{os.path.join(SF, t + '.parquet')}')"
        )
    return c


def _pair(name, con):
    from gridfia_ray.contract import build_oracle_sql, build_queries

    got = build_queries()[name](SF)
    exp = con.sql(build_oracle_sql()[name]).df()
    return got.reset_index(drop=True), exp.reset_index(drop=True)


class TestQ7Q8:
    def test_nation_volume_matches_oracle(self, ray_session, con):
        got, exp = _pair("rel_nation_volume", con)
        assert len(got) == len(exp) > 0
        for col in ["supp_nation", "cust_nation", "l_year", "volume_c", "n_lines"]:
            assert (got[col].to_numpy() == exp[col].to_numpy()).all(), col
        # both trade directions present
        assert set(zip(got["supp_nation"], got["cust_nation"])) == {
            ("NATION_1", "NATION_2"),
            ("NATION_2", "NATION_1"),
        }

    def test_market_share_matches_oracle(self, ray_session, con):
        got, exp = _pair("rel_market_share", con)
        assert len(got) == len(exp) > 0
        for col in ["o_year", "num_c", "den_c", "mkt_share_u"]:
            assert (got[col].to_numpy() == exp[col].to_numpy()).all(), col
        assert (got["num_c"] <= got["den_c"]).all()
        assert got["mkt_share_u"].between(0, 1_000_000).all()
        assert (np.diff(got["o_year"].to_numpy()) > 0).all()

    def test_empty_result_keeps_typed_schema(self, ray_session):
        # sf0.001 has zero NATION_1/2 suppliers → legitimately 0 rows,
        # but the columns must survive (zero-row to_pandas gotcha)
        from gridfia_ray.contract import build_queries

        got = build_queries()["rel_nation_volume"]("/root/testdata/sf0.001")
        assert len(got) == 0
        assert list(got.columns) == [
            "supp_nation", "cust_nation", "l_year", "volume_c", "n_lines",
        ]
        assert got["volume_c"].dtype == np.int64


class TestFertility:
    def test_matches_oracle_sf0001(self, ray_session):
        import duckdb

        from gridfia_ray.contract import build_oracle_sql, build_queries

        sf = "/root/testdata/sf0.001"
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf}/documents.parquet')"
        )
        got = build_queries()["doc_fertility"](sf)
        exp = con.sql(build_oracle_sql()["doc_fertility"]).df()
        assert len(got) == len(exp) > 0
        for col in ["lang_pred", "n_words", "n_bpe", "fertility_u"]:
            assert (got[col].to_numpy() == exp[col].to_numpy()).all(), col
        # fertility is tokens-per-word: >= 1e6 (a word is >= 1 pre-token)
        assert (got.loc[got["n_words"] > 0, "fertility_u"] >= 1_000_000).all()
