"""Table validation: planted violations per rule kind vs hand counts,
NULL semantics, zero-violation reporting, validation raises, partition
invariance."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from gridfia_ray.pipelines.validate import validate_table


def _frame():
    return pd.DataFrame(
        {
            "id": np.int64([1, 2, 3, 3, 4, 5, 5, 5]),
            "v": [5.0, -1.0, 2.0, np.nan, 100.0, 3.0, 4.0, -7.0],
            "s": ["ok", "ok", "bad", None, "ok", "meh", "ok", "ok"],
            "code": ["A-1", "B-2", "xx", None, "A-9", "C-3", "A-1", "Z-0"],
        }
    )


def _run(df, rules, parts=3):
    out = validate_table(rd.from_pandas(df).repartition(parts), rules)
    return dict(zip(out["rule"], out["violations"].astype(int)))


class TestValidateTable:
    def test_all_kinds_planted_counts(self, ray_session):
        got = _run(
            _frame(),
            [
                {"rule": "v_not_null", "kind": "not_null", "col": "v"},
                {"rule": "v_min", "kind": "min", "col": "v", "value": 0.0},
                {"rule": "v_max", "kind": "max", "col": "v", "value": 50.0},
                {"rule": "s_domain", "kind": "in_set", "col": "s", "values": ["ok", "meh"]},
                {"rule": "code_shape", "kind": "regex", "col": "code", "pattern": "[A-Z]-[0-9]"},
                {"rule": "id_unique", "kind": "unique", "col": "id"},
            ],
        )
        assert got == {
            "v_not_null": 1,   # one NaN
            "v_min": 2,        # -1, -7 (NaN does not violate range)
            "v_max": 1,        # 100
            "s_domain": 2,     # 'bad' + NULL (NULL is not in the set)
            "code_shape": 2,   # 'xx' + NULL
            "id_unique": 3,    # 3 twice (+1), 5 thrice (+2)
        }

    def test_clean_table_reports_zeros(self, ray_session):
        df = pd.DataFrame({"id": np.int64([1, 2, 3]), "v": [1.0, 2.0, 3.0]})
        got = _run(
            df,
            [
                {"rule": "v_not_null", "kind": "not_null", "col": "v"},
                {"rule": "id_unique", "kind": "unique", "col": "id"},
            ],
        )
        assert got == {"v_not_null": 0, "id_unique": 0}

    def test_row_order_matches_rule_order(self, ray_session):
        out = validate_table(
            rd.from_pandas(_frame()),
            [
                {"rule": "zz_last", "kind": "not_null", "col": "v"},
                {"rule": "aa_first", "kind": "unique", "col": "id"},
            ],
        )
        assert out["rule"].tolist() == ["zz_last", "aa_first"]

    def test_partition_invariant(self, ray_session):
        rules = [
            {"rule": "v_min", "kind": "min", "col": "v", "value": 0.0},
            {"rule": "id_unique", "kind": "unique", "col": "id"},
        ]
        assert _run(_frame(), rules, parts=1) == _run(_frame(), rules, parts=8)

    def test_validation_raises(self, ray_session):
        df = rd.from_pandas(_frame())
        with pytest.raises(ValueError, match="at least one rule"):
            validate_table(df, [])
        with pytest.raises(ValueError, match="duplicate rule names"):
            validate_table(
                df,
                [
                    {"rule": "x", "kind": "not_null", "col": "v"},
                    {"rule": "x", "kind": "not_null", "col": "s"},
                ],
            )
        with pytest.raises(ValueError, match="unknown rule kind"):
            validate_table(df, [{"rule": "x", "kind": "median", "col": "v"}])
