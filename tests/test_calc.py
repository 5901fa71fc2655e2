"""Map-algebra raster calculator: parser, truncating-division
semantics, brute-force evaluation, validation guards."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from gridfia_ray.pipelines.calc import (
    eval_ast,
    expr_names,
    expr_to_sql,
    parse_expr,
    raster_calc_tiles,
)


def _layer(name, g, tiles_y=2, tiles_x=2, h=4, w=4):
    rows = []
    for tr in range(tiles_y):
        for tc in range(tiles_x):
            rows.append(
                {"metric": name, "tile_row": tr, "tile_col": tc,
                 "h": h, "w": w,
                 "pix": g[tr*h:(tr+1)*h, tc*w:(tc+1)*w].tobytes(),
                 "dtype": "float64"}
            )
    return rd.from_pandas(pd.DataFrame(rows))


class TestParser:
    def test_precedence_and_funcs(self):
        ast = parse_expr("a + b * 2 - min(a, 3)")
        assert ast == ("-", ("+", ("name", "a"), ("*", ("name", "b"), ("lit", 2))),
                       ("min", ("name", "a"), ("lit", 3)))
        assert expr_names(ast) == {"a", "b"}

    def test_sql_mirror(self):
        ast = parse_expr("abs(a - b) // max(b, 1)")
        sql = expr_to_sql(ast, {"a": "ca", "b": "cb"})
        assert sql == "(ABS((ca - cb)) // GREATEST(cb, 1))"

    def test_rejects_garbage(self):
        for bad in ("a ** b", "import os", "a +", "f(a)", "a;b", "a / b"):
            with pytest.raises(ValueError):
                parse_expr(bad)

    def test_truncating_division(self):
        env = {"a": np.array([-7, 7, -7, 7], np.int64),
               "b": np.array([2, 2, -2, -2], np.int64)}
        out = eval_ast(parse_expr("a // b"), env)
        # C/SQL truncation, not numpy floor
        np.testing.assert_array_equal(out, [-3, 3, 3, -3])


class TestRasterCalc:
    def test_matches_brute_force(self, ray_session):
        rng = np.random.RandomState(31)
        ga = rng.rand(8, 8) * 100
        gb = rng.rand(8, 8) * 100
        expr = "(a - b) * 1000000 // (a + b + 1)"
        out = raster_calc_tiles(
            expr, {"a": _layer("a", ga), "b": _layer("b", gb)}, n_buckets=4
        ).to_pandas()
        ua = np.floor(ga * 1e6 + 0.5).astype(np.int64)
        ub = np.floor(gb * 1e6 + 0.5).astype(np.int64)
        want = {}
        for y in range(8):
            for x in range(8):
                a, b = int(ua[y, x]), int(ub[y, x])
                num, den = (a - b) * 1000000, a + b + 1
                q = abs(num) // abs(den)
                if (num < 0) != (den < 0):
                    q = -q
                want[(y, x)] = q
        got = {}
        for _, r in out.iterrows():
            h, w = int(r["h"]), int(r["w"])
            arr = np.frombuffer(r["pix"], np.int64).reshape(h, w)
            for ly in range(h):
                for lx in range(w):
                    got[(int(r["tile_row"])*h + ly, int(r["tile_col"])*w + lx)] = int(arr[ly, lx])
        assert got == want

    def test_missing_layer_tile_raises(self, ray_session):
        ga = np.ones((8, 8))
        a = _layer("a", ga)
        b_partial = _layer("b", ga).filter(
            lambda r: not (r["tile_row"] == 0 and r["tile_col"] == 0)
        )
        with pytest.raises(Exception, match="missing layers"):
            raster_calc_tiles("a + b", {"a": a, "b": b_partial}).to_pandas()

    def test_unbound_name_raises(self, ray_session):
        with pytest.raises(ValueError, match="unbound"):
            raster_calc_tiles("a + c", {"a": _layer("a", np.ones((8, 8)))})

    def test_zero_division_raises(self, ray_session):
        ga = np.zeros((8, 8))
        with pytest.raises(Exception, match="division by zero"):
            raster_calc_tiles("a // a", {"a": _layer("a", ga)}).to_pandas()
