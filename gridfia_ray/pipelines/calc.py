"""Map-algebra raster calculator (ArcGIS Raster Calculator / GRASS
r.mapcalc analogue): evaluate an arithmetic expression over any number
of co-registered result rasters, entirely in the µ-scaled int64 domain
so the DuckDB oracle reproduces every pixel bit-for-bit.

Grammar (integer-exact by construction — no float ops):

    expr   := term (('+' | '-') term)*
    term   := unary (('*' | '//') unary)*
    unary  := '-' unary | atom
    atom   := NAME | INTEGER | '(' expr ')'
            | ('min' | 'max') '(' expr ',' expr ')'
            | 'abs' '(' expr ')'

NAMEs bind to input rasters (their µ-scaled int64 pixel values);
INTEGER literals are plain integers (NOT µ-scaled — scale explicitly,
e.g. ``biomass - 50*1000000``). ``//`` is TRUNCATING integer division
(C/SQL semantics, toward zero) — DuckDB's ``//`` truncates, so the
engine implements the same rule rather than numpy's floor.

Shape: every bound raster's tiles tag their binding name and co-key on
the tile address in ONE exchange; each tile group evaluates the parsed
AST vectorized over the stacked arrays (no Python loop over pixels).
Output is a result-tile dataset with dtype int64 (values stay in the
µ domain) — composable with the downsample / focal / zonal family via
their ``allow_integer`` paths.

The expression is PARSED, never ``eval``-ed: a ~60-line recursive
descent accepting only the grammar above.

Reference parallel: the reference's calculation registry computes fixed
kernels only (``gridfia/core/calculations``); a user-supplied algebra
over arbitrary layer combinations is the standard raster-engine
extension (SURVEY §2.10).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

_TOKEN = re.compile(r"\s*(\d+|[A-Za-z_][A-Za-z0-9_]*|//|[-+*(),])")

_FUNCS = {"min", "max", "abs"}


def parse_expr(expr: str) -> tuple:
    """Expression → AST of nested tuples. Raises ValueError on anything
    outside the grammar."""
    tokens: list[str] = []
    pos = 0
    while pos < len(expr):
        m = _TOKEN.match(expr, pos)
        if m is None:
            if expr[pos:].strip() == "":
                break
            raise ValueError(f"raster_calc: bad token at {expr[pos:]!r}")
        tokens.append(m.group(1))
        pos = m.end()
    i = 0

    def peek() -> str | None:
        return tokens[i] if i < len(tokens) else None

    def take(expect: str | None = None) -> str:
        nonlocal i
        if i >= len(tokens):
            raise ValueError("raster_calc: unexpected end of expression")
        t = tokens[i]
        if expect is not None and t != expect:
            raise ValueError(f"raster_calc: expected {expect!r}, got {t!r}")
        i += 1
        return t

    def p_expr() -> tuple:
        node = p_term()
        while peek() in ("+", "-"):
            op = take()
            node = (op, node, p_term())
        return node

    def p_term() -> tuple:
        node = p_unary()
        while peek() in ("*", "//"):
            op = take()
            node = (op, node, p_unary())
        return node

    def p_unary() -> tuple:
        if peek() == "-":
            take()
            return ("neg", p_unary())
        return p_atom()

    def p_atom() -> tuple:
        t = take()
        if t == "(":
            node = p_expr()
            take(")")
            return node
        if t in _FUNCS:
            take("(")
            a = p_expr()
            if t == "abs":
                take(")")
                return ("abs", a)
            take(",")
            b = p_expr()
            take(")")
            return (t, a, b)
        if t.isdigit():
            return ("lit", int(t))
        if re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", t):
            return ("name", t)
        raise ValueError(f"raster_calc: unexpected token {t!r}")

    node = p_expr()
    if i != len(tokens):
        raise ValueError(f"raster_calc: trailing tokens {tokens[i:]!r}")
    return node


def expr_names(ast: tuple) -> set[str]:
    if ast[0] == "name":
        return {ast[1]}
    if ast[0] == "lit":
        return set()
    return set().union(*(expr_names(a) for a in ast[1:]))


def eval_ast(ast: tuple, env: dict[str, np.ndarray]) -> np.ndarray:
    op = ast[0]
    if op == "lit":
        return np.int64(ast[1])
    if op == "name":
        return env[ast[1]]
    if op == "neg":
        return -eval_ast(ast[1], env)
    if op == "abs":
        return np.abs(eval_ast(ast[1], env))
    a = eval_ast(ast[1], env)
    b = eval_ast(ast[2], env)
    if op == "+":
        return a + b
    if op == "-":
        return a - b
    if op == "*":
        return a * b
    if op == "//":
        if np.any(b == 0):
            raise ZeroDivisionError("raster_calc: division by zero pixel")
        # TRUNCATING division (DuckDB // semantics): floor, then undo
        # the floor step on inexact negative quotients
        q = a // b
        return q + ((a - q * b != 0) & ((a < 0) != (b < 0)))
    if op == "min":
        return np.minimum(a, b)
    if op == "max":
        return np.maximum(a, b)
    raise AssertionError(op)


def expr_to_sql(ast: tuple, bind: dict[str, str]) -> str:
    """The IDENTICAL expression as DuckDB SQL over the given column
    bindings — generated from the same AST so the two sides cannot
    drift."""
    op = ast[0]
    if op == "lit":
        return str(ast[1])
    if op == "name":
        return bind[ast[1]]
    if op == "neg":
        return f"(-{expr_to_sql(ast[1], bind)})"
    if op == "abs":
        return f"ABS({expr_to_sql(ast[1], bind)})"
    a = expr_to_sql(ast[1], bind)
    b = expr_to_sql(ast[2], bind)
    if op in ("+", "-", "*", "//"):
        return f"({a} {op} {b})"
    if op == "min":
        return f"LEAST({a}, {b})"
    if op == "max":
        return f"GREATEST({a}, {b})"
    raise AssertionError(op)


def raster_calc_tiles(
    expr: str,
    layers: dict[str, rd.Dataset],
    n_buckets: int = 64,
    out_metric: str = "calc",
) -> rd.Dataset:
    """Evaluate ``expr`` over the bound result rasters; returns result
    tiles (metric=``out_metric``, dtype int64, values in the µ domain).
    Every binding must cover every tile (co-registration is validated
    per tile group)."""
    from gridfia_ray.stages.agg_util import bucketed_group_map, to_arrow

    ast = parse_expr(expr)
    names = expr_names(ast)
    missing = names - set(layers)
    if missing:
        raise ValueError(f"raster_calc: unbound names {sorted(missing)}")

    out_schema = pa.schema(
        [("metric", pa.string()), ("tile_row", pa.int64()),
         ("tile_col", pa.int64()), ("h", pa.int64()), ("w", pa.int64()),
         ("pix", pa.binary()), ("dtype", pa.string())]
    )

    def tag(name: str):
        def fn(batch: pd.DataFrame) -> pd.DataFrame:
            batch = batch.copy()
            batch["__name"] = name
            return batch[
                ["tile_row", "tile_col", "h", "w", "pix", "dtype", "__name"]
            ]

        return fn

    tagged = [
        ds.map_batches(tag(name), batch_format="pandas")
        for name, ds in layers.items()
        if name in names
    ]
    both = tagged[0]
    for t in tagged[1:]:
        both = both.union(t)

    def compute(group: pd.DataFrame) -> pd.DataFrame:
        env: dict[str, np.ndarray] = {}
        h = w = None
        for _, r in group.iterrows():
            if r["__name"] in env:
                raise ValueError(
                    f"raster_calc: duplicate layer {r['__name']!r} at tile "
                    f"({r['tile_row']}, {r['tile_col']})"
                )
            h, w = int(r["h"]), int(r["w"])
            arr = np.frombuffer(r["pix"], np.dtype(r["dtype"])).reshape(h, w)
            env[r["__name"]] = np.floor(
                arr.astype(np.float64) * 1_000_000 + 0.5
            ).astype(np.int64)
        if set(env) != names:
            raise ValueError(
                f"raster_calc: tile ({group['tile_row'].iloc[0]}, "
                f"{group['tile_col'].iloc[0]}) missing layers "
                f"{sorted(names - set(env))}"
            )
        out = eval_ast(ast, env)
        if np.isscalar(out) or out.shape == ():  # constant expression
            out = np.full((h, w), out, np.int64)
        return pd.DataFrame(
            [
                {
                    "metric": out_metric,
                    "tile_row": int(group["tile_row"].iloc[0]),
                    "tile_col": int(group["tile_col"].iloc[0]),
                    "h": h,
                    "w": w,
                    "pix": out.astype(np.int64).tobytes(),
                    "dtype": "int64",
                }
            ]
        )

    return bucketed_group_map(
        both, ["tile_row", "tile_col"], compute,
        n_buckets=n_buckets, out_schema=out_schema,
    )
