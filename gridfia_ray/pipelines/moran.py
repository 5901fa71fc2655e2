"""Moran's I spatial autocorrelation (A8, SURVEY.md §2.5).

The reference delegates to libpysal/esda (``gridfia/core/analysis/
statistical_analysis.py:619-665``) — unavailable here, so the public
formula is computed directly over *tile-level* values (mean biomass per
tile) with queen (8-neighbor) contiguity weights, expressed as the
cell-ring neighbor join the north star calls for:

  1. per-tile value pass (file-pruned to the '0000' total layer);
  2. global mean (tiny aggregate, broadcast);
  3. each tile emits its deviation to its 8 neighbor cells (flat_map
     shape done vectorized in map_batches — the neighbor-ring block
     join on Z-order cell ids);
  4. messages pre-aggregate per batch (sum of neighbor deviations per
     cell — a combiner), then ONE bucketed merge joins the per-cell
     message sums with the cell's own deviation and folds each bucket
     to (cross, sq, w) partials. Python cost is O(buckets), not one
     call per tile (round-1 perf item 2; the ``agg_util`` shape).

I = (N / W) · Σ_ij w_ij (x_i − x̄)(x_j − x̄) / Σ_i (x_i − x̄)²
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from gridfia_ray.geo.cells import morton_encode
from gridfia_ray.pipelines.common import GridSpec, read_tiles, read_tiles_species
from gridfia_ray.stages.decode import species_prefilter

_OFFSETS = [(dr, dc) for dr in (-1, 0, 1) for dc in (-1, 0, 1) if (dr, dc) != (0, 0)]


def _tile_values(tiles_path, spec: GridSpec) -> rd.Dataset:
    """(cell_id, tile_row, tile_col, value=mean biomass) per tile from
    the '0000' total layer."""
    ds = read_tiles_species(tiles_path, ["0000"])
    if ds is None:
        ds = read_tiles(tiles_path).map_batches(
            species_prefilter(codes_keep=["0000"]), batch_format="pyarrow"
        )

    def tile_mean(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n = batch.num_rows
        fmts = batch["fmt"].to_pylist()
        hs = batch["h"].to_numpy()
        ws = batch["w"].to_numpy()
        payloads = batch["bytes"].to_pylist()
        # coordinates: image_id parse when every id is the canonical
        # 'code/<int>/<int>' form (vectorized, matches the caption by
        # store construction), else the caption is the source of truth
        # (arbitrary ids, near-dup suffixes)
        canonical = n > 0 and bool(
            pc.all(
                pc.match_substring_regex(batch["image_id"], r"^[^/]+/\d+/\d+$")
            ).as_py()
        )
        if canonical:
            parts = pc.split_pattern(batch["image_id"], "/")
            trs = pc.cast(pc.list_element(parts, 1), pa.int64()).to_numpy()
            tcs = pc.cast(pc.list_element(parts, 2), pa.int64()).to_numpy()
        else:
            trs = np.zeros(n, np.int64)
            tcs = np.zeros(n, np.int64)
            for i in range(n):
                meta = json.loads(batch["caption"][i].as_py())
                trs[i] = int(meta.get("tile_row", 0))
                tcs[i] = int(meta.get("tile_col", 0))
        if (
            n > 0
            and all(f == "raw-f32" for f in fmts)
            and (hs == hs[0]).all()
            and (ws == ws[0]).all()
        ):
            # raw stores (the common case): one stacked reduction;
            # dtype=f64 accumulates in double without an f64 copy
            stack = np.frombuffer(b"".join(payloads), dtype="<f4").reshape(
                n, int(hs[0]), int(ws[0])
            )
            vals = stack.mean(axis=(1, 2), dtype=np.float64)
        else:
            vals = np.zeros(n, np.float64)
            for i in range(n):
                meta = json.loads(batch["caption"][i].as_py())
                from gridfia_ray.codecs.registry import decode_tile

                arr = decode_tile(payloads[i], fmts[i], int(hs[i]), int(ws[i]), meta)
                vals[i] = float(arr.astype(np.float64).mean())
        return pa.table(
            {
                "cell_id": pa.array(morton_encode(tcs, trs), pa.int64()),
                "tile_row": pa.array(trs, pa.int64()),
                "tile_col": pa.array(tcs, pa.int64()),
                "value": pa.array(vals, pa.float64()),
            }
        )

    return ds.map_batches(tile_mean, batch_format="pyarrow")


def morans_i(tiles_path, spec: GridSpec) -> dict:
    """Global Moran's I over per-tile mean biomass, queen contiguity."""
    from ray.data.aggregate import Count, Sum

    values = _tile_values(tiles_path, spec).materialize()  # small: one row per tile
    g = values.aggregate(Sum("value", alias_name="s"), Count(alias_name="n"))
    n = int(g["n"])
    mean = float(g["s"]) / n

    # canonical row schema for both legs of the union:
    # (cell_id, msg_sum, msg_w, dev, has_own)
    def messages(batch: pa.Table) -> pd.DataFrame:
        """Combiner: each tile's deviation goes to its 8 neighbors, then
        the batch pre-sums messages per target cell — the shuffle
        carries O(distinct cells per batch) rows, not 8 per tile."""
        trs = batch["tile_row"].to_numpy()
        tcs = batch["tile_col"].to_numpy()
        dev = batch["value"].to_numpy() - mean
        to_cell, from_dev = [], []
        for dr, dc in _OFFSETS:
            nr, nc = trs + dr, tcs + dc
            ok = (nr >= 0) & (nc >= 0)
            to_cell.append(morton_encode(nc[ok], nr[ok]))
            from_dev.append(dev[ok])
        df = pd.DataFrame(
            {"cell_id": np.concatenate(to_cell), "msg_sum": np.concatenate(from_dev)}
        )
        g = df.groupby("cell_id", as_index=False).agg(
            msg_sum=("msg_sum", "sum"), msg_w=("msg_sum", "size")
        )
        g["msg_w"] = g["msg_w"].astype(np.int64)
        g["dev"] = 0.0
        g["has_own"] = np.int8(0)
        return g

    def own(batch: pa.Table) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "cell_id": batch["cell_id"].to_numpy(),
                "msg_sum": 0.0,
                "msg_w": np.int64(0),
                "dev": batch["value"].to_numpy() - mean,
                "has_own": np.int8(1),
            }
        )

    def add_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        from gridfia_ray.stages.dedup_util import bucket_of

        batch = batch.copy()
        batch["__bucket"] = bucket_of(batch, ["cell_id"], 64)
        return batch

    def fold_bucket(group: pd.DataFrame) -> pd.DataFrame:
        """One vectorized merge per bucket: per-cell message sums join
        the cell's own deviation; cells without a tile (edge messages)
        contribute nothing, matching the per-cell reference reduce."""
        g = group.groupby("cell_id", as_index=False).agg(
            msg_sum=("msg_sum", "sum"), msg_w=("msg_w", "sum"),
            dev=("dev", "sum"), has_own=("has_own", "max"),
        )
        g = g[g["has_own"] == 1]
        d = g["dev"].to_numpy()
        return pd.DataFrame(
            {
                "cross": [float((d * g["msg_sum"].to_numpy()).sum())],
                "sq": [float((d * d).sum())],
                "w": [int(g["msg_w"].sum())],
            }
        )

    parts = (
        values.map_batches(messages, batch_format="pyarrow")
        .union(values.map_batches(own, batch_format="pyarrow"))
        .map_batches(add_bucket, batch_format="pandas")
        .groupby("__bucket")
        .map_groups(fold_bucket, batch_format="pandas")
        .aggregate(Sum("cross", alias_name="cross"), Sum("sq", alias_name="sq"),
                   Sum("w", alias_name="w"))
    )
    cross, sq, w = float(parts["cross"]), float(parts["sq"]), float(parts["w"])
    i_val = (n / w) * (cross / sq) if w > 0 and sq > 0 else float("nan")
    return {"morans_i": i_val, "n_tiles": n, "w_pairs": int(w), "mean_value": mean}


def geary_c(tiles_path, spec: GridSpec) -> dict:
    """Global Geary's C over per-tile mean biomass, queen contiguity —
    the local-variation companion to Moran's I (C < 1 ⇔ positive
    autocorrelation). Same single-exchange message-passing shape as
    :func:`morans_i`; the reference's esda delegation
    (``statistical_analysis.py:619-665``) computed directly:

      C = ((N−1) / (2W)) · Σ_ij w_ij (x_i − x_j)² / Σ_i (x_i − x̄)²

    The pair term never materializes pairs: each tile's message to a
    neighbor carries (x_j, x_j²) partials pre-summed per batch, and the
    receiving cell folds Σ_j (x_i − x_j)² = w_i·x_i² − 2·x_i·Σx_j +
    Σx_j² locally — O(cells) rows through the shuffle, not O(pairs)."""
    from ray.data.aggregate import Count, Sum

    values = _tile_values(tiles_path, spec).materialize()  # small: one row per tile
    g = values.aggregate(Sum("value", alias_name="s"), Count(alias_name="n"))
    n = int(g["n"])
    mean = float(g["s"]) / n

    # row schema for both legs: (cell_id, msg_sum, msg_sq, msg_w, own, has_own)
    def messages(batch: pa.Table) -> pd.DataFrame:
        trs = batch["tile_row"].to_numpy()
        tcs = batch["tile_col"].to_numpy()
        v = batch["value"].to_numpy()
        to_cell, from_v = [], []
        for dr, dc in _OFFSETS:
            nr, nc = trs + dr, tcs + dc
            ok = (nr >= 0) & (nc >= 0)
            to_cell.append(morton_encode(nc[ok], nr[ok]))
            from_v.append(v[ok])
        df = pd.DataFrame(
            {"cell_id": np.concatenate(to_cell), "v": np.concatenate(from_v)}
        )
        df["v2"] = df["v"] * df["v"]
        g = df.groupby("cell_id", as_index=False).agg(
            msg_sum=("v", "sum"), msg_sq=("v2", "sum"), msg_w=("v", "size")
        )
        g["msg_w"] = g["msg_w"].astype(np.int64)
        g["own"] = 0.0
        g["has_own"] = np.int8(0)
        return g

    def own(batch: pa.Table) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "cell_id": batch["cell_id"].to_numpy(),
                "msg_sum": 0.0,
                "msg_sq": 0.0,
                "msg_w": np.int64(0),
                "own": batch["value"].to_numpy(),
                "has_own": np.int8(1),
            }
        )

    def add_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        from gridfia_ray.stages.dedup_util import bucket_of

        batch = batch.copy()
        batch["__bucket"] = bucket_of(batch, ["cell_id"], 64)
        return batch

    def fold_bucket(group: pd.DataFrame) -> pd.DataFrame:
        g = group.groupby("cell_id", as_index=False).agg(
            msg_sum=("msg_sum", "sum"), msg_sq=("msg_sq", "sum"),
            msg_w=("msg_w", "sum"), own=("own", "sum"), has_own=("has_own", "max"),
        )
        g = g[g["has_own"] == 1]
        x = g["own"].to_numpy()
        w_i = g["msg_w"].to_numpy().astype(np.float64)
        num = w_i * x * x - 2.0 * x * g["msg_sum"].to_numpy() + g["msg_sq"].to_numpy()
        d = x - mean
        return pd.DataFrame(
            {
                "num": [float(num.sum())],
                "sq": [float((d * d).sum())],
                "w": [int(g["msg_w"].sum())],
            }
        )

    parts = (
        values.map_batches(messages, batch_format="pyarrow")
        .union(values.map_batches(own, batch_format="pyarrow"))
        .map_batches(add_bucket, batch_format="pandas")
        .groupby("__bucket")
        .map_groups(fold_bucket, batch_format="pandas")
        .aggregate(Sum("num", alias_name="num"), Sum("sq", alias_name="sq"),
                   Sum("w", alias_name="w"))
    )
    num, sq, w = float(parts["num"]), float(parts["sq"]), float(parts["w"])
    c_val = ((n - 1) / (2.0 * w)) * (num / sq) if w > 0 and sq > 0 else float("nan")
    return {"geary_c": c_val, "n_tiles": n, "w_pairs": int(w), "mean_value": mean}
