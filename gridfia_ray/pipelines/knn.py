"""Grid-cell kNN interpolation (J6, SURVEY.md §2.4).

The BIGMAP methodology the reference rides on is kNN imputation of FIA
plot attributes onto pixels (``/root/reference/README.md:41-43``). Here:
interpolate a plot attribute onto every *tile center* by exact
k-nearest-neighbor inverse-distance weighting.

Scale shape: the plot table is the small side — broadcast once per actor
(``__init__``), bucketed into grid cells; per tile the candidate set is
grown over Z-order cell rings until the ring lower-bound distance
``(q-1)·cell_size`` exceeds the k-th candidate distance found so far —
which makes the kNN set provably exact, not approximate. Tiles stream
through ``map_batches``; no shuffle at all. For plot tables too large to
broadcast, shard plots by coarse parent cell and run one pool per shard
(the documented partitioning assumption).
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa
import ray.data as rd

from gridfia_ray.geo.cells import CellGrid, morton_decode
from gridfia_ray.pipelines.common import GridSpec, cluster_cpus, read_tiles
from gridfia_ray.stages.decode import species_prefilter


class KnnActor:
    """kNN/IDW scorer over a broadcast plot table.

    ``plots`` may be a parquet PATH instead of an in-memory dict: each
    actor then loads the table in ``__init__`` from shared storage.
    Prefer the path form for pooled use — it keeps the constructor args
    tiny (no object-store ref whose loss would break an actor restart,
    ray#53727) and is the restart-safe broadcast pattern at cluster
    scale."""

    def __init__(
        self, plots: dict | str, spec: GridSpec, k: int = 4, power: float = 2.0
    ):
        if isinstance(plots, str):
            plots = load_plots(plots)
        self.k = int(k)
        self.power = float(power)
        self.cs = spec.cell_size
        self.grid = CellGrid(spec.origin_x, spec.origin_y, spec.cell_size)
        self.px = np.asarray(plots["x"], dtype=np.float64)
        self.py = np.asarray(plots["y"], dtype=np.float64)
        self.pv = np.asarray(plots["value"], dtype=np.float64)
        cell = self.grid.cell_id(self.px, self.py)
        cx, cy = morton_decode(cell)
        self.plot_cx = cx
        self.plot_cy = cy

    def _knn(self, qx: float, qy: float, ccx: int, ccy: int):
        """Exact k nearest plots to (qx, qy) whose cell is (ccx, ccy).

        Ring q (Chebyshev cell distance q from the query's cell) cannot
        contain a point closer than ``(q-1)·cell_size`` to any point of
        the query cell, so once the k-th best distance d_k satisfies
        ``(q-1)·cs > d_k`` no further ring matters.
        """
        if self.px.size == 0:
            return None
        cheb = np.maximum(np.abs(self.plot_cx - ccx), np.abs(self.plot_cy - ccy))
        max_ring = int(cheb.max())
        # smallest radius holding >= k candidates
        counts = np.bincount(cheb.astype(np.int64), minlength=max_ring + 1)
        cum = np.cumsum(counts)
        r0 = int(np.searchsorted(cum, min(self.k, cum[-1])))
        cand = np.nonzero(cheb <= r0)[0]
        d2 = (self.px[cand] - qx) ** 2 + (self.py[cand] - qy) ** 2
        k = min(self.k, cand.size)
        dk = np.sqrt(np.partition(d2, k - 1)[k - 1])
        # include every ring whose lower bound could still beat dk
        r_final = min(max_ring, int(np.floor(dk / self.cs)) + 1)
        if r_final > r0:
            cand = np.nonzero(cheb <= r_final)[0]
            d2 = (self.px[cand] - qx) ** 2 + (self.py[cand] - qy) ** 2
            k = min(self.k, cand.size)
        # deterministic k-set: (distance², plot index) lexicographic.
        # argpartition would admit an ARBITRARY member of a tie group
        # straddling the k-th boundary, diverging from the SQL oracle's
        # ROW_NUMBER(ORDER BY d², plot_id) and the kriging replay's
        # lowest-index rule on snapped/gridded plot coordinates.
        order = np.lexsort((cand, d2))[:k]
        return cand[order], np.sqrt(d2[order])

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        captions = batch["caption"].to_pylist()
        ws = batch["w"].to_numpy()
        hs = batch["h"].to_numpy()
        out = {
            "tile_row": np.zeros(n, np.int32),
            "tile_col": np.zeros(n, np.int32),
            "cx": np.zeros(n, np.float64),
            "cy": np.zeros(n, np.float64),
            "knn_value": np.zeros(n, np.float64),
            "k_used": np.zeros(n, np.int32),
        }
        for i in range(n):
            meta = json.loads(captions[i])
            tf = meta["transform"]
            qx = tf[0] + int(ws[i]) * tf[1] / 2.0
            qy = tf[3] + int(hs[i]) * tf[5] / 2.0
            code = self.grid.cell_id(np.asarray([qx]), np.asarray([qy]))
            ccx, ccy = morton_decode(code)
            out["tile_row"][i] = int(meta.get("tile_row", 0))
            out["tile_col"][i] = int(meta.get("tile_col", 0))
            out["cx"][i], out["cy"][i] = qx, qy
            res = self._knn(qx, qy, int(ccx[0]), int(ccy[0]))
            if res is None:
                out["knn_value"][i] = np.nan
                continue
            sel, dk = res
            vk = self.pv[sel]
            if np.any(dk == 0.0):  # exact hit → that plot's value
                out["knn_value"][i] = float(vk[dk == 0.0][0])
            else:
                wgt = 1.0 / dk**self.power
                out["knn_value"][i] = float(np.sum(wgt * vk) / np.sum(wgt))
            out["k_used"][i] = int(dk.size)
        return pa.table({k: pa.array(v) for k, v in out.items()})


def knn_interpolate(
    tiles_path: str, plots: dict | str, spec: GridSpec, k: int = 4, power: float = 2.0
) -> rd.Dataset:
    """One kNN/IDW row per tile position (distinct tiles via the '0000'
    layer — every tile position has exactly one total row). Per-species
    stores prune at the file level (only the '0000' file is read)."""
    from gridfia_ray.pipelines.common import read_tiles_species

    tiles = read_tiles_species(tiles_path, ["0000"])
    if tiles is None:
        tiles = read_tiles(tiles_path).map_batches(
            species_prefilter(codes_keep=["0000"]), batch_format="pyarrow"
        )
    return tiles.map_batches(
        KnnActor,
        fn_constructor_kwargs=dict(plots=plots, spec=spec, k=k, power=power),
        batch_format="pyarrow",
        batch_size=512,
        concurrency=(1, max(2, cluster_cpus() // 2)),
        num_cpus=1,
    )


def load_plots(path: str) -> dict:
    import pyarrow.parquet as pq

    t = pq.read_table(path)
    return {c: t[c].to_numpy(zero_copy_only=False) for c in t.column_names}
