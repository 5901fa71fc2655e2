"""Deterministic synthetic fixtures: tile corpus + independent oracles.

Re-expresses the reference's seeded test cube (``tests/conftest.py:62-139``
in /root/reference — 5 archetypal species patterns + derived total layer,
``np.random.seed(42)``, CRS ``ESRI:102039``, transform
``[-2000000, 30, 0, -900000, 0, -30]``) as the driver's ``input_hint``
tile table:

    tiles(image_id, bytes, w, h, fmt, caption, phash)

and, next to it, *independently computed* oracle tables that DuckDB can
query (FIXTURES.md §5):

  * ``pixels.parquet``       — long (species_code, y, x, biomass) of the
    exact pre-encoding pixel values (float64 of the float32 values, so
    SQL double math sees bit-identical inputs);
  * ``zones.parquet``        — polygon side table (WKB);
  * ``pixel_zones.parquet``  — pixel→zone membership computed with
    rectangle / half-plane logic (NOT the engine's ray-casting PIP, so
    the spatial join is verified against independent geometry code);
  * ``plots.parquet``        — seeded point samples for kNN;
  * ``tiles_dup.parquet``    — tiles + injected exact duplicates (dedup
    oracle) + near-duplicates (phash Hamming neighbors).

Everything is seeded and bit-stable across runs and parallelism levels.
Fixtures are cached under /tmp and built atomically (tmp dir + rename).
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from gridfia_ray.codecs.phash import average_phash64
from gridfia_ray.codecs.registry import encode_tile
from gridfia_ray.geo import wkb
from gridfia_ray.geo.affine import tile_transform

GEN_VERSION = 6
SEED = 42
CRS = "ESRI:102039"
ORIGIN_X = -2_000_000.0
ORIGIN_Y = -900_000.0
PX = 30.0  # meters per pixel, north-up (y pixel size = -30)
TOTAL_CODE = "0000"

FIXTURE_ROOT = os.environ.get("GRIDFIA_RAY_FIXTURES", "/tmp/gridfia_ray_fixtures")


@dataclass(frozen=True)
class Scale:
    name: str
    grid: int  # tiles per side
    tile: int  # pixels per tile side
    n_species: int  # individual species (total layer added on top)
    fmt: str = "raw-f32"


SCALES = {
    "t1": Scale("t1", grid=4, tile=64, n_species=5),
    "t1png": Scale("t1png", grid=4, tile=64, n_species=5, fmt="png"),
    "t2": Scale("t2", grid=8, tile=64, n_species=9),
    "bench": Scale("bench", grid=32, tile=128, n_species=16),
    "bench-large": Scale("bench-large", grid=48, tile=128, n_species=24),
}

# species catalog: (code, name) — first five mirror the reference archetypes
_CATALOG = [
    ("0131", "Dominant Oak"),
    ("0110", "Common Pine"),
    ("0316", "Rare Maple"),
    ("0371", "Edge Birch"),
    ("0541", "Scattered Ash"),
] + [(f"{900 + i:04d}", f"Synthetic Species {i}") for i in range(1, 60)]

# group fixture for SpeciesGroupProportion (cf. reference
# cfg/species/southern_yellow_pine_config.yaml:60-67)
GROUP_NAME = "pine"
GROUP_CODES = ("0110", "0541")


def base_transform() -> list:
    return [ORIGIN_X, PX, 0.0, ORIGIN_Y, 0.0, -PX]


def species_list(scale: Scale) -> list[tuple[str, str]]:
    return _CATALOG[: scale.n_species]


def build_cube(scale: Scale) -> tuple[np.ndarray, list[tuple[str, str]]]:
    """(S+1, H, W) float32 cube, layer 0 = derived total (code '0000')."""
    rng = np.random.RandomState(SEED)
    n = scale.grid * scale.tile
    sp = species_list(scale)
    layers = np.zeros((len(sp) + 1, n, n), dtype=np.float32)
    for i, (code, _name) in enumerate(sp):
        r = rng.rand(n, n).astype(np.float32)
        if code == "0131":  # widespread dominant
            a = r * 50.0
            a[a < 10] = 0.0
        elif code == "0110":  # patchy common
            a = r * 30.0
            a[a < 15] = 0.0
        elif code == "0316":  # rare: one interior patch
            a = np.zeros((n, n), dtype=np.float32)
            s0, s1 = int(n * 0.15), int(n * 0.35)
            a[s0:s1, s0:s1] = r[s0:s1, s0:s1] * 20.0
        elif code == "0371":  # border bands only
            a = np.zeros((n, n), dtype=np.float32)
            band = max(1, n // 10)
            a[:band, :] = r[:band, :] * 25.0
            a[-band:, :] = r[-band:, :] * 25.0
        elif code == "0541":  # scattered sparse
            a = r * 15.0
            a[a < 12] = 0.0
        else:  # synthetic: varied density/intensity by index
            k = int(code) - 900
            a = r * (10.0 + (k % 7) * 6.0)
            a[a < (3.0 + (k % 5) * 2.5)] = 0.0
        layers[i + 1] = a
    layers[0] = layers[1:].sum(axis=0)
    return layers, [(TOTAL_CODE, "Total Biomass")] + sp


def tile_table_from_cube(
    cube: np.ndarray, catalog: list[tuple[str, str]], tile: int, fmt: str = "raw-f32"
) -> pa.Table:
    """In-memory tile table from an (S, H, W) cube — edge-case fixtures
    (all-zero cube, single-species cube; reference ``conftest.py:196-266``)."""
    n = cube.shape[1]
    assert n % tile == 0
    shim = Scale("adhoc", grid=n // tile, tile=tile, n_species=len(catalog) - 1, fmt=fmt)
    return pa.concat_tables(
        [_species_table(shim, cube[si], code, name) for si, (code, name) in enumerate(catalog)]
    )


def _phash_batch(tiles: np.ndarray) -> np.ndarray:
    """Vectorized average_phash64 over an (n, t, t) stack — identical
    bit-for-bit to codecs.phash.average_phash64 per tile."""
    n, h, w = tiles.shape
    th, tw = (h // 8) * 8, (w // 8) * 8
    block = tiles[:, :th, :tw].astype(np.float64).reshape(n, 8, th // 8, 8, tw // 8).mean(
        axis=(2, 4)
    )
    bits = block > block.mean(axis=(1, 2), keepdims=True)
    packed = np.packbits(bits.reshape(n, 64), axis=1)
    return packed.view(">u8").reshape(n).astype(np.int64)


def tile_rows_from_stack(
    code: str,
    name: str,
    stack: np.ndarray,
    trs: np.ndarray,
    tcs: np.ndarray,
    base: list,
    *,
    fmt: str = "raw-f32",
    crs: str = CRS,
    units: str = "Mg/ha",
) -> pa.Table:
    """Tile rows from an (n, t, t) stack at grid positions (trs, tcs) —
    THE row/caption construction, shared by the fixture builder and the
    zarr-cube ingest so the two store flavors cannot drift. Bounds come
    from the per-tile transform (bit-identical to the historical
    ``tf[3] - t*PX`` form for north-up grids)."""
    n, t, _ = stack.shape
    if fmt == "raw-f32":
        payloads = [stack[i].tobytes() for i in range(n)]
        metas = [{}] * n
    else:
        enc = [encode_tile(stack[i], fmt) for i in range(n)]
        payloads = [e[0] for e in enc]
        metas = [e[1] for e in enc]
    phashes = _phash_batch(stack)
    image_ids, captions = [], []
    for i in range(n):
        tr, tc = int(trs[i]), int(tcs[i])
        tf = tile_transform(base, tr, tc, t, t)
        caption = {
            "species_code": code,
            "species_name": name,
            "tile_row": tr,
            "tile_col": tc,
            "crs": crs,
            "transform": tf,
            "bounds": [tf[0], tf[3] + t * tf[5], tf[0] + t * tf[1], tf[3]],
            "units": units,
            "nodata": 0.0,
        }
        caption.update(metas[i])
        image_ids.append(f"{code}/{tr:04d}/{tc:04d}")
        captions.append(json.dumps(caption, sort_keys=True))
    return pa.Table.from_arrays(
        [
            pa.array(image_ids, pa.string()),
            pa.array(payloads, pa.binary()),
            pa.array(np.full(n, t, np.int32), pa.int32()),
            pa.array(np.full(n, t, np.int32), pa.int32()),
            pa.array([fmt] * n, pa.string()),
            pa.array(captions, pa.string()),
            pa.array(phashes, pa.int64()),
        ],
        schema=_TILE_SCHEMA,
    )


def _species_table(scale: Scale, layer: np.ndarray, code: str, name: str) -> pa.Table:
    """All tile rows of one species layer, built vectorized: the layer
    reshapes to an (g*g, t, t) tile stack, payloads/phashes come from
    array ops; only the caption JSON is per-row Python."""
    g, t = scale.grid, scale.tile
    stack = np.ascontiguousarray(
        layer.reshape(g, t, g, t).swapaxes(1, 2).reshape(g * g, t, t), dtype="<f4"
    )
    idx = np.arange(g * g)
    return tile_rows_from_stack(
        code, name, stack, idx // g, idx % g, base_transform(), fmt=scale.fmt
    )


_TILE_SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("bytes", pa.binary()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("fmt", pa.string()),
        ("caption", pa.string()),
        ("phash", pa.int64()),
    ]
)


def _write_tiles(dirpath: str, scale: Scale, cube: np.ndarray,
                 catalog: list[tuple[str, str]]) -> int:
    """Write the tile table as a DIRECTORY of parquet files, one per
    species, with small row groups — so `ray.data.read_parquet(dir)`
    gets one read task per file (parallel ingest) and species filters
    can prune whole files. One giant file = one serial reader = the
    single worst ingest bottleneck at scale."""
    os.makedirs(dirpath, exist_ok=True)
    n = 0
    for si, (code, name) in enumerate(catalog):
        t = _species_table(scale, cube[si], code, name)
        pq.write_table(
            t,
            os.path.join(dirpath, f"part-{code}.parquet"),
            compression="zstd",
            row_group_size=32,
        )
        n += t.num_rows
    return n


def _write_pixels(path: str, cube: np.ndarray, catalog: list[tuple[str, str]]) -> None:
    """Long pixel oracle table; biomass stored as float64 of the f32 value."""
    n = cube.shape[1]
    yy, xx = np.meshgrid(np.arange(n, dtype=np.int32), np.arange(n, dtype=np.int32), indexing="ij")
    writer = pq.ParquetWriter(
        path,
        pa.schema(
            [
                ("species_code", pa.string()),
                ("y", pa.int32()),
                ("x", pa.int32()),
                ("biomass", pa.float64()),
            ]
        ),
        compression="zstd",
    )
    try:
        for si, (code, _name) in enumerate(catalog):
            t = pa.table(
                {
                    "species_code": pa.array([code] * (n * n), type=pa.string()),
                    "y": pa.array(yy.ravel(), type=pa.int32()),
                    "x": pa.array(xx.ravel(), type=pa.int32()),
                    "biomass": pa.array(cube[si].astype(np.float64).ravel(), type=pa.float64()),
                }
            )
            writer.write_table(t)
    finally:
        writer.close()


def _write_warp_expected(path: str, scale: Scale, cube: np.ndarray) -> None:
    """Pinned oracle for the Web-Mercator warp of the total-biomass
    raster (contract.q_warp_mercator): a SINGLE-PROCESS brute-force
    reprojection over the stitched cube — no tiling, no gather, no
    exchange — emitting the same per-destination-tile summary
    (tile_row, tile_col, n_valid, sum_u). The distributed pipeline's
    cover fan-out / keyed exchange / per-tile resample must reproduce it
    bit-exactly. Same brute force as tests/test_warp.py:51.

    Exactness: total = float64 sum of the f32 species layers (≤ 24+5
    mantissa bits → order-independent); warped values are copies of
    source pixels (nearest neighbor), so s6 sums are exact ints."""
    from gridfia_ray.geo.crs import transform_bbox, transform_points

    n = scale.grid * scale.tile
    G = cube[1:].astype(np.float64).sum(axis=0)  # total from species layers
    ext = float(n) * PX
    bbox = transform_bbox(
        (ORIGIN_X, ORIGIN_Y - ext, ORIGIN_X + ext, ORIGIN_Y), CRS, "EPSG:3857"
    )
    dst_px, D = 40.0, scale.tile
    dst_x0, dst_y0 = bbox[0], bbox[3]
    cell = dst_px * D
    # scan the destination tiles covering the transformed extent (+1
    # margin ring); tiles at negative indices never materialize (the
    # pipeline clamps), and all-NaN tiles are dropped on both sides
    n_cols = int(np.ceil((bbox[2] - bbox[0]) / cell)) + 2
    n_rows = int(np.ceil((bbox[3] - bbox[1]) / cell)) + 2
    rows = []
    for tr in range(n_rows):
        for tc in range(n_cols):
            xs = dst_x0 + (tc * D + np.arange(D) + 0.5) * dst_px
            ys = dst_y0 - (tr * D + np.arange(D) + 0.5) * dst_px
            gx = np.broadcast_to(xs[None, :], (D, D)).ravel()
            gy = np.broadcast_to(ys[:, None], (D, D)).ravel()
            sx, sy = transform_points(gx, gy, "EPSG:3857", CRS)
            px_x = np.floor((sx - ORIGIN_X) / PX).astype(np.int64)
            px_y = np.floor((ORIGIN_Y - sy) / PX).astype(np.int64)
            ok = (px_x >= 0) & (px_y >= 0) & (px_x < n) & (px_y < n)
            if not ok.any():
                continue
            vals = G[px_y[ok], px_x[ok]]
            sum_u = int(
                np.floor(vals * 1_000_000 + 0.5).astype(np.int64).sum()
            )
            rows.append((tr, tc, int(ok.sum()), sum_u))
    df = pa.table(
        {
            "tile_row": pa.array([r[0] for r in rows], pa.int64()),
            "tile_col": pa.array([r[1] for r in rows], pa.int64()),
            "n_valid": pa.array([r[2] for r in rows], pa.int64()),
            "sum_u": pa.array([r[3] for r in rows], pa.int64()),
        }
    )
    pq.write_table(df, path)


def _write_percentiles_expected(path: str, cube: np.ndarray) -> None:
    """Pinned oracle for the mergeable-histogram percentile sketch
    (contract.q_percentiles): the sketch is APPROXIMATE vs the true
    order statistic but fully DETERMINISTIC (exact min/max range, fixed
    4096 float64 edges, exact int64 counts, one interpolation formula) —
    so a single-process replay over the cube's nonzero species values
    pins its output exactly, turning the driver row from no_oracle to a
    full hash check. np.percentile-level accuracy is separately asserted
    in tests/test_reassemble_percentiles.py."""
    vals = cube[1:].ravel()
    vals = vals[vals != 0.0]
    lo, hi = float(vals.min()), float(vals.max())
    bins = 4096
    edges = np.linspace(lo, hi, bins + 1)
    counts = np.histogram(vals, bins=edges)[0].astype(np.int64)
    cum = np.cumsum(counts)
    total = int(cum[-1])
    out_q, out_v = [], []
    for q in (2.0, 50.0, 98.0):
        target = q / 100.0 * total
        b = min(int(np.searchsorted(cum, target, side="left")), bins - 1)
        prev = cum[b - 1] if b > 0 else 0
        in_bin = counts[b]
        frac = (target - prev) / in_bin if in_bin > 0 else 0.0
        v = float(edges[b] + frac * (edges[b + 1] - edges[b]))
        out_q.append(q)
        out_v.append(int(np.floor(np.float64(v) * 1_000_000 + 0.5)))
    pq.write_table(
        pa.table(
            {"q": pa.array(out_q, pa.float64()), "value_u": pa.array(out_v, pa.int64())}
        ),
        path,
    )


# ---------------------------------------------------------------------------
# zones — geometry in world coords; membership from independent logic
# ---------------------------------------------------------------------------

_EDGE_OFF = 7.3  # meters; keeps zone edges off the pixel-center lattice


def _zone_defs(scale: Scale):
    """Returns list of (zone_id, zone_name, kind, params) in world coords.

    kind 'rect'    params (x0, y0t, x1, y1b) with y0t > y1b (top > bottom)
    kind 'lshape'  params (rect1, rect2) — union of two rects
    kind 'tri'     params ((x,y) * 3)
    """
    ext = scale.grid * scale.tile * PX
    X, Y = ORIGIN_X, ORIGIN_Y  # top-left

    def fx(f):
        return X + f * ext + _EDGE_OFF

    def fy(f):  # fraction measured downward from the top edge
        return Y - f * ext - _EDGE_OFF

    rect_a = (fx(0.05), fy(0.05), fx(0.45), fy(0.55))
    rect_b = (fx(0.50), fy(0.10), fx(0.95), fy(0.50))
    l_r1 = (fx(0.10), fy(0.60), fx(0.60), fy(0.75))
    l_r2 = (fx(0.10), fy(0.75), fx(0.35), fy(0.95))
    tri = ((fx(0.55), fy(0.60)), (fx(0.95), fy(0.60)), (fx(0.75), fy(0.95)))
    edge = (fx(0.80), fy(-0.20), fx(1.20), fy(0.30))  # sticks out of the extent
    return [
        ("37001", "RectWest", "rect", rect_a),
        ("37003", "RectEast", "rect", rect_b),
        ("37005", "ElbowSouth", "lshape", (l_r1, l_r2)),
        ("37007", "TriangleSE", "tri", tri),
        ("37009", "EdgeOverlap", "rect", edge),
    ]


def _zone_polygon(kind: str, params) -> list:
    if kind == "rect":
        x0, y0, x1, y1 = params
        return wkb.box(x0, min(y0, y1), x1, max(y0, y1))
    if kind == "lshape":
        (ax0, ay0, ax1, ay1), (bx0, by0, bx1, by1) = params
        # rect1 on top of rect2, sharing the y=ay1 line; single concave ring
        ring = np.array(
            [
                [ax0, ay0],
                [ax1, ay0],
                [ax1, ay1],
                [bx1, ay1],
                [bx1, by1],
                [bx0, by1],
                [ax0, ay0],
            ]
        )
        return [ring]
    if kind == "tri":
        (x1, y1), (x2, y2), (x3, y3) = params
        return [np.array([[x1, y1], [x2, y2], [x3, y3], [x1, y1]])]
    raise ValueError(kind)


def _zone_mask(kind: str, params, cx: np.ndarray, cy: np.ndarray) -> np.ndarray:
    """Membership of pixel centers — deliberately NOT the engine's PIP."""
    if kind == "rect":
        x0, y0, x1, y1 = params
        ylo, yhi = min(y0, y1), max(y0, y1)
        return (cx > x0) & (cx < x1) & (cy > ylo) & (cy < yhi)
    if kind == "lshape":
        return _zone_mask("rect", params[0], cx, cy) | _zone_mask("rect", params[1], cx, cy)
    if kind == "tri":
        (x1, y1), (x2, y2), (x3, y3) = params

        def side(ax, ay, bx, by):
            return (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)

        d1 = side(x1, y1, x2, y2)
        d2 = side(x2, y2, x3, y3)
        d3 = side(x3, y3, x1, y1)
        return ((d1 > 0) & (d2 > 0) & (d3 > 0)) | ((d1 < 0) & (d2 < 0) & (d3 < 0))
    raise ValueError(kind)


def _write_zones(dirpath: str, scale: Scale) -> None:
    defs = _zone_defs(scale)
    pq.write_table(
        pa.table(
            {
                "zone_id": [z[0] for z in defs],
                "zone_name": [z[1] for z in defs],
                "geometry_wkb": [wkb.encode_polygon(_zone_polygon(z[2], z[3])) for z in defs],
            }
        ),
        os.path.join(dirpath, "zones.parquet"),
    )
    # independent pixel→zone membership on pixel centers
    n = scale.grid * scale.tile
    xs = ORIGIN_X + (np.arange(n, dtype=np.float64) + 0.5) * PX
    ys = ORIGIN_Y - (np.arange(n, dtype=np.float64) + 0.5) * PX
    cx = np.broadcast_to(xs[None, :], (n, n))
    cy = np.broadcast_to(ys[:, None], (n, n))
    zid, zy, zx = [], [], []
    for zone_id, _name, kind, params in defs:
        mask = _zone_mask(kind, params, cx, cy)
        yy, xx = np.nonzero(mask)
        zid.extend([zone_id] * len(yy))
        zy.append(yy.astype(np.int32))
        zx.append(xx.astype(np.int32))
    pq.write_table(
        pa.table(
            {
                "zone_id": pa.array(zid, type=pa.string()),
                "y": np.concatenate(zy) if zy else np.array([], np.int32),
                "x": np.concatenate(zx) if zx else np.array([], np.int32),
            }
        ),
        os.path.join(dirpath, "pixel_zones.parquet"),
    )


def _write_plots(dirpath: str, scale: Scale, n_plots: int = 32) -> None:
    rng = np.random.RandomState(SEED + 1)
    ext = scale.grid * scale.tile * PX
    x = ORIGIN_X + rng.rand(n_plots) * ext
    y = ORIGIN_Y - rng.rand(n_plots) * ext
    value = (rng.rand(n_plots) * 100.0).astype(np.float64)
    pq.write_table(
        pa.table(
            {
                "plot_id": [f"P{i:04d}" for i in range(n_plots)],
                "x": x,
                "y": y,
                "value": value,
            }
        ),
        os.path.join(dirpath, "plots.parquet"),
    )


def _write_dup_tiles(dirpath: str) -> None:
    """tiles_dup = tiles ∪ exact dups (every 7th row, identical image_id)
    ∪ near-dups (noised pixels, new image_id, phash within a few bits)."""
    tiles = pq.read_table(os.path.join(dirpath, "tiles"))
    rows = tiles.to_pylist()
    exact = [dict(r) for r in rows[::7]]
    rng = np.random.RandomState(SEED + 2)
    near = []
    for r in rows[::13]:
        arr = np.frombuffer(r["bytes"], dtype="<f4").reshape(r["h"], r["w"]).copy()
        arr += (rng.rand(*arr.shape).astype(np.float32) - 0.5) * 0.01  # tiny noise
        near.append(
            {
                **r,
                "image_id": r["image_id"] + "#near",
                "bytes": arr.astype("<f4").tobytes(),
                "phash": average_phash64(arr),
            }
        )
    dup = pa.Table.from_pylist(rows + exact + near, schema=_TILE_SCHEMA)
    pq.write_table(dup, os.path.join(dirpath, "tiles_dup.parquet"))


def ensure_fixture(name: str) -> str:
    """Generate (once, atomically) and return the fixture directory."""
    scale = SCALES[name]
    out = os.path.join(FIXTURE_ROOT, f"{name}-v{GEN_VERSION}")
    marker = os.path.join(out, "_COMPLETE")
    if os.path.exists(marker):
        return out
    os.makedirs(FIXTURE_ROOT, exist_ok=True)
    tmp = tempfile.mkdtemp(prefix=f".{name}-", dir=FIXTURE_ROOT)
    try:
        cube, catalog = build_cube(scale)
        n_tiles = _write_tiles(os.path.join(tmp, "tiles"), scale, cube, catalog)
        if scale.name in ("t1", "t1png", "t2"):
            _write_pixels(os.path.join(tmp, "pixels.parquet"), cube, catalog)
        if scale.name in ("t1", "t2"):
            _write_warp_expected(os.path.join(tmp, "warp_expected.parquet"), scale, cube)
            _write_percentiles_expected(
                os.path.join(tmp, "percentiles_expected.parquet"), cube
            )
        _write_zones(tmp, scale)
        _write_plots(tmp, scale)
        if scale.fmt == "raw-f32" and scale.name in ("t1", "t2"):
            _write_dup_tiles(tmp)  # small scales only — dedup oracles
        meta = {
            "scale": scale.name,
            "grid": scale.grid,
            "tile": scale.tile,
            "fmt": scale.fmt,
            "n_species": scale.n_species,
            "n_tiles": n_tiles,
            "crs": CRS,
            "transform": base_transform(),
            "species": [{"species_code": c, "species_name": s} for c, s in catalog],
            "group": {"group_name": GROUP_NAME, "species_codes": list(GROUP_CODES)},
            "gen_version": GEN_VERSION,
            "seed": SEED,
        }
        with open(os.path.join(tmp, "meta.json"), "w") as f:
            json.dump(meta, f, indent=1)
        with open(os.path.join(tmp, "_COMPLETE"), "w") as f:
            f.write("ok\n")
        if os.path.exists(out):  # lost a race; keep the winner
            shutil.rmtree(tmp, ignore_errors=True)
        else:
            os.rename(tmp, out)
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    return out


def fixture_meta(name: str) -> dict:
    with open(os.path.join(ensure_fixture(name), "meta.json")) as f:
        return json.load(f)


# bump when the JPEG/WebP codec or the expected-table layout changes —
# the pinned oracle must be regenerated alongside the codec's bit behavior
JPEG_ORACLE_V = 1
WEBP_ORACLE_V = 1


def ensure_jpeg_fixture() -> dict:
    """Lossy-codec roundtrip fixture (cached): the t2 cube encoded as a
    baseline-JPEG tile table, plus the PINNED expected decode sums — a
    single-process sequential replay (codecs.registry.decode_tile per
    payload, no Ray) of exactly the bytes the distributed decoder pool
    will see. JPEG is lossy but DETERMINISTIC: encode once at fixture
    gen, and the distributed caption-scale dequantization must
    reproduce the sequential replay bit-exactly. Returns
    {'tiles': parquet path, 'expected': parquet path}."""
    return _ensure_codec_fixture("jpeg", JPEG_ORACLE_V)


def ensure_webp_fixture() -> dict:
    """Same contract for WebP-lossless (VP8L, codecs/webp): quantized
    8-bit tile table + pinned sequential decode sums."""
    return _ensure_codec_fixture("webp", WEBP_ORACLE_V)


def _ensure_codec_fixture(fmt: str, version: int) -> dict:
    from gridfia_ray.codecs.registry import decode_tile

    out = os.path.join(FIXTURE_ROOT, f"{fmt}-t2-v{GEN_VERSION}.{version}")
    marker = os.path.join(out, "_COMPLETE")
    paths = {
        "tiles": os.path.join(out, "tiles.parquet"),
        "expected": os.path.join(out, "expected.parquet"),
    }
    if os.path.exists(marker):
        return paths
    os.makedirs(FIXTURE_ROOT, exist_ok=True)
    tmp = tempfile.mkdtemp(prefix=f".{fmt}-t2-", dir=FIXTURE_ROOT)
    try:
        scale = SCALES["t2"]
        cube, catalog = build_cube(scale)
        table = tile_table_from_cube(cube, catalog, scale.tile, fmt=fmt)
        pq.write_table(table, os.path.join(tmp, "tiles.parquet"), compression="zstd")
        ids, sums = [], []
        for row in table.to_pylist():
            arr = decode_tile(
                row["bytes"], row["fmt"], row["h"], row["w"], json.loads(row["caption"])
            )
            ids.append(row["image_id"])
            sums.append(
                int(np.floor(arr.astype(np.float64) * 1_000_000 + 0.5).astype(np.int64).sum())
            )
        exp = pa.table(
            {"image_id": pa.array(ids, pa.string()), "sum_u": pa.array(sums, pa.int64())}
        )
        pq.write_table(exp.sort_by("image_id"), os.path.join(tmp, "expected.parquet"))
        with open(os.path.join(tmp, "_COMPLETE"), "w") as f:
            f.write("ok\n")
        if os.path.exists(out):
            shutil.rmtree(tmp, ignore_errors=True)
        else:
            os.rename(tmp, out)
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    return paths


def ensure_embedding_fixture(
    n: int = 400_000, dim: int = 64, n_clusters: int = 64, seed: int = 1234
) -> str:
    """Seeded clustered embedding corpus for ANN benchmarks (the sf
    embeddings tables are random noise and tiny). Returns the parquet
    path; generated once, cached. Rows: vec_id int64, embedding
    list<float32>, label int32."""
    out = os.path.join(FIXTURE_ROOT, f"emb-{n}x{dim}c{n_clusters}-v{GEN_VERSION}.parquet")
    if os.path.exists(out):
        return out
    os.makedirs(FIXTURE_ROOT, exist_ok=True)
    rng = np.random.RandomState(seed)
    centers = rng.normal(size=(n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.randint(0, n_clusters, n)
    vecs = (centers[labels] + 0.25 * rng.normal(size=(n, dim))).astype(np.float32)
    flat = pa.array(vecs.reshape(-1), pa.float32())
    emb = pa.FixedSizeListArray.from_arrays(flat, dim)
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": emb,
            "label": pa.array(labels.astype(np.int32)),
        }
    )
    tmp = out + f".tmp{os.getpid()}"
    pq.write_table(t, tmp, row_group_size=32_768)
    os.replace(tmp, out)
    return out
