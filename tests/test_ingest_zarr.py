"""Zarr-cube → tile-store ingest: equality with the direct store,
aligned layout, chunk straddling, and metadata fallbacks."""

import os

import numpy as np
import pytest

from gridfia_ray import fixtures
from gridfia_ray.codecs import zarrlite
from gridfia_ray.exceptions import InvalidTileTable
from gridfia_ray.pipelines.ingest import ingest_zarr_cube


@pytest.fixture(scope="module")
def cube_and_catalog():
    cube, catalog = fixtures.build_cube(fixtures.SCALES["t1"])
    return cube.astype(np.float32), catalog


def _write_cube_zarr(root, cube, catalog, chunk):
    meta = zarrlite.array_metadata(
        cube.shape,
        chunk,
        np.float32,
        fill_value=0.0,
        attributes={
            "species": [
                {"species_code": c, "species_name": n} for c, n in catalog
            ],
            "transform": fixtures.base_transform(),
            "crs": fixtures.CRS,
        },
        dimension_names=["species", "y", "x"],
    )
    zarrlite.init_store(root, meta)
    cs = chunk
    grid = [int(np.ceil(s / c)) for s, c in zip(cube.shape, cs)]
    for idx in np.ndindex(*grid):
        sl = tuple(slice(i * c, min((i + 1) * c, s)) for i, c, s in zip(idx, cs, cube.shape))
        zarrlite.write_chunk(root, meta, idx, cube[sl])
    return meta


class TestZarrIngest:
    @pytest.mark.parametrize("chunk", [(1, 128, 128), (1, 96, 256)])
    def test_roundtrip_bit_exact(self, ray_session, cube_and_catalog, tmp_path, chunk):
        """Ingested tiles decode bit-exactly to the source cube, for
        aligned AND straddling chunk grids."""
        cube, catalog = cube_and_catalog
        zroot = str(tmp_path / f"cube_zarr_{chunk[1]}")
        out = str(tmp_path / f"tiles_{chunk[1]}")
        _write_cube_zarr(zroot, cube, catalog, chunk)
        n = ingest_zarr_cube(zroot, out, tile=64)
        g = cube.shape[1] // 64
        assert n == len(catalog) * g * g

        import pyarrow.parquet as pq

        t = pq.read_table(os.path.join(out, f"part-{catalog[2][0]}.parquet"))
        for i in range(t.num_rows):
            image_id = t["image_id"][i].as_py()
            _, tr, tc = image_id.split("/")
            tr, tc = int(tr), int(tc)
            arr = np.frombuffer(t["bytes"][i].as_py(), dtype="<f4").reshape(64, 64)
            expect = cube[2, tr * 64 : (tr + 1) * 64, tc * 64 : (tc + 1) * 64]
            assert np.array_equal(arr, expect), image_id

    def test_store_is_valid_and_aligned(self, ray_session, cube_and_catalog, tmp_path):
        cube, catalog = cube_and_catalog
        zroot = str(tmp_path / "cube_zarr_v")
        out = str(tmp_path / "tiles_v")
        _write_cube_zarr(zroot, cube, catalog, (1, 128, 128))
        ingest_zarr_cube(zroot, out, tile=64)

        from gridfia_ray.api import GridFIARay
        from gridfia_ray.pipelines.aligned import aligned_layout

        assert GridFIARay.validate_store(out)["n_species"] == len(catalog)
        assert aligned_layout(out) is not None  # zero-shuffle path eligible

    def test_metrics_match_direct_store(self, ray_session, cube_and_catalog, tmp_path,
                                        t1_dir):
        """A kernel run over the ingested store equals the run over the
        fixture-built store of the same cube."""
        cube, catalog = cube_and_catalog
        zroot = str(tmp_path / "cube_zarr_m")
        out = str(tmp_path / "tiles_m")
        _write_cube_zarr(zroot, cube, catalog, (1, 128, 128))
        ingest_zarr_cube(zroot, out, tile=64)

        from gridfia_ray.api import GridFIARay

        def run(store):
            api = GridFIARay.from_store(store)
            res = api.calculate_metrics(store, ["species_richness"]).to_pandas()
            return res.sort_values(["tile_row", "tile_col", "metric"]).reset_index(
                drop=True
            )

        a = run(out)
        b = run(os.path.join(t1_dir, "tiles"))
        import pandas as pd

        pd.testing.assert_frame_equal(a, b)  # incl. bit-exact pix payloads

    def test_errors(self, ray_session, cube_and_catalog, tmp_path):
        cube, catalog = cube_and_catalog
        zroot = str(tmp_path / "cube_zarr_e")
        _write_cube_zarr(zroot, cube, catalog, (1, 128, 128))
        with pytest.raises(InvalidTileTable):
            ingest_zarr_cube(zroot, str(tmp_path / "x"), tile=48)  # 256 % 48 != 0
        with pytest.raises(InvalidTileTable):
            ingest_zarr_cube(zroot, str(tmp_path / "y"), tile=64,
                             catalog=[("0001", "one")])  # wrong catalog size


class TestCompactStore:
    def _mono(self, tmp_path, cube, catalog, tile):
        import pyarrow.parquet as pq

        mono = str(tmp_path / "mono.parquet")
        pq.write_table(
            fixtures.tile_table_from_cube(cube.astype(np.float32), catalog, tile), mono
        )
        return mono

    def test_monolithic_to_aligned(self, ray_session, tmp_path, cube_and_catalog):
        import pyarrow.parquet as pq

        from gridfia_ray.pipelines.ingest import compact_store

        cube, catalog = cube_and_catalog
        tile = 64
        mono = self._mono(tmp_path, cube, catalog, tile)
        dst = str(tmp_path / "store")
        manifest = compact_store(mono, dst)
        assert manifest["species_code"].tolist() == sorted(c for c, _ in catalog)
        # per-species files exist, tile-ordered, fixed row groups
        for code, _ in catalog:
            f = pq.ParquetFile(os.path.join(dst, f"part-{code}.parquet"))
            ids = f.read(columns=["image_id"])["image_id"].to_pylist()
            assert ids == sorted(ids)
            assert f.metadata.row_group(0).num_rows <= 32
        # content identical to the source (same multiset of rows)
        src = pq.read_table(mono).sort_by("image_id")
        got = pq.read_table(dst).sort_by("image_id")
        assert src.equals(got)

    def test_resume_skips_done_species(self, ray_session, tmp_path, cube_and_catalog):
        import pyarrow.parquet as pq

        from gridfia_ray.pipelines.ingest import compact_store

        cube, catalog = cube_and_catalog
        mono = self._mono(tmp_path, cube, catalog, 64)
        dst = str(tmp_path / "store")
        os.makedirs(dst)
        # pre-complete one species with a SENTINEL extra column value —
        # if compaction rewrote it, the sentinel would vanish
        code0 = catalog[1][0]
        pre = (
            pq.read_table(mono)
            .filter(
                np.array(
                    [i.startswith(code0 + "/") for i in pq.read_table(mono)["image_id"].to_pylist()]
                )
            )
            .sort_by("image_id")
        )
        pq.write_table(pre, os.path.join(dst, f"part-{code0}.parquet"))
        before = os.path.getmtime(os.path.join(dst, f"part-{code0}.parquet"))
        manifest = compact_store(mono, dst)
        after = os.path.getmtime(os.path.join(dst, f"part-{code0}.parquet"))
        assert before == after  # untouched
        assert len(manifest) == len(catalog)
        assert manifest.loc[manifest["species_code"] == code0, "n_rows"].iloc[0] == pre.num_rows

    def test_misaligned_raises(self, ray_session, tmp_path, cube_and_catalog):
        import pyarrow.parquet as pq

        from gridfia_ray.pipelines.ingest import compact_store

        cube, catalog = cube_and_catalog
        mono = self._mono(tmp_path, cube, catalog, 64)
        t = pq.read_table(mono)
        # drop one row of one species → per-species counts disagree
        mask = np.ones(t.num_rows, dtype=bool)
        drop_at = next(
            i for i, v in enumerate(t["image_id"].to_pylist())
            if v.startswith(catalog[1][0] + "/")
        )
        mask[drop_at] = False
        broken = str(tmp_path / "broken.parquet")
        pq.write_table(t.filter(np.array(mask)), broken)
        with pytest.raises(InvalidTileTable, match="misaligned"):
            compact_store(broken, str(tmp_path / "store2"))
