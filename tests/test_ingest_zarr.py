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
