"""API facade tests (the reference's API-first surface, api.py:57-818)."""

import os

import numpy as np
import pytest

from gridfia_ray.api import GridFIARay
from gridfia_ray.exceptions import CalculationFailed, InvalidTileTable
from gridfia_ray.pipelines.common import GridSpec


@pytest.fixture(scope="module")
def api(t1_meta):
    return GridFIARay(GridSpec.from_fixture_meta(t1_meta))


class TestStore:
    def test_from_store_infers_spec(self, t1_tiles, t1_meta):
        api = GridFIARay.from_store(t1_tiles)
        assert api.spec.origin_x == t1_meta["transform"][0]
        assert api.spec.origin_y == t1_meta["transform"][3]
        assert api.spec.tile == t1_meta["tile"]

    def test_list_species(self, api, t1_tiles):
        cat = api.list_species(t1_tiles)
        assert len(cat) == 6
        assert cat.iloc[0]["species_code"] == "0000"

    def test_validate_store(self, api, t1_tiles):
        v = api.validate_store(t1_tiles)
        assert v["valid"] and v["n_species"] == 6 and v["n_tile_positions"] == 16

    def test_validate_rejects_misaligned(self, api, tmp_path, t1_tiles):
        import pyarrow.parquet as pq

        t = pq.read_table(t1_tiles)
        broken = t.slice(0, t.num_rows - 1)  # drop one tile of one species
        p = str(tmp_path / "broken.parquet")
        pq.write_table(broken, p)
        with pytest.raises(InvalidTileTable):
            api.validate_store(p)

    def test_create_and_append(self, api, tmp_path, ray_session):
        rng = np.random.RandomState(0)
        cube = np.zeros((3, 128, 128), dtype=np.float32)
        cube[1] = rng.rand(128, 128) * 10
        cube[2] = rng.rand(128, 128) * 5
        cube[0] = cube[1:].sum(axis=0)
        p = str(tmp_path / "store.parquet")
        n = api.create_tile_table(cube, [("0000", "Total"), ("0010", "A"), ("0020", "B")], p, tile=64)
        assert n == 3 * 4
        n2 = api.append_species(p, rng.rand(128, 128).astype(np.float32), "0030", "C")
        assert n2 == 4
        assert api.validate_store(p)["n_species"] == 4
        with pytest.raises(InvalidTileTable):
            api.append_species(p, cube[1], "0030", "C")  # duplicate code
        with pytest.raises(InvalidTileTable):
            api.append_species(p, np.zeros((64, 64), np.float32), "0040", "D")  # misaligned


class TestCompute:
    def test_calculate_metrics_streaming(self, api, t1_tiles, ray_session):
        res = api.calculate_metrics(t1_tiles, ["species_richness"])
        assert res.count() == 16

    def test_unknown_calculation(self, api, t1_tiles):
        with pytest.raises(CalculationFailed):
            api.calculate_metrics(t1_tiles, ["not_a_metric"])

    def test_no_enabled_calculations(self, api, t1_tiles):
        with pytest.raises(CalculationFailed):
            api.calculate_metrics(t1_tiles, [{"name": "species_richness", "enabled": False}])

    def test_identify_pixel(self, api, t1_tiles, ray_session, t1_meta):
        from gridfia_ray import fixtures

        cube, catalog = fixtures.build_cube(fixtures.SCALES["t1"])
        # pixel (y=10, x=200) world coords
        x = t1_meta["transform"][0] + (200 + 0.5) * 30.0
        y = t1_meta["transform"][3] - (10 + 0.5) * 30.0
        v = api.identify_pixel(t1_tiles, x, y, "0131")
        si = [c for c, _ in catalog].index("0131")
        assert v == pytest.approx(float(cube[si, 10, 200]))

    def test_identify_pixel_grid_edge(self, api, t1_tiles, ray_session, t1_meta):
        """Point exactly on the grid's right/bottom edge clamps to the
        last pixel instead of raising IndexError (ADVICE r1)."""
        from gridfia_ray import fixtures

        cube, catalog = fixtures.build_cube(fixtures.SCALES["t1"])
        n = cube.shape[1]
        x = t1_meta["transform"][0] + n * 30.0
        y = t1_meta["transform"][3] - n * 30.0
        v = api.identify_pixel(t1_tiles, x, y, "0131")
        si = [c for c, _ in catalog].index("0131")
        assert v == pytest.approx(float(cube[si, -1, -1]))


class TestCheckpoint:
    def test_resume_skips_completed(self, api, t1_tiles, tmp_path, ray_session, t1_catalog):
        out = str(tmp_path / "run")
        m1 = api.calculate_metrics(
            t1_tiles, ["species_richness"], output_dir=out, n_shards=4, catalog=t1_catalog
        )
        assert len(m1.completed()) == 4
        total_rows = sum(e["rows_out"] for e in m1.partitions.values())
        assert total_rows == 16
        assert sum(e["tiles_in"] for e in m1.partitions.values()) == 96
        # lineage recorded
        assert all("input_path" in e and "tiles_per_sec" in e for e in m1.partitions.values())
        # resume: nothing re-runs (wall times unchanged)
        before = {k: e["wall_sec"] for k, e in m1.partitions.items()}
        m2 = api.calculate_metrics(
            t1_tiles, ["species_richness"], output_dir=out, n_shards=4, catalog=t1_catalog
        )
        after = {k: e["wall_sec"] for k, e in m2.partitions.items()}
        assert before == after

    def test_sharded_equals_unsharded(self, api, t1_tiles, tmp_path, ray_session, t1_catalog):
        import glob

        import pyarrow.parquet as pq

        out = str(tmp_path / "run2")
        api.calculate_metrics(
            t1_tiles, ["species_richness"], output_dir=out, n_shards=3, catalog=t1_catalog
        )
        files = glob.glob(os.path.join(out, "part=*", "*.parquet"))
        sharded = pq.read_table(files).to_pandas().sort_values("cell_id").reset_index(drop=True)
        direct = (
            api.calculate_metrics(t1_tiles, ["species_richness"], catalog=t1_catalog)
            .to_pandas()
            .sort_values("cell_id")
            .reset_index(drop=True)
        )
        assert len(sharded) == len(direct) == 16
        assert (sharded["pix"] == direct["pix"]).all()


class TestDirectoryAppend:
    def test_append_writes_new_part_file(self, api, tmp_path, ray_session, t1_dir):
        import shutil

        store = str(tmp_path / "tiles")
        shutil.copytree(os.path.join(t1_dir, "tiles"), store)
        rng = np.random.RandomState(9)
        n = api.append_species(store, rng.rand(256, 256).astype(np.float32) * 5, "0777", "New")
        assert n == 16
        assert os.path.exists(os.path.join(store, "part-0777.parquet"))
        assert api.validate_store(store)["n_species"] == 7
        # aligned layout still holds -> zero-shuffle path still applies
        from gridfia_ray.pipelines.aligned import aligned_layout

        assert aligned_layout(store) is not None
        with pytest.raises(InvalidTileTable):
            api.append_species(store, np.zeros((256, 256), np.float32), "0777", "Dup")
        with pytest.raises(InvalidTileTable):
            api.append_species(store, np.zeros((64, 64), np.float32), "0888", "Bad")


class TestAlignedProbe:
    def test_rejects_foreign_directories(self, tmp_path, t1_dir):
        """aligned_layout must not treat an arbitrary directory of
        equal-shaped parquet files as an aligned store (ADVICE r1)."""
        import shutil

        import pyarrow.parquet as pq

        from gridfia_ray.pipelines.aligned import aligned_layout

        src = os.path.join(t1_dir, "tiles")
        name0 = sorted(os.listdir(src))[0]

        # wrong filenames (no part- prefix) -> rejected
        d1 = str(tmp_path / "foreign")
        os.makedirs(d1)
        for i, f in enumerate(sorted(os.listdir(src))):
            shutil.copy(os.path.join(src, f), os.path.join(d1, f"data-{i}.parquet"))
        assert aligned_layout(d1) is None

        # part- names whose code contradicts the content -> rejected
        d2 = str(tmp_path / "mismatched")
        os.makedirs(d2)
        shutil.copy(os.path.join(src, name0), os.path.join(d2, "part-9999.parquet"))
        assert aligned_layout(d2) is None

        # the genuine store still probes fine
        assert aligned_layout(src) is not None
        # sanity: first row's species prefix equals the filename code
        code = name0[len("part-"):-len(".parquet")]
        first = next(pq.ParquetFile(os.path.join(src, name0)).iter_batches(batch_size=1))
        assert first["image_id"][0].as_py().startswith(code + "/")
