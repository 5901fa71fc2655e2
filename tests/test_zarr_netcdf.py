"""Zarr v3 and NetCDF classic result sinks (S13/S14): format
round-trips, distributed chunk writes, resume semantics."""

import os

import numpy as np
import pytest

from gridfia_ray.codecs import cdf as C
from gridfia_ray.codecs import zarrlite as Z


class TestZarrLite:
    def test_roundtrip_with_edge_chunks(self, tmp_path):
        root = str(tmp_path / "z")
        rng = np.random.RandomState(0)
        a = rng.rand(10, 7).astype(np.float32)  # not a multiple of chunk
        meta = Z.array_metadata((10, 7), (4, 4), np.float32, attributes={"k": 1})
        Z.init_store(root, meta)
        for i in range(3):
            for j in range(2):
                Z.write_chunk(root, meta, (i, j), a[i * 4 : (i + 1) * 4, j * 4 : (j + 1) * 4])
        out, m = Z.read_array(root)
        assert (out == a).all()
        assert m["attributes"]["k"] == 1
        assert m["codecs"][-1]["name"] == "gzip"

    def test_missing_chunk_is_fill(self, tmp_path):
        root = str(tmp_path / "z2")
        meta = Z.array_metadata((8, 8), (4, 4), np.float32, fill_value=np.nan)
        Z.init_store(root, meta)
        Z.write_chunk(root, meta, (0, 0), np.ones((4, 4), np.float32))
        out, _ = Z.read_array(root)
        assert (out[:4, :4] == 1).all()
        assert np.isnan(out[4:, 4:]).all()

    def test_uncompressed_and_int_dtypes(self, tmp_path):
        root = str(tmp_path / "z3")
        a = np.arange(16, dtype=np.int64).reshape(4, 4)
        meta = Z.array_metadata((4, 4), (2, 2), np.int64, fill_value=0, compress=False)
        Z.init_store(root, meta)
        for i in range(2):
            for j in range(2):
                Z.write_chunk(root, meta, (i, j), a[i * 2 : (i + 1) * 2, j * 2 : (j + 1) * 2])
        # raw bytes on disk == little-endian array bytes (no codec)
        raw = open(os.path.join(root, "c", "0", "0"), "rb").read()
        assert raw == a[:2, :2].astype("<i8").tobytes()
        out, _ = Z.read_array(root)
        assert (out == a).all()


class TestCdf:
    def test_header_and_roundtrip(self, tmp_path):
        path = str(tmp_path / "t.nc")
        variables = [
            C.CdfVar("x", C.NC_DOUBLE, [1], [("units", C.NC_CHAR, "m")]),
            C.CdfVar("y", C.NC_DOUBLE, [0]),
            C.CdfVar("v", C.NC_FLOAT, [0, 1], [("_FillValue", C.NC_FLOAT, [np.nan])]),
        ]
        vmap = C.write_header(
            path, dims=[("y", 3), ("x", 5)], variables=variables,
            global_atts=[("crs", C.NC_CHAR, "EPSG:5070"), ("t", C.NC_DOUBLE, [1.5, 2.5])],
        )
        # note: arithmetic on a '>f8' array silently returns native
        # endian — cast AFTER computing, as the real sink does
        xs = (np.arange(5) * 30.0).astype(">f8")
        ys = (np.arange(3) * -30.0).astype(">f8")
        v = np.arange(15).reshape(3, 5).astype(">f4")
        with open(path, "r+b") as f:
            f.seek(vmap["x"].begin); f.write(xs.tobytes())
            f.seek(vmap["y"].begin); f.write(ys.tobytes())
            f.seek(vmap["v"].begin); f.write(v.tobytes())
        data, vatts, gatts = C.read_cdf(path)
        assert (data["x"] == xs).all() and (data["y"] == ys).all()
        assert (data["v"] == v).all()
        assert gatts["crs"] == "EPSG:5070" and gatts["t"] == [1.5, 2.5]
        assert vatts["x"]["units"] == "m"
        assert np.isnan(vatts["v"]["_FillValue"][0])

    def test_magic_is_cdf2(self, tmp_path):
        path = str(tmp_path / "m.nc")
        C.write_header(path, dims=[("x", 2)], variables=[C.CdfVar("x", C.NC_INT, [0])])
        assert open(path, "rb").read(4) == b"CDF\x02"


class TestResultSinks:
    @pytest.fixture(scope="class")
    def result_ds(self, ray_session, t1_tiles, t1_catalog, t1_meta):
        from gridfia_ray.kernels.registry import registry
        from gridfia_ray.pipelines import metrics as M
        from gridfia_ray.pipelines.common import GridSpec

        spec = GridSpec.from_fixture_meta(t1_meta)
        return M.run_metrics(
            t1_tiles, registry.from_configs([{"name": "total_biomass"}]), spec, t1_catalog
        ).materialize()

    def test_write_zarr_distributed(self, result_ds, t1_meta, tmp_path):
        from gridfia_ray import fixtures
        from gridfia_ray.pipelines.reassemble import write_zarr

        root = str(tmp_path / "total_zarr")
        info = write_zarr(
            result_ds, "total_biomass", root, grid=t1_meta["grid"], tile=t1_meta["tile"],
            crs=t1_meta["crs"], transform=t1_meta["transform"],
        )
        assert info["n_chunks"] == t1_meta["grid"] ** 2
        arr, meta = Z.read_array(root)
        cube, _ = fixtures.build_cube(fixtures.SCALES["t1"])
        assert np.allclose(arr, cube[1:].sum(axis=0), atol=1e-3)
        assert meta["attributes"]["crs"] == t1_meta["crs"]
        # resume semantics: delete one chunk -> fill; re-write -> healed
        victim = os.path.join(root, "c", "0", "0")
        os.remove(victim)
        arr2, _ = Z.read_array(root)
        assert np.isnan(arr2[: t1_meta["tile"], : t1_meta["tile"]]).all()
        write_zarr(result_ds, "total_biomass", root, grid=t1_meta["grid"],
                   tile=t1_meta["tile"], crs=t1_meta["crs"],
                   transform=t1_meta["transform"])
        arr3, _ = Z.read_array(root)
        assert np.allclose(arr3, arr, atol=0, equal_nan=True)

    def test_write_netcdf(self, result_ds, t1_meta, tmp_path):
        from gridfia_ray import fixtures
        from gridfia_ray.pipelines.reassemble import write_netcdf

        path = str(tmp_path / "total.nc")
        info = write_netcdf(
            result_ds, "total_biomass", path, grid=t1_meta["grid"], tile=t1_meta["tile"],
            crs=t1_meta["crs"], transform=t1_meta["transform"],
        )
        assert info["n_tiles"] == t1_meta["grid"] ** 2
        data, vatts, gatts = C.read_cdf(path)
        cube, _ = fixtures.build_cube(fixtures.SCALES["t1"])
        assert np.allclose(data["total_biomass"], cube[1:].sum(axis=0), atol=1e-3)
        assert gatts["crs"] == t1_meta["crs"]
        tf = t1_meta["transform"]
        n = t1_meta["grid"] * t1_meta["tile"]
        assert data["x"][0] == pytest.approx(tf[0] + 0.5 * tf[1])
        assert data["y"].shape == (n,) and data["x"].shape == (n,)

    def test_unknown_metric_raises(self, result_ds, t1_meta, tmp_path):
        from gridfia_ray.pipelines.reassemble import write_netcdf, write_zarr

        with pytest.raises(ValueError, match="no result tiles"):
            write_zarr(result_ds, "nope", str(tmp_path / "z"), grid=t1_meta["grid"],
                       tile=t1_meta["tile"])
        with pytest.raises(ValueError, match="no result tiles"):
            write_netcdf(result_ds, "nope", str(tmp_path / "n.nc"),
                         grid=t1_meta["grid"], tile=t1_meta["tile"])
