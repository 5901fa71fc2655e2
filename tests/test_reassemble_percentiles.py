"""Raster reassembly sink + global percentile aggregates."""

import numpy as np
import pytest

from gridfia_ray import fixtures
from gridfia_ray.kernels.registry import registry
from gridfia_ray.pipelines import metrics as M
from gridfia_ray.pipelines.common import GridSpec, decoded_tiles, read_tiles
from gridfia_ray.pipelines.percentiles import (
    normalize_percentile_clip,
    percentiles_histogram,
    value_range,
)
from gridfia_ray.pipelines.reassemble import read_raster, sample_tiles, write_raster


@pytest.fixture(scope="module")
def spec(t1_meta):
    return GridSpec.from_fixture_meta(t1_meta)


class TestReassembly:
    def test_roundtrip_matches_cube(self, ray_session, t1_tiles, spec, t1_catalog, t1_meta, tmp_path_factory):
        out = str(tmp_path_factory.mktemp("raster") / "richness")
        res = M.run_metrics(
            t1_tiles, [registry.create("species_richness")], spec, t1_catalog,
            n_tiles_hint=96, n_species_hint=5,
        )
        meta = write_raster(
            res, "species_richness", out, grid=t1_meta["grid"], tile=t1_meta["tile"],
            crs=t1_meta["crs"], transform=t1_meta["transform"],
        )
        assert meta["n_tiles"] == 16
        arr, m2 = read_raster(out)
        cube, catalog = fixtures.build_cube(fixtures.SCALES["t1"])
        expect = np.count_nonzero(cube[1:] > 0, axis=0)
        assert arr.shape == expect.shape
        assert np.array_equal(np.asarray(arr), expect.astype(arr.dtype))
        assert m2["crs"] == t1_meta["crs"]

    def test_missing_metric_rejected(self, ray_session, t1_tiles, spec, t1_catalog, tmp_path_factory):
        out = str(tmp_path_factory.mktemp("raster") / "nope")
        res = M.run_metrics(
            t1_tiles, [registry.create("species_richness")], spec, t1_catalog,
            n_tiles_hint=96, n_species_hint=5,
        )
        with pytest.raises(ValueError):
            write_raster(res, "shannon_diversity", out, grid=4, tile=64)

    def test_sample_tiles(self, ray_session, t1_tiles):
        ds = read_tiles(t1_tiles)
        frac = sample_tiles(ds, 0.5, seed=7).count()
        assert 0 < frac < 96


class TestPercentiles:
    def test_uniform_hist_equals_np_histogram(self):
        """_uniform_hist must be BIT-equal to np.histogram with explicit
        linspace edges — the refinement bookkeeping and the pinned
        sketch oracle both depend on it. Trials plant values exactly on
        edges and at the range ends."""
        from gridfia_ray.pipelines.percentiles import _uniform_hist

        rng = np.random.RandomState(3)
        for _ in range(200):
            bins = int(rng.randint(2, 4097))
            lo, hi = np.sort(rng.normal(size=2) * 100)
            if hi <= lo:
                continue
            edges = np.linspace(lo, hi, bins + 1)
            a = rng.normal(loc=(lo + hi) / 2, scale=(hi - lo), size=1500)
            a = np.concatenate([a, rng.choice(edges, 50), [lo, hi]])
            want = np.histogram(a, bins=edges)[0]
            got = _uniform_hist(a, edges)
            assert (want == got).all()
        # near-ulp-wide range (late refinement pass): multiply model is
        # off by whole bins → must take the audited numpy fallback
        lo = 0.002752170898020255
        hi = np.nextafter(np.nextafter(lo, 1.0), 1.0)
        edges = np.linspace(lo, hi, 4097)
        a = np.array([lo, np.nextafter(lo, 1.0), hi])
        assert (_uniform_hist(a, edges) == np.histogram(a, bins=edges)[0]).all()
        # degenerate lo == hi
        edges0 = np.linspace(lo, lo, 11)
        a0 = np.full(5, lo)
        assert (_uniform_hist(a0, edges0) == np.histogram(a0, bins=edges0)[0]).all()

    def test_matches_numpy(self, ray_session, t1_tiles, spec):
        decoded = decoded_tiles(read_tiles(t1_tiles), spec, include_total=False)
        got = percentiles_histogram(decoded, [2, 50, 98], bins=8192)
        cube, _ = fixtures.build_cube(fixtures.SCALES["t1"])
        vals = cube[1:][cube[1:] != 0.0]
        expect = np.percentile(vals, [2, 50, 98])
        lo, hi = value_range(decoded)
        tol = (hi - lo) / 8192 * 2
        for q, e in zip([2, 50, 98], expect):
            assert abs(got[q] - e) < tol, (q, got[q], e)

    def test_exact_matches_order_statistic(self, ray_session, t1_tiles, spec):
        """percentiles_exact = the k-th smallest value, k = ceil(q/100·n)
        (quantile_disc semantics) — bit-exact, including extremes."""
        from gridfia_ray.pipelines.percentiles import percentiles_exact

        decoded = decoded_tiles(read_tiles(t1_tiles), spec, include_total=False)
        qs = [0.001, 2.0, 50.0, 98.0, 100.0]
        got = percentiles_exact(decoded, qs)
        cube, _ = fixtures.build_cube(fixtures.SCALES["t1"])
        vals = np.sort(cube[1:][cube[1:] != 0.0].astype(np.float64), kind="stable")
        for q in qs:
            k = max(1, int(np.ceil(q / 100.0 * len(vals))))
            assert got[q] == vals[k - 1], (q, got[q], vals[k - 1])

    def test_exact_tiny_bin_forces_refinement(self, ray_session, t1_tiles, spec):
        """With 2 bins per pass the refinement loop must iterate many
        times and still land exactly (exercises the multi-pass path and
        the inclusive-top bookkeeping)."""
        from gridfia_ray.pipelines.percentiles import percentiles_exact

        decoded = decoded_tiles(read_tiles(t1_tiles), spec, include_total=False)
        got = percentiles_exact(decoded, [50.0], bins=2, collect_limit=64, max_iters=40)
        cube, _ = fixtures.build_cube(fixtures.SCALES["t1"])
        vals = np.sort(cube[1:][cube[1:] != 0.0].astype(np.float64), kind="stable")
        k = int(np.ceil(0.5 * len(vals)))
        assert got[50.0] == vals[k - 1]

    def test_exact_duplicate_heavy_bin(self, ray_session):
        """A value repeated far beyond collect_limit: the bin never
        shrinks, so the force-collect path must resolve it via
        (value, count) partials rather than shipping every duplicate."""
        import pandas as pd
        import ray.data as rd

        from gridfia_ray.pipelines.percentiles import percentiles_exact

        vals = np.concatenate(
            [np.full(10_000, 5.0, np.float32), np.asarray([1.0, 2.0, 9.0], np.float32)]
        )
        rows = [vals[i : i + 500].tobytes() for i in range(0, len(vals), 500)]
        ds = rd.from_pandas(pd.DataFrame({"pix": rows})).repartition(4)
        got = percentiles_exact(ds, [50.0, 0.01, 100.0], collect_limit=4, max_iters=6)
        srt = np.sort(vals.astype(np.float64), kind="stable")
        n = len(srt)
        for q in (50.0, 0.01, 100.0):
            k = max(1, int(np.ceil(q / 100 * n)))
            assert got[q] == srt[k - 1], (q, got[q])

    def test_normalize_clip(self):
        a = np.array([0.0, 5.0, 10.0, np.nan])
        out = normalize_percentile_clip(a, 2.0, 8.0)
        assert out[0] == 0.0 and out[2] == 1.0
        assert out[1] == pytest.approx(0.5)
        assert np.isnan(out[3])
