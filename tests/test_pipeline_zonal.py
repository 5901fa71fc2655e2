"""Zonal spatial join + statistics vs the independent membership oracle."""

import os

import numpy as np
import pytest

from gridfia_ray.kernels import zonal as zr
from gridfia_ray.pipelines import zonal as Z
from gridfia_ray.pipelines.common import GridSpec


@pytest.fixture(scope="module")
def spec(t1_meta):
    return GridSpec.from_fixture_meta(t1_meta)


@pytest.fixture(scope="module")
def zones(t1_dir):
    return Z.load_zones(os.path.join(t1_dir, "zones.parquet"))


class TestZonalStats:
    @pytest.fixture(scope="class")
    def got(self, ray_session, t1_tiles, zones, spec):
        return Z.zonal_stats(t1_tiles, zones, spec).to_pandas().set_index("zone_id")

    @pytest.fixture(scope="class")
    def zone_counts(self, duck):
        return duck.execute(
            """
            WITH p AS (SELECT * FROM pixels WHERE species_code <> '0000')
            SELECT z.zone_id, p.species_code,
                   COUNT(*) FILTER (p.biomass > 0) cnt,
                   SUM(p.biomass) sb, COUNT(*) npx
            FROM p JOIN pixel_zones z USING (y, x)
            GROUP BY z.zone_id, p.species_code
            """
        ).df()

    def test_all_zones_present(self, got, zone_counts):
        assert set(got.index) == set(zone_counts.zone_id.unique())

    def test_counts_and_sums(self, got, zone_counts):
        for zid, g in zone_counts.groupby("zone_id"):
            row = got.loc[zid]
            assert row["n_pixels"] == g["npx"].max()
            assert row["total_biomass"] == pytest.approx(g["sb"].sum(), abs=1e-6)

    def test_diversity_estimators(self, got, zone_counts):
        """Zone metrics equal the A6 reducers applied to the oracle's
        per-species count vector — including Chao1 and ACE."""
        for zid, g in zone_counts.groupby("zone_id"):
            counts = g["cnt"].to_numpy(dtype=float)
            row = got.loc[zid]
            assert row["richness"] == zr.richness(counts)
            assert row["shannon"] == pytest.approx(zr.shannon(counts), abs=1e-12)
            assert row["simpson"] == pytest.approx(zr.simpson(counts), abs=1e-12)
            assert row["evenness"] == pytest.approx(zr.evenness(counts), abs=1e-12)
            assert row["chao1"] == pytest.approx(zr.chao1(counts))
            assert row["ace"] == pytest.approx(zr.ace(counts))


class TestCoverageValidation:
    def test_missing_tile_raises(self, ray_session, t1_tiles, zones, spec):
        """A species store missing one tile over a zone must fail loudly
        (different per-species denominators), not silently use max()."""
        import pyarrow.parquet as pq
        import ray.data as rd

        pairs = Z.tile_zone_join(t1_tiles, zones, spec).to_pandas()
        victim = next(
            img for img in pairs["image_id"] if not img.startswith("0000/")
        )
        full = pq.read_table(t1_tiles)
        keep = [i for i, v in enumerate(full["image_id"].to_pylist()) if v != victim]
        assert len(keep) == full.num_rows - 1
        broken = rd.from_arrow(full.take(keep))
        with pytest.raises(ValueError, match="disagree on pixel coverage"):
            Z.zonal_stats(broken, zones, spec)


class TestTileZoneJoin:
    def test_join_rows_exact(self, ray_session, t1_tiles, zones, spec, duck, t1_meta):
        """Join output rows and tile assignments match the independent
        membership oracle exactly (the north-rule artifact)."""
        got = Z.tile_zone_join(t1_tiles, zones, spec).to_pandas()
        got_set = set(zip(got.zone_id, got.image_id))
        t = t1_meta["tile"]
        o = duck.execute(
            f"""
            WITH tz AS (SELECT DISTINCT zone_id, y // {t} tr, x // {t} tc FROM pixel_zones),
            sp AS (SELECT DISTINCT species_code FROM pixels)
            SELECT tz.zone_id, printf('%s/%04d/%04d', sp.species_code, tz.tr, tz.tc) image_id
            FROM tz CROSS JOIN sp
            """
        ).df()
        expect = set(zip(o.zone_id, o.image_id))
        assert got_set == expect
        assert len(got) == len(got_set)  # no duplicate pairs


class TestRasterize:
    def test_burn_matches_membership_oracle(
        self, ray_session, zones, spec, duck, t1_meta
    ):
        """Vector→raster burn: every pixel whose center is in ≥1 zone
        carries the SMALLEST containing zone_id; everything else is
        absent. Checked pixel-exact against the fixture's independent
        membership table."""
        from gridfia_ray.pipelines.metrics import metrics_to_pixels

        g = int(t1_meta["grid"])
        burned, cat = Z.rasterize_zones(zones, spec, g, g)
        pix = metrics_to_pixels(burned).to_pandas()
        assert (pix["metric"] == "zone_burn").all()
        pix = pix[pix["value"] >= 0]
        got = {
            (int(y), int(x)): cat[int(v)]
            for y, x, v in zip(pix["y"], pix["x"], pix["value"])
        }
        o = duck.execute(
            "SELECT y, x, MIN(zone_id) zid FROM pixel_zones GROUP BY y, x"
        ).df()
        expect = {(int(r.y), int(r.x)): r.zid for r in o.itertuples()}
        assert got == expect

    def test_emitted_tile_set_is_exactly_touched_tiles(
        self, ray_session, zones, spec, duck, t1_meta
    ):
        """The burn is sparse: a tile materializes iff ≥1 of its pixel
        centers is inside a zone, and every emitted tile has ≥1 burned
        pixel (all-(-1) tiles are dropped before they hit the stream)."""
        g, t = int(t1_meta["grid"]), int(t1_meta["tile"])
        burned, _ = Z.rasterize_zones(zones, spec, g, g)
        df = burned.to_pandas()
        got_tiles = set(zip(df["tile_row"].astype(int), df["tile_col"].astype(int)))
        o = duck.execute(
            f"SELECT DISTINCT y // {t} tr, x // {t} tc FROM pixel_zones"
        ).df()
        assert got_tiles == set(zip(o["tr"].astype(int), o["tc"].astype(int)))
        for _, r in df.iterrows():
            arr = np.frombuffer(r["pix"], dtype=np.int32)
            assert (arr >= 0).any()


class TestZonalMajority:
    def test_fold_tie_breaks_and_variety(self):
        import pandas as pd

        from gridfia_ray.pipelines.zonal import _majority_fold

        zs = pd.DataFrame(
            {
                "zone_id": ["a"] * 3 + ["b"] * 2,
                "species_code": ["0110", "0131", "0202", "0110", "0131"],
                # zone a: tie 7/7 at top -> smaller code wins majority;
                # 0202 present 0 px -> excluded from candidates & variety
                "present_px": [7, 7, 0, 3, 9],
            }
        )
        out = _majority_fold(zs).set_index("zone_id")
        assert out.loc["a", "majority_species"] == "0110"
        assert out.loc["a", "majority_px"] == 7
        assert out.loc["a", "minority_species"] == "0110"  # tie low too
        assert out.loc["a", "variety"] == 2
        assert out.loc["b", "majority_species"] == "0131"
        assert out.loc["b", "minority_species"] == "0110"
        assert out.loc["b", "minority_px"] == 3


class TestZonalResultStats:
    def test_matches_pixel_oracle(self, ray_session, t1_dir, duck):
        import os

        import numpy as np

        from gridfia_ray import fixtures
        from gridfia_ray.kernels.registry import registry
        from gridfia_ray.pipelines import metrics as M
        from gridfia_ray.pipelines import zonal as Z
        from gridfia_ray.pipelines.common import GridSpec

        meta = fixtures.fixture_meta("t1")
        spec = GridSpec.from_fixture_meta(meta)
        catalog = ["0000"] + sorted(
            s["species_code"] for s in meta["species"] if s["species_code"] != "0000"
        )
        res = M.run_metrics(
            os.path.join(t1_dir, "tiles"),
            registry.from_configs([{"name": "total_biomass", "parameters": {}}]),
            spec,
            catalog,
            n_tiles_hint=meta["n_tiles"],
            n_species_hint=meta["n_species"],
            precise=True,
        )
        g = int(meta["grid"])
        got = Z.zonal_result_stats(
            res, Z.load_zones(os.path.join(t1_dir, "zones.parquet")), spec, g, g
        )
        want = duck.execute(
            """WITH p AS (SELECT * FROM pixels WHERE species_code <> '0000'),
               tot AS (SELECT y, x, SUM(biomass) total FROM p GROUP BY y, x),
               u AS (SELECT y, x,
                     CAST(FLOOR(total*1000000 + 0.5) AS BIGINT) v FROM tot),
               z AS (SELECT y, x, MIN(zone_id) zone_id FROM pixel_zones
                     GROUP BY y, x)
               SELECT z.zone_id, COUNT(*) n_px, MIN(u.v) min_u,
                      MAX(u.v) max_u, CAST(SUM(u.v) AS BIGINT) sum_u
               FROM u JOIN z USING (y, x)
               GROUP BY z.zone_id ORDER BY z.zone_id"""
        ).df()
        assert len(got) == len(want) > 0
        for c in ("n_px", "min_u", "max_u", "sum_u"):
            assert (got[c].to_numpy() == want[c].to_numpy(np.int64)).all(), c


class TestTabulateArea:
    def test_matches_pixel_oracle(self, ray_session, t1_dir, duck):
        """Zone × NTILE(5)-class cross-tab vs the independent pixel-
        geometry + SQL-window replay on the t1 fixture."""
        import os

        import numpy as np
        import pandas as pd
        import ray.data as rd

        from gridfia_ray import fixtures
        from gridfia_ray.kernels.registry import registry
        from gridfia_ray.pipelines import metrics as M
        from gridfia_ray.pipelines import zonal as Z
        from gridfia_ray.pipelines.common import GridSpec
        from gridfia_ray.pipelines.rank import ntile_exact

        meta = fixtures.fixture_meta("t1")
        spec = GridSpec.from_fixture_meta(meta)
        catalog = ["0000"] + sorted(
            s["species_code"] for s in meta["species"] if s["species_code"] != "0000"
        )
        res = M.run_metrics(
            os.path.join(t1_dir, "tiles"),
            registry.from_configs([{"name": "total_biomass", "parameters": {}}]),
            spec,
            catalog,
            n_tiles_hint=meta["n_tiles"],
            n_species_hint=meta["n_species"],
            precise=True,
        )
        g = int(meta["grid"])
        n_px = g * int(meta["tile"])
        pix = M.metrics_to_pixels(res)

        def prep(b):
            return pd.DataFrame(
                {
                    "pid": (b["y"] * n_px + b["x"]).astype(np.int64),
                    "v_u": np.floor(
                        b["value"].to_numpy(np.float64) * 1_000_000 + 0.5
                    ).astype(np.int64),
                }
            )

        classed = ntile_exact(
            pix.map_batches(prep, batch_format="pandas"), "v_u", "pid", 3
        )

        def sel(b):
            return pd.DataFrame(
                {"pid": b["pid"].astype(np.int64), "class": b["tile"].astype(np.int64)}
            )

        got = Z.tabulate_area(
            classed.map_batches(sel, batch_format="pandas"),
            Z.load_zones(os.path.join(t1_dir, "zones.parquet")),
            spec,
            g,
            g,
            n_buckets=4,
        )
        want = duck.execute(
            f"""WITH p AS (SELECT * FROM pixels WHERE species_code <> '0000'),
               tot AS (SELECT y, x, SUM(biomass) total FROM p GROUP BY y, x),
               u AS (SELECT y, x,
                     CAST(FLOOR(total*1000000 + 0.5) AS BIGINT) v FROM tot),
               cl AS (SELECT y, x,
                      CAST(NTILE(3) OVER (ORDER BY v, y*{n_px}+x) AS BIGINT) AS class
                      FROM u),
               z AS (SELECT y, x, MIN(zone_id) zone_id FROM pixel_zones
                     GROUP BY y, x)
               SELECT z.zone_id, cl.class, CAST(COUNT(*) AS BIGINT) AS n_px
               FROM cl JOIN z USING (y, x)
               GROUP BY 1, 2 ORDER BY 1, 2"""
        ).df()
        want["zone_id"] = want["zone_id"].astype(str)
        for c in ("class", "n_px"):
            want[c] = want[c].astype(np.int64)
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want.reset_index(drop=True)
        )
        # counts partition each zone's burned pixels
        assert (got.groupby("zone_id")["n_px"].sum() > 0).all()

    def test_class_validation(self, ray_session, zones, spec, t1_meta):
        import numpy as np
        import pandas as pd
        import pytest as _pt
        import ray.data as rd

        from gridfia_ray.pipelines import zonal as Z

        g = int(t1_meta["grid"])
        bad = rd.from_pandas(pd.DataFrame({"pid": [0, 1], "class": [1, -2]}))
        with _pt.raises(Exception, match="class values must be >= 0"):
            Z.tabulate_area(bad, zones, spec, g, g)


class TestZonalGeometry:
    def test_matches_pixel_oracle(self, ray_session, zones, spec, t1_meta, duck):
        import numpy as np
        import pandas as pd

        from gridfia_ray.pipelines import zonal as Z

        g = int(t1_meta["grid"])
        got = Z.zonal_geometry(zones, spec, g, g, n_buckets=4)
        want = duck.execute(
            """WITH z AS (SELECT y, x, MIN(zone_id) zone_id FROM pixel_zones
                     GROUP BY y, x),
               e AS (SELECT a.y, a.x, a.zone_id,
                     (SELECT COUNT(*) FROM z b
                      WHERE b.zone_id = a.zone_id AND (
                        (b.y = a.y + 1 AND b.x = a.x) OR
                        (b.y = a.y - 1 AND b.x = a.x) OR
                        (b.y = a.y AND b.x = a.x + 1) OR
                        (b.y = a.y AND b.x = a.x - 1))) AS same
                     FROM z a)
               SELECT zone_id, CAST(COUNT(*) AS BIGINT) AS n_px,
                      CAST(SUM(y) AS BIGINT) AS sum_y,
                      CAST(SUM(x) AS BIGINT) AS sum_x,
                      CAST(SUM(4 - same) AS BIGINT) AS perim
               FROM e GROUP BY zone_id ORDER BY zone_id"""
        ).df()
        want["zone_id"] = want["zone_id"].astype(str)
        for c in ("n_px", "sum_y", "sum_x", "perim"):
            want[c] = want[c].astype(np.int64)
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want.reset_index(drop=True)
        )
        # a zone's perimeter is at least that of a square of equal area
        for r in got.itertuples():
            assert r.perim >= int(np.ceil(4 * np.sqrt(r.n_px)))


class TestZoneNeighbors:
    def test_matches_pixel_oracle(self, ray_session, zones, spec, t1_meta, duck):
        import numpy as np
        import pandas as pd

        from gridfia_ray.pipelines import zonal as Z

        g = int(t1_meta["grid"])
        got = Z.zone_neighbors(zones, spec, g, g, n_buckets=4)
        want = duck.execute(
            """WITH z AS (SELECT y, x, MIN(zone_id) zone_id FROM pixel_zones
                     GROUP BY y, x)
               SELECT LEAST(a.zone_id, b.zone_id) AS zone_a,
                      GREATEST(a.zone_id, b.zone_id) AS zone_b,
                      CAST(COUNT(*) AS BIGINT) AS shared_edges
               FROM z a JOIN z b
                 ON (b.y = a.y + 1 AND b.x = a.x)
                 OR (b.y = a.y AND b.x = a.x + 1)
               WHERE a.zone_id <> b.zone_id
               GROUP BY 1, 2 ORDER BY 1, 2"""
        ).df()
        for c in ("zone_a", "zone_b"):
            want[c] = want[c].astype(str)
        want["shared_edges"] = want["shared_edges"].astype(np.int64)
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want.reset_index(drop=True)
        )
        # pairs are canonical (a < b) and unique
        assert (got["zone_a"] < got["zone_b"]).all()
        assert not got.duplicated(["zone_a", "zone_b"]).any()
