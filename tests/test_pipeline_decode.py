"""Decode invariants (BASELINE.json input_hint): decoded pixels bit-exact
for raw-f32, PSNR >= 40 dB for png; caption fields preserved; phash
verification flags corruption."""

import json
import os

import numpy as np
import pytest

from gridfia_ray import fixtures
from gridfia_ray.codecs.png16 import psnr
from gridfia_ray.pipelines.common import GridSpec, decoded_tiles, read_tiles


def _decoded_df(tiles_path, meta, **kw):
    spec = GridSpec.from_fixture_meta(meta)
    return decoded_tiles(read_tiles(tiles_path), spec, include_total=True, **kw).to_pandas()


@pytest.fixture(scope="module")
def cube_t1():
    cube, catalog = fixtures.build_cube(fixtures.SCALES["t1"])
    return cube, [c for c, _ in catalog]


class TestRawDecode:
    def test_bit_exact_and_caption(self, ray_session, t1_dir, t1_meta, cube_t1):
        cube, codes = cube_t1
        df = _decoded_df(os.path.join(t1_dir, "tiles"), t1_meta, verify_phash=True)
        assert (df["status"] == "ok").all()
        t = t1_meta["tile"]
        for _, r in df.iterrows():
            si = codes.index(r.species_code)
            ref = cube[si, r.tile_row * t : (r.tile_row + 1) * t, r.tile_col * t : (r.tile_col + 1) * t]
            got = np.frombuffer(r.pix, dtype="<f4").reshape(t, t)
            assert np.array_equal(got, ref)  # bit-exact
        # caption-derived fields: transform anchors per tile
        base = t1_meta["transform"]
        assert np.allclose(df.x0, base[0] + df.tile_col * t * base[1])
        assert np.allclose(df.y0, base[3] + df.tile_row * t * base[5])

    def test_cell_ids_unique_per_tile(self, ray_session, t1_dir, t1_meta):
        df = _decoded_df(os.path.join(t1_dir, "tiles"), t1_meta)
        per_tile = df.groupby(["tile_row", "tile_col"])["cell_id"].nunique()
        assert (per_tile == 1).all()
        assert df["cell_id"].nunique() == t1_meta["grid"] ** 2


class TestPngDecode:
    def test_psnr_gate(self, ray_session, t1png_dir, cube_t1):
        cube, codes = cube_t1
        meta = fixtures.fixture_meta("t1png")
        df = _decoded_df(os.path.join(t1png_dir, "tiles"), meta)
        assert (df["status"] == "ok").all()
        t = meta["tile"]
        worst = np.inf
        for _, r in df.iterrows():
            si = codes.index(r.species_code)
            ref = cube[si, r.tile_row * t : (r.tile_row + 1) * t, r.tile_col * t : (r.tile_col + 1) * t]
            got = np.frombuffer(r.pix, dtype="<f4").reshape(t, t)
            worst = min(worst, psnr(ref, got))
        assert worst >= 40.0, f"worst tile PSNR {worst:.1f} dB"


class TestCorruption:
    def test_bad_payload_flagged_not_fatal(self, ray_session, t1_dir, t1_meta):
        import pyarrow as pa
        import pyarrow.parquet as pq

        t = pq.read_table(os.path.join(t1_dir, "tiles")).to_pylist()
        t[3]["bytes"] = t[3]["bytes"][:100]  # truncated payload
        tbl = pa.Table.from_pylist(t, schema=fixtures._TILE_SCHEMA)
        df = _decoded_df(tbl, t1_meta)
        bad = df[df["status"] != "ok"]
        assert len(bad) == 1
        assert bad.iloc[0]["status"].startswith("decode_error:")

    def test_phash_mismatch_flagged(self, ray_session, t1_dir, t1_meta):
        import pyarrow as pa
        import pyarrow.parquet as pq

        t = pq.read_table(os.path.join(t1_dir, "tiles")).to_pylist()
        t[5]["phash"] = t[5]["phash"] ^ 0xFF  # corrupt the recorded hash
        tbl = pa.Table.from_pylist(t, schema=fixtures._TILE_SCHEMA)
        df = _decoded_df(tbl, t1_meta, verify_phash=True)
        assert (df["status"] == "phash_mismatch").sum() == 1


class TestCaptionEquality:
    def test_caption_roundtrip(self, t1_dir):
        """Caption JSON in the table equals the generator's metadata
        (per-row caption equality, input_hint)."""
        import pyarrow.parquet as pq

        t = pq.read_table(os.path.join(t1_dir, "tiles"))
        for cap, iid in zip(t["caption"].to_pylist()[:20], t["image_id"].to_pylist()[:20]):
            meta = json.loads(cap)
            code, tr, tc = iid.split("/")
            assert meta["species_code"] == code
            assert meta["tile_row"] == int(tr) and meta["tile_col"] == int(tc)
            assert meta["crs"] == fixtures.CRS
