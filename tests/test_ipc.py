"""Arrow IPC sink/source: exact roundtrip, feather interop, manifest
accounting, compression modes, typed columns incl. binary + lists."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.feather as feather
import pytest
import ray.data as rd

from gridfia_ray.io import read_ipc, write_ipc


def _frame(n=200, seed=0):
    rng = np.random.RandomState(seed)
    return pd.DataFrame(
        {
            "id": np.arange(n, dtype=np.int64),
            "name": [f"row-{i:04d}" for i in range(n)],
            "x": rng.randn(n),
            "payload": [rng.bytes(16) for _ in range(n)],
            "vec": [rng.randn(4).astype(np.float32) for _ in range(n)],
        }
    )


def _sorted(df):
    return df.sort_values("id").reset_index(drop=True)


class TestIpcRoundtrip:
    def test_exact_roundtrip_multiblock(self, ray_session, tmp_path):
        df = _frame()
        manifest = write_ipc(rd.from_pandas(df).repartition(5), str(tmp_path))
        assert int(manifest["num_rows"].sum()) == len(df)
        assert all(p.endswith(".arrow") for p in manifest["path"])
        assert not any(f.endswith(".tmp") for f in os.listdir(tmp_path))
        back = _sorted(read_ipc(str(tmp_path)).to_pandas())
        want = _sorted(df)
        assert back["id"].tolist() == want["id"].tolist()
        assert back["name"].tolist() == want["name"].tolist()
        np.testing.assert_array_equal(back["x"].to_numpy(), want["x"].to_numpy())
        assert [bytes(b) for b in back["payload"]] == want["payload"].tolist()
        np.testing.assert_array_equal(
            np.stack(back["vec"].to_numpy()), np.stack(want["vec"].to_numpy())
        )

    def test_feather_interop(self, ray_session, tmp_path):
        # plain pyarrow.feather must read our files: IPC file == Feather v2
        df = _frame(50, seed=1)
        manifest = write_ipc(rd.from_pandas(df).repartition(2), str(tmp_path))
        parts = [feather.read_table(p).to_pandas() for p in manifest["path"]]
        got = _sorted(pd.concat(parts, ignore_index=True))
        assert got["id"].tolist() == _sorted(df)["id"].tolist()

    def test_uncompressed_mode(self, ray_session, tmp_path):
        df = _frame(30, seed=2)
        write_ipc(rd.from_pandas(df), str(tmp_path), compression=None)
        back = _sorted(read_ipc(str(tmp_path)).to_pandas())
        assert back["id"].tolist() == _sorted(df)["id"].tolist()

    def test_read_single_file_and_missing(self, ray_session, tmp_path):
        df = _frame(20, seed=3)
        manifest = write_ipc(rd.from_pandas(df), str(tmp_path))
        one = read_ipc(manifest["path"].iloc[0]).to_pandas()
        assert len(one) == int(manifest["num_rows"].iloc[0])
        empty = tmp_path / "empty_dir_that_has_none"
        empty.mkdir()
        with pytest.raises(FileNotFoundError, match="no .arrow files"):
            read_ipc(str(empty))
