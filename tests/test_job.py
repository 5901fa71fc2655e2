"""ray-job-submit entrypoint: config load, checkpointed run, resume."""

import json
import os

import pytest

from gridfia_ray import job


@pytest.fixture
def spec_file(t1_dir, tmp_path):
    cfg = {
        "tiles_path": os.path.join(t1_dir, "tiles"),
        "calculations": [
            {"name": "species_richness"},
            {"name": "total_biomass"},
        ],
        "n_shards": 2,
    }
    p = tmp_path / "job.json"
    p.write_text(json.dumps(cfg))
    return str(p)


def _run(capsys, argv):
    rc = job.main(argv)
    out = capsys.readouterr().out.strip().splitlines()[-1]
    return rc, json.loads(out)


class TestJobEntrypoint:
    def test_streaming_mode(self, ray_session, spec_file, capsys):
        rc, summary = _run(capsys, ["--config", spec_file])
        assert rc == 0
        assert summary["mode"] == "streaming"
        assert summary["result_tiles"] > 0
        assert summary["kernels"] == ["species_richness", "total_biomass"]

    def test_checkpointed_and_resume(self, ray_session, spec_file, tmp_path, capsys):
        out_dir = str(tmp_path / "out")
        rc, summary = _run(capsys, ["--config", spec_file, "--out", out_dir])
        assert rc == 0
        assert summary["mode"] == "checkpointed"
        assert summary["shards_done"] == 2
        # manifest records lineage + metrics per shard
        from gridfia_ray.state.manifest import RunManifest

        m = RunManifest(out_dir)
        assert m.completed() == {"0000", "0001"}
        # resubmit: completed shards skip (resume) → fast, still ok
        rc2, summary2 = _run(capsys, ["--config", spec_file, "--out", out_dir])
        assert rc2 == 0 and summary2["shards_done"] == 2

    def test_missing_config_errors(self, ray_session, tmp_path, capsys):
        bad = tmp_path / "bad.json"
        bad.write_text(json.dumps({"tiles_path": "/nope", "calculations": []}))
        with pytest.raises(Exception):
            job.main(["--config", str(bad)])
