"""Resumable corpus build: shard-union == global filter chain, resume
skips completed shards, atomic layout."""

import json
import os
import shutil

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from gridfia_ray.pipelines.corpus import run_corpus_filter_checkpointed

SF = "/root/testdata/sf0.001"


def _read_parts(out_dir):
    frames = []
    for d in sorted(os.listdir(out_dir)):
        if d.startswith("part="):
            frames.append(rd.read_parquet(os.path.join(out_dir, d)).to_pandas())
    return pd.concat(frames, ignore_index=True) if frames else pd.DataFrame()


class TestCorpusBuild:
    def test_shard_union_equals_global_chain(self, ray_session, tmp_path):
        from gridfia_ray.contract import _bench_snippets, q_doc_filter_chain

        snips = _bench_snippets(SF)
        out = str(tmp_path / "corpus")
        man = run_corpus_filter_checkpointed(
            os.path.join(SF, "documents.parquet"), snips, out, n_shards=4
        )
        got = _read_parts(out)
        want = q_doc_filter_chain(SF)
        assert sorted(got["doc_id"]) == want["doc_id"].tolist()
        # the corpus carries the documents, not just ids
        assert "text" in got.columns
        # manifest: every shard recorded with lineage + metrics
        assert man.completed() == {f"{i:04d}" for i in range(4)}
        with open(os.path.join(out, "manifest.json")) as f:
            m = json.load(f)
        for entry in m["partitions"].values():
            assert entry["rows_out"] >= 0 and "docs_in" in entry

    def test_resume_skips_and_repairs(self, ray_session, tmp_path):
        from gridfia_ray.contract import _bench_snippets

        snips = _bench_snippets(SF)
        out = str(tmp_path / "corpus")
        run_corpus_filter_checkpointed(
            os.path.join(SF, "documents.parquet"), snips, out, n_shards=3
        )
        before = _read_parts(out)
        # simulate a crash that lost shard 1: delete its dir + record
        with open(os.path.join(out, "manifest.json")) as f:
            m = json.load(f)
        del m["partitions"]["0001"]
        with open(os.path.join(out, "manifest.json"), "w") as f:
            json.dump(m, f)
        shutil.rmtree(os.path.join(out, "part=0001"))
        man = run_corpus_filter_checkpointed(
            os.path.join(SF, "documents.parquet"), snips, out, n_shards=3
        )
        after = _read_parts(out)
        assert sorted(after["doc_id"]) == sorted(before["doc_id"])
        assert man.completed() == {"0000", "0001", "0002"}
