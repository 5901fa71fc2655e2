"""Content-defined chunking: vectorized gear chunker vs the byte-walk
replay, the shift-invariance dedup property, size discipline, edge
cases, distributed partition invariance."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from gridfia_ray import oracle_pins
from gridfia_ray.text.cdc import cdc_boundaries, cdc_chunk_batch


def _chunks(text, mn=32, av=64, mx=256):
    df = pd.DataFrame({"doc_id": np.int64([0]), "text": [text]})
    return cdc_chunk_batch(df, mn, av, mx)


class TestBoundaries:
    def test_matches_byte_walk_replay(self):
        docs = oracle_pins._cdcpin_table().to_pandas()
        want = oracle_pins._replay_cdc(
            docs["doc_id"].to_numpy(), docs["text"].tolist()
        ).to_pandas()
        got = cdc_chunk_batch(docs, *oracle_pins.CDC_PIN_SIZES)
        pd.testing.assert_frame_equal(
            got.sort_values(["doc_id", "chunk_id"]).reset_index(drop=True),
            want.sort_values(["doc_id", "chunk_id"]).reset_index(drop=True),
        )

    def test_size_discipline_and_coverage(self):
        rng = np.random.RandomState(3)
        data = bytes(rng.randint(0, 256, 20_000, dtype=np.uint8).tolist())
        ends = cdc_boundaries(data, 32, 64, 256)
        lens = np.diff(np.concatenate([[0], ends]))
        assert ends[-1] == len(data)
        assert (lens[:-1] >= 32).all() and (lens <= 256).all()
        # avg mask 64 -> mean chunk length in the right decade
        assert 40 < lens.mean() < 200

    def test_shift_invariance(self):
        # prefix insertion: chunk hashes past the first re-synced
        # boundary are identical — THE property fixed-size chunking lacks
        rng = np.random.RandomState(4)
        body = " ".join(f"w{i%80:02d}" for i in rng.randint(0, 80, 600))
        a = _chunks(body)
        b = _chunks("INSERTED-PREFIX-XYZ " + body)
        shared = set(a["chunk_hash"]) & set(b["chunk_hash"])
        assert len(shared) >= len(a) - 3  # only the head chunks differ

    def test_empty_and_short(self):
        assert len(_chunks("")) == 0
        one = _chunks("xy")
        assert len(one) == 1 and int(one["length"].iloc[0]) == 2

    def test_validation(self):
        with pytest.raises(ValueError, match="power of two"):
            cdc_boundaries(b"abc", 2, 48, 100)
        with pytest.raises(ValueError, match="min_size <= avg_size"):
            cdc_boundaries(b"abc", 128, 64, 256)

    def test_concatenation_reconstructs(self):
        text = "the quick brown fox " * 100
        c = _chunks(text)
        data = text.encode("utf-8")
        assert b"".join(
            data[s : s + l] for s, l in zip(c["start"], c["length"])
        ) == data


class TestDistributed:
    def test_partition_invariant(self, ray_session):
        docs = oracle_pins._cdcpin_table().to_pandas()
        mn, av, mx = oracle_pins.CDC_PIN_SIZES

        def run(parts):
            return (
                rd.from_pandas(docs)
                .repartition(parts)
                .map_batches(
                    lambda b: cdc_chunk_batch(b, mn, av, mx), batch_format="pandas"
                )
                .to_pandas()
                .sort_values(["doc_id", "chunk_id"])
                .reset_index(drop=True)
            )

        pd.testing.assert_frame_equal(run(1), run(7))


class TestCdcDedupDocs:
    def _run(self, texts, parts=3, **kw):
        from gridfia_ray.text.cdc import cdc_dedup_docs

        df = pd.DataFrame(
            {"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}
        )
        kw.setdefault("n_buckets", 4)
        out = (
            cdc_dedup_docs(rd.from_pandas(df).repartition(parts), **kw)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        return out

    def test_first_doc_untouched_exact_copy_dropped(self, ray_session):
        rng = np.random.RandomState(7)
        base = " ".join(f"w{i:03d}" for i in rng.randint(0, 500, 400))
        out = self._run([base, base, "totally different text " * 20])
        got = out.set_index("doc_id")
        assert got.loc[0, "text"] == base          # first occurrence intact
        assert got.loc[0, "n_dropped"] == 0
        assert 1 not in got.index or got.loc[1, "text"] == ""  # copy gone
        assert got.loc[2, "n_dropped"] == 0

    def test_shared_passage_removed_once(self, ray_session):
        rng = np.random.RandomState(8)
        passage = " ".join(f"p{i:02d}" for i in rng.randint(0, 60, 200))
        a = "alpha head " + passage + " alpha tail"
        b = "beta head completely other " + passage + " beta tail"
        out = self._run([a, b]).set_index("doc_id")
        assert out.loc[0, "text"] == a
        assert out.loc[1, "n_dropped"] > 0
        assert passage not in out.loc[1, "text"]  # shared body cut from doc 1
        assert "beta head" in out.loc[1, "text"]

    def test_kept_counts_equal_distinct_hashes(self, ray_session):
        from gridfia_ray.text.cdc import cdc_chunk_batch

        rng = np.random.RandomState(9)
        texts = []
        base = " ".join(f"q{i:02d}" for i in rng.randint(0, 40, 300))
        for i in range(6):
            texts.append(f"pre{i} " + base)
        out = self._run(texts)
        df = pd.DataFrame(
            {"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}
        )
        distinct = cdc_chunk_batch(df)["chunk_hash"].nunique()
        assert int(out["n_kept"].sum()) == distinct

    def test_partition_invariant(self, ray_session):
        rng = np.random.RandomState(10)
        base = " ".join(f"z{i:02d}" for i in rng.randint(0, 30, 250))
        texts = [f"h{i} " + base + f" t{i}" for i in range(8)]
        a = self._run(texts, parts=1)
        b = self._run(texts, parts=7)
        pd.testing.assert_frame_equal(a, b)
