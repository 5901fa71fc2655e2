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
