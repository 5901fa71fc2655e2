"""BPE tokenizer training/application: hand-computed merges, pinned
sequential-replay equality, partition invariance, NUL rejection."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from gridfia_ray.text.bpe import (
    apply_merges,
    pretokenize,
    tokenize_count,
    train_bpe,
)


class TestTrainSmall:
    def test_hand_computed_merges(self, ray_session):
        # classic Sennrich toy: {'low':5, 'lower':2}. Pair counts round 1:
        # (l,o)=7 (o,w)=7 -> tie breaks to (l,o); round 2: (lo,w)=7; round
        # 3: {'low</w>':5 pairs (low,</w>)=5, 'lower':2 (low,e)=2 ...}
        docs = pd.DataFrame({"text": ["low " * 5 + "lower " * 2]})
        merges = train_bpe(rd.from_pandas(docs), 3)
        assert merges == [("l", "o"), ("lo", "w"), ("low", "</w>")]

    def test_apply_matches_training_segmentation(self, ray_session):
        docs = pd.DataFrame({"text": ["ab ab ab abc abc d"]})
        merges = train_bpe(rd.from_pandas(docs), 4)
        # 'ab' dominates: first merge (a,b)
        assert merges[0] == ("a", "b")
        toks = apply_merges("ab</w>", merges)
        assert "".join(toks) == "ab</w>"

    def test_nul_rejected(self, ray_session):
        docs = pd.DataFrame({"text": ["bad\x00text"]})
        with pytest.raises(Exception, match="NUL"):
            train_bpe(rd.from_pandas(docs), 1)


class TestPinnedReplay:
    def test_train_matches_sequential_replay(self, ray_session):
        from gridfia_ray import oracle_pins

        pin = oracle_pins.ensure_bpepin()
        docs = rd.read_parquet(pin["documents"]).repartition(5)
        merges = train_bpe(docs, oracle_pins.BPE_PIN_MERGES)
        exp = pq.read_table(pin["merges_expected"]).to_pandas()
        got = pd.DataFrame(
            {"left": [m[0] for m in merges], "right": [m[1] for m in merges]}
        )
        assert len(got) == len(exp)
        assert (got["left"].to_numpy() == exp["left"].to_numpy()).all()
        assert (got["right"].to_numpy() == exp["right"].to_numpy()).all()

    def test_tokenize_counts_match_replay(self, ray_session):
        from gridfia_ray import oracle_pins

        pin = oracle_pins.ensure_bpepin()
        exp = pq.read_table(pin["merges_expected"]).to_pandas()
        merges = list(zip(exp["left"], exp["right"]))
        docs = rd.read_parquet(pin["documents"]).repartition(3)
        got = (tokenize_count(docs, merges, concurrency=2).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        want = (pq.read_table(pin["counts_expected"]).to_pandas()
                .sort_values("doc_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(got, want)

    def test_train_partition_invariant(self, ray_session):
        from gridfia_ray import oracle_pins

        pin = oracle_pins.ensure_bpepin()
        a = train_bpe(rd.read_parquet(pin["documents"]).repartition(2), 12)
        b = train_bpe(rd.read_parquet(pin["documents"]).repartition(9), 12)
        assert a == b


class TestTokenizeProperties:
    def test_no_merges_counts_chars(self, ray_session):
        docs = pd.DataFrame({"doc_id": [0, 1], "text": ["ab c", "xyz"]})
        got = (tokenize_count(rd.from_pandas(docs), [], concurrency=1)
               .to_pandas().sort_values("doc_id"))
        # 'ab</w>' -> a,b,</w> = 3; 'c</w>' -> 2; total 5. 'xyz</w>' -> 4
        assert got["n_tokens"].tolist() == [5, 4]

    def test_pretokenize_marks_word_ends(self):
        assert pretokenize("a bc") == ["a</w>", "bc</w>"]
