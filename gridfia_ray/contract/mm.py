"""Multimodal: audio features/spectrogram/resample, MJPEG frame
sampling.

Split out of the former monolithic ``gridfia_ray/contract.py`` (round-5
VERDICT #3); see ``gridfia_ray/contract/__init__.py`` for the package
map. Query/oracle semantics are unchanged.
"""

from __future__ import annotations

import os
from typing import Callable

import numpy as np
import pandas as pd

from gridfia_ray import fixtures
from gridfia_ray.io import read_parquet_clean
from gridfia_ray.kernels.base import KernelContext
from gridfia_ray.kernels.registry import registry
from gridfia_ray.pipelines.common import GridSpec
from gridfia_ray.contract._shared import *  # noqa: F401,F403


def q_audio_resample(sf_dir: str) -> pd.DataFrame:
    """Mixed-rate corpus normalization (stages/multimodal.
    AudioResampleActor): 8 kHz clips pass through bit-identically,
    16 kHz clips decimate 2:1 through the Q15 windowed-sinc integer
    FIR (round-half-up shifts — no float path anywhere); the feature
    row of each RESAMPLED clip hash-matches the pinned sequential twin
    (oracle_pins.ensure_audpin resample_expected)."""
    import ray.data as rd

    from gridfia_ray import oracle_pins
    from gridfia_ray.context import tune_context
    from gridfia_ray.stages.multimodal import AudioResampleActor

    tune_context()
    clips = rd.read_parquet(oracle_pins.ensure_audpin()["clips"])
    out = (
        clips.map_batches(
            AudioResampleActor, batch_format="pyarrow",
            fn_constructor_kwargs=dict(target_rate=8000),
            concurrency=(1, 4),
        )
        .drop_columns(["bytes"])
        .to_pandas()
    )
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    cols = ["clip_id", "n_samples", "rate", "duration_ms", "rms_u",
            "peak_u", "zero_crossings"]
    return out[cols].sort_values("clip_id", ignore_index=True)

def q_audio_features(sf_dir: str) -> pd.DataFrame:
    """Audio-column pipeline end-to-end: WAV/PCM clips (pure-numpy RIFF
    codec — wav graduated from the stub list) through the distributed
    ``AudioFeatureActor`` pool; per-clip exact/scaled features
    hash-compared against the pinned sequential replay."""
    import ray.data as rd

    from gridfia_ray import oracle_pins
    from gridfia_ray.context import tune_context
    from gridfia_ray.stages.multimodal import AudioFeatureActor

    tune_context()
    clips = rd.read_parquet(oracle_pins.ensure_audpin()["clips"])
    out = (
        clips.map_batches(AudioFeatureActor, batch_format="pyarrow", concurrency=(1, 4))
        .to_pandas()
    )
    assert (out["status"] == "ok").all()
    out = out.drop(columns=["status"])
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("clip_id", ignore_index=True)

def q_audio_spectrogram(sf_dir: str) -> pd.DataFrame:
    """Integer STFT spectrogram (stages/multimodal.SpectrogramActor):
    Hann 64-sample frames at hop 32, 8 quantized DFT bins, per-bin
    int64 energy — the distributed actor pool must reproduce the
    sequential pin replay bit-for-bit (all-shift-and-multiply math)."""
    import ray.data as rd

    from gridfia_ray import oracle_pins
    from gridfia_ray.context import tune_context
    from gridfia_ray.stages.multimodal import SpectrogramActor

    tune_context()
    clips = rd.read_parquet(oracle_pins.ensure_audpin()["clips"])
    out = (
        clips.map_batches(SpectrogramActor, batch_format="pyarrow", concurrency=(1, 4))
        .to_pandas()
    )
    assert (out["status"] == "ok").all()
    out = out.drop(columns=["status"])
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("clip_id", ignore_index=True)

def q_video_frames(sf_dir: str) -> pd.DataFrame:
    """Video-column pipeline end-to-end: MJPEG-in-ISO-BMFF clips (pure-
    python box parser + T.81 decoder, ``codecs/mp4`` — video graduated
    from the stub list) through the distributed ``FrameSampleActor``
    pool (uniform-stride sampling over each track's own duration);
    per-frame exact/scaled stats hash-compared against the pinned
    sequential container-parse + decode replay."""
    import pyarrow as pa
    import ray.data as rd

    from gridfia_ray import oracle_pins
    from gridfia_ray.codecs.phash import content_hash64
    from gridfia_ray.context import tune_context
    from gridfia_ray.stages.multimodal import FrameSampleActor

    tune_context()
    clips = rd.read_parquet(oracle_pins.ensure_vidpin()["clips"])

    def frame_stats(batch: pa.Table) -> pa.Table:
        sums, mins, maxs, hashes = [], [], [], []
        for i in range(batch.num_rows):
            pix = batch["pix"][i].as_py()
            arr = np.frombuffer(pix, dtype="<f4")
            if arr.size == 0:  # decode_error sentinel row: emit zeros
                # and let the status assertion below report it clearly
                sums.append(0), mins.append(0), maxs.append(0), hashes.append(0)
                continue
            sums.append(int(np.rint(float(arr.sum()) * 16.0)))
            mins.append(int(np.rint(float(arr.min()) * 16.0)))
            maxs.append(int(np.rint(float(arr.max()) * 16.0)))
            hashes.append(int(content_hash64(pix) & 0x7FFFFFFFFFFFFFFF))
        return pa.table(
            {
                "clip_id": batch["image_id"].cast(pa.int64()),
                "frame_idx": batch["frame_idx"].cast(pa.int64()),
                "frame_ts_ms": batch["frame_ts_ms"].cast(pa.int64()),
                "h": batch["h"].cast(pa.int64()),
                "w": batch["w"].cast(pa.int64()),
                "status": batch["status"],
                "px_sum_u": pa.array(sums, pa.int64()),
                "px_min_u": pa.array(mins, pa.int64()),
                "px_max_u": pa.array(maxs, pa.int64()),
                "pix_hash": pa.array(hashes, pa.int64()),
            }
        )

    out = (
        clips.map_batches(
            FrameSampleActor, fn_constructor_kwargs={"n_frames": 4},
            batch_format="pyarrow", concurrency=(1, 4),
        )
        .map_batches(frame_stats, batch_format="pyarrow")
        .to_pandas()
    )
    assert (out["status"] == "ok").all()
    return (
        out.drop(columns=["status"])
        .sort_values(["clip_id", "frame_idx"], ignore_index=True)
    )
