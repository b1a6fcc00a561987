"""Data layer: manifests (both schemas), audio IO, bucketing, loader."""

import gzip
import json

import numpy as np
import pytest
from scipy.io import wavfile

from dmel_codec_tpu.data import (
    BucketBatcher,
    Cut,
    DataLoader,
    load_audio,
    load_manifest,
    peak_normalize,
    resample_audio,
    save_manifest,
)
from dmel_codec_tpu.data.preprocess import (
    cut_into_windows,
    cuts_from_dir,
    duration_stats,
    filter_by_duration,
    prepare_manifests,
)


@pytest.fixture
def wav_dir(tmp_path, rng):
    for i, (sr, sec) in enumerate([(24000, 1.0), (16000, 2.0), (24000, 0.5)]):
        n = int(sr * sec)
        data = (rng.standard_normal(n) * 0.2 * 32767).astype(np.int16)
        wavfile.write(str(tmp_path / f"utt{i}.wav"), sr, data)
    return tmp_path


def test_manifest_roundtrip_and_lhotse_schema(tmp_path):
    cuts = [
        Cut("a", "/x/a.wav", 0.0, 1.5, 24000, "hello"),
        Cut("b", "/x/b.wav", 0.5, 2.0, 16000, None),
    ]
    p = str(tmp_path / "cuts.jsonl.gz")
    save_manifest(cuts, p)
    back = load_manifest(p)
    assert back == cuts

    # lhotse MonoCut lines parse too
    lhotse_line = {
        "id": "c1",
        "start": 0.25,
        "duration": 3.0,
        "recording": {
            "sources": [{"source": "/y/c.wav"}],
            "sampling_rate": 22050,
        },
        "supervisions": [{"text": "hi there"}],
    }
    p2 = str(tmp_path / "lhotse.jsonl.gz")
    with gzip.open(p2, "wt") as f:
        f.write(json.dumps(lhotse_line) + "\n")
    (cut,) = load_manifest(p2)
    assert cut.audio_path == "/y/c.wav"
    assert cut.sampling_rate == 22050
    assert cut.text == "hi there"
    assert cut.start == 0.25


def test_load_audio_resamples_and_normalizes(wav_dir):
    a = load_audio(str(wav_dir / "utt1.wav"), target_sr=24000)  # 16k -> 24k
    assert abs(len(a) - 48000) <= 2
    np.testing.assert_allclose(np.abs(a).max(), 0.95, atol=1e-3)

    sine = np.sin(np.linspace(0, 2 * np.pi * 10, 1600)).astype(np.float32)
    up = resample_audio(sine, 16000, 24000)
    assert len(up) == 2400
    assert peak_normalize(np.zeros(10)).max() == 0.0


def test_bucket_batcher_respects_budget():
    cuts = [Cut(str(i), "x", 0, d, 24000) for i, d in enumerate([1, 1, 2, 3, 3, 8])]
    batches = BucketBatcher(cuts, max_duration=6.0, shuffle=False).batches()
    assert sum(len(b) for b in batches) == len(cuts)
    for b in batches:
        padded_cost = max(c.duration for c in b) * len(b)
        # a single over-budget cut still gets its own batch
        assert padded_cost <= 6.0 or len(b) == 1


def test_loader_end_to_end(wav_dir):
    cuts = cuts_from_dir(str(wav_dir))
    assert len(cuts) == 3
    loader = DataLoader(cuts, max_duration=4.0, shuffle=False, length_quantum=1024)
    batches = list(loader)
    total = sum(len(b["audio_lengths"]) for b in batches)
    assert total == 3
    for b in batches:
        assert b["audios"].shape[1] % 1024 == 0
        assert b["audios"].dtype == np.float32
        for i, n in enumerate(b["audio_lengths"]):
            assert np.all(b["audios"][i, n:] == 0)

    # sharding partitions the cuts
    l0 = DataLoader(cuts, num_shards=2, shard_index=0, shuffle=False)
    l1 = DataLoader(cuts, num_shards=2, shard_index=1, shuffle=False)
    n0 = sum(len(b["audio_lengths"]) for b in l0)
    n1 = sum(len(b["audio_lengths"]) for b in l1)
    assert n0 + n1 == 3


def test_preprocess_windows_filters_stats(wav_dir, tmp_path):
    cuts = cuts_from_dir(str(wav_dir))
    windowed = cut_into_windows(cuts, 0.6)
    assert all(c.duration <= 0.6 + 1e-9 for c in windowed)
    total_orig = sum(c.duration for c in cuts)
    total_win = sum(c.duration for c in windowed)
    np.testing.assert_allclose(total_orig, total_win, rtol=1e-6)

    kept = filter_by_duration(windowed, min_duration=0.5)
    assert all(c.duration >= 0.5 for c in kept)

    out = str(tmp_path / "train.jsonl.gz")
    stats = prepare_manifests(cuts, out, window_seconds=0.6, min_duration=0.3)
    assert stats["num_cuts"] == len(load_manifest(out))
    assert stats["total_hours"] > 0


def test_loader_multiworker_matches_single(wav_dir):
    """num_workers>1 must deliver identical batches in identical order."""
    cuts = cuts_from_dir(str(wav_dir))
    kw = dict(max_duration=4.0, shuffle=False, length_quantum=1024)
    single = list(DataLoader(cuts, num_workers=1, **kw))
    multi = list(DataLoader(cuts, num_workers=4, **kw))
    assert len(single) == len(multi)
    for a, b in zip(single, multi):
        np.testing.assert_array_equal(a["audios"], b["audios"])
        np.testing.assert_array_equal(a["audio_lengths"], b["audio_lengths"])
        assert a["texts"] == b["texts"]
