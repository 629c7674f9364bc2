"""Host DSP behavioral tests (edge trims, fades, gap stitching)."""

import numpy as np
import pytest

from vocalie_tts_tpu.dsp.host import (
    apply_inter_chunk_gap,
    fade_in,
    fade_out,
    find_active_range,
    peak_normalize,
    resample,
    snap_zero_crossing,
    trim_audio_to_expected_duration,
)

pytestmark = pytest.mark.unit


def test_resample_passthrough_and_ratio():
    x = np.random.default_rng(0).standard_normal(24000).astype(np.float32)
    assert resample(x, 24000, 24000) is x
    y = resample(x, 24000, 48000)
    assert abs(len(y) - 48000) <= 2
    z = resample(x, 24000, 22050)
    assert abs(len(z) - 22050) <= 2


def test_resample_preserves_tone_frequency():
    sr1, sr2 = 24000, 48000
    t = np.arange(sr1) / sr1
    x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    y = resample(x, sr1, sr2)
    spec = np.abs(np.fft.rfft(y[:sr2]))
    assert abs(int(np.argmax(spec)) - 440) <= 1


def test_snap_zero_crossing_finds_crossing():
    x = np.ones(1000, dtype=np.float32)
    x[500] = -1.0  # crossing at 500 and 501
    idx = snap_zero_crossing(x, 490, radius_samples=20)
    assert idx == 500


def test_snap_zero_crossing_no_crossing_keeps_idx():
    x = np.ones(100, dtype=np.float32)
    assert snap_zero_crossing(x, 50, radius_samples=10) == 50


def test_fades_are_linear_and_inplace():
    x = np.ones(100, dtype=np.float32)
    fade_in(x, 10)
    assert x[0] == 0.0 and x[9] == 1.0 and x[50] == 1.0
    fade_out(x, 10)
    assert x[-1] == 0.0 and x[-10] == 1.0


def test_inter_chunk_gap_inserts_silence():
    sr = 1000
    chunks = [np.ones(100, np.float32), np.ones(100, np.float32)]
    out = apply_inter_chunk_gap(chunks, sr=sr, gap_ms=50, fade_ms=0)
    assert len(out) == 100 + 50 + 100
    assert np.all(out[100:150] == 0.0)


def test_inter_chunk_gap_zero_is_plain_concat():
    chunks = [np.ones(10, np.float32), np.ones(10, np.float32)]
    out = apply_inter_chunk_gap(chunks, sr=1000, gap_ms=0)
    assert len(out) == 20
    assert np.all(out == 1.0)


def test_inter_chunk_gap_crossfades_edges():
    sr = 1000
    chunks = [np.ones(100, np.float32), np.ones(100, np.float32)]
    out = apply_inter_chunk_gap(chunks, sr=sr, gap_ms=10, fade_ms=10)
    # chunk 1 fades out into the gap, chunk 2 fades in from it
    assert out[99] == 0.0
    assert out[110] == 0.0
    assert out[0] == 1.0 and out[-1] == 1.0


def test_find_active_range_trims_edges():
    x = np.zeros(1000, dtype=np.float32)
    x[300:700] = 0.5
    start, end = find_active_range(x, threshold=0.002, min_silence_frames=10)
    assert start == 300 and end == 700


def test_find_active_range_keeps_short_edges():
    x = np.zeros(1000, dtype=np.float32)
    x[5:995] = 0.5  # edge silence shorter than min_silence_frames
    start, end = find_active_range(x, threshold=0.002, min_silence_frames=10)
    assert start == 0 and end == 1000


def test_find_active_range_all_silence():
    x = np.zeros(100, dtype=np.float32)
    assert find_active_range(x, threshold=0.002, min_silence_frames=10) == (0, 100)


def test_peak_normalize_hits_target():
    x = 0.25 * np.ones(100, dtype=np.float32)
    y, gain, peak_before = peak_normalize(x, -1.0)
    assert peak_before == pytest.approx(0.25)
    assert np.max(np.abs(y)) == pytest.approx(10 ** (-1 / 20), rel=1e-6)
    assert gain == pytest.approx(10 ** (-1 / 20) / 0.25, rel=1e-6)


def test_trim_to_expected_duration():
    sr = 1000
    x = np.ones(5000, dtype=np.float32) * 0.5
    x[2300:2310] = 0.0  # quiet region for the cut
    y = trim_audio_to_expected_duration(x, estimated_duration_s=2.0, sr=sr)
    assert len(y) < 5000
    assert len(y) >= 2000
