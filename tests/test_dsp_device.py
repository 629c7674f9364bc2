"""Device DSP parity with the numpy host implementations."""

import numpy as np
import pytest

import jax.numpy as jnp

from vocalie_tts_tpu.dsp import host
from vocalie_tts_tpu.dsp.device import (
    fade_edges_device,
    peak_normalize_device,
    resample_device,
    snap_zero_crossing_device,
    stitch_with_gaps_device,
)

pytestmark = pytest.mark.device


def test_resample_device_tone_frequency():
    sr1, sr2 = 24000, 48000
    t = np.arange(sr1) / sr1
    x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    y = np.asarray(resample_device(jnp.asarray(x), sr1, sr2))
    spec = np.abs(np.fft.rfft(y[: sr2]))
    assert abs(int(np.argmax(spec)) - 440) <= 1


def test_resample_device_matches_host_dbfs():
    rng = np.random.default_rng(0)
    x = rng.standard_normal(24000).astype(np.float32) * 0.3
    y_host = host.resample(x, 24000, 22050)
    y_dev = np.asarray(resample_device(jnp.asarray(x), 24000, 22050))
    n = min(len(y_host), len(y_dev))
    # spectral energy within 0.1 dB (different FIR designs allowed)
    db_host = 20 * np.log10(np.sqrt(np.mean(y_host[200:n - 200] ** 2)))
    db_dev = 20 * np.log10(np.sqrt(np.mean(y_dev[200:n - 200] ** 2)))
    assert abs(db_host - db_dev) < 0.1


def test_peak_normalize_device_matches_host():
    x = (0.25 * np.sin(np.linspace(0, 30, 4000))).astype(np.float32)
    y_host, _gain, _peak = host.peak_normalize(x.copy(), -1.0)
    y_dev, gain = peak_normalize_device(jnp.asarray(x), -1.0)
    y_dev = np.asarray(y_dev)
    assert np.max(np.abs(y_dev)) == pytest.approx(10 ** (-1 / 20), abs=1e-4)
    db_host = 20 * np.log10(np.max(np.abs(y_host)))
    db_dev = 20 * np.log10(np.max(np.abs(y_dev)))
    assert abs(db_host - db_dev) < 0.1


def test_fade_edges_device():
    x = np.ones(1000, np.float32)
    y = np.asarray(fade_edges_device(jnp.asarray(x), 100))
    assert y[0] == 0.0 and y[-1] == 0.0
    assert y[500] == pytest.approx(1.0)


def test_snap_zero_crossing_device_matches_host():
    rng = np.random.default_rng(3)
    x = rng.standard_normal(2000).astype(np.float32)
    for idx in (100, 777, 1500):
        got = int(snap_zero_crossing_device(jnp.asarray(x), jnp.asarray(idx), 48))
        want = host.snap_zero_crossing(x, idx, radius_samples=48)
        assert got == want, (idx, got, want)


def test_stitch_with_gaps_device_matches_host():
    sr = 1000
    a = np.ones(300, np.float32) * 0.5
    b = np.ones(200, np.float32) * 0.25
    gap_ms, fade_ms = 100, 10
    want = host.apply_inter_chunk_gap(
        [a.copy(), b.copy()], sr=sr, gap_ms=gap_ms, fade_ms=fade_ms
    )
    chunks = np.zeros((2, 300), np.float32)
    chunks[0, :300] = a
    chunks[1, :200] = b
    out, total = stitch_with_gaps_device(
        jnp.asarray(chunks),
        jnp.asarray([300, 200]),
        gap_frames=int(sr * gap_ms / 1000),
        fade_frames=int(sr * fade_ms / 1000),
    )
    got = np.asarray(out)[: int(total)]
    assert len(got) == len(want)
    np.testing.assert_allclose(got, want, atol=1e-5)
