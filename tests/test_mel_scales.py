"""Mel filterbank scale conventions: the librosa-compatible Slaney
scale (linear <1 kHz, log above — used by the published AudioSR /
tortoise-lineage front-ends) vs the HTK scale (torchaudio default).
Analytic pins so a regression in either formula fails loudly."""

import numpy as np
import pytest

pytestmark = pytest.mark.unit

from vocalie_tts_tpu.models.common.audio import (  # noqa: E402
    _hz_to_mel,
    _mel_filterbank_np,
    _mel_to_hz,
)


def test_slaney_scale_analytic_points():
    # linear region: mel = hz / (200/3)
    assert np.isclose(_hz_to_mel(1000.0, "slaney"), 15.0)
    assert np.isclose(_hz_to_mel(500.0, "slaney"), 7.5)
    # log region: 6.4× frequency every 27 mel
    assert np.isclose(_hz_to_mel(6400.0, "slaney"), 15.0 + 27.0)
    # inverses round-trip in both regions
    for hz in (123.0, 999.0, 1000.0, 4321.0, 22050.0):
        assert np.isclose(_mel_to_hz(_hz_to_mel(hz, "slaney"), "slaney"), hz)
        assert np.isclose(_mel_to_hz(_hz_to_mel(hz, "htk"), "htk"), hz)


def test_scales_differ_above_1khz():
    fb_htk = _mel_filterbank_np(48000, 2048, 64, 20.0, 24000.0, scale="htk")
    fb_sl = _mel_filterbank_np(48000, 2048, 64, 20.0, 24000.0, scale="slaney")
    assert fb_htk.shape == fb_sl.shape == (1025, 64)
    # each band normalized, non-negative, and the two conventions place
    # high bands at genuinely different centers
    assert (fb_sl >= 0).all()
    centers_htk = fb_htk.argmax(axis=0)
    centers_sl = fb_sl.argmax(axis=0)
    assert (centers_htk[-16:] != centers_sl[-16:]).any()
    # every band has support
    assert (fb_sl.sum(axis=0) > 0).all() and (fb_htk.sum(axis=0) > 0).all()


def test_audiosr_front_end_uses_slaney():
    from vocalie_tts_tpu.models.audiosr.model import AudioSRConfig

    cfg = AudioSRConfig()
    assert cfg.mel_scale == "slaney" and cfg.mel_fmin == 20.0
