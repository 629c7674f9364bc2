"""WAV codec round-trip tests."""

import numpy as np
import pytest

from vocalie_tts_tpu.io.wavio import read_wav, wav_duration_s, wav_info, write_wav

pytestmark = pytest.mark.unit


def _sine(n=2400, sr=24000, f=440.0):
    t = np.arange(n) / sr
    return (0.5 * np.sin(2 * np.pi * f * t)).astype(np.float32)


def test_pcm16_roundtrip(tmp_path):
    path = tmp_path / "a.wav"
    audio = _sine()
    write_wav(path, audio, 24000, subtype="PCM_16")
    back, sr = read_wav(path)
    assert sr == 24000
    assert back.shape == audio.shape
    assert np.max(np.abs(back - audio)) < 1.0 / 32000


def test_float_roundtrip_exact(tmp_path):
    path = tmp_path / "f.wav"
    audio = _sine()
    write_wav(path, audio, 48000, subtype="FLOAT")
    back, sr = read_wav(path)
    assert sr == 48000
    np.testing.assert_array_equal(back, audio)


def test_pcm24_roundtrip(tmp_path):
    path = tmp_path / "p24.wav"
    audio = _sine()
    write_wav(path, audio, 24000, subtype="PCM_24")
    back, _ = read_wav(path)
    assert np.max(np.abs(back - audio)) < 1.0 / 8e6


def test_stereo_roundtrip(tmp_path):
    path = tmp_path / "st.wav"
    audio = np.stack([_sine(), -_sine()], axis=1)
    write_wav(path, audio, 24000)
    back, _ = read_wav(path)
    assert back.shape == audio.shape
    assert np.max(np.abs(back - audio)) < 1e-3


def test_mono_always_2d(tmp_path):
    path = tmp_path / "m.wav"
    write_wav(path, _sine(100), 24000)
    back, _ = read_wav(path, always_2d=True)
    assert back.shape == (100, 1)


def test_wav_info_and_duration(tmp_path):
    path = tmp_path / "i.wav"
    write_wav(path, _sine(24000), 24000)
    info = wav_info(path)
    assert info.frames == 24000
    assert info.samplerate == 24000
    assert info.channels == 1
    assert wav_duration_s(path) == pytest.approx(1.0)


def test_reject_non_wav(tmp_path):
    path = tmp_path / "x.wav"
    path.write_bytes(b"definitely not a wav file")
    with pytest.raises(ValueError):
        read_wav(path)


def test_odd_payload_word_alignment(tmp_path):
    # 24-bit mono with odd byte count must still parse back
    path = tmp_path / "odd.wav"
    write_wav(path, _sine(101), 24000, subtype="PCM_24")
    back, _ = read_wav(path)
    assert back.shape == (101,)


def test_native_codec_parity():
    """Native C codec matches numpy within 1 LSB (build optional)."""
    from vocalie_tts_tpu import native

    x = (np.random.default_rng(1).standard_normal(100_000) * 0.5).astype(np.float32)
    ref = (np.clip(x.astype(np.float64), -1, 1) * 32767.0).round().astype(np.int16)
    got = native.encode_pcm16(x)
    assert int(np.abs(ref.astype(np.int32) - got.astype(np.int32)).max()) <= 1
    back = native.decode_pcm16(got)
    np.testing.assert_allclose(back, got.astype(np.float32) / 32768.0)
    assert abs(native.peak_abs(x) - float(np.max(np.abs(x)))) < 1e-6
    assert abs(native.rms(x) - float(np.sqrt(np.mean(x.astype(np.float64) ** 2)))) < 1e-6
    y = np.zeros(1000, np.float32)
    y[100:900] = 0.5
    assert native.active_range(y, 0.002) == (100, 900)
    assert native.active_range(np.zeros(10, np.float32), 0.002) == (0, 10)


def test_normalize_ref_audio(tmp_path):
    """Ref conditioning audio: mono downmix + 24 kHz + loudness target."""
    from vocalie_tts_tpu.io.refs import normalize_ref_audio

    sr = 48000
    t = np.arange(sr * 2) / sr
    quiet = 0.01 * np.sin(2 * np.pi * 220 * t).astype(np.float32)
    stereo = np.stack([quiet, quiet], axis=1)
    path = tmp_path / "ref.wav"
    write_wav(path, stereo, sr)

    audio, out_sr = normalize_ref_audio(path, target_sr=24000, target_dbfs=-20.0)
    assert out_sr == 24000
    assert audio.ndim == 1 and len(audio) == 24000 * 2
    rms_dbfs = 20 * np.log10(np.sqrt(np.mean(audio.astype(np.float64) ** 2)))
    assert abs(rms_dbfs - (-20.0)) < 1.0
    assert np.max(np.abs(audio)) <= 0.97 + 1e-6


def test_normalize_ref_audio_peak_ceiling(tmp_path):
    from vocalie_tts_tpu.io.refs import normalize_ref_audio

    sr = 24000
    # impulsive content: RMS-normalizing to -20 dBFS would clip the peak
    audio = np.zeros(sr, np.float32)
    audio[::1000] = 0.05
    path = tmp_path / "spikes.wav"
    write_wav(path, audio, sr)
    out, _ = normalize_ref_audio(path, target_dbfs=-6.0)
    assert np.max(np.abs(out)) <= 0.97 + 1e-6
