"""Published Piper espeak phoneme_id_map frontend (text/piper_ids.py):
id translation pinning, piper's interleaved-pad sequence convention,
config discovery, and the end-to-end converted-voice path (a synthetic
256-phone checkpoint + realistic id map converts and serves).
Ref: SURVEY §2.4 Piper re-support; BASELINE config #1."""

import dataclasses
import json

import numpy as np
import pytest

pytestmark = pytest.mark.unit


def realistic_fr_id_map():
    """Piper-shaped map: sentinels + punctuation + the espeak French
    character set, ids as lists, combining tilde as its own key."""
    chars = [
        "_", "^", "$", " ", "!", ",", ".", "?",
        "a", "b", "d", "e", "f", "i", "j", "k", "l", "m", "n", "o",
        "p", "s", "t", "u", "v", "w", "y", "z",
        "ɑ", "ɛ", "ɔ", "ø", "œ", "ə", "ɡ", "ʃ", "ʒ", "ɲ", "ʁ", "ɥ",
        "̃",  # combining tilde (espeak nasal vowels)
    ]
    return {ch: [i] for i, ch in enumerate(chars)}


def test_phone_inventory_fully_covered():
    """Every phone the French G2P can emit translates into the
    realistic map — no silent skips on normal text."""
    from vocalie_tts_tpu.text.phonemes import PHONES
    from vocalie_tts_tpu.text.piper_ids import PHONE_TO_IPA, PiperIdMap

    m = PiperIdMap(realistic_fr_id_map())
    for p in PHONES:
        assert p in PHONE_TO_IPA, f"phone {p!r} has no IPA mapping"
        if p in ("^", "$"):
            continue
        assert m._ids_for_ipa(PHONE_TO_IPA[p]) is not None, (
            f"phone {p!r} → ipa {PHONE_TO_IPA[p]!r} not resolvable"
        )


def test_encode_pins_piper_sequence_convention():
    from vocalie_tts_tpu.text.piper_ids import PiperIdMap

    raw = realistic_fr_id_map()
    m = PiperIdMap(raw)
    ids = m.encode_phones(["^", "b", "o~", "$"])
    bos, pad, eos = raw["^"][0], raw["_"][0], raw["$"][0]
    # piper convention: BOS pad (phone pad)* EOS; the nasal "o~"
    # becomes [ɔ, combining-tilde]
    assert ids == [bos, pad,
                   raw["b"][0], pad,
                   raw["ɔ"][0], raw["̃"][0], pad,
                   eos]


def test_encode_text_end_to_end_ids_in_range():
    from vocalie_tts_tpu.text.piper_ids import PiperIdMap

    m = PiperIdMap(realistic_fr_id_map())
    ids = m.encode_text("Bonjour le monde, enchanté !")
    assert ids and all(0 <= i <= m.max_id for i in ids)
    assert ids[0] == m.bos[0] and ids[-1] == m.eos[0]


def test_unknown_phone_skipped_with_warning(caplog):
    from vocalie_tts_tpu.text.piper_ids import PiperIdMap

    raw = realistic_fr_id_map()
    del raw["ʁ"]  # make R untranslatable
    m = PiperIdMap(raw)
    import logging

    with caplog.at_level(logging.WARNING, logger="vocalie_api"):
        ids = m.encode_phones(["^", "R", "a", "$"])
    assert raw["a"][0] in ids
    assert any("phoneme_id_map" in r.message for r in caplog.records)
    # warning is one-time per phone
    n = len(caplog.records)
    m.encode_phones(["R"])
    assert len(caplog.records) == n


def test_config_discovery(tmp_path):
    from vocalie_tts_tpu.text.piper_ids import load_piper_id_map

    assert load_piper_id_map(tmp_path) is None
    (tmp_path / "piper_config.json").write_text(
        json.dumps({"phoneme_id_map": realistic_fr_id_map(),
                    "audio": {"sample_rate": 22050}}),
        encoding="utf-8",
    )
    m = load_piper_id_map(tmp_path)
    assert m is not None and m.bos and m.eos


@pytest.mark.device
def test_published_voice_roundtrip(tmp_path, monkeypatch):
    """A 256-phone checkpoint (published-size id space ≠ the in-repo
    inventory) + its config.json convert and serve: n_phones comes from
    the checkpoint, the runtime encodes text through the published id
    map, and synthesis runs."""
    import torch

    from tests.test_convert_vits import _build_torch_vits
    from vocalie_tts_tpu.models.convert.import_checkpoint import (
        import_vits_checkpoint,
    )
    from vocalie_tts_tpu.models.vits.runtime import SCALES, VITSRuntime

    monkeypatch.setenv("VOCALIE_MODEL_SCALE", "tiny")
    cfg = dataclasses.replace(SCALES["tiny"], n_phones=256)
    synth = _build_torch_vits(cfg, seed=11)
    ckpt = tmp_path / "fr_FR-test-medium.pt"
    torch.save(synth.state_dict(), ckpt)
    (tmp_path / "config.json").write_text(
        json.dumps({"phoneme_id_map": realistic_fr_id_map(),
                    "num_symbols": 256}),
        encoding="utf-8",
    )

    report = import_vits_checkpoint(checkpoint=ckpt, assets_dir=tmp_path)
    assert report["n_phones"] == "256"
    assert "voice_config" in report

    rt = VITSRuntime.create(tmp_path)
    assert rt.cfg.n_phones == 256
    assert rt._id_map is not None
    np.testing.assert_allclose(
        np.asarray(rt.params["emb"], np.float32),
        synth.state_dict()["enc_p.emb.weight"].numpy(), atol=1e-6,
    )
    audio, sr, meta = rt.synthesize("Bonjour depuis une voix publiée.")
    assert np.isfinite(audio).all() and len(audio) > 0
