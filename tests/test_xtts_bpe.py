"""XTTS BPE tokenizer.json frontend (text/bpe.py): discovery beside
the weights, published encode conventions ([lang] prefix, [SPACE]
substitution, lowercase), and runtime wiring. Ref: SURVEY §2.4 XTTS
re-support mandate (PARITY.md "BPE tokenizer" delta)."""

import numpy as np
import pytest

pytestmark = pytest.mark.unit


def _write_tiny_tokenizer(path):
    from tokenizers import Tokenizer, models

    vocab = {"[UNK]": 0, "[fr]": 1, "[SPACE]": 2, "[STOP]": 3}
    for i, ch in enumerate("abcdefghijklmnopqrstuvwxyzéèàç.,'"):
        vocab[ch] = 4 + i
    tok = Tokenizer(models.BPE(vocab=vocab, merges=[], unk_token="[UNK]"))
    tok.add_special_tokens(["[fr]", "[SPACE]", "[STOP]"])
    tok.save(str(path))


def test_bpe_encode_conventions(tmp_path):
    from vocalie_tts_tpu.text.bpe import BpeTextTokenizer

    _write_tiny_tokenizer(tmp_path / "tokenizer.json")
    bpe = BpeTextTokenizer(tmp_path / "tokenizer.json")
    ids = bpe.encode("Bonjour le monde", lang="fr")
    assert ids[0] == 1                      # [fr] is one token
    assert 2 in ids                          # spaces → [SPACE]
    assert 0 not in ids                      # lowercased — no [UNK]
    assert max(ids) < bpe.vocab_size


def test_runtime_uses_tokenizer_json(tmp_path, monkeypatch):
    monkeypatch.setenv("VOCALIE_MODEL_SCALE", "tiny")
    monkeypatch.setenv("VOCALIE_ALLOW_RANDOM_WEIGHTS", "1")
    monkeypatch.delenv("VOCALIE_WEIGHT_INT8", raising=False)
    monkeypatch.delenv("VOCALIE_KV_INT8", raising=False)

    from vocalie_tts_tpu.models.xtts.runtime import XTTSRuntime

    assets = tmp_path / "xtts"
    assets.mkdir()
    _write_tiny_tokenizer(assets / "tokenizer.json")
    rt = XTTSRuntime.create(assets)
    assert rt._bpe is not None

    audio, sr, meta = rt.synthesize("Bonjour le monde.")
    assert np.isfinite(audio).all() and meta["vq_tokens"] > 0

    # byte fallback without the file
    rt2 = XTTSRuntime.create(tmp_path / "xtts2")
    assert rt2._bpe is None
