"""Published text frontends (text/frontend.py): encode conventions per
family style, discovery/validation beside the weights, and byte
fallback. Ref: the reference hands raw text to models that tokenize
internally (tts_backends/chatterbox_impl.py:154-201,
cosyvoice_runner.py:87-125, qwen3_runner.py:113-144)."""

import json

import pytest

pytestmark = pytest.mark.unit


def make_voicebpe_tokenizer(path, with_lang=True):
    """A tiny Chatterbox-style voice BPE: char vocab + [SPACE]/[STOP]
    specials (+ [fr]/[en] language tokens)."""
    from tokenizers import Tokenizer, models

    vocab = {"[UNK]": 0, "[SPACE]": 1, "[STOP]": 2, "[START]": 3}
    if with_lang:
        vocab["[fr]"] = 4
        vocab["[en]"] = 5
    for i, ch in enumerate("abcdefghijklmnopqrstuvwxyz"
                           "ABCDEFGHIJKLMNOPQRSTUVWXYZéèàçê.,'!?-"):
        vocab[ch] = 6 + i
    tok = Tokenizer(models.BPE(vocab=vocab, merges=[], unk_token="[UNK]"))
    tok.add_special_tokens([t for t in vocab if t.startswith("[")])
    tok.save(str(path))
    return vocab


def make_qwen_style_tokenizer(path, with_eop=True):
    """A tiny Qwen-style byte-level BPE (raw text in, ids out) with the
    <|endofprompt|> special CosyVoice uses as instruct separator."""
    from tokenizers import Tokenizer, models, pre_tokenizers, decoders

    # byte-level alphabet as the base vocab
    alphabet = pre_tokenizers.ByteLevel.alphabet()
    vocab = {ch: i for i, ch in enumerate(sorted(alphabet))}
    n = len(vocab)
    tok = Tokenizer(models.BPE(vocab=vocab, merges=[]))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    if with_eop:
        tok.add_special_tokens(["<|endofprompt|>"])
    tok.save(str(path))
    return n + (1 if with_eop else 0)


# ── byte fallback ────────────────────────────────────────────────────────


def test_byte_frontend_ids_match_phonemes_module():
    from vocalie_tts_tpu.text.frontend import ByteFrontend
    from vocalie_tts_tpu.text.phonemes import BYTE_BOS, BYTE_SEP, text_to_byte_ids

    f = ByteFrontend()
    assert f.encode("Bonjour") == text_to_byte_ids("Bonjour", add_bos=False,
                                                   add_eos=False)
    assert f.bos_ids == [BYTE_BOS] and f.sep_ids == [BYTE_SEP]
    assert not f.published


def test_build_prompt_ids_byte_layout():
    from vocalie_tts_tpu.text.frontend import ByteFrontend, build_prompt_ids
    from vocalie_tts_tpu.text.phonemes import BYTE_BOS, BYTE_SEP

    f = ByteFrontend()
    ids = build_prompt_ids(f, "salut", preamble="calme")
    assert ids[0] == BYTE_BOS
    assert ids.count(BYTE_SEP) == 1
    assert ids == [BYTE_BOS] + f.encode("calme") + [BYTE_SEP] + f.encode("salut")
    assert build_prompt_ids(f, "salut") == [BYTE_BOS] + f.encode("salut")


# ── voicebpe style (chatterbox) ─────────────────────────────────────────


def test_voicebpe_encode_goldens(tmp_path):
    from vocalie_tts_tpu.text.frontend import PublishedFrontend

    vocab = make_voicebpe_tokenizer(tmp_path / "tokenizer.json")
    f = PublishedFrontend(tmp_path / "tokenizer.json", "voicebpe")
    ids = f.encode("Bonjour le monde", lang="fr")
    # golden: [fr] prefix token, [SPACE] substitution, case preserved
    assert ids[0] == vocab["[fr]"]
    assert ids.count(vocab["[SPACE]"]) == 2
    assert vocab["B"] in ids                # NOT lowercased (≠ XTTS)
    assert vocab["[UNK]"] not in ids
    # unknown language → no prefix rather than [UNK]
    ids_xx = f.encode("Bonjour", lang="xx")
    assert ids_xx[0] != vocab["[UNK]"]
    assert len(ids_xx) == len(f.encode("Bonjour"))


def test_voicebpe_without_optional_specials(tmp_path):
    from vocalie_tts_tpu.text.frontend import PublishedFrontend

    make_voicebpe_tokenizer(tmp_path / "tokenizer.json", with_lang=False)
    f = PublishedFrontend(tmp_path / "tokenizer.json", "voicebpe")
    ids = f.encode("abc", lang="fr")        # no [fr] token → plain encode
    assert len(ids) == 3


# ── raw style (cosyvoice / qwen3) ───────────────────────────────────────


def test_raw_encode_goldens(tmp_path):
    from tokenizers import Tokenizer

    from vocalie_tts_tpu.text.frontend import PublishedFrontend

    make_qwen_style_tokenizer(tmp_path / "tokenizer.json")
    f = PublishedFrontend(tmp_path / "tokenizer.json", "raw")
    ref = Tokenizer.from_file(str(tmp_path / "tokenizer.json"))
    text = "Bonjour, le monde é!"
    assert f.encode(text) == list(ref.encode(text).ids)  # untransformed
    # separator is the <|endofprompt|> special (the CosyVoice instruct
    # convention), published prompts carry no byte-space BOS
    assert f.sep_ids == [ref.token_to_id("<|endofprompt|>")]
    assert f.bos_ids == []


def test_raw_sep_falls_back_to_newline(tmp_path):
    from vocalie_tts_tpu.text.frontend import PublishedFrontend

    make_qwen_style_tokenizer(tmp_path / "tokenizer.json", with_eop=False)
    f = PublishedFrontend(tmp_path / "tokenizer.json", "raw")
    assert f.sep_ids == f.encode("\n")
    assert len(f.sep_ids) >= 1


# ── discovery + validation ───────────────────────────────────────────────


def test_load_frontend_discovery_and_vocab_gate(tmp_path):
    from vocalie_tts_tpu.text.frontend import (
        ByteFrontend,
        PublishedFrontend,
        load_frontend,
    )

    # no file → byte
    assert isinstance(load_frontend(tmp_path, style="raw", text_vocab=260),
                      ByteFrontend)
    # file in assets root → published
    n = make_qwen_style_tokenizer(tmp_path / "tokenizer.json")
    f = load_frontend(tmp_path, style="raw", text_vocab=n)
    assert isinstance(f, PublishedFrontend)
    # vocab larger than the text embedding rows → rejected, byte fallback
    f2 = load_frontend(tmp_path, style="raw", text_vocab=n - 1)
    assert isinstance(f2, ByteFrontend)
    # discovery also looks under weights/
    sub = tmp_path / "eng"
    (sub / "weights").mkdir(parents=True)
    make_qwen_style_tokenizer(sub / "weights" / "tokenizer.json")
    assert isinstance(load_frontend(sub, style="raw", text_vocab=n),
                      PublishedFrontend)
