"""VITS model family + French G2P tests."""

import jax
import numpy as np
import pytest

from vocalie_tts_tpu.text.phonemes import (
    N_PHONES,
    phonemize_fr,
    text_to_byte_ids,
    text_to_phone_ids,
)

pytestmark = pytest.mark.device


def test_phonemizer_basic_french():
    phones = phonemize_fr("bonjour")
    assert phones[0] == "^" and phones[-1] == "$"
    inner = [p for p in phones if p not in "^$ "]
    # b-o~-Z-u-R
    assert inner == ["b", "o~", "Z", "u", "R"], inner


def test_phonemizer_nasal_and_silent_finals():
    assert [p for p in phonemize_fr("chant") if p not in "^$ "] == ["S", "a~"]
    assert [p for p in phonemize_fr("eau") if p not in "^$ "] == ["o"]
    # nasal doesn't trigger before vowel: "ami" → a-m-i
    assert [p for p in phonemize_fr("ami") if p not in "^$ "] == ["a", "m", "i"]


def test_phonemizer_punctuation_and_ids():
    phones = phonemize_fr("Oui, non.")
    assert "," in phones and "." in phones
    ids = text_to_phone_ids("Oui, non.")
    assert all(0 <= i < N_PHONES for i in ids)
    assert len(ids) > 4


def test_phonemizer_deterministic():
    assert phonemize_fr("Le chat mange.") == phonemize_fr("Le chat mange.")


def test_byte_tokenizer():
    ids = text_to_byte_ids("été")
    assert ids[0] == 257 and ids[-1] == 258
    assert all(0 <= i < 260 for i in ids)


@pytest.fixture(scope="module")
def vits_runtime(tmp_path_factory):
    from vocalie_tts_tpu.models.vits.model import VITSConfig
    from vocalie_tts_tpu.models.vits.runtime import VITSRuntime

    import vocalie_tts_tpu.models.vits.runtime as rt_mod

    # tiny config for CPU tests
    tiny = VITSConfig(
        d_model=32, n_layers=2, n_heads=2, d_ff=64, latent_dim=32,
        n_flows=2, max_phones=64, max_frames=128,
    )
    assets = tmp_path_factory.mktemp("vits")

    class TinyRuntime(VITSRuntime):
        @classmethod
        def create(cls, assets_dir, force_init=False):
            from vocalie_tts_tpu.models.vits.model import init_vits

            params = init_vits(jax.random.PRNGKey(0), tiny)
            return cls(params, tiny, assets_dir)

    del rt_mod
    return TinyRuntime.create(assets)


def test_vits_synthesize_shapes(vits_runtime):
    audio, sr, meta = vits_runtime.synthesize("Bonjour le monde.")
    assert sr == 22050
    assert audio.ndim == 1 and len(audio) > 0
    assert np.isfinite(audio).all()
    assert meta["engine"] == "piper"


def test_vits_batch_synthesis(vits_runtime):
    texts = ["Premier texte court.", "Deuxieme texte un peu plus long ici."]
    seen = []
    out = vits_runtime.synthesize_batch(texts, progress_cb=seen.append)
    assert len(out) == 2
    assert seen[-1] == 1.0
    for audio, sr, meta in out:
        assert sr == 22050 and len(audio) > 0


def test_vits_length_scale_stretches(vits_runtime):
    a1, _, _ = vits_runtime.synthesize("Bonjour le monde et tout.", length_scale=1.0)
    a2, _, _ = vits_runtime.synthesize("Bonjour le monde et tout.", length_scale=2.0)
    assert len(a2) > len(a1) * 1.3


def test_vits_weights_roundtrip(tmp_path):
    from vocalie_tts_tpu.models.common.weights import (
        load_params,
        save_params,
    )
    from vocalie_tts_tpu.models.vits.model import VITSConfig, init_vits

    tiny = VITSConfig(
        d_model=16, n_layers=1, n_heads=2, d_ff=32, latent_dim=16,
        n_flows=1, max_phones=32, max_frames=64,
    )
    params = init_vits(jax.random.PRNGKey(1), tiny)
    save_params(tmp_path, "vits", params)
    template = init_vits(jax.random.PRNGKey(2), tiny)
    loaded = load_params(tmp_path, "vits", template)
    leaf0 = jax.tree_util.tree_leaves(params)[0]
    loaded0 = jax.tree_util.tree_leaves(loaded)[0]
    assert np.allclose(np.asarray(leaf0), np.asarray(loaded0))
