"""Qwen3 12.5 Hz codec-decoder converter parity vs a torch replica
(models/convert/codec_decoder.py). The last per-stage converter delta
from docs/PARITY.md's qwen3 row — same pattern as every other stage:
replica torch module, convert_* function, elementwise parity."""

import numpy as np
import pytest

pytestmark = pytest.mark.unit


def _torch_codec_decoder(cfg, vocab, seed=0):
    import torch
    from torch import nn

    class TorchCodecDecoder(nn.Module):
        def __init__(self):
            super().__init__()
            ch = 512
            self.tok_emb = nn.Embedding(vocab, ch)
            self.up1 = nn.ConvTranspose1d(ch, ch, 8, stride=4, padding=2)
            self.up2 = nn.ConvTranspose1d(ch, ch, 4, stride=2, padding=1)
            self.mel_out = nn.Conv1d(ch, cfg.n_mels, 5, padding=2)

        def forward(self, tokens, mask):
            x = self.tok_emb(tokens) * mask[..., None]
            x = x.transpose(1, 2)
            x = torch.nn.functional.leaky_relu(self.up1(x), 0.1)
            x = torch.nn.functional.leaky_relu(self.up2(x), 0.1)
            return self.mel_out(x).transpose(1, 2)

    torch.manual_seed(seed)
    return TorchCodecDecoder().eval()


def test_codec_decoder_mel_parity():
    import jax
    import jax.numpy as jnp
    import torch

    from vocalie_tts_tpu.models.convert.codec_decoder import convert_codec_decoder
    from vocalie_tts_tpu.models.lmtts.model import (
        CODEC_VOCAB,
        init_codec_decoder,
        tokens_to_mel,
    )
    from vocalie_tts_tpu.models.lmtts.runtime import SCALES

    cfg = SCALES["tiny"]
    ref = _torch_codec_decoder(cfg, CODEC_VOCAB + 2, seed=4)
    state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    stage = convert_codec_decoder(state, cfg)
    dec = {**init_codec_decoder(jax.random.PRNGKey(0), cfg), **stage}

    rng = np.random.default_rng(7)
    tokens = rng.integers(0, CODEC_VOCAB, (2, 24)).astype(np.int32)
    mask = np.ones((2, 24), np.float32)
    mask[1, 16:] = 0.0

    with torch.no_grad():
        want = ref(torch.tensor(tokens, dtype=torch.long),
                   torch.tensor(mask)).numpy()
    got = np.asarray(tokens_to_mel(dec, cfg, jnp.asarray(tokens),
                                   jnp.asarray(mask)))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


def test_codec_decoder_weight_normed_checkpoint():
    """weight_g/weight_v pairs fuse like the other stages'."""
    import torch

    from vocalie_tts_tpu.models.convert.codec_decoder import convert_codec_decoder
    from vocalie_tts_tpu.models.lmtts.model import CODEC_VOCAB
    from vocalie_tts_tpu.models.lmtts.runtime import SCALES

    cfg = SCALES["tiny"]
    ref = _torch_codec_decoder(cfg, CODEC_VOCAB + 2, seed=5)
    fused = convert_codec_decoder(
        {k: v.detach().numpy() for k, v in ref.state_dict().items()}, cfg
    )
    for name in ("up1", "up2", "mel_out"):
        torch.nn.utils.weight_norm(getattr(ref, name))
    normed_state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    normed = convert_codec_decoder(normed_state, cfg)
    for name in ("up1", "up2", "mel_out"):
        np.testing.assert_allclose(
            np.asarray(normed[name]["w"]), np.asarray(fused[name]["w"]),
            atol=1e-5,
        )


def test_codec_decoder_fails_loud():
    from vocalie_tts_tpu.models.convert.codec_decoder import convert_codec_decoder
    from vocalie_tts_tpu.models.lmtts.model import CODEC_VOCAB
    from vocalie_tts_tpu.models.lmtts.runtime import SCALES

    cfg = SCALES["tiny"]
    with pytest.raises(KeyError):
        convert_codec_decoder({}, cfg)
    bad = {"tok_emb.weight": np.zeros((CODEC_VOCAB + 9, 512), np.float32)}
    with pytest.raises(ValueError, match="CODEC_VOCAB"):
        convert_codec_decoder(bad, cfg)


def test_import_codec_decoder_into_runtime(tmp_path, monkeypatch):
    """Graft + reload through the engine runtime: converted stage rows
    survive create() and synthesis runs."""
    import torch

    monkeypatch.setenv("VOCALIE_MODEL_SCALE", "tiny")
    monkeypatch.delenv("VOCALIE_WEIGHT_INT8", raising=False)
    monkeypatch.delenv("VOCALIE_KV_INT8", raising=False)

    from vocalie_tts_tpu.models.convert.import_checkpoint import (
        import_codec_decoder_checkpoint,
    )
    from vocalie_tts_tpu.models.lmtts.model import CODEC_VOCAB
    from vocalie_tts_tpu.models.lmtts.runtime import SCALES, LMTTSRuntime

    cfg = SCALES["tiny"]
    ref = _torch_codec_decoder(cfg, CODEC_VOCAB + 2, seed=6)
    ckpt = tmp_path / "codec_decoder.pt"
    torch.save(ref.state_dict(), ckpt)

    report = import_codec_decoder_checkpoint(checkpoint=ckpt, assets_dir=tmp_path)
    assert int(report["codec_params"]) > 0

    rt = LMTTSRuntime.create(tmp_path)
    np.testing.assert_allclose(
        np.asarray(rt.params["decoder"]["tok_emb"], np.float32),
        ref.tok_emb.weight.detach().numpy(), atol=1e-6,
    )
    audio, sr, meta = rt.synthesize("Bonjour.", mode="custom_voice",
                                    language="French")
    assert np.isfinite(audio).all()
