"""Torch→JAX checkpoint converters.

Published checkpoints for the engine families are torch state dicts /
safetensors (ResembleAI/chatterbox, Qwen3-TTS, FunAudioLLM CosyVoice,
coqui XTTS-v2, rsxdalv piper, haoheliu AudioSR). These converters map
them onto this framework's pytrees and save through
models.common.weights, making `VOCALIE_INSTALL_MODE=download`
meaningful in egress-enabled deployments.
"""

from vocalie_tts_tpu.models.convert.torch_bridge import (
    convert_linear,
    convert_embedding,
    convert_conv1d,
    load_state_dict,
)

__all__ = [
    "convert_linear",
    "convert_embedding",
    "convert_conv1d",
    "load_state_dict",
]
