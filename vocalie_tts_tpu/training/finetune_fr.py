"""FR-overlay fine-tuning for the Chatterbox-class T3 decoder.

The product ships a French fine-tune of its base decoder that is
overlaid on the T3 stage at load time (ref: chatterbox_impl.py:63-73 —
upstream trains it out-of-repo in torch and distributes a safetensors
state dict). This module is the in-framework, TPU-native trainer for
that overlay: teacher-forced next-token cross-entropy on
[BOS, text bytes, BOS_speech, speech tokens, EOS_speech] sequences,
AdamW over a (dp × tp) mesh, checkpointed as the ``t3_fr`` weight set
that ``ChatterboxRuntime.create`` already overlays.

Dataset format: JSONL, one example per line —
    {"text": "<french text>", "speech_tokens": [int, ...]}
speech tokens are codebook ids in [0, 1024); the trainer offsets them
into its mixed [text ‖ core] view (see ``to_train_view``). Use
``synthetic_dataset`` for smoke runs without data.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, Iterator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vocalie_tts_tpu.models.chatterbox.model import (
    SPEECH_VOCAB,
    T3Config,
)
from vocalie_tts_tpu.parallel.mesh import make_mesh, shard_params
from vocalie_tts_tpu.parallel.train import (
    create_train_state,
    make_optimizer,
    make_sharded_train_epoch,
)
from vocalie_tts_tpu.text.phonemes import text_to_byte_ids
from vocalie_tts_tpu.utils.env import bool_env

IGNORE = -100


def example_to_tokens(
    text: str, speech_tokens: List[int], max_len: int,
    text_vocab: int = None, speech_vocab: int = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """(tokens, targets) in the mixed training space — loss on the
    speech span only.

    Training ids: text [0, text_vocab) ‖ LM-core ids at +text_vocab
    (the serving model keeps text in a separate embedding table; the
    trainer concatenates the two tables into one mixed view so
    teacher-forced sequences stay a flat id array — see
    ``to_train_view``/``from_train_view``)."""
    from vocalie_tts_tpu.text.phonemes import BYTE_VOCAB_SIZE

    tv = BYTE_VOCAB_SIZE if text_vocab is None else int(text_vocab)
    sv = SPEECH_VOCAB if speech_vocab is None else int(speech_vocab)
    prompt = text_to_byte_ids(text, add_bos=True, add_eos=False) + [tv + sv]
    speech = [tv + min(max(int(t), 0), sv - 1) for t in speech_tokens]
    seq = (prompt + speech + [tv + sv + 1])[:max_len]
    tokens = np.zeros(max_len, np.int32)
    targets = np.full(max_len, IGNORE, np.int32)
    tokens[: len(seq)] = seq
    # next-token targets, masked to the speech region (prompt is context)
    for i in range(len(prompt) - 1, len(seq) - 1):
        targets[i] = seq[i + 1]
    return tokens, targets


def to_train_view(t3: Dict, cfg: T3Config) -> Dict:
    """LM params over the mixed [text ‖ core] vocabulary: tok_emb rows
    are [text_emb; core tok_emb]; lm_head gains zero text columns (the
    loss never targets text ids — prompt targets are IGNORE — so those
    columns only absorb softmax-denominator gradient, like the separate
    text head the published T3 trains and we don't serve)."""
    lm = dict(t3["lm"])
    text_emb = t3["text_emb"].astype(lm["tok_emb"].dtype)
    lm["tok_emb"] = jnp.concatenate([text_emb, lm["tok_emb"]], axis=0)
    lm["lm_head"] = jnp.concatenate(
        [jnp.zeros((lm["lm_head"].shape[0], cfg.text_vocab), lm["lm_head"].dtype),
         lm["lm_head"]],
        axis=1,
    )
    return lm


def from_train_view(lm_mixed: Dict, cfg: T3Config) -> Tuple[Dict, jax.Array]:
    """Split the trained mixed view back into (core lm, text_emb)."""
    lm = dict(lm_mixed)
    text_emb = lm["tok_emb"][: cfg.text_vocab]
    lm["tok_emb"] = lm["tok_emb"][cfg.text_vocab :]
    lm["lm_head"] = lm["lm_head"][:, cfg.text_vocab :]
    return lm, text_emb


def load_jsonl(path: Path) -> Iterator[Dict]:
    with open(path, encoding="utf-8") as fh:
        for line in fh:
            line = line.strip()
            if line:
                yield json.loads(line)


def synthetic_dataset(n: int, seed: int = 0) -> Iterator[Dict]:
    """Deterministic toy corpus: each sentence maps to a fixed token
    pattern, so the loss has real structure to learn."""
    rng = np.random.RandomState(seed)
    phrases = [
        "Bonjour et bienvenue.",
        "La séance est ouverte.",
        "Merci de votre attention.",
        "À demain pour la suite.",
    ]
    for i in range(n):
        text = phrases[i % len(phrases)]
        base = (i % len(phrases)) * 17
        length = 24 + int(rng.randint(0, 8))
        yield {
            "text": text,
            "speech_tokens": [(base + 7 * j) % SPEECH_VOCAB for j in range(length)],
        }


def finetune_overlay(
    *,
    assets_dir: Path,
    dataset: Optional[Path] = None,
    steps: int = 100,
    batch_size: int = 8,
    seq_len: int = 128,
    learning_rate: float = 1e-4,
    tp: int = 1,
    n_devices: Optional[int] = None,
    log_every: int = 10,
    log=print,
) -> Dict[str, float]:
    """Train the FR overlay and save it as the ``t3_fr`` checkpoint.

    Starts from the installed base ``t3`` weights (or random init in
    dev mode) and writes ``t3_fr`` next to them — exactly the overlay
    slot ChatterboxRuntime loads.
    """
    import os

    if bool_env("VOCALIE_WEIGHT_INT8"):
        raise RuntimeError("unset VOCALIE_WEIGHT_INT8 to fine-tune (int8 is inference-only)")

    # Training wants the whole chip: drop any resident serving runtimes
    # (weights + KV caches + jitted decode programs) before allocating
    # optimizer state. Serving re-admits lazily afterwards.
    from vocalie_tts_tpu.engines.residency import RESIDENCY

    dropped = RESIDENCY.release_all()
    if dropped:
        log(f"released {dropped} resident serving runtime(s) before training")

    from vocalie_tts_tpu.models.chatterbox.runtime import SCALES, _scale_from_env
    from vocalie_tts_tpu.models.common.weights import (
        checkpoint_exists,
        load_params,
        save_params,
    )
    from vocalie_tts_tpu.models.chatterbox.model import init_t3

    cfg: T3Config = SCALES[_scale_from_env()]
    weights_dir = Path(assets_dir) / "weights"
    # converted checkpoints define the text/speech id spaces (meta)
    import dataclasses as _dc0

    from vocalie_tts_tpu.models.common.weights import load_meta as _load_meta

    _meta = _load_meta(weights_dir, "t3")
    cfg = _dc0.replace(
        cfg,
        text_vocab=int(_meta.get("text_vocab", cfg.text_vocab)),
        speech_vocab=int(_meta.get("speech_vocab", cfg.speech_vocab)),
    )
    t3 = init_t3(jax.random.PRNGKey(7), cfg)
    if checkpoint_exists(weights_dir, "t3_fr"):
        t3 = load_params(weights_dir, "t3_fr", t3)  # resume the overlay
    elif checkpoint_exists(weights_dir, "t3"):
        t3 = load_params(weights_dir, "t3", t3)

    examples = list(load_jsonl(dataset)) if dataset else list(synthetic_dataset(512))
    if not examples:
        raise ValueError("empty dataset")
    toks = np.stack([
        example_to_tokens(e["text"], e["speech_tokens"], seq_len,
                          text_vocab=cfg.text_vocab,
                          speech_vocab=cfg.speech_vocab)[0]
        for e in examples
    ])
    tgts = np.stack([
        example_to_tokens(e["text"], e["speech_tokens"], seq_len,
                          text_vocab=cfg.text_vocab,
                          speech_vocab=cfg.speech_vocab)[1]
        for e in examples
    ])

    import dataclasses as _dc

    train_cfg = _dc.replace(
        cfg.lm, vocab_size=cfg.text_vocab + cfg.speech_vocab + 2
    )
    mesh = make_mesh(n_devices, tp=tp)
    optimizer = make_optimizer(learning_rate)
    losses: List[float] = []
    with mesh:
        lm = shard_params(to_train_view(t3, cfg), mesh)
        state = create_train_state(lm, optimizer)
        epoch_fn = make_sharded_train_epoch(train_cfg, mesh, optimizer)(state)
        rng = np.random.RandomState(42)
        done = 0
        while done < steps:
            k = min(log_every, steps - done)
            idx = rng.randint(0, len(examples), (k, batch_size))
            state, loss_k = epoch_fn(
                state, jnp.asarray(toks[idx]), jnp.asarray(tgts[idx])
            )
            loss_k = np.asarray(loss_k)
            if done == 0:
                losses.append(float(loss_k[0]))
            losses.append(float(loss_k[-1]))
            done += k
            log(f"step {done - 1}: loss {losses[-1]:.4f}")
        trained_mixed = jax.device_get(state.params)

    trained_lm, trained_text_emb = from_train_view(trained_mixed, cfg)
    overlay = dict(t3)
    overlay["lm"] = trained_lm
    overlay["text_emb"] = trained_text_emb
    save_params(weights_dir, "t3_fr", overlay,
                meta={"family": "chatterbox", "stage": "t3_fr_overlay",
                      "text_vocab": cfg.text_vocab,
                      "speech_vocab": cfg.speech_vocab,
                      "steps": steps, "final_loss": losses[-1]})
    return {"first_loss": losses[0], "final_loss": losses[-1], "steps": steps}


__all__ = [
    "finetune_overlay",
    "example_to_tokens",
    "synthetic_dataset",
    "load_jsonl",
    "to_train_view",
    "from_train_view",
]
