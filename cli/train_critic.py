"""Pretrain the frozen SegmentCritic (segment-boundary detector).

The reference only ships the trained checkpoint (``critic.cp``, loaded at
model/bm_hrl_agent.py:201); the trainer itself is absent from that repo. This
provides the producer so the full BMHRL pipeline is reproducible:

- with ``--segment_json`` in the CharadeCaptions layout
  ({"captions": [...], "seg_labels": [...]} per entry — the format
  captioning_datasets/segment_dataset.py consumes), labels are used as-is;
- otherwise labels are synthesized from caption punctuation/conjunction
  structure (boundary at clause-final tokens and the caption end) over an
  ANet-format JSON corpus — a documented proxy for the unavailable data.

The critic is trained standalone (embedding + BCE over boundary logits) and
exported both as orbax state and as a reference-layout ``critic.cp``.
"""
from __future__ import annotations

import argparse
import json
from typing import List, Sequence, Tuple

import numpy as np

BOUNDARY_WORDS = {"and", "then", "while", "before", "after", "as"}


def synth_labels(tokens: Sequence[str]) -> List[int]:
    """Boundary at tokens preceding clause markers and at the caption end."""
    labels = [0] * len(tokens)
    for i, tok in enumerate(tokens):
        if i > 0 and (tok in {",", ";", "."} or tok in BOUNDARY_WORDS):
            labels[i - 1] = 1
    if labels:
        labels[-1] = 1
    return labels


def load_examples(args) -> List[Tuple[List[str], List[int]]]:
    from bmhrl_tpu.data.tokenizer import tokenize_lower

    out: List[Tuple[List[str], List[int]]] = []
    if args.segment_json:
        with open(args.segment_json) as f:
            data = json.load(f)
        entries = data.values() if isinstance(data, dict) else data
        for item in entries:
            for caption, seg in zip(item["captions"], item["seg_labels"]):
                words = caption.split()
                if len(words) != len(seg):
                    continue
                out.append((["<s>"] + [w.lower() for w in words],
                            [0] + list(seg)))
    else:
        with open(args.corpus_json) as f:
            data = json.load(f)
        for info in data.values():
            for caption in info.get("sentences", []):
                toks = tokenize_lower(caption)
                if not toks:
                    continue
                out.append((["<s>"] + toks + ["</s>"],
                            [0] + synth_labels(toks) + [0]))
    return out


def main(argv=None):
    p = argparse.ArgumentParser(description="Pretrain the segment critic")
    p.add_argument("--corpus_json", default="./data/train.json",
                   help="ANet-format JSON caption corpus")
    p.add_argument("--segment_json", default=None,
                   help="CharadeCaptions-format JSON with seg_labels")
    p.add_argument("--train_meta_path", default="./data/train.csv",
                   help="meta TSV for the vocabulary")
    p.add_argument("--glove_path", default=None)
    p.add_argument("--out", default="./data/models/critic.cp")
    p.add_argument("--epochs", type=int, default=3)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--max_len", type=int, default=32)
    p.add_argument("--d_model_caps", type=int, default=300)
    p.add_argument("--max_examples", type=int, default=None)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    from bmhrl_tpu.utils.jax_setup import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp

    from bmhrl_tpu.data.vocab import PAD, build_vocab_from_tsv
    from bmhrl_tpu.models.blocks import VocabularyEmbedder
    from bmhrl_tpu.models.critic import SegmentCritic
    from bmhrl_tpu.train.optim import GatedAdam
    from bmhrl_tpu.utils.checkpoint import export_torch_critic

    vocab = build_vocab_from_tsv(args.train_meta_path, 1, args.glove_path,
                                 args.d_model_caps)
    examples = load_examples(args)
    if args.max_examples:
        examples = examples[: args.max_examples]
    print(f"{len(examples)} critic training examples, vocab {len(vocab)}")

    L = args.max_len
    ids = np.full((len(examples), L), PAD, np.int32)
    labels = np.zeros((len(examples), L), np.float32)
    mask = np.zeros((len(examples), L), np.float32)
    for i, (toks, lab) in enumerate(examples):
        enc = vocab.encode(toks)[:L]
        ids[i, : len(enc)] = enc
        labels[i, : len(enc)] = lab[: len(enc)]
        mask[i, : len(enc)] = 1.0

    import flax.linen as nn

    class CriticTrainer(nn.Module):
        voc: int
        d: int

        @nn.compact
        def __call__(self, tokens):
            emb = VocabularyEmbedder(self.voc, self.d, name="emb")(tokens)
            crit = SegmentCritic(self.d, name="critic")
            return crit.logits_trainable(emb)[..., 0]

    model = CriticTrainer(len(vocab), args.d_model_caps)
    rng = jax.random.PRNGKey(args.seed)
    params = jax.jit(model.init)(rng, jnp.asarray(ids[:2]))
    if vocab.vectors is not None:
        params["params"]["emb"]["embedding"]["embedding"] = jnp.asarray(
            vocab.vectors)
    optim = GatedAdam(0.9, 0.999, 1e-8, 0.0)
    opt_state = optim.init(params)

    @jax.jit
    def step(params, opt_state, tok, lab, msk):
        def loss_fn(p):
            logits = model.apply(p, tok)
            bce = (jnp.maximum(logits, 0) - logits * lab
                   + jnp.log1p(jnp.exp(-jnp.abs(logits))))
            return jnp.sum(bce * msk) / jnp.maximum(jnp.sum(msk), 1.0)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        params, opt_state = optim.update(grads, opt_state, params, True,
                                         args.lr)
        return params, opt_state, loss

    n = len(examples)
    order = np.arange(n)
    rng_np = np.random.RandomState(args.seed)
    for epoch in range(args.epochs):
        rng_np.shuffle(order)
        losses = []
        for s in range(0, n - args.batch_size + 1, args.batch_size):
            idx = order[s: s + args.batch_size]
            params, opt_state, loss = step(
                params, opt_state, jnp.asarray(ids[idx]),
                jnp.asarray(labels[idx]), jnp.asarray(mask[idx]))
            losses.append(float(loss))
        print(f"epoch {epoch}: bce={np.mean(losses):.4f}")

    import os

    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    export_torch_critic(params["params"]["critic"], args.out)
    print(f"saved {args.out}")
    return args.out


if __name__ == "__main__":
    main()
