"""Jitted train/predict steps for the proposal generator.

Parity target: epoch_loops/proposal_epoch_loops.py:27-96 — per-batch
forward returning (predictions, loss, losses_A, losses_V), Adam with
optional global-norm gradient clipping, per-modality loss accumulation.
TPU-shaped: one donated jitted step; targets arrive host-assembled
(data/proposal.ProposalDataset.make_batch)."""
from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import optax


class ProposalStepFactory:
    def __init__(self, model, lr: float = 5e-5, grad_clip: float = 1.0):
        self.model = model
        self.tx = optax.chain(
            optax.clip_by_global_norm(grad_clip) if grad_clip
            else optax.identity(),
            optax.adam(lr))

    def init_state(self, rng, batch) -> Dict:
        fs = {k: jnp.asarray(v) for k, v in batch["feature_stacks"].items()}
        masks = {k: jnp.asarray(v) for k, v in batch["masks"].items()}
        tgts = jax.tree.map(jnp.asarray, batch["targets"])
        params = jax.jit(self.model.init)(
            {"params": rng, "dropout": rng}, fs, tgts, masks)
        return {"params": params, "opt": self.tx.init(params["params"]),
                "step": jnp.zeros((), jnp.int32)}

    @partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_step(self, state, batch, rng) -> Tuple[Dict, Dict]:
        def loss_fn(p):
            preds, loss, la, lv = self.model.apply(
                {"params": p}, batch["feature_stacks"], batch["targets"],
                batch["masks"], deterministic=False,
                rngs={"dropout": rng})
            return loss, (la, lv)

        (loss, (la, lv)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state["params"]["params"])
        updates, opt = self.tx.update(grads, state["opt"],
                                      state["params"]["params"])
        params = optax.apply_updates(state["params"]["params"], updates)
        new_state = {"params": {"params": params}, "opt": opt,
                     "step": state["step"] + 1}
        metrics = {"loss": loss}
        metrics.update({f"{k}_A": v for k, v in la.items()})
        metrics.update({f"{k}_V": v for k, v in lv.items()})
        return new_state, metrics

    @partial(jax.jit, static_argnums=0)
    def predict(self, state, batch) -> jnp.ndarray:
        preds, _, _, _ = self.model.apply(
            state["params"], batch["feature_stacks"], batch["targets"],
            batch["masks"], deterministic=True)
        return preds
