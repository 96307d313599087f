"""Golden tests: jax losses vs the reference formulas expressed in torch.

The torch blocks below re-state the published math of
loss/label_smoothing.py:12-32 and loss/biased_kl.py:22-53 (smoothed prior,
scatter of GT/sampled mass, pad handling, elementwise KL) to serve as an
independent oracle.
"""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from bmhrl_tpu.train import losses as L

B, S, V = 3, 7, 23
PAD = 1
SMOOTH = 0.7


@pytest.fixture
def data():
    rng = np.random.RandomState(0)
    logits = rng.randn(B, S, V).astype(np.float32)
    pred_log = torch.log_softmax(torch.tensor(logits), dim=-1).numpy()
    target = rng.randint(0, V, (B, S)).astype(np.int64)
    target[0, -2:] = PAD  # padded tail
    sampled = rng.randint(0, V, (B, S)).astype(np.int64)
    sampled[1, 3] = target[1, 3]  # overlap case
    sampled[2, 0] = PAD  # sampled pad case
    amplitude = rng.rand(B, S).astype(np.float32)
    return pred_log, target, sampled, amplitude


def torch_label_smoothing(pred, target, smoothing, pad_idx):
    pred = torch.tensor(pred).reshape(-1, V)
    target = torch.tensor(target).reshape(-1)
    dist = smoothing * torch.ones_like(pred) / (V - 2)
    dist.scatter_(1, target.unsqueeze(-1), 1 - smoothing)
    dist[:, pad_idx] = 0
    mask = torch.nonzero(target == pad_idx)
    if len(mask) > 0:
        dist.index_fill_(0, mask.squeeze(-1), 0)
    return F.kl_div(pred, dist, reduction="none").numpy().reshape(B, S, V)


def torch_biased_kl(pred, trg, biased_trg, biased_offset, smoothing, pad_idx):
    pred_t = torch.tensor(pred)
    trg_t = torch.tensor(trg)
    off = torch.tensor(biased_offset)
    trg_factor = 1 - smoothing
    trg_ampl = trg_factor * (1 - off).reshape(-1)
    normed_offset = off * trg_factor
    biased_dist = torch.zeros_like(pred_t)
    biased_dist = torch.scatter(
        biased_dist, 2, torch.tensor(biased_trg).unsqueeze(-1),
        normed_offset.unsqueeze(-1))
    prediction = pred_t.reshape(-1, V)
    target = trg_t.reshape(-1)
    dist = smoothing * torch.ones_like(prediction) / (V - 2)
    dist.scatter_(1, target.unsqueeze(-1), trg_ampl.unsqueeze(-1))
    dist[:, pad_idx] = 0
    dist = dist + biased_dist.reshape(-1, V)
    mask = torch.nonzero(target == pad_idx)
    if len(mask) > 0:
        dist.index_fill_(0, mask.squeeze(-1), 0)
    div = F.kl_div(prediction, dist + 1e-8, reduction="none")
    return div.numpy().reshape(B, S, V)


def test_label_smoothing_matches_torch(data):
    pred_log, target, _, _ = data
    got = np.asarray(L.label_smoothing(jnp.asarray(pred_log), jnp.asarray(target),
                                       SMOOTH, PAD))
    want = torch_label_smoothing(pred_log, target, SMOOTH, PAD)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_biased_kl_matches_torch(data):
    pred_log, target, sampled, amplitude = data
    got = np.asarray(L.biased_kl(
        jnp.asarray(pred_log), jnp.asarray(target), jnp.asarray(sampled),
        jnp.asarray(amplitude), SMOOTH, PAD))
    want = torch_biased_kl(pred_log, target, sampled, amplitude, SMOOTH, PAD)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_biased_kl_zero_amplitude_reduces_to_label_smoothing(data):
    pred_log, target, sampled, _ = data
    amp0 = jnp.zeros((B, S))
    b = np.asarray(L.biased_kl(jnp.asarray(pred_log), jnp.asarray(target),
                               jnp.asarray(sampled), amp0, SMOOTH, PAD))
    ls = np.asarray(L.label_smoothing(jnp.asarray(pred_log), jnp.asarray(target),
                                      SMOOTH, PAD))
    # identical up to the +1e-8 stabilizer
    np.testing.assert_allclose(b, ls, atol=2e-4)


def test_reinforce_matches_torch(data):
    pred_log, target, sampled, _ = data
    probs = np.exp(pred_log)
    rng = np.random.RandomState(1)
    value = rng.randn(B, S).astype(np.float32)
    critic = rng.randn(B, S).astype(np.float32)
    got = float(L.reinforce_loss(jnp.asarray(probs), jnp.asarray(sampled),
                                 jnp.asarray(value), jnp.asarray(critic)))
    # torch oracle (ref: loss/biased_kl.py:69-81)
    p = torch.clamp(torch.tensor(probs), 1e-5, 1 - 1e-5)
    one_hot = F.one_hot(torch.tensor(sampled), V)
    pa = torch.sum(one_hot * p, -1)
    adv = torch.tensor(value) - torch.tensor(critic)
    want = (-torch.mean(adv.detach() * torch.log(pa)) + torch.mean(adv ** 2)).item()
    np.testing.assert_allclose(got, want, rtol=1e-4)
