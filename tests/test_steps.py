"""Train-step tests: warmstart overfit, RL worker/manager steps, grad gating."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bmhrl_tpu.config import Config
from bmhrl_tpu.models.bmhrl import (
    BMHrlAgent, BMManagerValueFunction, BMWorkerValueFunction)
from bmhrl_tpu.train.rewards import CiderReward
from bmhrl_tpu.train.steps import (
    StepFactory, param_groups, phase_mask, synonym_noise)

VOC = 40
ITOS = ["<unk>", "<blank>", "<s>", "</s>"] + [f"w{i}" for i in range(VOC - 4)]
CORPUS = [["w0", "w1", "w2"], ["w0", "w1", "w2", "w3"], ["w1", "w2"]] * 2
CAPTIONS = ["w0 w1 w2", "w1 w2 w3 w4"]


def tiny_setup():
    cfg = Config(B=2, mesh_shape=(1, 1), to_log=False, rl_gamma_worker=0.0,
                 rl_gamma_manager=0.0)
    model = BMHrlAgent(
        voc_size=VOC, d_video=16, d_audio=8, d_model=16, d_model_caps=12,
        att_heads=2, att_layers=1, d_ff_v=16, d_ff_a=8, d_ff_c=16,
        dtype=jnp.float32)
    wv = BMWorkerValueFunction(12)
    mv = BMManagerValueFunction(12)
    scorer = CiderReward(ITOS, CORPUS, 0.0, 0.0)
    sf = StepFactory(cfg, model, wv, mv, emb_trainable=True)
    rng = np.random.RandomState(0)
    batch = {
        "rgb": jnp.asarray(rng.rand(2, 6, 16), jnp.float32),
        "flow": jnp.asarray(rng.rand(2, 6, 16), jnp.float32),
        "audio": jnp.asarray(rng.rand(2, 9, 8), jnp.float32),
        "caption_idx": jnp.asarray(
            [[2, 4, 5, 6, 3, 1, 1, 1], [2, 5, 6, 7, 8, 3, 1, 1]], jnp.int32),
    }
    return cfg, sf, scorer, batch


@pytest.fixture(scope="module")
def setup():
    return tiny_setup()


def run_rl_step(sf, scorer, state, batch, rng, train_worker):
    roll = sf.rl_rollout(state, batch, rng, train_worker)
    sampled = np.asarray(roll["sampled"])
    if train_worker:
        score, _ = scorer.delta_worker(sampled, CAPTIONS)
    else:
        score, _ = scorer.delta_manager(
            sampled, CAPTIONS, np.asarray(roll["loss_mask"]),
            np.asarray(roll["seg"]))
    return sf.rl_update(state, batch, rng, 1e-4, roll,
                        jnp.asarray(score), train_worker)


def test_warmstart_overfits(setup):
    cfg, sf, scorer, batch = setup
    state = sf.init_state(jax.random.PRNGKey(0), jax.tree.map(np.asarray, batch))
    losses = []
    for i in range(8):
        state, metrics, aux = sf.warmstart_step(
            state, batch, jax.random.PRNGKey(i), 1e-3)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


def test_warmstart_value_pretraining(setup):
    cfg, sf, scorer, batch = setup
    state = sf.init_state(jax.random.PRNGKey(0), jax.tree.map(np.asarray, batch))
    state, metrics, aux = sf.warmstart_step(
        state, batch, jax.random.PRNGKey(0), 1e-3)
    w, m, _ = scorer.delta_both(
        np.asarray(aux["argmax"]), CAPTIONS,
        np.asarray(aux["token_mask"]), np.asarray(aux["seg"]))
    state, vmetrics = sf.value_warmstart_step(
        state, aux["wf"], aux["mf"], jnp.asarray(w), jnp.asarray(m),
        aux["token_mask"], aux["seg"])
    assert np.isfinite(float(vmetrics["wv_loss"]))
    assert np.isfinite(float(vmetrics["mv_loss"]))


def test_rl_worker_and_manager_steps(setup):
    cfg, sf, scorer, batch = setup
    state = sf.init_state(jax.random.PRNGKey(1), jax.tree.map(np.asarray, batch))
    state, m = run_rl_step(sf, scorer, state, batch, jax.random.PRNGKey(0), True)
    assert np.isfinite(float(m["loss"]))
    state, m2 = run_rl_step(sf, scorer, state, batch, jax.random.PRNGKey(1), False)
    assert np.isfinite(float(m2["loss"]))


def test_grad_gating(setup):
    """Worker phase must not touch manager params and vice versa."""
    cfg, sf, scorer, batch = setup
    state = sf.init_state(jax.random.PRNGKey(2), jax.tree.map(np.asarray, batch))
    p0 = jax.tree.map(np.asarray, state.cap_params)
    st1, _ = run_rl_step(sf, scorer, state, batch, jax.random.PRNGKey(0), True)
    p1 = jax.tree.map(np.asarray, st1.cap_params)
    g = param_groups(p0)

    def max_delta(pa, pb, group):
        deltas = jax.tree.leaves(jax.tree.map(
            lambda a, b, lab: float(np.abs(a - b).max()) if lab == group else 0.0,
            pa, pb, g))
        return max(deltas)

    assert max_delta(p0, p1, "worker") > 0
    assert max_delta(p0, p1, "manager") == 0
    assert max_delta(p0, p1, "frozen") == 0
    st2, _ = run_rl_step(sf, scorer, st1, batch, jax.random.PRNGKey(1), False)
    p2 = jax.tree.map(np.asarray, st2.cap_params)
    assert max_delta(p1, p2, "manager") > 0
    assert max_delta(p1, p2, "worker") == 0


def test_phase_mask_labels(setup):
    cfg, sf, scorer, batch = setup
    state = sf.init_state(jax.random.PRNGKey(3), jax.tree.map(np.asarray, batch))
    g = sf.groups(state)
    labels = set(jax.tree.leaves(g))
    assert labels <= {"frozen", "embedding", "worker", "manager", "other"}
    m = phase_mask(g, "manager", emb_trainable=False)
    for lab, a in zip(jax.tree.leaves(g), jax.tree.leaves(m)):
        if lab in ("frozen", "embedding", "worker"):
            assert not a
        if lab == "manager":
            assert a


def test_synonym_noise_semantics():
    rng = jax.random.PRNGKey(0)
    cap = jnp.asarray([[2, 5, 6, 7, 3, 1, 1]], jnp.int32)
    out = np.asarray(synonym_noise(rng, cap, VOC, p=1.0))
    # end token always becomes pad; tail unchanged
    assert out[0, 4] == 1
    np.testing.assert_array_equal(out[0, 5:], [1, 1])
    out0 = np.asarray(synonym_noise(rng, cap, VOC, p=0.0))
    np.testing.assert_array_equal(out0[0, :4], [2, 5, 6, 7])
    assert out0[0, 4] == 1  # end still padded even with p=0


def test_val_loss_step(setup):
    cfg, sf, scorer, batch = setup
    state = sf.init_state(jax.random.PRNGKey(4), jax.tree.map(np.asarray, batch))
    loss = float(sf.val_loss_step(state, batch))
    assert np.isfinite(loss) and loss > 0


def test_rl_improves_reward():
    """End-to-end RL sign check: on a tiny overfit task, 60 biased-KL worker
    steps must raise the sampled-caption CIDEr (validates the reward ->
    amplitude -> loss plumbing direction, not just finiteness)."""
    cfg, sf, scorer, batch = tiny_setup()
    caps = ["w0 w1 w2", "w0 w1 w2"]
    batch = dict(batch)
    batch["caption_idx"] = jnp.asarray(
        [[2, 4, 5, 6, 3, 1, 1, 1], [2, 4, 5, 6, 3, 1, 1, 1]], jnp.int32)
    state = sf.init_state(jax.random.PRNGKey(0),
                          jax.tree.map(np.asarray, batch))
    for i in range(10):
        state, _, _ = sf.warmstart_step(state, batch, jax.random.PRNGKey(i),
                                        1e-3)
    scores = []
    for i in range(60):
        k = jax.random.PRNGKey(1000 + i)
        roll = sf.rl_rollout(state, batch, k, True)
        score, rewards = scorer.delta_worker(np.asarray(roll["sampled"]), caps)
        scores.append(float(rewards[:, -1].mean()))
        state, _ = sf.rl_update(state, batch, k, 3e-4, roll,
                                jnp.asarray(score), True)
    early, late = np.mean(scores[:10]), np.mean(scores[-10:])
    assert late > early, (early, late)


def test_bmhrl_trains_on_zero_feature_batch():
    """Zero-filled missing-feature clips (data/features.py) must keep
    warmstart + RL updates and decode finite for the BMHRL family too
    (companion to the DETR regression in test_detr.py)."""
    from bmhrl_tpu.ops.masking import make_masks
    from bmhrl_tpu.train.decode import decode

    cfg, sf, scorer, batch = tiny_setup()
    batch = dict(batch)
    for kk in ("rgb", "flow", "audio"):
        batch[kk] = jnp.zeros_like(batch[kk])
    state = sf.init_state(jax.random.PRNGKey(0), batch)
    k = jax.random.PRNGKey(1)
    state, m, aux = sf.warmstart_step(state, batch, k, 1e-3)
    assert np.isfinite(float(m["loss"]))
    state, _ = run_rl_step(sf, scorer, state, batch, k, True)
    bad = [jax.tree_util.keystr(p) for p, x in
           jax.tree_util.tree_leaves_with_path(state.cap_params)
           if not bool(jnp.isfinite(x).all())]
    assert not bad, f"non-finite params: {bad[:5]}"
    feats = {kk: batch[kk] for kk in ("rgb", "flow", "audio")}
    masks_src = make_masks(feats, None, "audio_video", 1)
    toks, probs = decode(sf.model, state.cap_params, feats, masks_src,
                         6, 2, 3, 1, greedy=True, use_fast=True)
    assert np.isfinite(np.asarray(probs)).all()
