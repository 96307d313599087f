"""Decoder tests: incremental critic consistency, greedy decode semantics."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bmhrl_tpu.models.bmhrl import BMHrlAgent
from bmhrl_tpu.models.critic import SegmentCritic
from bmhrl_tpu.ops.masking import make_masks
from bmhrl_tpu.train.decode import decode, detokenize

VOC = 30
B, Sv, Sa = 2, 5, 7


@pytest.fixture(scope="module")
def model_setup():
    model = BMHrlAgent(
        voc_size=VOC, d_video=16, d_audio=8, d_model=16, d_model_caps=12,
        att_heads=2, att_layers=1, d_ff_v=16, d_ff_a=8, d_ff_c=16, d_goal=8,
        dtype=jnp.float32)
    rng = np.random.RandomState(0)
    feats = {
        "rgb": jnp.asarray(rng.rand(B, Sv, 16), jnp.float32),
        "flow": jnp.asarray(rng.rand(B, Sv, 16), jnp.float32),
        "audio": jnp.asarray(rng.rand(B, Sa, 8), jnp.float32),
    }
    trg = jnp.asarray([[2, 4, 5, 3, 1, 1], [2, 6, 7, 8, 3, 1]], jnp.int32)
    masks = make_masks(feats, trg, "audio_video", 1)
    k = jax.random.PRNGKey(0)
    params = jax.jit(model.init)(
        {"params": k, "dropout": k, "noise": k},
        (feats["rgb"] + feats["flow"], feats["audio"]), trg, masks)
    return model, params, feats, trg, masks


def test_critic_step_matches_scan(model_setup):
    """Incremental critic stepping must equal the full-sequence scan."""
    model, params, feats, trg, masks = model_setup
    crit = SegmentCritic(12)
    cp = {"params": params["params"]["critic"]}
    emb = jax.random.normal(jax.random.PRNGKey(7), (B, 6, 12))
    full = np.asarray(crit.apply(cp, emb))  # (B, 6, 1)
    state = crit.apply(cp, B, method="init_state")
    steps = []
    for t in range(6):
        s, state = crit.apply(cp, emb[:, t], state, method="step")
        steps.append(np.asarray(s))
    inc = np.stack(steps, axis=1)
    np.testing.assert_allclose(inc, full, rtol=1e-5, atol=1e-5)


def test_agent_critic_step_matches_labels(model_setup):
    """Agent-level critic_step labels must match segment_labels_of on the
    same prefix."""
    model, params, feats, trg, masks = model_setup

    def labels_full(p, trg):
        C_emb = model.apply(p, trg, method="embed_caption")
        return model.apply(p, C_emb, method="segment_labels_of")

    full = np.asarray(jax.jit(labels_full)(params, trg))
    state = model.apply(params, B, method="critic_init_state")
    for t in range(trg.shape[1]):
        score, state = model.apply(params, trg[:, t], state,
                                   method="critic_step")
        lab = (jax.nn.sigmoid(score) > model.critic_score_threshold).astype(int)
        np.testing.assert_array_equal(np.asarray(lab), full[:, t],
                                      err_msg=f"t={t}")


def test_greedy_decode_shapes_and_semantics(model_setup):
    model, params, feats, trg, masks = model_setup
    masks_src = make_masks(feats, None, "audio_video", 1)
    toks, probs = decode(model, params, feats, masks_src, 8, 2, 3, 1,
                         greedy=True)
    t = np.asarray(toks)
    assert t.shape == (B, 9)
    assert (t[:, 0] == 2).all()
    # deterministic: same call -> same output
    toks2, _ = decode(model, params, feats, masks_src, 8, 2, 3, 1, greedy=True)
    np.testing.assert_array_equal(t, np.asarray(toks2))
    # sampled decode differs across rngs (usually)
    s1, p1 = decode(model, params, feats, masks_src, 8, 2, 3, 1, greedy=False,
                    rng=jax.random.PRNGKey(0))
    assert np.asarray(p1)[:, 1:].max() <= 1.0


def test_detokenize():
    itos = ["<unk>", "<blank>", "<s>", "</s>", "a", "man", "runs"]
    toks = np.asarray([[2, 4, 5, 6, 3, 1], [2, 5, 6, 1, 1, 1]])
    out = detokenize(toks, itos)
    assert out[0] == "A man runs"
    assert out[1] == "Man runs <blank> <blank> <blank>"  # no </s>: keep tail


def test_fast_decode_matches_full(model_setup):
    """The incremental (KV-cached) decode must produce exactly the tokens of
    the full-buffer decode path (greedy, deterministic)."""
    from bmhrl_tpu.train import decode as D

    model, params, feats, trg, masks = model_setup
    masks_src = make_masks(feats, None, "audio_video", 1)
    V = feats["rgb"] + feats["flow"]
    A = feats["audio"]
    Va, Av = model.apply(params, V, A, masks_src, method="encode")
    full_toks, full_probs = D._decode_loop(
        model, params, Va, Av, masks_src, B, 8, 2, 3, 1, True, None)
    fast_toks, fast_probs = D._decode_loop_fast(
        model, params, Va, Av, masks_src, B, 8, 2, 3, 1, True, None)
    np.testing.assert_array_equal(np.asarray(full_toks), np.asarray(fast_toks))
    np.testing.assert_allclose(np.asarray(full_probs), np.asarray(fast_probs),
                               rtol=1e-4, atol=1e-5)


def test_fast_decode_matches_full_with_pad_emissions(model_setup):
    """A degenerate model that greedily emits PAD mid-caption: the fast
    path's validity mask must reproduce the full path's C_mask exclusion
    of PAD key positions (regression for the pos<=t-only masking)."""
    from bmhrl_tpu.train import decode as D

    model, params, feats, trg, masks = model_setup
    p = jax.tree.map(lambda x: x, params)  # shallow copy
    proj = dict(p["params"]["worker"]["projection"])
    proj["bias"] = proj["bias"].at[1].add(10.0)  # PAD always wins argmax
    p = {"params": dict(p["params"],
                        worker=dict(p["params"]["worker"],
                                    projection=proj))}
    masks_src = make_masks(feats, None, "audio_video", 1)
    V = feats["rgb"] + feats["flow"]
    A = feats["audio"]
    Va, Av = model.apply(p, V, A, masks_src, method="encode")
    full_toks, full_probs = D._decode_loop(
        model, p, Va, Av, masks_src, B, 8, 2, 3, 1, True, None)
    fast_toks, fast_probs = D._decode_loop_fast(
        model, p, Va, Av, masks_src, B, 8, 2, 3, 1, True, None)
    assert (np.asarray(full_toks)[:, 1:] == 1).any(), "PAD must be emitted"
    np.testing.assert_array_equal(np.asarray(full_toks),
                                  np.asarray(fast_toks))
    np.testing.assert_allclose(np.asarray(full_probs),
                               np.asarray(fast_probs), rtol=1e-4, atol=1e-5)


def test_sample_filter_semantics():
    """top-k keeps exactly the k best, nucleus keeps the smallest prefix
    reaching p, temperature rescales — against a numpy reference."""
    from bmhrl_tpu.train.decode import sample_filter

    logp = np.log(np.asarray([[0.5, 0.25, 0.15, 0.08, 0.02]], np.float32))
    # top_k=2: only the two largest survive
    out = np.asarray(sample_filter(jnp.asarray(logp), top_k=2))
    assert (out[0, :2] > -1e8).all() and (out[0, 2:] <= -1e8).all()
    # top_p=0.6: 0.5 alone < 0.6 -> prefix {0.5, 0.25}
    out = np.asarray(sample_filter(jnp.asarray(logp), top_p=0.6))
    assert (out[0, :2] > -1e8).all() and (out[0, 2:] <= -1e8).all()
    # top_p tiny: top-1 always survives
    out = np.asarray(sample_filter(jnp.asarray(logp), top_p=1e-6))
    assert out[0, 0] > -1e8 and (out[0, 1:] <= -1e8).all()
    # temperature scales log-probs
    out = np.asarray(sample_filter(jnp.asarray(logp), temperature=2.0))
    np.testing.assert_allclose(out, logp / 2.0, rtol=1e-6)


def test_sampled_decode_topk1_equals_greedy(model_setup):
    """greedy=False with top_k=1 must reproduce the greedy tokens on both
    decode loops (the argmax is the only sampling survivor)."""
    model, params, feats, trg, masks = model_setup
    masks_src = make_masks(feats, None, "audio_video", 1)
    g_toks, _ = decode(model, params, feats, masks_src, 8, 2, 3, 1,
                       greedy=True)
    for fast in (True, False):
        s_toks, _ = decode(model, params, feats, masks_src, 8, 2, 3, 1,
                           greedy=False, rng=jax.random.PRNGKey(5),
                           use_fast=fast, top_k=1)
        np.testing.assert_array_equal(np.asarray(g_toks),
                                      np.asarray(s_toks))
