"""Beam-search decode tests: W=1 degenerates to greedy, and the jitted
lax.while_loop implementation matches an independent Python/numpy beam
over the same model step surface (candidate scoring, parent reindexing,
finished-beam freezing, length-penalty selection)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bmhrl_tpu.models.bmhrl import BMHrlAgent
from bmhrl_tpu.ops.masking import c_mask, make_masks
from bmhrl_tpu.train.decode import beam_decode, decode

VOC = 30
B, Sv, Sa = 3, 5, 7
MAX_LEN = 8
PAD, BOS, EOS = 1, 2, 3


@pytest.fixture(scope="module")
def setup():
    model = BMHrlAgent(
        voc_size=VOC, d_video=16, d_audio=8, d_model=16, d_model_caps=12,
        att_heads=2, att_layers=1, d_ff_v=16, d_ff_a=8, d_ff_c=16, d_goal=8,
        dtype=jnp.float32)
    rng = np.random.RandomState(7)
    feats = {
        "rgb": jnp.asarray(rng.rand(B, Sv, 16), jnp.float32),
        "flow": jnp.asarray(rng.rand(B, Sv, 16), jnp.float32),
        "audio": jnp.asarray(rng.rand(B, Sa, 8), jnp.float32),
    }
    trg0 = jnp.full((B, 4), PAD, jnp.int32).at[:, 0].set(BOS)
    masks0 = make_masks(feats, trg0, "audio_video", PAD)
    k = jax.random.PRNGKey(3)
    params = jax.jit(model.init)(
        {"params": k, "dropout": k, "noise": k},
        (feats["rgb"] + feats["flow"], feats["audio"]), trg0, masks0)
    masks_src = make_masks(feats, None, "audio_video", PAD)
    return model, params, feats, masks_src


def test_beam1_equals_greedy(setup):
    model, params, feats, masks_src = setup
    greedy_toks, _ = decode(model, params, feats, masks_src, MAX_LEN,
                            BOS, EOS, PAD, greedy=True, use_fast=False)
    beam_toks, scores = beam_decode(model, params, feats, masks_src,
                                    MAX_LEN, BOS, EOS, PAD, beam_width=1)
    np.testing.assert_array_equal(np.asarray(beam_toks),
                                  np.asarray(greedy_toks))
    assert np.all(np.isfinite(np.asarray(scores)))


def _ref_beam(model, params, feats, masks_src, max_len, W,
              length_penalty=0.0):
    """Independent beam search: Python loop + numpy top-k over the same
    model methods the jitted loop uses."""
    NEG = -1e9
    V_feat = feats["rgb"] + feats["flow"]
    A_feat = feats["audio"]
    Bn = V_feat.shape[0]
    Va, Av = model.apply(params, V_feat, A_feat, masks_src, method="encode")
    rep = lambda x: jnp.repeat(x, W, axis=0)
    Va_b = jax.tree.map(rep, Va)
    Av_b = jax.tree.map(rep, Av)
    masks_b = {k: rep(v) for k, v in masks_src.items()}
    extra = {}
    if hasattr(type(model), "precompute_fusion_kv"):
        extra["fusion_kv"] = model.apply(params, Va_b, Av_b,
                                         method="precompute_fusion_kv")
    BW = Bn * W
    L = max_len + 1
    trg = np.full((BW, L), PAD, np.int32)
    trg[:, 0] = BOS
    labels = np.zeros((BW, L), np.int32)
    crit = model.apply(params, BW, method="critic_init_state")
    scores = np.tile([0.0] + [NEG] * (W - 1), Bn).astype(np.float32)
    done = np.zeros((BW,), bool)
    lengths = np.zeros((BW,), np.int32)
    noise_rng = {"noise": jax.random.PRNGKey(0)}
    use_frontier = hasattr(type(model), "decode_frontier")
    for t in range(max_len):
        if done.all():
            break
        score_t, crit = model.apply(params, jnp.asarray(trg[:, t]), crit,
                                    method="critic_step")
        lab_t = (jax.nn.sigmoid(score_t) > model.critic_score_threshold)
        labels[:, t] = np.asarray(lab_t).astype(np.int32)
        masks = dict(masks_b)
        masks["C_mask"] = c_mask(jnp.asarray(trg), PAD)
        if use_frontier:
            logits_t = model.apply(
                params, jnp.asarray(trg), jnp.asarray(labels), Va_b, Av_b,
                masks, t, exploration=False, method="decode_frontier",
                **extra, rngs=noise_rng)
        else:
            preds = model.apply(
                params, jnp.asarray(trg), jnp.asarray(labels), Va_b, Av_b,
                masks, exploration=False, method="decode_with_labels",
                **extra, rngs=noise_rng)[0]
            logits_t = preds[np.arange(BW), t]
        logp = np.asarray(logits_t, np.float32)
        voc = logp.shape[-1]
        pad_row = np.full((voc,), NEG, np.float32)
        pad_row[PAD] = 0.0
        logp = np.where(done[:, None], pad_row[None], logp)
        cand = (scores[:, None] + logp).reshape(Bn, W * voc)
        top_i = np.argsort(-cand, axis=1, kind="stable")[:, :W]
        top_s = np.take_along_axis(cand, top_i, axis=1)
        parent = top_i // voc
        token = (top_i % voc).astype(np.int32)
        flat_parent = (np.arange(Bn)[:, None] * W + parent).reshape(-1)
        prev_done = done[flat_parent]
        trg = trg[flat_parent].copy()
        trg[:, t + 1] = token.reshape(-1)
        labels = labels[flat_parent].copy()
        crit = jax.tree.map(lambda x: x[jnp.asarray(flat_parent)], crit)
        lengths = lengths[flat_parent] + (~prev_done).astype(np.int32)
        done = prev_done | (token.reshape(-1) == EOS)
        scores = top_s.reshape(-1).astype(np.float32)
    if length_penalty > 0.0:
        lp = ((5.0 + lengths.astype(np.float32)) / 6.0) ** length_penalty
        ranked = scores / lp
    else:
        ranked = scores
    best = np.argmax(ranked.reshape(Bn, W), axis=1)
    rows = np.arange(Bn) * W + best
    return trg[rows], scores[rows]


@pytest.mark.parametrize("lp", [0.0, 1.0])
def test_beam_matches_numpy_reference(setup, lp):
    model, params, feats, masks_src = setup
    W = 3
    toks, scores = beam_decode(model, params, feats, masks_src, MAX_LEN,
                               BOS, EOS, PAD, beam_width=W,
                               length_penalty=lp)
    ref_toks, ref_scores = _ref_beam(model, params, feats, masks_src,
                                     MAX_LEN, W, length_penalty=lp)
    np.testing.assert_array_equal(np.asarray(toks), ref_toks)
    np.testing.assert_allclose(np.asarray(scores), ref_scores,
                               rtol=1e-4, atol=1e-4)


def test_beam_fast_matches_full_buffer(setup):
    """The incremental (KV-cached, cache-reindexing) beam is token-exact
    with the full-buffer beam."""
    model, params, feats, masks_src = setup
    toks_f, s_f = beam_decode(model, params, feats, masks_src, MAX_LEN,
                              BOS, EOS, PAD, beam_width=3, use_fast=True)
    toks_s, s_s = beam_decode(model, params, feats, masks_src, MAX_LEN,
                              BOS, EOS, PAD, beam_width=3, use_fast=False)
    np.testing.assert_array_equal(np.asarray(toks_f), np.asarray(toks_s))
    np.testing.assert_allclose(np.asarray(s_f), np.asarray(s_s),
                               rtol=1e-4, atol=1e-4)


def test_beam_fast_matches_full_buffer_detr():
    """Fast beam on the DETR family (axis-0 cache gather, step_detr)."""
    from bmhrl_tpu.models.detr import DetrCaption

    model = DetrCaption(voc_size=20, d_model=64, d_model_caps=16, d_goal=8,
                        nhead=2, num_layers=1, n_time=2, dim_ff=32,
                        dtype=jnp.float32)
    rng = np.random.RandomState(5)
    feats = {
        "rgb": jnp.asarray(rng.rand(2, 8, 64), jnp.float32),
        "flow": jnp.asarray(rng.rand(2, 8, 64), jnp.float32),
        "audio": jnp.asarray(rng.rand(2, 10, 16), jnp.float32),
    }
    trg0 = jnp.full((2, 4), PAD, jnp.int32).at[:, 0].set(BOS)
    masks0 = make_masks(feats, trg0, "audio_video", PAD)
    k = jax.random.PRNGKey(1)
    params = jax.jit(model.init)(
        {"params": k, "dropout": k, "noise": k},
        (feats["rgb"] + feats["flow"], feats["audio"]), trg0, masks0)
    masks_src = make_masks(feats, None, "audio_video", PAD)
    toks_f, s_f = beam_decode(model, params, feats, masks_src, 6,
                              BOS, EOS, PAD, beam_width=3, use_fast=True)
    toks_s, s_s = beam_decode(model, params, feats, masks_src, 6,
                              BOS, EOS, PAD, beam_width=3, use_fast=False)
    np.testing.assert_array_equal(np.asarray(toks_f), np.asarray(toks_s))
    np.testing.assert_allclose(np.asarray(s_f), np.asarray(s_s),
                               rtol=1e-4, atol=1e-4)


def test_beam_fast_matches_full_buffer_unimodal():
    """Fast beam on the unimodal family (stacked uni fusion caches)."""
    from bmhrl_tpu.config import Config
    from bmhrl_tpu.models.unimodal import AudioAgent

    cfg = Config(B=2, mesh_shape=(1, 1), to_log=False, d_vid=16, d_aud=8,
                 d_model=16, d_model_caps=12, rl_att_heads=2,
                 rl_att_layers=1, rl_ff_v=16, rl_ff_a=8, rl_ff_c=16,
                 rl_goal_d=8)
    model = AudioAgent.build(cfg, 20, jnp.float32)
    rng = np.random.RandomState(9)
    feats = {
        "rgb": jnp.asarray(rng.rand(2, 6, 16), jnp.float32),
        "flow": jnp.asarray(rng.rand(2, 6, 16), jnp.float32),
        "audio": jnp.asarray(rng.rand(2, 9, 8), jnp.float32),
    }
    trg0 = jnp.full((2, 4), PAD, jnp.int32).at[:, 0].set(BOS)
    masks0 = make_masks(feats, trg0, "audio_video", PAD)
    k = jax.random.PRNGKey(2)
    params = jax.jit(model.init)(
        {"params": k, "dropout": k, "noise": k},
        (feats["rgb"] + feats["flow"], feats["audio"]), trg0, masks0)
    masks_src = make_masks(feats, None, "audio_video", PAD)
    toks_f, s_f = beam_decode(model, params, feats, masks_src, 6,
                              BOS, EOS, PAD, beam_width=3, use_fast=True)
    toks_s, s_s = beam_decode(model, params, feats, masks_src, 6,
                              BOS, EOS, PAD, beam_width=3, use_fast=False)
    np.testing.assert_array_equal(np.asarray(toks_f), np.asarray(toks_s))
    np.testing.assert_allclose(np.asarray(s_f), np.asarray(s_s),
                               rtol=1e-4, atol=1e-4)


def test_beam_share_memory_path_exact():
    """At folded-kernel-qualifying dims (draw % 128 == 0, S >= 64) the
    beam folds the beam axis into the kernel's query groups and reads
    each clip's memory ONCE per step — must stay token-exact with the
    full-buffer beam."""
    from bmhrl_tpu.ops import attention as fused_ops

    model = BMHrlAgent(
        voc_size=24, d_video=128, d_audio=128, d_model=128, d_model_caps=16,
        att_heads=2, att_layers=1, d_ff_v=32, d_ff_a=32, d_ff_c=16,
        d_goal=8, dtype=jnp.float32)
    rng = np.random.RandomState(11)
    feats = {
        "rgb": jnp.asarray(rng.rand(2, 64, 128), jnp.float32),
        "flow": jnp.asarray(rng.rand(2, 64, 128), jnp.float32),
        "audio": jnp.asarray(rng.rand(2, 64, 128), jnp.float32),
    }
    trg0 = jnp.full((2, 4), PAD, jnp.int32).at[:, 0].set(BOS)
    masks0 = make_masks(feats, trg0, "audio_video", PAD)
    k = jax.random.PRNGKey(4)
    params = jax.jit(model.init)(
        {"params": k, "dropout": k, "noise": k},
        (feats["rgb"] + feats["flow"], feats["audio"]), trg0, masks0)
    masks_src = make_masks(feats, None, "audio_video", PAD)
    # the share path must actually engage at these dims
    assert fused_ops.folded_qualifies(64, 128)
    toks_f, s_f = beam_decode(model, params, feats, masks_src, 5,
                              BOS, EOS, PAD, beam_width=2, use_fast=True)
    toks_s, s_s = beam_decode(model, params, feats, masks_src, 5,
                              BOS, EOS, PAD, beam_width=2, use_fast=False)
    np.testing.assert_array_equal(np.asarray(toks_f), np.asarray(toks_s))
    np.testing.assert_allclose(np.asarray(s_f), np.asarray(s_s),
                               rtol=1e-4, atol=1e-4)


def test_beam_score_is_sum_of_token_logprobs(setup):
    """The winning beam's reported score must equal the sum of its tokens'
    log-probs under teacher forcing of that same sequence."""
    model, params, feats, masks_src = setup
    toks, scores = beam_decode(model, params, feats, masks_src, MAX_LEN,
                               BOS, EOS, PAD, beam_width=3)
    toks = np.asarray(toks)
    # teacher-force the decoded sequence and accumulate chosen log-probs
    trg = jnp.asarray(toks)
    labels = np.zeros_like(toks)
    crit = model.apply(params, B, method="critic_init_state")
    total = np.zeros((B,), np.float32)
    ended = np.zeros((B,), bool)
    for t in range(MAX_LEN):
        score_t, crit = model.apply(params, trg[:, t], crit,
                                    method="critic_step")
        lab_t = (jax.nn.sigmoid(score_t) > model.critic_score_threshold)
        labels[:, t] = np.asarray(lab_t).astype(np.int32)
        masks = dict(masks_src)
        masks["C_mask"] = c_mask(trg, PAD)
        logits_t = model.apply(
            params, trg, jnp.asarray(labels), *model.apply(
                params, feats["rgb"] + feats["flow"], feats["audio"],
                masks_src, method="encode"),
            masks, t, exploration=False, method="decode_frontier",
            rngs={"noise": jax.random.PRNGKey(0)})
        step = np.asarray(logits_t)[np.arange(B), toks[:, t + 1]]
        total += np.where(ended, 0.0, step)
        ended |= toks[:, t + 1] == EOS
        if ended.all():
            break
    np.testing.assert_allclose(np.asarray(scores), total, rtol=1e-3,
                               atol=1e-3)
