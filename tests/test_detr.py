"""DETR captioner tests: forward shapes, Hungarian matching, word loss,
train step, decode."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from bmhrl_tpu.config import Config
from bmhrl_tpu.models.bmhrl import BMManagerValueFunction, BMWorkerValueFunction
from bmhrl_tpu.models.detr import DetrCaption
from bmhrl_tpu.ops.masking import make_masks
from bmhrl_tpu.train import losses as L
from bmhrl_tpu.train.decode import decode
from bmhrl_tpu.train.rewards import CiderReward
from bmhrl_tpu.train.steps_detr import DetrStepFactory

VOC = 40
B, Sv, Sa, Lc = 2, 8, 10, 8


def tiny_model():
    return DetrCaption(voc_size=VOC, d_model=64, d_model_caps=16, d_goal=8,
                       nhead=2, num_layers=1, n_time=2, dim_ff=32,
                       dtype=jnp.float32)


def batch_np():
    rng = np.random.RandomState(0)
    return {
        "rgb": rng.rand(B, Sv, 64).astype(np.float32),
        "flow": rng.rand(B, Sv, 64).astype(np.float32),
        "audio": rng.rand(B, Sa, 16).astype(np.float32),
        "caption_idx": np.asarray(
            [[2, 4, 5, 6, 3, 1, 1, 1], [2, 5, 6, 7, 8, 3, 1, 1]], np.int32),
    }


@pytest.fixture(scope="module")
def setup():
    model = tiny_model()
    b = batch_np()
    feats = {k: jnp.asarray(v) for k, v in b.items() if k != "caption_idx"}
    trg = jnp.asarray(b["caption_idx"][:, :-1])
    masks = make_masks(feats, trg, "audio_video", 1)
    k = jax.random.PRNGKey(0)
    params = jax.jit(model.init)(
        {"params": k, "dropout": k, "noise": k},
        (feats["rgb"] + feats["flow"], feats["audio"]), trg, masks)
    return model, params, b, feats, trg, masks


def test_forward_six_tuple(setup):
    model, params, b, feats, trg, masks = setup
    out = model.apply(params, (feats["rgb"] + feats["flow"], feats["audio"]),
                      trg, masks)
    pred, wf, memory, goals, seg, pred_classes = out
    assert pred.shape == (B, Lc - 1, VOC)
    assert wf.shape == (B, Lc - 1, 16)
    assert pred_classes.shape == (B, 100, VOC + 1)
    assert np.isfinite(np.asarray(pred)).all()


def test_hungarian_match_semantics():
    rng = np.random.RandomState(0)
    logits = rng.randn(1, 5, 11).astype(np.float32)
    # force query 2 to love word 7
    logits[0, 2, 7] = 10.0
    targets = np.asarray([[7, 9, 1, 1]])
    tc = L.hungarian_match(logits, targets, pad_idx=1)
    assert tc.shape == (1, 5)
    assert tc[0, 2] == 7  # best query got its word
    assert (tc[0] == 10).sum() == 3  # unmatched queries -> "no word" class
    assert sorted(t for t in tc[0] if t != 10) == [7, 9]


def test_detr_word_loss_matches_torch():
    rng = np.random.RandomState(1)
    logits = rng.randn(2, 6, 9).astype(np.float32)
    tc = rng.randint(0, 9, (2, 6)).astype(np.int64)
    got = float(L.detr_word_loss(jnp.asarray(logits), jnp.asarray(tc)))
    w = torch.ones(9)
    w[-1] = 0.1
    want = F.cross_entropy(torch.tensor(logits).transpose(1, 2),
                           torch.tensor(tc), w).item()
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_detr_train_step(setup):
    model, params, b, feats, trg, masks = setup
    cfg = Config(B=2, mesh_shape=(1, 1), to_log=False)
    sf = DetrStepFactory(cfg, model, BMWorkerValueFunction(16),
                         BMManagerValueFunction(16), emb_trainable=True)
    state = sf.init_state(jax.random.PRNGKey(0), b)
    bdev = {k: jnp.asarray(v) for k, v in b.items()}
    roll = sf.detr_rollout(state, bdev, jax.random.PRNGKey(1))
    assert roll["sampled"].shape == (B, Lc - 1)
    itos = ["<unk>", "<blank>", "<s>", "</s>"] + [f"w{i}" for i in range(VOC - 4)]
    scorer = CiderReward(itos, [["w0", "w1"]] * 3, 0.0, 0.0)
    score, _ = scorer.delta_worker(np.asarray(roll["sampled"]),
                                   ["w0 w1", "w1 w2"])
    tc = sf.match_targets(roll["pred_classes"], roll["x_idx"])
    state, m = sf.detr_update(state, bdev, jax.random.PRNGKey(1), 1e-4,
                              roll["sampled"], jnp.asarray(score),
                              jnp.asarray(tc))
    for key in ("loss", "value_loss", "word_loss", "total_loss"):
        assert np.isfinite(float(m[key])), key
    # reinforce variant
    state, m2 = sf.reinforce_update(state, bdev, jax.random.PRNGKey(2), 1e-4,
                                    roll["sampled"], jnp.asarray(score))
    assert np.isfinite(float(m2["loss"]))


def test_detr_decode(setup):
    model, params, b, feats, trg, masks = setup
    masks_src = make_masks(feats, None, "audio_video", 1)
    toks, _ = decode(model, params, feats, masks_src, 6, 2, 3, 1, greedy=True)
    t = np.asarray(toks)
    assert t.shape == (B, 7)
    assert (t[:, 0] == 2).all()


def test_detr_fast_decode_matches_full(setup):
    """The incremental (KV-cached) DETR decode must produce exactly the
    tokens of the full-buffer frontier path (default use_manager=False /
    pre_goal_attention=False path)."""
    from bmhrl_tpu.train import decode as D

    model, params, b, feats, trg, masks = setup
    masks_src = make_masks(feats, None, "audio_video", 1)
    V = feats["rgb"] + feats["flow"]
    A = feats["audio"]
    Va, Av = model.apply(params, V, A, masks_src, method="encode")
    full_toks, full_probs = D._decode_loop(
        model, params, Va, Av, masks_src, B, 6, 2, 3, 1, True, None)
    fast_toks, fast_probs = D._decode_loop_fast(
        model, params, Va, Av, masks_src, B, 6, 2, 3, 1, True, None)
    np.testing.assert_array_equal(np.asarray(full_toks),
                                  np.asarray(fast_toks))
    np.testing.assert_allclose(np.asarray(full_probs),
                               np.asarray(fast_probs), rtol=1e-4, atol=1e-5)


# -- pre_goal_attention decode caching (VERDICT r2 item 9) -------------------

@pytest.fixture(scope="module")
def pg_setup():
    model = DetrCaption(voc_size=VOC, d_model=64, d_model_caps=16, d_goal=8,
                        nhead=2, num_layers=1, n_time=2, dim_ff=32,
                        pre_goal_attention=True, dtype=jnp.float32)
    b = batch_np()
    feats = {k: jnp.asarray(v) for k, v in b.items() if k != "caption_idx"}
    trg = jnp.asarray(b["caption_idx"][:, :-1])
    masks = make_masks(feats, trg, "audio_video", 1)
    k = jax.random.PRNGKey(0)
    params = jax.jit(model.init)(
        {"params": k, "dropout": k, "noise": k},
        (feats["rgb"] + feats["flow"], feats["audio"]), trg, masks)
    return model, params, b, feats, trg, masks


def test_pre_goal_cached_features_exact(pg_setup):
    """caption_features with per-clip precomputed memory/object K/V must
    reproduce the uncached path: the cache only folds deterministic
    projections of static inputs (the goal stream stays live)."""
    model, params, b, feats, trg, masks = pg_setup
    masks_src = make_masks(feats, None, "audio_video", 1)
    V = feats["rgb"] + feats["flow"]
    Va, Av = model.apply(params, V, feats["audio"], masks_src,
                         method="encode")
    fkv = model.apply(params, Va, Av, method="precompute_fusion_kv")
    assert set(fkv) == {"worker_mem", "worker_obj", "manager_mem"}
    want = model.apply(params, trg, Va, Av, masks,
                       method="caption_features")
    got = model.apply(params, trg, Va, Av, masks, fusion_kv=fkv,
                      method="caption_features")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_pre_goal_decode_runs_with_cache(pg_setup):
    """End-to-end pre_goal decode (frontier loop, which now feeds
    fusion_kv) emits a valid token buffer."""
    model, params, b, feats, trg, masks = pg_setup
    masks_src = make_masks(feats, None, "audio_video", 1)
    toks, probs = decode(model, params, feats, masks_src, 6, 2, 3, 1,
                         greedy=True)
    t = np.asarray(toks)
    assert t.shape == (B, 7) and (t[:, 0] == 2).all()
    assert np.isfinite(np.asarray(probs)).all()


def test_default_detr_cached_frontier_exact(setup):
    """The default (non-pre_goal) frontier loop also consumes fusion_kv
    now; its tokens must stay identical to the incremental-path tokens
    (which test_detr_fast_decode_matches_full ties to the full path)."""
    from bmhrl_tpu.train import decode as D

    model, params, b, feats, trg, masks = setup
    masks_src = make_masks(feats, None, "audio_video", 1)
    V = feats["rgb"] + feats["flow"]
    Va, Av = model.apply(params, V, feats["audio"], masks_src,
                         method="encode")
    frontier_toks, _ = D._decode_loop(
        model, params, Va, Av, masks_src, B, 6, 2, 3, 1, True, None)
    fast_toks, _ = D._decode_loop_fast(
        model, params, Va, Av, masks_src, B, 6, 2, 3, 1, True, None)
    np.testing.assert_array_equal(np.asarray(frontier_toks),
                                  np.asarray(fast_toks))


def test_detr_trains_on_zero_feature_batch():
    """Missing-feature clips are zero-filled (data/features.py); a batch of
    them must NOT produce non-finite params. Guards two fixes: torch-style
    nonzero conv bias init (conv(0) == 0 exactly kept the whole stack at
    zero variance, whose normalization backward overflows), and the
    non-finite-norm guard in clip_by_global_norm."""
    model = tiny_model()
    b = batch_np()
    b["rgb"][:] = 0.0
    b["flow"][:] = 0.0
    b["audio"][:] = 0.0
    cfg = Config(B=2, mesh_shape=(1, 1), to_log=False)
    sf = DetrStepFactory(cfg, model, BMWorkerValueFunction(16),
                         BMManagerValueFunction(16), emb_trainable=True)
    state = sf.init_state(jax.random.PRNGKey(0), b)
    bdev = {k: jnp.asarray(v) for k, v in b.items()}
    k = jax.random.PRNGKey(1)
    for it in range(2):
        roll = sf.detr_rollout(state, bdev, k)
        pc = np.asarray(roll["pred_classes"])
        assert np.isfinite(pc).all(), f"iter {it}: pred_classes non-finite"
        tc = sf.match_targets(roll["pred_classes"], roll["x_idx"])
        score = jnp.zeros(roll["sampled"].shape, jnp.float32)
        state, m = sf.detr_update(state, bdev, k, 1e-4, roll["sampled"],
                                  score, jnp.asarray(tc))
    bad = [jax.tree_util.keystr(p) for p, x in
           jax.tree_util.tree_leaves_with_path(state.cap_params)
           if not bool(jnp.isfinite(x).all())]
    assert not bad, f"non-finite params after update: {bad[:5]}"


def test_clip_guard_drops_nonfinite_grads():
    from bmhrl_tpu.train.optim import clip_by_global_norm

    good = {"a": jnp.ones((3,)), "b": jnp.full((2,), 2.0)}
    out = clip_by_global_norm(good, 1.0)
    norm = float(np.sqrt(3 * 1 + 2 * 4))
    np.testing.assert_allclose(np.asarray(out["a"]), 1.0 / (norm + 1e-6),
                               rtol=1e-5)
    for poison in (jnp.nan, jnp.inf):
        bad = {"a": jnp.ones((3,)).at[0].set(poison), "b": good["b"]}
        out = clip_by_global_norm(bad, 1.0)
        for leaf in jax.tree.leaves(out):
            np.testing.assert_array_equal(np.asarray(leaf), 0.0)
