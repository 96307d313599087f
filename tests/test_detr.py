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
