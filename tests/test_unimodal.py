"""Unimodal (AHRL/VHRL) agent tests: shapes, step compatibility, decode."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bmhrl_tpu.config import Config
from bmhrl_tpu.models.bmhrl import BMManagerValueFunction, BMWorkerValueFunction
from bmhrl_tpu.models.unimodal import AudioAgent, UnimodalAgent, VideoAgent
from bmhrl_tpu.ops.masking import make_masks
from bmhrl_tpu.train.decode import decode
from bmhrl_tpu.train.rewards import CiderReward
from bmhrl_tpu.train.steps import StepFactory

VOC = 40
B, Sv, Sa, Lc = 2, 6, 9, 8


def tiny_cfg():
    return Config(B=2, mesh_shape=(1, 1), to_log=False, d_vid=16, d_aud=8,
                  d_model=16, d_model_caps=12, rl_att_heads=2, rl_att_layers=1,
                  rl_ff_v=16, rl_ff_a=8, rl_ff_c=16, rl_goal_d=8)


def batch_np():
    rng = np.random.RandomState(0)
    return {
        "rgb": rng.rand(B, Sv, 16).astype(np.float32),
        "flow": rng.rand(B, Sv, 16).astype(np.float32),
        "audio": rng.rand(B, Sa, 8).astype(np.float32),
        "caption_idx": np.asarray(
            [[2, 4, 5, 6, 3, 1, 1, 1], [2, 5, 6, 7, 8, 3, 1, 1]], np.int32),
    }


@pytest.mark.parametrize("family", [AudioAgent, VideoAgent])
def test_unimodal_forward_and_step(family):
    cfg = tiny_cfg()
    model = family.build(cfg, VOC, jnp.float32)
    assert isinstance(model, UnimodalAgent)
    sf = StepFactory(cfg, model, BMWorkerValueFunction(12),
                     BMManagerValueFunction(12), emb_trainable=True)
    b = batch_np()
    state = sf.init_state(jax.random.PRNGKey(0), b)
    bdev = {k: jnp.asarray(v) for k, v in b.items()}
    state, metrics, aux = sf.warmstart_step(state, bdev, jax.random.PRNGKey(0), 1e-3)
    assert np.isfinite(float(metrics["loss"]))
    assert aux["argmax"].shape == (B, Lc - 1)
    # RL worker step
    roll = sf.rl_rollout(state, bdev, jax.random.PRNGKey(1), True)
    itos = ["<unk>", "<blank>", "<s>", "</s>"] + [f"w{i}" for i in range(VOC - 4)]
    scorer = CiderReward(itos, [["w0", "w1"]] * 3, 0.0, 0.0)
    score, _ = scorer.delta_worker(np.asarray(roll["sampled"]), ["w0 w1", "w1 w2"])
    state, m2 = sf.rl_update(state, bdev, jax.random.PRNGKey(1), 1e-4,
                             roll, jnp.asarray(score), True)
    assert np.isfinite(float(m2["loss"]))


def test_unimodal_decode():
    cfg = tiny_cfg()
    model = VideoAgent.build(cfg, VOC, jnp.float32)
    b = batch_np()
    feats = {k: jnp.asarray(b[k]) for k in ("rgb", "flow", "audio")}
    masks_src = make_masks(feats, None, "audio_video", 1)
    trg = jnp.asarray(b["caption_idx"])
    masks = make_masks(feats, trg[:, :-1], "audio_video", 1)
    k = jax.random.PRNGKey(0)
    params = jax.jit(model.init)(
        {"params": k, "dropout": k, "noise": k},
        (feats["rgb"] + feats["flow"], feats["audio"]), trg[:, :-1], masks)
    toks, probs = decode(model, params, feats, masks_src, 6, 2, 3, 1)
    assert toks.shape == (B, 7)
    assert (np.asarray(toks)[:, 0] == 2).all()


@pytest.mark.parametrize("family", [AudioAgent, VideoAgent])
def test_unimodal_fast_decode_matches_full(family):
    """The incremental (stacked, folded cross-attention) unimodal decode
    must produce exactly the tokens of the full-buffer frontier path."""
    from bmhrl_tpu.train import decode as D

    cfg = tiny_cfg()
    model = family.build(cfg, VOC, jnp.float32)
    b = batch_np()
    feats = {k: jnp.asarray(b[k]) for k in ("rgb", "flow", "audio")}
    masks_src = make_masks(feats, None, "audio_video", 1)
    trg = jnp.asarray(b["caption_idx"])
    masks = make_masks(feats, trg[:, :-1], "audio_video", 1)
    k = jax.random.PRNGKey(0)
    params = jax.jit(model.init)(
        {"params": k, "dropout": k, "noise": k},
        (feats["rgb"] + feats["flow"], feats["audio"]), trg[:, :-1], masks)
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
