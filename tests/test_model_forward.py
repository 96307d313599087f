"""Shape/NaN smoke tests for the BMHRL agent forward pass."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bmhrl_tpu.models.bmhrl import (
    BMHrlAgent,
    BMManagerValueFunction,
    BMWorkerValueFunction,
)
from bmhrl_tpu.ops.masking import make_masks

VOC = 97
B, Sv, Sa, Lc = 2, 10, 14, 12


@pytest.fixture(scope="module")
def model_and_params():
    model = BMHrlAgent(
        voc_size=VOC, d_video=64, d_audio=32, d_model=64, d_model_caps=36,
        att_heads=2, att_layers=1, d_ff_v=64, d_ff_a=32, d_ff_c=64,
        dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    feats = {
        "rgb": jnp.ones((B, Sv, 64)),
        "audio": jnp.ones((B, Sa, 32)),
    }
    trg = jnp.full((B, Lc), 4, jnp.int32).at[:, 0].set(2)
    masks = make_masks(feats, trg, "audio_video", pad_idx=1)
    params = model.init(
        {"params": rng, "dropout": rng, "noise": rng},
        (feats["rgb"], feats["audio"]), trg, masks)
    return model, params, feats, trg, masks


def test_forward_shapes(model_and_params):
    model, params, feats, trg, masks = model_and_params
    pred, wf, mf, goals, seg = model.apply(
        params, (feats["rgb"], feats["audio"]), trg, masks)
    assert pred.shape == (B, Lc, VOC)
    assert wf.shape == (B, Lc, 36)
    assert mf.shape == (B, Lc, 36)
    assert goals.shape == (B, Lc, 64)
    assert seg.shape == (B, Lc)
    assert np.isfinite(np.asarray(pred)).all()
    # log-probs sum to 1 in prob space
    np.testing.assert_allclose(
        np.exp(np.asarray(pred, np.float64)).sum(-1), 1.0, rtol=1e-4)


def test_forward_jit_and_exploration(model_and_params):
    model, params, feats, trg, masks = model_and_params

    @jax.jit
    def fwd(p, rgb, audio, trg):
        return model.apply(
            p, (rgb, audio), trg, masks, exploration=True,
            deterministic=False,
            rngs={"dropout": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)})[0]

    pred = fwd(params, feats["rgb"], feats["audio"], trg)
    assert np.isfinite(np.asarray(pred)).all()


def test_mixed_prediction(model_and_params):
    model, params, feats, trg, masks = model_and_params
    out = model.apply(
        params, (feats["rgb"], feats["audio"]), (trg, trg), masks,
        mix_factor=jnp.asarray(0.3))
    assert out[0].shape == (B, Lc, VOC)


def test_value_functions(model_and_params):
    model, params, feats, trg, masks = model_and_params
    _, wf, mf, goals, _ = model.apply(
        params, (feats["rgb"], feats["audio"]), trg, masks)
    wv = BMWorkerValueFunction(36)
    mv = BMManagerValueFunction(36)
    wp = wv.init(jax.random.PRNGKey(0), (wf, goals))
    mp = mv.init(jax.random.PRNGKey(0), mf)
    assert wv.apply(wp, (wf, goals)).shape == (B, Lc, 1)
    assert mv.apply(mp, mf).shape == (B, Lc, 1)


def test_masked_positions_do_not_affect_earlier_logits(model_and_params):
    """Causality: changing token t+1 must not change logits at t."""
    model, params, feats, trg, masks = model_and_params
    base = np.asarray(model.apply(
        params, (feats["rgb"], feats["audio"]), trg, masks)[0])
    trg2 = trg.at[:, -1].set(5)
    pert = np.asarray(model.apply(
        params, (feats["rgb"], feats["audio"]), trg2, masks)[0])
    np.testing.assert_allclose(base[:, :-1], pert[:, :-1], atol=1e-5)
