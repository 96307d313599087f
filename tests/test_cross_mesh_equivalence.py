"""Cross-mesh numerical equivalence: the sharded training/decode steps must
compute the SAME numbers on (1,1), (8,1) and (4,2) meshes.

This is the actual correctness claim behind "DP == DataParallel semantics"
(SURVEY §2.13; ref: scripts/train_rl_captioning_module.py:95-99): sharding
the batch over the data axis and the wide kernels over the model axis is a
layout choice, not a semantics choice. Identical seeds + identical batch on
different mesh shapes must give the same warmstart loss, RL losses, updated
parameters, and greedy-decode tokens, up to fp32 reduction reassociation.

Runs on the 8-device virtual CPU mesh from conftest.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bmhrl_tpu.config import Config
from bmhrl_tpu.models.bmhrl import (BMHrlAgent, BMManagerValueFunction,
                                    BMWorkerValueFunction)
from bmhrl_tpu.ops.masking import make_masks
from bmhrl_tpu.parallel import mesh as mesh_lib
from bmhrl_tpu.train.decode import decode
from bmhrl_tpu.train.steps import StepFactory

B, Sv, Sa, Lc, VOC = 8, 8, 12, 9, 64

MESHES = [(1, 1), (8, 1), (4, 2)]


def _model():
    return BMHrlAgent(
        voc_size=VOC, d_video=32, d_audio=16, d_model=32, d_model_caps=16,
        att_heads=2, att_layers=1, d_ff_v=32, d_ff_a=16, d_ff_c=32,
        d_goal=8, dtype=jnp.float32)


def _batch():
    rng = np.random.RandomState(7)
    cap = np.full((B, Lc), 1, np.int32)
    cap[:, 0] = 2
    cap[:, 1:6] = rng.randint(4, VOC, (B, 5))
    cap[:, 6] = 3
    return {
        "rgb": rng.rand(B, Sv, 32).astype(np.float32),
        "flow": rng.rand(B, Sv, 32).astype(np.float32),
        "audio": rng.rand(B, Sa, 16).astype(np.float32),
        "caption_idx": cap,
    }


def _run_all_steps(mesh_shape):
    """One warmstart + value-warmstart + RL worker + RL manager step and a
    greedy decode, all under the given mesh. Every random input (init rng,
    step rngs, host 'scores') is fixed, so any cross-mesh difference comes
    from the sharding itself."""
    d, m = mesh_shape
    mesh = mesh_lib.make_mesh(mesh_shape, jax.devices()[: d * m])
    cfg = Config(B=B // d, mesh_shape=mesh_shape, to_log=False,
                 compute_dtype="float32")
    model = _model()
    sf = StepFactory(cfg, model, BMWorkerValueFunction(16),
                     BMManagerValueFunction(16), emb_trainable=True)
    batch = _batch()
    out = {}
    with mesh:
        state = sf.init_state(jax.random.PRNGKey(0), batch)
        rules = mesh_lib.param_sharding_rules(mesh, state.cap_params)
        state = state._replace(
            cap_params=jax.device_put(state.cap_params, rules))
        bdev = mesh_lib.shard_batch(mesh, batch)
        k = jax.random.PRNGKey(1)

        state, metrics, aux = sf.warmstart_step(state, bdev, k, 1e-3)
        out["warmstart_loss"] = float(metrics["loss"])

        w_score = jnp.asarray(
            np.random.RandomState(3).rand(B, Lc - 1).astype(np.float32))
        state, vm = sf.value_warmstart_step(
            state, aux["wf"], aux["mf"], w_score, w_score,
            aux["token_mask"], aux["seg"])
        out["wv_loss"] = float(vm["wv_loss"])
        out["mv_loss"] = float(vm["mv_loss"])

        for name, tw in (("worker", True), ("manager", False)):
            roll = sf.rl_rollout(state, bdev, k, tw)
            out[f"sampled_{name}"] = np.asarray(roll["sampled"])
            score = jnp.asarray(
                np.random.RandomState(5).rand(B, Lc - 1).astype(np.float32))
            state, m2 = sf.rl_update(state, bdev, k, 1e-3, roll, score, tw)
            out[f"rl_{name}_loss"] = float(m2["loss"])
            out[f"rl_{name}_value_loss"] = float(m2["value_loss"])

        feats = {kk: bdev[kk] for kk in ("rgb", "flow", "audio")}
        masks_src = make_masks(feats, None, "audio_video", 1)
        toks, _ = decode(model, state.cap_params, feats, masks_src,
                         6, 2, 3, 1, greedy=True, use_fast=True)
        out["decode_tokens"] = np.asarray(toks)
        out["params"] = jax.tree.map(np.asarray, state.cap_params)
    return out


@pytest.fixture(scope="module")
def runs():
    yield {ms: _run_all_steps(ms) for ms in MESHES}
    # free this module's pile of sharded executables — letting them
    # accumulate has preceded XLA-CPU compile segfaults later in the suite
    jax.clear_caches()


@pytest.mark.parametrize("ms", MESHES[1:])
def test_losses_match_single_device(runs, ms):
    ref, got = runs[(1, 1)], runs[ms]
    for key in ("warmstart_loss", "wv_loss", "mv_loss", "rl_worker_loss",
                "rl_worker_value_loss", "rl_manager_loss",
                "rl_manager_value_loss"):
        np.testing.assert_allclose(got[key], ref[key], rtol=2e-5, atol=1e-6,
                                   err_msg=f"{key} diverges on mesh {ms}")


@pytest.mark.parametrize("ms", MESHES[1:])
def test_sampled_and_decode_tokens_match(runs, ms):
    ref, got = runs[(1, 1)], runs[ms]
    np.testing.assert_array_equal(got["sampled_worker"],
                                  ref["sampled_worker"])
    np.testing.assert_array_equal(got["sampled_manager"],
                                  ref["sampled_manager"])
    np.testing.assert_array_equal(got["decode_tokens"], ref["decode_tokens"])


@pytest.mark.parametrize("ms", MESHES[1:])
def test_updated_params_match(runs, ms):
    ref, got = runs[(1, 1)], runs[ms]
    flat_ref = jax.tree_util.tree_leaves_with_path(ref["params"])
    flat_got = jax.tree.leaves(got["params"])
    assert len(flat_ref) == len(flat_got)
    for (path, a), b in zip(flat_ref, flat_got):
        np.testing.assert_allclose(
            b, a, rtol=2e-5, atol=1e-6,
            err_msg=f"param {jax.tree_util.keystr(path)} diverges on {ms}")
