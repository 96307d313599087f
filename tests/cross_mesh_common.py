"""Shared scaffolding for the cross-mesh equivalence suites
(test_cross_mesh_equivalence / _unimodal / _detr_proposal).

The contract all three assert: identical seeds + identical batch on
(1,1), (8,1) and (4,2) meshes must give the same losses, bit-equal
sampled/greedy tokens, and the same updated parameters — sharding is a
layout choice, not a semantics choice (SURVEY §2.13). Tolerances are
parameters because the families differ for documented reasons (the DETR
suite's conv/GroupNorm stacks carry a certified-benign reassociation
budget; see its module docstring).
"""
import jax
import jax.numpy as jnp
import numpy as np

from bmhrl_tpu.models.bmhrl import (BMManagerValueFunction,
                                    BMWorkerValueFunction)
from bmhrl_tpu.ops.masking import make_masks
from bmhrl_tpu.parallel import mesh as mesh_lib
from bmhrl_tpu.train.decode import decode
from bmhrl_tpu.train.steps import StepFactory

MESHES = [(1, 1), (8, 1), (4, 2)]


def run_stepfactory_case(model, cfg, batch, mesh_shape, B, Lc,
                         decode_len=6, value_dim=16):
    """One warmstart + value-warmstart + RL worker + RL manager step and a
    greedy decode under the given mesh, for any model the shared
    StepFactory drives (BMHrlAgent, UnimodalAgent). Every random input
    (init rng, step rngs, host 'scores') is fixed, so any cross-mesh
    difference comes from the sharding itself."""
    d, m = mesh_shape
    mesh = mesh_lib.make_mesh(mesh_shape, jax.devices()[: d * m])
    sf = StepFactory(cfg, model, BMWorkerValueFunction(value_dim),
                     BMManagerValueFunction(value_dim), emb_trainable=True)
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
                         decode_len, 2, 3, 1, greedy=True, use_fast=True)
        out["decode_tokens"] = np.asarray(toks)
        out["params"] = jax.tree.map(np.asarray, state.cap_params)
    return out


LOSS_KEYS = ("warmstart_loss", "wv_loss", "mv_loss", "rl_worker_loss",
             "rl_worker_value_loss", "rl_manager_loss",
             "rl_manager_value_loss")
TOKEN_KEYS = ("sampled_worker", "sampled_manager", "decode_tokens")


def assert_scalars_match(ref, got, keys, ms, rtol=2e-5, atol=1e-6):
    for key in keys:
        np.testing.assert_allclose(got[key], ref[key], rtol=rtol, atol=atol,
                                   err_msg=f"{key} diverges on mesh {ms}")


def assert_arrays_equal(ref, got, keys, ms):
    for key in keys:
        np.testing.assert_array_equal(
            got[key], ref[key],
            err_msg=f"{key} not bit-equal on mesh {ms}")


def assert_params_match(ref_params, got_params, ms, rtol=2e-5, atol=1e-6):
    flat_ref = jax.tree_util.tree_leaves_with_path(ref_params)
    flat_got = jax.tree.leaves(got_params)
    assert len(flat_ref) == len(flat_got)
    for (path, a), b in zip(flat_ref, flat_got):
        np.testing.assert_allclose(
            b, a, rtol=rtol, atol=atol,
            err_msg=f"param {jax.tree_util.keystr(path)} diverges on {ms}")
