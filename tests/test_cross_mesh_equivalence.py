"""Cross-mesh numerical equivalence: the sharded training/decode steps must
compute the SAME numbers on (1,1), (8,1) and (4,2) meshes.

This is the actual correctness claim behind "DP == DataParallel semantics"
(SURVEY §2.13; ref: scripts/train_rl_captioning_module.py:95-99): sharding
the batch over the data axis and the wide kernels over the model axis is a
layout choice, not a semantics choice. Identical seeds + identical batch on
different mesh shapes must give the same warmstart loss, RL losses, updated
parameters, and greedy-decode tokens, up to fp32 reduction reassociation.

Runs on the 8-device virtual CPU mesh from conftest. Scaffolding shared
with the unimodal suite in cross_mesh_common.py.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bmhrl_tpu.config import Config
from bmhrl_tpu.models.bmhrl import BMHrlAgent
from cross_mesh_common import (LOSS_KEYS, MESHES, TOKEN_KEYS,
                               assert_arrays_equal, assert_params_match,
                               assert_scalars_match, run_stepfactory_case)

B, Sv, Sa, Lc, VOC = 8, 8, 12, 9, 64


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
    d, _ = mesh_shape
    cfg = Config(B=B // d, mesh_shape=mesh_shape, to_log=False,
                 compute_dtype="float32")
    return run_stepfactory_case(_model(), cfg, _batch(), mesh_shape, B, Lc)


@pytest.fixture(scope="module")
def runs():
    yield {ms: _run_all_steps(ms) for ms in MESHES}
    # free this module's pile of sharded executables — letting them
    # accumulate has preceded XLA-CPU compile segfaults later in the suite
    jax.clear_caches()


@pytest.mark.parametrize("ms", MESHES[1:])
def test_losses_match_single_device(runs, ms):
    assert_scalars_match(runs[(1, 1)], runs[ms], LOSS_KEYS, ms)


@pytest.mark.parametrize("ms", MESHES[1:])
def test_sampled_and_decode_tokens_match(runs, ms):
    assert_arrays_equal(runs[(1, 1)], runs[ms], TOKEN_KEYS, ms)


@pytest.mark.parametrize("ms", MESHES[1:])
def test_updated_params_match(runs, ms):
    assert_params_match(runs[(1, 1)]["params"], runs[ms]["params"], ms)
