"""Driver-contract tests: entry() shape check and dryrun_multichip on the
virtual 8-device CPU mesh; orbax TrainState roundtrip."""
import os
import subprocess
import sys

import jax
import numpy as np
import pytest


def test_dryrun_multichip_8():
    """Run the driver contract the way the driver does: a FRESH process.
    (In-process, the 8-device full-train-step compile segfaults XLA-CPU
    when it follows a long suite's worth of compilations — observed at the
    same spot across three full-suite runs, while the identical call in a
    fresh process passes every time. The subprocess also self-provisions
    the virtual mesh exactly like the driver invocation.)"""
    env = dict(os.environ)
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8").strip()
    r = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms', 'cpu'); "
         "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env, capture_output=True, text=True, timeout=1500)
    assert r.returncode == 0, f"dryrun failed:\n{r.stdout}\n{r.stderr}"
    assert "dryrun_multichip OK" in r.stdout
    assert "cross-mesh equivalence vs (1,1) certified" in r.stdout


def test_entry_compiles():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    out = np.asarray(out)
    assert out.ndim == 3 and np.isfinite(out).all()


def test_orbax_trainstate_roundtrip(tmp_path):
    import jax.numpy as jnp

    from bmhrl_tpu.config import Config
    from bmhrl_tpu.models.bmhrl import (
        BMHrlAgent, BMManagerValueFunction, BMWorkerValueFunction)
    from bmhrl_tpu.train.steps import StepFactory
    from bmhrl_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    cfg = Config(B=2, mesh_shape=(1, 1), to_log=False)
    model = BMHrlAgent(
        voc_size=20, d_video=8, d_audio=8, d_model=8, d_model_caps=8,
        att_heads=2, att_layers=1, d_ff_v=8, d_ff_a=8, d_ff_c=8, d_goal=8,
        dtype=jnp.float32)
    sf = StepFactory(cfg, model, BMWorkerValueFunction(8),
                     BMManagerValueFunction(8), emb_trainable=True)
    rng = np.random.RandomState(0)
    batch = {
        "rgb": rng.rand(2, 4, 8).astype(np.float32),
        "flow": rng.rand(2, 4, 8).astype(np.float32),
        "audio": rng.rand(2, 5, 8).astype(np.float32),
        "caption_idx": np.asarray([[2, 5, 3, 1], [2, 6, 3, 1]], np.int32),
    }
    state = sf.init_state(jax.random.PRNGKey(0), batch)
    save_checkpoint(str(tmp_path), state)
    abstract = jax.tree.map(np.asarray, state)
    restored = load_checkpoint(str(tmp_path), abstract)
    a = jax.tree.leaves(state)
    b = jax.tree.leaves(restored)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_prefetcher_staged_batch_shards_on_mesh():
    """Regression: shard_batch must re-shard batches the Prefetcher already
    staged as single-device jax.Arrays — skipping them left multi-chip
    training with an unsharded batch."""
    from bmhrl_tpu.data.dataset import Prefetcher
    from bmhrl_tpu.parallel import mesh as mesh_lib

    mesh = mesh_lib.make_mesh((4, 2), jax.devices()[:8])
    batch = {"rgb": np.ones((8, 4, 6), np.float32),
             "caption_idx": np.zeros((8, 5), np.int32),
             "video_ids": ["v"] * 8}
    # default staging (no sharding arg): single-device jax.Arrays
    (staged,) = list(Prefetcher(iter([dict(batch)]), depth=2))
    assert isinstance(staged["rgb"], jax.Array)
    out = mesh_lib.shard_batch(mesh, staged)
    data_sh = mesh_lib.batch_sharding(mesh)
    assert out["rgb"].sharding.is_equivalent_to(data_sh, out["rgb"].ndim)
    assert out["video_ids"] == ["v"] * 8
    # sharding-aware staging lands in the mesh layout directly
    (staged2,) = list(Prefetcher(iter([dict(batch)]), depth=2,
                                 sharding=data_sh))
    assert staged2["rgb"].sharding.is_equivalent_to(data_sh,
                                                    staged2["rgb"].ndim)
