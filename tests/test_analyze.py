"""Verbose/analyze diagnostic mode + Prefetcher coverage."""
import jax
import jax.numpy as jnp
import numpy as np

from bmhrl_tpu.data.dataset import Prefetcher
from bmhrl_tpu.train.analyze import analyze_batch, get_top_outliers
from tests.test_steps import CAPTIONS, ITOS, tiny_setup


def test_get_top_outliers():
    biased = np.array([[1.0, 1.0], [5.0, 5.0], [2.0, 2.0]])
    plain = np.zeros((3, 2))
    idx = get_top_outliers(biased, plain, 2)
    assert list(idx) == [1, 2]


def test_analyze_batch_runs():
    cfg, sf, scorer, batch = tiny_setup()
    state = sf.init_state(jax.random.PRNGKey(0), jax.tree.map(np.asarray, batch))
    out = analyze_batch(sf, state, scorer, batch, CAPTIONS, ITOS,
                        jax.random.PRNGKey(1))
    B, L = 2, 7
    for key in ("plain", "biased", "weighted", "score"):
        assert out[key].shape == (B, L), key
        assert np.isfinite(out[key]).all(), key
    assert out["outliers"].shape == (1,)


def test_prefetcher_order_and_exhaustion():
    items = list(range(20))
    got = list(Prefetcher(iter(items), depth=3))
    assert got == items
    # empty iterator terminates cleanly
    assert list(Prefetcher(iter([]), depth=2)) == []


def test_prefetcher_device_staging():
    """Numeric feature keys are staged to device in the worker thread;
    string metadata stays host-side untouched."""
    import jax

    batches = [{"rgb": np.ones((2, 3), np.float32),
                "caption_idx": np.zeros((2, 4), np.int32),
                "video_ids": ["a", "b"], "n_valid": 2}]
    (out,) = list(Prefetcher(iter(batches), depth=2))
    assert isinstance(out["rgb"], jax.Array)
    assert isinstance(out["caption_idx"], jax.Array)
    assert out["video_ids"] == ["a", "b"]
    assert out["n_valid"] == 2
