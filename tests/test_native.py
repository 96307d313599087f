"""Native C++ METEOR aligner: build, parity with the Python scorer, speed."""
import time

import numpy as np
import pytest

from bmhrl_tpu import native


@pytest.fixture(scope="module")
def nat():
    if not native.available():
        pytest.skip("no C++ toolchain / build failed")
    return native.MeteorNative()


def test_native_matches_python_aligner(nat):
    """Exact+stem C++ path vs the Python MeteorScorer with wordnet disabled."""
    from bmhrl_tpu.eval.meteor import MeteorScorer

    py = MeteorScorer("nltk")
    py.wordnet = None  # force exact+stem only (same stages as native)
    cases = [
        (["a", "man", "is", "running", "fast"], ["a", "man", "runs", "quickly"]),
        (["the", "dog", "jumps"], ["the", "dog", "jumped", "high"]),
        (["hello"], ["world"]),
        (["x", "y", "z", "x", "y"], ["y", "x", "y"]),
    ]
    hyps = [h for h, _ in cases]
    refs = [r for _, r in cases]
    out = nat.prefix_rewards(hyps, refs)
    for b, (h, r) in enumerate(cases):
        for l in range(len(h)):
            want = py._single(h[: l + 1], r)
            np.testing.assert_allclose(
                out[b, l], want, rtol=1e-5, atol=1e-6,
                err_msg=f"case {b} prefix {l+1}")


def test_native_through_reward_scorer(nat):
    from bmhrl_tpu.train.rewards import MeteorReward

    itos = ["<unk>", "<blank>", "<s>", "</s>", "a", "man", "is", "running"]
    sc = MeteorReward(itos, 0.0, 0.0)
    pred = np.array([[4, 5, 6, 7]], np.int64)
    r = sc.raw_rewards(pred, ["a man is running"])
    assert r[0, -1] > 0.9
    if sc.native is not None:
        # python fallback path must agree
        sc2 = MeteorReward(itos, 0.0, 0.0)
        sc2.native = None
        r2 = sc2.raw_rewards(pred, ["a man is running"])
        np.testing.assert_allclose(r, r2, rtol=1e-4, atol=1e-5)


def test_native_speed(nat):
    rng = np.random.RandomState(0)
    words = [f"word{i}" for i in range(200)]
    hyps = [[words[i] for i in rng.randint(0, 200, 30)] for _ in range(16)]
    refs = [[words[i] for i in rng.randint(0, 200, 20)] for _ in range(16)]
    nat.prefix_rewards(hyps, refs)  # warm the stem cache
    t0 = time.time()
    for _ in range(10):
        nat.prefix_rewards(hyps, refs)
    per_batch = (time.time() - t0) / 10
    # B=16 x L=30 prefixes in well under 10 ms
    assert per_batch < 0.05, per_batch


def test_cider_native_matches_python():
    """C++ CIDEr vs the Python incremental scorer on identical inputs."""
    from bmhrl_tpu.train.rewards import CiderReward

    itos = ["<unk>", "<blank>", "<s>", "</s>"] + [f"w{i}" for i in range(30)]
    rng = np.random.RandomState(0)
    corpus = [[f"w{i}" for i in rng.randint(0, 30, 8)] for _ in range(50)]
    sc = CiderReward(itos, corpus, 0.0, 0.0)
    if sc.native is None:
        pytest.skip("native cider unavailable")
    pred = rng.randint(0, 34, (4, 12)).astype(np.int64)
    pred[1, 5] = 3  # eos mid-sequence
    pred[2, 0] = 3  # immediate eos -> -0.1
    trgs = [" ".join(f"w{i}" for i in rng.randint(0, 30, 6)) for _ in range(4)]
    got = sc.raw_rewards(pred, trgs)
    sc.native = None
    want = sc.raw_rewards(pred, trgs)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_cider_native_speed():
    from bmhrl_tpu.train.rewards import CiderReward

    itos = ["<unk>", "<blank>", "<s>", "</s>"] + [f"w{i}" for i in range(5000)]
    rng = np.random.RandomState(1)
    corpus = [[f"w{i}" for i in rng.randint(0, 5000, 12)] for _ in range(5000)]
    sc = CiderReward(itos, corpus, 0.0, 0.0)
    if sc.native is None:
        pytest.skip("native cider unavailable")
    pred = rng.randint(4, 5004, (16, 31)).astype(np.int64)
    trgs = [" ".join(f"w{i}" for i in rng.randint(0, 5000, 14))
            for _ in range(16)]
    sc.raw_rewards(pred, trgs)
    t0 = time.time()
    for _ in range(10):
        sc.raw_rewards(pred, trgs)
    per_batch = (time.time() - t0) / 10
    assert per_batch < 0.02, per_batch  # well under the 50ms python cost
