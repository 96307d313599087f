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
