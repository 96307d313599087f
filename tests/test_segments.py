"""Golden tests: vectorized segment ops vs straightforward Python-loop
re-implementations of the reference semantics (bm_hrl_agent.py:415-429,
batched_meteor.py:19-36, util.py:54-89)."""
import numpy as np
import pytest

from bmhrl_tpu.ops import segments as S


def ref_expand_goals(x, mask):
    """DIRECT transcription of the reference's in-place loop
    (bm_hrl_agent.py:415-429), including its finalization quirks: the tail
    after a row's last boundary is zeroed only when a later row also has a
    boundary; boundary-less rows keep raw x (except row 0, which the
    ``old_b = 0`` initialization zeroes whenever a later row has the first
    boundary); an all-zero mask is a no-op."""
    x = x.copy()
    old_l = old_b = 0
    for b, l in np.argwhere(mask):  # torch.nonzero order (row-major)
        goal = x[b, l].copy()
        if b != old_b:
            x[old_b, old_l:] = 0
            old_l = 0
            old_b = b
        x[b, old_l:l + 1] = goal
        old_l = l + 1
    return x


def ref_segment_sum(reward, mask):
    B, L = reward.shape
    out = np.zeros_like(reward)
    for b in range(B):
        old_l = 0
        for l in range(L):
            if mask[b, l]:
                out[b, old_l:l + 1] = reward[b, old_l:l + 1].sum()
                old_l = l + 1
        out[b, old_l:] = 0
    return out


def ref_discounted(delta, gamma, n_step=100):
    B, L = delta.shape
    out = np.zeros_like(delta)
    for b in range(B):
        for i in range(L):
            acc = 0.0
            for k in range(i, min(L, i + n_step)):
                acc += (gamma ** (k - i)) * delta[b, k]
            out[b, i] = acc
    return out


def ref_discounted_segment(reward, mask, gamma):
    B, L = reward.shape
    out = np.zeros_like(reward)
    for b in range(B):
        bounds = [l for l in range(L) if mask[b, l]]
        old_l = 0
        for m, j in enumerate(bounds):
            v = 0.0
            for n, j2 in enumerate(bounds[m:]):
                v += (gamma ** n) * reward[b, j2]
            out[b, old_l:j + 1] = v
            old_l = j + 1
        out[b, old_l:] = 0
    return out


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def random_mask(rng, B, L, p=0.25):
    return (rng.rand(B, L) < p).astype(np.int32)


def test_next_boundary(rng):
    B, L = 4, 12
    m = random_mask(rng, B, L)
    nb = np.asarray(S.next_boundary(m))
    for b in range(B):
        for i in range(L):
            js = [j for j in range(i, L) if m[b, j]]
            assert nb[b, i] == (js[0] if js else L)


def test_expand_goals(rng):
    B, L, D = 3, 10, 5
    x = rng.randn(B, L, D).astype(np.float32)
    m = random_mask(rng, B, L)
    got = np.asarray(S.expand_goals(x, m))
    np.testing.assert_allclose(got, ref_expand_goals(x, m), rtol=1e-6)


def test_expand_goals_finalization_quirks(rng):
    """The reference loop's side effects: boundary-less rows keep raw x
    (except row 0), the LAST boundary-row keeps its raw tail, earlier
    boundary-rows get zeroed tails."""
    B, L, D = 4, 6, 3
    x = rng.randn(B, L, D).astype(np.float32)
    m = np.zeros((B, L), np.int32)
    m[1, 2] = 1  # boundary row, later boundary exists -> tail zeroed
    m[3, 1] = 1  # LAST boundary row -> raw tail kept
    # row 0: boundary-less, zeroed by the old_b=0 quirk; row 2: raw
    got = np.asarray(S.expand_goals(x, m))
    ref = ref_expand_goals(x, m)
    np.testing.assert_allclose(got, ref, rtol=1e-6)
    assert (ref[0] == 0).all()
    np.testing.assert_allclose(ref[2], x[2])
    assert (ref[1, 3:] == 0).all()
    np.testing.assert_allclose(ref[3, 2:], x[3, 2:])


def test_frontier_goal_matches_expand_goals(rng):
    """frontier_goal(x_t, label_t, hb) == expand_goals row t on a buffer
    whose labels beyond t are zero (the decode invariant)."""
    B, L, D = 4, 8, 3
    x = rng.randn(B, L, D).astype(np.float32)
    for t in (0, 3, 7):
        m = random_mask(rng, B, L)
        m[:, t + 1:] = 0
        full = np.asarray(S.expand_goals(x, m))
        got = np.asarray(S.frontier_goal(
            x[:, t:t + 1], m[:, t], m[:, :t + 1].any(axis=1)))
        np.testing.assert_allclose(got[:, 0], full[:, t], rtol=1e-6)


def test_segment_sum_expand(rng):
    B, L = 3, 11
    r = rng.randn(B, L).astype(np.float32)
    m = random_mask(rng, B, L)
    got = np.asarray(S.segment_sum_expand(r, m))
    np.testing.assert_allclose(got, ref_segment_sum(r, m), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("gamma", [0.0, 0.5, 0.8])
def test_discounted_return(rng, gamma):
    B, L = 3, 9
    d = rng.randn(B, L).astype(np.float32)
    got = np.asarray(S.discounted_return(d, gamma))
    np.testing.assert_allclose(got, ref_discounted(d, gamma), rtol=1e-5, atol=1e-6)


def test_discounted_return_nstep(rng):
    B, L = 2, 8
    d = rng.randn(B, L).astype(np.float32)
    got = np.asarray(S.discounted_return(d, 0.9, n_step=3))
    np.testing.assert_allclose(got, ref_discounted(d, 0.9, 3), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("gamma", [0.0, 0.8])
def test_discounted_segment_return(rng, gamma):
    B, L = 4, 12
    r = rng.randn(B, L).astype(np.float32)
    m = random_mask(rng, B, L, p=0.3)
    got = np.asarray(S.discounted_segment_return(r, m, gamma))
    np.testing.assert_allclose(
        got, ref_discounted_segment(r, m, gamma), rtol=1e-5, atol=1e-6)


def test_edge_no_boundaries():
    r = np.ones((2, 6), np.float32)
    m = np.zeros((2, 6), np.int32)
    assert np.asarray(S.segment_sum_expand(r, m)).sum() == 0
    assert np.asarray(S.discounted_segment_return(r, m, 0.9)).sum() == 0
    x = np.ones((2, 6, 3), np.float32)
    # all-zero mask: the reference loop never runs -> x is returned unchanged
    np.testing.assert_allclose(np.asarray(S.expand_goals(x, m)), x)


def test_edge_all_boundaries():
    B, L = 1, 5
    r = np.arange(L, dtype=np.float32)[None]
    m = np.ones((B, L), np.int32)
    np.testing.assert_allclose(np.asarray(S.segment_sum_expand(r, m)), r)
