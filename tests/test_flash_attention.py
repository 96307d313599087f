"""Pallas flash attention vs XLA reference path (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bmhrl_tpu.models.attention import scaled_dot_attention
from bmhrl_tpu.ops import attention as fused

B, H, D = 2, 2, 128


@pytest.fixture(autouse=True)
def flash_on():
    fused.enable_flash(True)
    yield
    fused.enable_flash(False)


@pytest.mark.parametrize("Sq,Sk", [(64, 256), (100, 300), (31, 333)])
def test_flash_matches_xla(Sq, Sk):
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, H, Sq, D), jnp.float32)
    k = jnp.asarray(rng.randn(B, H, Sk, D), jnp.float32)
    v = jnp.asarray(rng.randn(B, H, Sk, D), jnp.float32)
    # key pad mask with ragged lengths
    lens = [Sk, Sk - 37]
    mask = np.zeros((B, 1, 1, Sk), bool)
    for b, L in enumerate(lens):
        mask[b, :, :, :L] = True
    mask = jnp.asarray(mask)
    want = np.asarray(scaled_dot_attention(q, k, v, mask))
    got = np.asarray(fused.flash_attention(q, k, v, mask))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_flash_no_mask():
    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.randn(1, 1, 32, D), jnp.float32)
    k = jnp.asarray(rng.randn(1, 1, 256, D), jnp.float32)
    v = jnp.asarray(rng.randn(1, 1, 256, D), jnp.float32)
    want = np.asarray(scaled_dot_attention(q, k, v, None))
    got = np.asarray(fused.flash_attention(q, k, v, None))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_qualify_gate():
    assert not fused.flash_qualifies(31, 100, 128)   # short keys
    assert not fused.flash_qualifies(31, 512, 100)   # unaligned d_k
    assert fused.flash_qualifies(31, 512, 256)
    # 128-key sources qualify since the floor dropped to 128 (measured on
    # the batch-tiled grid: 1.34x at B=1024 Sv=128 — ops/attention.py)
    assert fused.flash_qualifies(31, 128, 256)
    fused.enable_flash(False)
    assert not fused.flash_qualifies(31, 512, 256)


class TestStreamingKernel:
    """K/V-streaming (online-softmax) flash variant: parity with the
    one-pass kernel / XLA path, and the auto-dispatch gate."""

    def _bsd(self, rng, B, Sq, Sk, HD, qscale=0.2):
        # qscale keeps logits O(1): with raw randn the logit std is
        # ~sqrt(d)=11 and any f32 score noise is exponentially amplified
        # near-tied keys (measured ~1e-3 on ALL paths incl. pure XLA vs a
        # float64 oracle) — that tests the data, not the kernel.
        q = jnp.asarray(rng.randn(B, Sq, HD) * qscale, jnp.float32)
        k = jnp.asarray(rng.randn(B, Sk, HD), jnp.float32)
        v = jnp.asarray(rng.randn(B, Sk, HD), jnp.float32)
        return q, k, v

    def _xla_ref(self, q, k, v, mask, H, causal=False):
        m4 = None if mask is None else (mask > 0)[:, None, None, :]
        p = fused._xla_attention_probs(
            fused._heads_of(q, H), fused._heads_of(k, H), m4, causal)
        return np.asarray(fused._unheads(
            jnp.einsum("bhqk,bhkd->bhqd", p, fused._heads_of(v, H))))

    @pytest.mark.parametrize("causal", [False, True])
    def test_stream_matches_xla(self, causal):
        rng = np.random.RandomState(0)
        B, Sq, Sk, H, HD = 2, 16, 300, 2, 256
        q, k, v = self._bsd(rng, B, Sq, Sk, HD)
        mask = np.ones((B, Sk), np.int32)
        mask[1, 250:] = 0
        mask = jnp.asarray(mask)
        stiles = fused._pick_stream_tiles(B, 16, 384, HD, 4, 8)
        assert stiles is not None
        got = np.asarray(fused._flash_stream_call(q, k, v, mask, H, causal,
                                                  stiles))
        want = self._xla_ref(q, k, v, mask, H, causal)
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    def test_stream_matches_one_pass_on_hot_logits(self):
        """Unscaled logits (std ~11): both kernels must stay within the
        inherent f32 exponential-amplification band of each other."""
        rng = np.random.RandomState(1)
        B, Sq, Sk, H, HD = 2, 16, 300, 2, 256
        q, k, v = self._bsd(rng, B, Sq, Sk, HD, qscale=1.0)
        mask = jnp.ones((B, Sk), jnp.int32)
        old = fused._STREAM_MODE
        try:
            fused._STREAM_MODE = "off"
            one = np.asarray(fused._flash_bsd_call(q, k, v, mask, H, False))
            fused._STREAM_MODE = "on"
            st = np.asarray(fused._flash_bsd_call(q, k, v, mask, H, False))
        finally:
            fused._STREAM_MODE = old
        np.testing.assert_allclose(st, one, rtol=2e-3, atol=2e-3)

    def test_fully_masked_rows_match_one_pass(self):
        """Rows with zero valid keys (production reality: zero-filled
        missing features make the channel-0-vs-pad mask all-False): both
        kernels emit the mean of V over the ACTUAL key range — the XLA
        path's uniform-softmax-over--1e9 convention — independent of how
        each kernel pads the keys (one-pass pads Sk to 384, streaming here
        to a multiple of its k-block)."""
        rng = np.random.RandomState(2)
        B, Sq, Sk, H, HD = 2, 8, 300, 2, 256
        q, k, v = self._bsd(rng, B, Sq, Sk, HD)
        mask = jnp.asarray(
            np.stack([np.ones(Sk), np.zeros(Sk)]).astype(np.int32))
        stiles = fused._pick_stream_tiles(B, 8, 384, HD, 4, 8)
        got = np.asarray(fused._flash_stream_call(q, k, v, mask, H, False,
                                                  stiles))
        old = fused._STREAM_MODE
        try:
            fused._STREAM_MODE = "off"
            one = np.asarray(fused._flash_bsd_call(q, k, v, mask, H, False))
        finally:
            fused._STREAM_MODE = old
        want = self._xla_ref(q, k, v, mask, H)
        np.testing.assert_allclose(got, one, rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(one, want, rtol=2e-4, atol=2e-4)

    def test_auto_gate_streams_only_when_one_pass_cannot_run(self):
        """auto uses streaming as coverage only: it dispatches exactly when
        NO one-pass tiling fits VMEM. The 2026-08-19 re-measurement (two
        runs, tools/flash_site_ab.py) showed one-pass beating every
        streaming config 1.6-2.8x even at the bt=1 long-source sites the
        streaming kernel was built for; the r3 snapshot's bt-improvement
        gate regressed the long-source encoder 108 -> 180 ms and the
        headline bench ~9%."""
        # every model site (bf16): one-pass fits -> never stream
        for shape in [(256, 304, 896), (256, 800, 896), (256, 304, 384),
                      (1024, 128, 256), (32, 304, 896)]:
            B, Sq_pad, Sk_pad = shape
            t = fused._pick_tiles(B, Sq_pad, Sk_pad, 1024, 2, 16)
            s = fused._pick_stream_tiles(B, Sq_pad, Sk_pad, 1024, 2, 16)
            assert t is not None, shape
            assert not fused._stream_wins(t, s), shape
        # f32 long-audio self-attention (Sk_pad=896, itemsize 4): one-pass
        # K/V blocks alone exceed the budget -> streaming is the coverage
        # path (beats the unfused XLA fallback)
        t = fused._pick_tiles(256, 896, 896, 1024, 4, 8)
        s = fused._pick_stream_tiles(256, 896, 896, 1024, 4, 8)
        assert t is None and s is not None
        assert fused._stream_wins(t, s)
        assert not fused._stream_wins(None, None)


def test_mha_module_uses_flash_consistently():
    """MHA output with flash on == flash off (same params, eval mode)."""
    from bmhrl_tpu.models.attention import MultiheadedAttention

    m = MultiheadedAttention(64, 48, 48, 2, 0.0, 256, dtype=jnp.float32)
    rng = np.random.RandomState(2)
    Q = jnp.asarray(rng.randn(2, 10, 64), jnp.float32)
    K = jnp.asarray(rng.randn(2, 300, 48), jnp.float32)
    V = jnp.asarray(rng.randn(2, 300, 48), jnp.float32)
    mask = jnp.ones((2, 1, 300), bool).at[1, :, 250:].set(False)
    params = m.init(jax.random.PRNGKey(0), Q, K, V, mask)
    fused.enable_flash(False)
    base = np.asarray(m.apply(params, Q, K, V, mask))
    fused.enable_flash(True)
    flash = np.asarray(m.apply(params, Q, K, V, mask))
    np.testing.assert_allclose(flash, base, rtol=2e-4, atol=2e-4)


def test_flash_gradients_match_xla():
    """custom VJP: grads through flash == grads through the XLA path."""
    rng = np.random.RandomState(3)
    q = jnp.asarray(rng.randn(1, 2, 16, D), jnp.float32)
    k = jnp.asarray(rng.randn(1, 2, 300, D), jnp.float32)
    v = jnp.asarray(rng.randn(1, 2, 300, D), jnp.float32)
    mask = jnp.ones((1, 1, 1, 300), bool).at[0, :, :, 250:].set(False)

    def loss_flash(q, k, v):
        return jnp.sum(fused.flash_attention(q, k, v, mask) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(scaled_dot_attention(q, k, v, mask) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3)


def test_folded_attend_kernel_matches_xla():
    """Decode-side fused folded attention (Pallas, interpret on CPU) must
    match the plain XLA contraction it replaces."""
    rng = np.random.RandomState(4)
    B, G, S, draw = 3, 8, 130, 128  # S >= 64 and draw % 128 == 0 -> kernel
    q = jnp.asarray(rng.randn(B, G, draw), jnp.float32)
    mem = jnp.asarray(rng.randn(B, S, draw), jnp.float32)
    mask = jnp.ones((B, S), bool).at[1, 100:].set(False)
    scale = 0.0625
    assert fused.folded_qualifies(S, draw)  # kernel is default-on
    out = np.asarray(fused.folded_attend(q, mem, mask, scale))

    s = np.einsum("bgk,bsk->bgs", np.asarray(q) * scale, np.asarray(mem))
    s = np.where(np.asarray(mask)[:, None, :], s, -1e9)
    p = np.exp(s - s.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    ref = np.einsum("bgs,bsk->bgk", p, np.asarray(mem))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_flash_bsd_vmem_fallback_matches(monkeypatch):
    """When no (bt, bq) tile fits the VMEM budget, _flash_bsd_call must
    fall back to plain XLA attention with identical semantics (exercised
    by shrinking the budget so every tile config is rejected)."""
    rng = np.random.RandomState(7)
    B, Sq, Sk, H, d = 2, 16, 300, 2, 128
    q = jnp.asarray(rng.randn(B, Sq, H * d), jnp.float32)
    k = jnp.asarray(rng.randn(B, Sk, H * d), jnp.float32)
    v = jnp.asarray(rng.randn(B, Sk, H * d), jnp.float32)
    mask = jnp.ones((B, Sk), jnp.int32).at[0, 200:].set(0)
    want = np.asarray(fused.flash_attention_bsd(q, k, v, mask, H))
    monkeypatch.setattr(fused, "_VMEM_BUDGET", 1)
    assert fused._pick_tiles(B, 16, 384, H * d, 4, 8) is None
    got = np.asarray(fused.flash_attention_bsd(q, k, v, mask, H))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_folded_attend_small_batch_tile():
    """Long sources shrink the folded kernel's batch tile below 8 (the
    VMEM-aware pick); the (bt, 1, S) mask block must keep the kernel exact
    there (regression for the Mosaic tiling rule at bt < 8)."""
    rng = np.random.RandomState(8)
    B, G, S, draw = 5, 8, 800, 128
    q = jnp.asarray(rng.randn(B, G, draw), jnp.float32)
    mem = jnp.asarray(rng.randn(B, S, draw), jnp.float32)
    mask = jnp.ones((B, S), bool).at[2, 640:].set(False)
    out = np.asarray(fused.folded_attend(q, mem, mask, 0.1))
    s = np.einsum("bgk,bsk->bgs", np.asarray(q) * 0.1, np.asarray(mem))
    s = np.where(np.asarray(mask)[:, None, :], s, -1e9)
    p = np.exp(s - s.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    ref = np.einsum("bgs,bsk->bgk", p, np.asarray(mem))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)
