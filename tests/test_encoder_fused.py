"""Fused encoder-layer Pallas ops (ops/encoder_fused.py) vs the plain
composition — interpret mode on CPU.

The fused path must be numerically interchangeable with the
ResidualConnection/MultiheadedAttention/PositionwiseFeedForward chain it
replaces (ref semantics: model/blocks.py:128-187, bm_hrl_agent.py:328-384):
the encoder A/B gate flips it on/off per run, so any drift would change
serving outputs between configurations.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.flatten_util import ravel_pytree

from bmhrl_tpu.ops import encoder_fused as enc


@pytest.fixture(autouse=True)
def fusion_on():
    enc.enable_encoder_fusion(True)
    yield
    enc.enable_encoder_fusion(False)


def _rand(rng, *shape):
    return jnp.asarray(rng.randn(*shape), jnp.float32)


# ---------------------------------------------------------------- kernels


def test_ln_matmul_matches_ref():
    rng = np.random.RandomState(0)
    R, D, Dout = 70, 128, 384  # R not a tile multiple -> exercises padding
    x = _rand(rng, R, D)
    g = _rand(rng, D) * 0.1 + 1.0
    b = _rand(rng, D) * 0.1
    w = _rand(rng, D, Dout) * 0.2
    bias = _rand(rng, Dout) * 0.1
    for relu in (False, True):
        got = np.asarray(enc.ln_matmul(x, g, b, w, bias, relu, jnp.float32))
        want = np.asarray(enc._ln_matmul_ref(x, g, b, w, bias, relu,
                                             jnp.float32))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_matmul_residual_matches_ref():
    rng = np.random.RandomState(1)
    R, D, Dout = 50, 256, 128
    y = _rand(rng, R, D)
    w = _rand(rng, D, Dout) * 0.2
    bias = _rand(rng, Dout) * 0.1
    x = _rand(rng, R, Dout)
    got = np.asarray(enc.matmul_residual(y, w, bias, x, jnp.float32))
    want = np.asarray(enc._matmul_residual_ref(y, w, bias, x, jnp.float32))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_proj_res_ffn_matches_ref():
    rng = np.random.RandomState(2)
    R, Din, D, Dff = 40, 256, 128, 384
    ctx = _rand(rng, R, Din)
    wo = _rand(rng, Din, D) * 0.2
    bo = _rand(rng, D) * 0.1
    x = _rand(rng, R, D)
    g = _rand(rng, D) * 0.1 + 1.0
    b = _rand(rng, D) * 0.1
    w1 = _rand(rng, D, Dff) * 0.2
    b1 = _rand(rng, Dff) * 0.1
    w2 = _rand(rng, Dff, D) * 0.2
    b2 = _rand(rng, D) * 0.1
    got = np.asarray(enc.proj_res_ffn(ctx, wo, bo, x, g, b, w1, b1, w2, b2,
                                      jnp.float32))
    want = np.asarray(enc._proj_res_ffn_ref(ctx, wo, bo, x, g, b, w1, b1,
                                            w2, b2, jnp.float32))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_kernel_gradients_match_ref():
    """custom VJP: grads through the fused ops == grads through the twins."""
    rng = np.random.RandomState(3)
    R, D, Dout = 24, 128, 256
    x = _rand(rng, R, D)
    g = _rand(rng, D) * 0.1 + 1.0
    b = _rand(rng, D) * 0.1
    w = _rand(rng, D, Dout) * 0.2
    bias = _rand(rng, Dout) * 0.1

    def loss_fused(x, g, b, w, bias):
        return jnp.sum(enc.ln_matmul(x, g, b, w, bias, False,
                                     jnp.float32) ** 2)

    def loss_ref(x, g, b, w, bias):
        return jnp.sum(enc._ln_matmul_ref(x, g, b, w, bias, False,
                                          jnp.float32) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(x, g, b, w, bias)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, g, b, w, bias)
    for a, c in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=2e-3, atol=2e-3)


def test_kernels_at_production_dims():
    """Flagship dims (video D=1024, merged QKV Dout=3072, FFN 1024; DETR
    Dff=2048) with few rows: exercises the exact VMEM tile-pick branches
    the serving shapes hit, in bf16 like production."""
    rng = np.random.RandomState(11)
    R = 48  # deliberately not a tile multiple
    x = jnp.asarray(rng.randn(R, 1024), jnp.float32)
    g = jnp.ones((1024,), jnp.float32)
    b = jnp.zeros((1024,), jnp.float32)
    w = jnp.asarray(rng.randn(1024, 3072) * 0.03, jnp.float32)
    bias = jnp.zeros((3072,), jnp.float32)
    got = np.asarray(enc.ln_matmul(x, g, b, w, bias, False, jnp.bfloat16),
                     np.float32)
    want = np.asarray(enc._ln_matmul_ref(x, g, b, w, bias, False,
                                         jnp.bfloat16), np.float32)
    np.testing.assert_allclose(got, want, atol=0.03 * np.abs(want).max())

    ctx = jnp.asarray(rng.randn(R, 1024), jnp.float32)
    wo = jnp.asarray(rng.randn(1024, 1024) * 0.03, jnp.float32)
    w1 = jnp.asarray(rng.randn(1024, 1024) * 0.03, jnp.float32)
    w2 = jnp.asarray(rng.randn(1024, 1024) * 0.03, jnp.float32)
    z = jnp.zeros((1024,), jnp.float32)
    got = np.asarray(enc.proj_res_ffn(ctx, wo, z, x, g, b, w1, z, w2, z,
                                      jnp.bfloat16), np.float32)
    want = np.asarray(enc._proj_res_ffn_ref(ctx, wo, z, x, g, b, w1, z,
                                            w2, z, jnp.bfloat16), np.float32)
    np.testing.assert_allclose(got, want, atol=0.03 * np.abs(want).max())

    wf1 = jnp.asarray(rng.randn(1024, 2048) * 0.03, jnp.float32)
    wf2 = jnp.asarray(rng.randn(2048, 1024) * 0.03, jnp.float32)
    zf = jnp.zeros((2048,), jnp.float32)
    got = np.asarray(enc.ffn_residual_ln(x, wf1, zf, wf2, z, g, b,
                                         jnp.bfloat16), np.float32)
    want = np.asarray(enc._ffn_residual_ln_ref(x, wf1, zf, wf2, z, g, b,
                                               jnp.bfloat16), np.float32)
    np.testing.assert_allclose(got, want, atol=0.03 * np.abs(want).max())


def test_vmem_fallback_to_xla_twin(monkeypatch):
    """When even a 16-row tile cannot fit VMEM (oversized dims), every
    fused op must fall back to its pure-XLA twin with identical semantics
    instead of failing at Mosaic compile time."""
    rng = np.random.RandomState(12)
    R, D, Dout = 24, 128, 256
    x = _rand(rng, R, D)
    g = _rand(rng, D) * 0.1 + 1.0
    b = _rand(rng, D) * 0.1
    w = _rand(rng, D, Dout) * 0.2
    bias = _rand(rng, Dout) * 0.1
    want = np.asarray(enc.ln_matmul(x, g, b, w, bias, False, jnp.float32))
    monkeypatch.setattr(enc, "_VMEM_BUDGET", 1)
    assert enc._pick_rows(10, 10, 16) is None
    got = np.asarray(enc.ln_matmul(x, g, b, w, bias, False, jnp.float32))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
    # post-norm FFN fallback too
    w2 = _rand(rng, Dout, D) * 0.2
    z = jnp.zeros((Dout,), jnp.float32)
    zd = jnp.zeros((D,), jnp.float32)
    out = np.asarray(enc.ffn_residual_ln(x, w, z, w2, zd, g, b, jnp.float32))
    monkeypatch.setattr(enc, "_VMEM_BUDGET", 12 * 1024 * 1024)
    ref = np.asarray(enc.ffn_residual_ln(x, w, z, w2, zd, g, b, jnp.float32))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_qualify_gate():
    assert enc.encoder_fusion_qualifies(1024, 128, 1024, 1024, 512)
    assert not enc.encoder_fusion_qualifies(1024, 100, 1024)  # unaligned
    enc.enable_encoder_fusion(False)
    assert not enc.encoder_fusion_qualifies(1024, 128, 1024)


# ----------------------------------------------- monolithic flash+epilogue


@pytest.fixture
def flash_on():
    from bmhrl_tpu.ops import attention as fatt

    fatt.enable_flash(True)
    yield
    fatt.enable_flash(False)


def _epi_inputs(Dq=256, Dff=384, H=2, d=128, B=2, Sq=20, Sk=130):
    rng = np.random.RandomState(20)
    HD = H * d
    q3 = _rand(rng, B, Sq, HD) * 0.3
    k3 = _rand(rng, B, Sk, HD) * 0.3
    v3 = _rand(rng, B, Sk, HD) * 0.3
    km = jnp.ones((B, Sk), jnp.int32).at[1, 100:].set(0)
    x = _rand(rng, B, Sq, Dq)
    wo = _rand(rng, HD, Dq) * 0.05
    bo = _rand(rng, Dq) * 0.1
    g = _rand(rng, Dq) * 0.1 + 1.0
    b = _rand(rng, Dq) * 0.1
    w1 = _rand(rng, Dq, Dff) * 0.05
    b1 = _rand(rng, Dff) * 0.1
    w2 = _rand(rng, Dff, Dq) * 0.05
    b2 = _rand(rng, Dq) * 0.1
    return q3, k3, v3, km, x, (wo, bo, g, b, w1, b1, w2, b2), H


def test_flash_mr_matches_ref(flash_on):
    q3, k3, v3, km, x, (wo, bo, *_), H = _epi_inputs()
    got = np.asarray(enc.flash_mr(q3, k3, v3, km, x, wo, bo, H, jnp.float32))
    want = np.asarray(enc._flash_mr_ref(q3, k3, v3, km, x, wo, bo, H,
                                        jnp.float32))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-3)


def test_flash_prf_matches_ref(flash_on):
    q3, k3, v3, km, x, w, H = _epi_inputs()
    got = np.asarray(enc.flash_prf(q3, k3, v3, km, x, *w, H, jnp.float32))
    want = np.asarray(enc._flash_prf_ref(q3, k3, v3, km, x, *w, H,
                                         jnp.float32))
    np.testing.assert_allclose(got, want, rtol=2e-3,
                               atol=5e-3 * np.abs(want).max())


def test_flash_mrl_matches_ref(flash_on):
    q3, k3, v3, km, x, (wo, bo, g, b, *_), H = _epi_inputs()
    got = np.asarray(enc.flash_mrl(q3, k3, v3, km, x, wo, bo, g, b, H,
                                   jnp.float32))
    want = np.asarray(enc._flash_mrl_ref(q3, k3, v3, km, x, wo, bo, g, b, H,
                                         jnp.float32))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_flash_epi_none_mask(flash_on):
    """key_mask=None means attend everywhere (incl. the Sk pad handling)."""
    q3, k3, v3, _, x, (wo, bo, *_), H = _epi_inputs()
    got = np.asarray(enc.flash_mr(q3, k3, v3, None, x, wo, bo, H,
                                  jnp.float32))
    want = np.asarray(enc._flash_mr_ref(q3, k3, v3, None, x, wo, bo, H,
                                        jnp.float32))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-3)


def test_flash_prf_production_dims_bf16(flash_on):
    """Flagship serving dims (video cross+FFN site: HD=1024, Dq=1024,
    Dff=1024) in bf16 — exercises the exact tile branch the headline shape
    hits, with resident weights near the VMEM budget."""
    q3, k3, v3, km, x, w, H = _epi_inputs(Dq=1024, Dff=1024, H=4, d=256,
                                          B=2, Sq=24, Sk=256)
    got = np.asarray(enc.flash_prf(q3, k3, v3, km, x, *w, H, jnp.bfloat16),
                     np.float32)
    want = np.asarray(enc._flash_prf_ref(q3, k3, v3, km, x, *w, H,
                                         jnp.bfloat16), np.float32)
    np.testing.assert_allclose(got, want, atol=0.04 * np.abs(want).max())


def test_flash_epi_grads_match_ref(flash_on):
    q3, k3, v3, km, x, w, H = _epi_inputs(Sq=8, Sk=128)

    def loss_fused(q3, x, wo):
        return jnp.sum(enc.flash_prf(q3, k3, v3, km, x, wo, *w[1:], H,
                                     jnp.float32) ** 2)

    def loss_ref(q3, x, wo):
        return jnp.sum(enc._flash_prf_ref(q3, k3, v3, km, x, wo, *w[1:], H,
                                          jnp.float32) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(q3, x, w[0])
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q3, x, w[0])
    for a, c in zip(gf, gr):
        scale = max(np.abs(np.asarray(c)).max(), 1e-6)
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   atol=5e-3 * scale)


def test_flash_epi_vmem_fallback(monkeypatch, flash_on):
    """When no tile fits, the monolithic ops fall back to the XLA twin."""
    q3, k3, v3, km, x, (wo, bo, *_), H = _epi_inputs()
    want = np.asarray(enc.flash_mr(q3, k3, v3, km, x, wo, bo, H,
                                   jnp.float32))
    monkeypatch.setattr(enc, "_VMEM_BUDGET", 1)
    assert enc._flash_epi_call("mr", q3, k3, v3, km, x, (wo, bo), H,
                               jnp.float32) is None
    got = np.asarray(enc.flash_mr(q3, k3, v3, km, x, wo, bo, H, jnp.float32))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-3)


def test_flash_epi_overflow_fails_qualify_gate():
    """At production prf dims with Sa=800 keys, full-Sk K/V blocks plus the
    ~6 MB of resident FFN weights overflow VMEM — _epi_tiles must say so, so
    the glue keeps the split flash + epilogue-op composition (the measured
    winner at Sv=300/Sa=800) instead of the wrappers' pure-XLA fallback."""
    D = 1024
    wts = (np.zeros((D, D)), np.zeros(D), np.zeros(D), np.zeros(D),
           np.zeros((D, D)), np.zeros(D), np.zeros((D, D)), np.zeros(D))
    assert enc._epi_tiles("prf", 256, 300, 800, D, D, wts,
                          jnp.bfloat16, jnp.float32, jnp.bfloat16) is None
    # ... while the headline shape (Sk=256) fits with room to spare
    assert enc._epi_tiles("prf", 1024, 128, 256, D, D, wts,
                          jnp.bfloat16, jnp.float32, jnp.bfloat16) is not None


def test_encoder_layer_monolithic_path_matches_plain(flash_on):
    """Layer-level: BOTH source lengths >= MIN_SK so every attention site
    routes through the monolithic kernels (self -> flash_mr, cross+FFN ->
    flash_prf); must match the plain composition with everything off."""
    from bmhrl_tpu.ops import attention as fatt

    layer = _layer(jnp.float32)
    rng = np.random.RandomState(21)
    B, Sv, Sa = 2, 136, 140
    x = (_rand(rng, B, Sv, 256), _rand(rng, B, Sa, 128))
    masks = (jnp.ones((B, 1, Sv), bool).at[0, :, 130:].set(False),
             jnp.ones((B, 1, Sa), bool).at[1, :, 120:].set(False))
    params = layer.init(jax.random.PRNGKey(0), x, masks)
    enc.enable_encoder_fusion(False)
    fatt.enable_flash(False)
    plain = layer.apply(params, x, masks, True)
    enc.enable_encoder_fusion(True)
    fatt.enable_flash(True)
    assert fatt.flash_qualifies(Sv, Sv, 128)
    att = layer.bind(params).self_att_M1
    po = att.linear_d2Q.variables["params"]
    assert enc._flash_epi_qualifies(
        att, "mr", B, Sv, Sv, x[0], jnp.float32, jnp.float32,
        (po["kernel"], po["bias"]))
    fused = layer.apply(params, x, masks, True)
    for a, b in zip(plain, fused):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-3, atol=2e-3)


# ----------------------------------------------------------- encoder layer


def _layer(dtype):
    from bmhrl_tpu.models.bmhrl import BMEncoderLayer

    return BMEncoderLayer(d_model_M1=256, d_model_M2=128, d_model=256,
                          d_ff_M1=256, d_ff_M2=128, dout_p=0.1, H=2,
                          dtype=dtype)


def _inputs():
    rng = np.random.RandomState(4)
    B, Sv, Sa = 2, 20, 36
    M1 = _rand(rng, B, Sv, 256)
    M2 = _rand(rng, B, Sa, 128)
    m1 = jnp.ones((B, 1, Sv), bool).at[1, :, 15:].set(False)
    m2 = jnp.ones((B, 1, Sa), bool).at[0, :, 30:].set(False)
    return (M1, M2), (m1, m2)


def test_encoder_layer_fused_matches_plain_f32():
    layer = _layer(jnp.float32)
    x, masks = _inputs()
    params = layer.init(jax.random.PRNGKey(0), x, masks)
    enc.enable_encoder_fusion(False)
    plain = layer.apply(params, x, masks, True)
    enc.enable_encoder_fusion(True)
    fused = layer.apply(params, x, masks, True)
    for a, b in zip(plain, fused):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=3e-4, atol=3e-4)


def test_encoder_layer_fused_matches_plain_bf16():
    """bf16 production dtype: agreement at bf16 rounding scale."""
    layer = _layer(jnp.bfloat16)
    x, masks = _inputs()
    params = layer.init(jax.random.PRNGKey(0), x, masks)
    enc.enable_encoder_fusion(False)
    plain = layer.apply(params, x, masks, True)
    enc.enable_encoder_fusion(True)
    fused = layer.apply(params, x, masks, True)
    for a, b in zip(plain, fused):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        scale = np.abs(a).max()
        np.testing.assert_allclose(b, a, atol=0.02 * scale)


def test_encoder_layer_fused_gradients_match():
    """Training through the fused path (custom VJPs) == plain-path grads."""
    layer = _layer(jnp.float32)
    x, masks = _inputs()
    params = layer.init(jax.random.PRNGKey(0), x, masks)

    def loss(p, on):
        enc.enable_encoder_fusion(on)
        a, b = layer.apply(p, x, masks, True)
        return jnp.sum(a ** 2) + jnp.sum(b ** 2)

    g0, _ = ravel_pytree(jax.grad(lambda p: loss(p, False))(params))
    g1, _ = ravel_pytree(jax.grad(lambda p: loss(p, True))(params))
    scale = np.abs(np.asarray(g0)).max()
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                               rtol=2e-3, atol=2e-5 * scale)


def test_param_tree_unchanged_by_setup_conversion():
    """The setup-style rewrite must keep the exact param paths the torch
    checkpoint interop (utils/checkpoint.py) depends on."""
    layer = _layer(jnp.float32)
    x, masks = _inputs()
    params = layer.init(jax.random.PRNGKey(0), x, masks)["params"]
    assert sorted(params.keys()) == [
        "bi_modal_att_M1", "bi_modal_att_M2", "ff_M1", "ff_M2",
        "res_M1_0", "res_M1_1", "res_M1_2",
        "res_M2_0", "res_M2_1", "res_M2_2",
        "self_att_M1", "self_att_M2"]
    assert sorted(params["ff_M1"].keys()) == ["fc1", "fc2"]
    assert sorted(params["res_M1_0"].keys()) == ["norm"]
    assert sorted(params["self_att_M1"].keys()) == [
        "linear_K2d", "linear_Q2d", "linear_V2d", "linear_d2Q"]


def test_encoder_layer_fused_with_flash_matches_plain():
    """Production composition: fusion + flash TOGETHER (audio-side key
    count >= MIN_SK so attend_bsd actually routes through the flash
    kernel) must match the plain path with both off."""
    from bmhrl_tpu.ops import attention as fatt

    layer = _layer(jnp.float32)
    rng = np.random.RandomState(10)
    B, Sv, Sa = 2, 24, 300
    x = (_rand(rng, B, Sv, 256), _rand(rng, B, Sa, 128))
    masks = (jnp.ones((B, 1, Sv), bool),
             jnp.ones((B, 1, Sa), bool).at[1, :, 270:].set(False))
    params = layer.init(jax.random.PRNGKey(0), x, masks)
    enc.enable_encoder_fusion(False)
    fatt.enable_flash(False)
    plain = layer.apply(params, x, masks, True)
    enc.enable_encoder_fusion(True)
    fatt.enable_flash(True)
    try:
        assert fatt.flash_qualifies(Sv, Sa, 128)  # cross-att leg uses flash
        fused = layer.apply(params, x, masks, True)
    finally:
        fatt.enable_flash(False)
    for a, b in zip(plain, fused):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=4e-4, atol=4e-4)


def test_unimodal_encoder_layer_fused_matches_plain():
    from bmhrl_tpu.models.unimodal import UnimodalEncoderLayer

    layer = UnimodalEncoderLayer(d_m1=128, d_model=256, d_ff=128,
                                 dout_p=0.1, H=2, dtype=jnp.float32)
    rng = np.random.RandomState(6)
    B, S = 2, 24
    x = _rand(rng, B, S, 128)
    mask = jnp.ones((B, 1, S), bool).at[1, :, 18:].set(False)
    params = layer.init(jax.random.PRNGKey(0), x, mask)
    assert sorted(params["params"].keys()) == [
        "ff_M1", "res_M1_0", "res_M1_2", "self_att_M1"]
    enc.enable_encoder_fusion(False)
    plain = layer.apply(params, x, mask, True)
    enc.enable_encoder_fusion(True)
    fused = layer.apply(params, x, mask, True)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(plain),
                               rtol=3e-4, atol=3e-4)


def test_fused_layer_under_data_sharding_matches_unsharded():
    """The fused path must survive pjit with the batch sharded over the
    8-device mesh (serving decode runs exactly this way): same outputs as
    the unsharded run."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    layer = _layer(jnp.float32)
    rng = np.random.RandomState(7)
    B, Sv, Sa = 8, 16, 24
    M1 = _rand(rng, B, Sv, 256)
    M2 = _rand(rng, B, Sa, 128)
    m1 = jnp.ones((B, 1, Sv), bool)
    m2 = jnp.ones((B, 1, Sa), bool).at[3, :, 20:].set(False)
    params = layer.init(jax.random.PRNGKey(0), (M1, M2), (m1, m2))
    base = layer.apply(params, (M1, M2), (m1, m2), True)

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("data",))
    shard = NamedSharding(mesh, P("data"))
    fwd = jax.jit(lambda p, x, masks: layer.apply(p, x, masks, True),
                  in_shardings=(None, (shard, shard), (shard, shard)))
    with mesh:
        got = fwd(params, (jax.device_put(M1, shard),
                           jax.device_put(M2, shard)),
                  (jax.device_put(m1, shard), jax.device_put(m2, shard)))
    for a, b in zip(base, got):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=3e-4, atol=3e-4)


def test_detr_encoder_layer_fused_matches_plain():
    """Post-norm variant (DETR): fused LN(x + proj) / LN(x + FFN) passes
    must match the plain composition (ref encoder.py:39-75 semantics)."""
    from bmhrl_tpu.models.blocks import PositionalEncoder
    from bmhrl_tpu.models.detr import DetrEncoderLayer

    class Wrap(__import__("flax").linen.Module):
        @__import__("flax").linen.compact
        def __call__(self, src, mask, deterministic=True):
            pos = PositionalEncoder(128, 0.1, name="pos")
            return DetrEncoderLayer(128, 2, 256, 0.1, jnp.float32,
                                    name="layer")(src, mask, pos,
                                                  deterministic)

    rng = np.random.RandomState(8)
    B, S = 2, 20
    src = _rand(rng, B, S, 128)
    mask = jnp.ones((B, 1, S), bool).at[1, :, 15:].set(False)
    model = Wrap()
    params = model.init(jax.random.PRNGKey(0), src, mask)
    assert sorted(params["params"]["layer"].keys()) == [
        "linear1", "linear2", "norm1", "norm2", "self_attn"]
    enc.enable_encoder_fusion(False)
    plain = model.apply(params, src, mask, True)
    enc.enable_encoder_fusion(True)
    fused = model.apply(params, src, mask, True)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(plain),
                               rtol=3e-4, atol=3e-4)


def test_detr_decode_tokens_identical_with_fusion():
    """Serving decode of the DETR captioner (fusion-qualifying dims) must
    emit IDENTICAL tokens with the fused encoder on and off."""
    from bmhrl_tpu.models.detr import DetrCaption
    from bmhrl_tpu.ops.masking import make_masks
    from bmhrl_tpu.train.decode import decode

    model = DetrCaption(voc_size=40, d_model=128, d_model_caps=16,
                        d_goal=8, nhead=2, num_layers=1, n_time=2,
                        dim_ff=128, dtype=jnp.float32)
    rng = np.random.RandomState(9)
    B, Sv, Sa = 2, 8, 10
    feats = {"rgb": _rand(rng, B, Sv, 64), "flow": _rand(rng, B, Sv, 64),
             "audio": _rand(rng, B, Sa, 16)}
    trg = jnp.asarray([[2, 4, 5, 3, 1, 1], [2, 5, 6, 7, 3, 1]], jnp.int32)
    masks = make_masks(feats, trg, "audio_video", 1)
    k = jax.random.PRNGKey(0)
    params = jax.jit(model.init)(
        {"params": k, "dropout": k, "noise": k},
        (feats["rgb"] + feats["flow"], feats["audio"]), trg, masks)
    masks_src = make_masks(feats, None, "audio_video", 1)
    enc.enable_encoder_fusion(False)
    t0, _ = decode(model, params, feats, masks_src, 6, 2, 3, 1, greedy=True)
    enc.enable_encoder_fusion(True)
    t1, _ = decode(model, params, feats, masks_src, 6, 2, 3, 1, greedy=True)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t0))


def test_agent_serving_forward_fused_matches_plain():
    """Full BMHrlAgent forward (f32, deterministic): fusion on == off —
    the encoder feeds both caption stacks, so this covers the wiring.
    Dims are 128-aligned so the fused gate actually engages."""
    from bmhrl_tpu.models.bmhrl import BMHrlAgent
    from bmhrl_tpu.ops.masking import make_masks

    model = BMHrlAgent(voc_size=50, d_video=128, d_audio=128, d_model=128,
                       d_model_caps=36, att_heads=2, att_layers=1,
                       d_goal=16, d_ff_v=128, d_ff_a=128, d_ff_c=128,
                       dtype=jnp.float32)
    rng = np.random.RandomState(5)
    B, Sv, Sa, L = 2, 12, 16, 7
    feats = {"rgb": _rand(rng, B, Sv, 128), "audio": _rand(rng, B, Sa, 128)}
    caps = jnp.full((B, L), 4, jnp.int32).at[:, 0].set(2)
    masks = make_masks(feats, caps, "audio_video", pad_idx=1)
    key = jax.random.PRNGKey(0)
    params = model.init({"params": key, "dropout": key, "noise": key},
                        (feats["rgb"], feats["audio"]), caps, masks)
    enc.enable_encoder_fusion(False)
    p0 = model.apply(params, (feats["rgb"], feats["audio"]), caps, masks)
    enc.enable_encoder_fusion(True)
    p1 = model.apply(params, (feats["rgb"], feats["audio"]), caps, masks)
    np.testing.assert_allclose(np.asarray(p1[0]), np.asarray(p0[0]),
                               rtol=3e-4, atol=3e-4)
