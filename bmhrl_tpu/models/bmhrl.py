"""BMHRL agent: bimodal encoder + dual fusion decoders + hierarchical
manager/worker heads, plus the two value-function baselines.

Parity target: model/bm_hrl_agent.py in the reference. Functional flax design:
- no mutable mode flags; ``exploration`` and ``deterministic`` are call args;
- grad gating (teach_worker/teach_manager/warmstart, ref :555-589) is an
  optimizer param-mask, not requires_grad flips (see train/steps.py);
- Manager.expand_goals is the vectorized ops.segments.expand_goals instead of
  a host loop (ref :415-429).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from bmhrl_tpu.models.attention import MultiheadedAttention
from bmhrl_tpu.models.blocks import (
    PositionalEncoder,
    PositionwiseFeedForward,
    ResidualConnection,
    VocabularyEmbedder,
)
from bmhrl_tpu.models.critic import SegmentCritic
from bmhrl_tpu.ops.segments import expand_goals
from bmhrl_tpu.ops.segments import frontier_goal as expand_goals_frontier


class BMEncoderLayer(nn.Module):
    """Self-attention per modality, then symmetric cross-modal attention, then
    per-modality FFN; prenorm residuals. ref: bm_hrl_agent.py:328-384.

    setup-style (attribute names are the param paths, unchanged from the
    earlier compact layout, preserving the strict .pt interop surface).
    Attention routes through the Pallas flash kernel (ops/attention.py)
    when enabled; a monolithic fused-encoder-layer surface was A/B'd over
    rounds 2-4, measured a wash-or-loss at every serving shape, and
    deleted (ROUND3_NOTES §9-10, ROUND4_NOTES §8) — its one real win, the
    flash MIN_SK=128 tile floor, lives in ops/attention.py."""

    d_model_M1: int
    d_model_M2: int
    d_model: int
    d_ff_M1: int
    d_ff_M2: int
    dout_p: float
    H: int
    dtype: jnp.dtype = jnp.bfloat16

    def setup(self):
        att = dict(dout_p=self.dout_p, d_model=self.d_model, dtype=self.dtype)
        self.self_att_M1 = MultiheadedAttention(
            self.d_model_M1, self.d_model_M1, self.d_model_M1, self.H, **att)
        self.self_att_M2 = MultiheadedAttention(
            self.d_model_M2, self.d_model_M2, self.d_model_M2, self.H, **att)
        self.bi_modal_att_M1 = MultiheadedAttention(
            self.d_model_M1, self.d_model_M2, self.d_model_M2, self.H, **att)
        self.bi_modal_att_M2 = MultiheadedAttention(
            self.d_model_M2, self.d_model_M1, self.d_model_M1, self.H, **att)
        self.ff_M1 = PositionwiseFeedForward(
            self.d_model_M1, self.d_ff_M1, self.dout_p, self.dtype)
        self.ff_M2 = PositionwiseFeedForward(
            self.d_model_M2, self.d_ff_M2, self.dout_p, self.dtype)
        self.res_M1 = [ResidualConnection(self.d_model_M1, self.dout_p)
                       for _ in range(3)]
        self.res_M2 = [ResidualConnection(self.d_model_M2, self.dout_p)
                       for _ in range(3)]

    def __call__(self, x, masks, deterministic: bool = True):
        M1, M2 = x
        M1_mask, M2_mask = masks
        det = deterministic
        M1 = self.res_M1[0](M1, lambda h: self.self_att_M1(
            h, h, h, M1_mask, deterministic=det), det)
        M2 = self.res_M2[0](M2, lambda h: self.self_att_M2(
            h, h, h, M2_mask, deterministic=det), det)
        M1m2 = self.res_M1[1](M1, lambda h: self.bi_modal_att_M1(
            h, M2, M2, M2_mask, deterministic=det), det)
        M2m1 = self.res_M2[1](M2, lambda h: self.bi_modal_att_M2(
            h, M1, M1, M1_mask, deterministic=det), det)
        M1m2 = self.res_M1[2](M1m2, lambda h: self.ff_M1(h, det), det)
        M2m1 = self.res_M2[2](M2m1, lambda h: self.ff_M2(h, det), det)
        return M1m2, M2m1


class BMEncoder(nn.Module):
    """N-layer bimodal encoder. ref: bm_hrl_agent.py:218-235."""

    d_model_M1: int
    d_model_M2: int
    d_model: int
    d_ff_M1: int
    d_ff_M2: int
    dout_p: float
    H: int
    N: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, masks, deterministic: bool = True):
        V, A = x
        out = (V, A)
        for i in range(self.N):
            out = BMEncoderLayer(
                self.d_model_M1, self.d_model_M2, self.d_model,
                self.d_ff_M1, self.d_ff_M2, self.dout_p, self.H,
                dtype=self.dtype, name=f"layer_{i}",
            )(out, (masks["V_mask"], masks["A_mask"]), deterministic)
        return out  # (video-side memory, audio-side memory)


class BMFusionLayer(nn.Module):
    """Caption decoder layer: causal self-attention, separate cross-attention
    into audio and video memories, per-branch LayerNorm, then a learned
    sigmoid-gated A/V blend. The reference constructs (but never applies) a
    feed-forward here; we omit it. ref: bm_hrl_agent.py:54-117.

    ``cross_kv`` (dict with "A"/"V" (k, v) pairs from ``precompute_kv``)
    skips the per-step K/V projections of the static memories during
    autoregressive decoding."""

    d_model_A: int
    d_model_V: int
    d_model_C: int
    d_model: int
    d_ff_c: int
    dout_p: float
    H: int
    dtype: jnp.dtype = jnp.bfloat16

    def setup(self):
        att = dict(dout_p=self.dout_p, d_model=self.d_model, dtype=self.dtype)
        self.self_att = MultiheadedAttention(
            self.d_model_C, self.d_model_C, self.d_model_C, self.H, **att,
            name="self_att")
        self.enc_att_A = MultiheadedAttention(
            self.d_model_C, self.d_model_A, self.d_model_A, self.H, **att,
            name="enc_att_A")
        self.enc_att_V = MultiheadedAttention(
            self.d_model_C, self.d_model_V, self.d_model_V, self.H, **att,
            name="enc_att_V")
        self.res_self = ResidualConnection(self.d_model_C, self.dout_p,
                                           name="res_self_att")
        self.res_A = ResidualConnection(self.d_model_C, self.dout_p,
                                        name="res_enc_att_A")
        self.res_V = ResidualConnection(self.d_model_C, self.dout_p,
                                        name="res_enc_att_V")
        self.normCA = nn.LayerNorm(epsilon=1e-5, name="normCA")
        self.normCV = nn.LayerNorm(epsilon=1e-5, name="normCV")
        self.a_v_constant = self.param(
            "a_v_constant", lambda k: jnp.zeros((1,), jnp.float32))

    def precompute_kv(self, Av, Va):
        return {"A": self.enc_att_A.project_kv(Av, Av),
                "V": self.enc_att_V.project_kv(Va, Va)}

    def step_mem(self, c_t, t, cache, masks, mem, deterministic: bool = True):
        """``step`` with the cross-attention K/V projections folded into the
        query/output side (MultiheadedAttention.attend_folded): attends the
        RAW encoder memories ``mem = {"A": Av, "V": Va}`` directly, so no
        per-layer (B, H, Sk, d_k) caches exist and per-token HBM traffic
        drops ~2.4x. The self-attention runs its Q/K/V projections as one
        merged matmul (attend_step_shared). Token-exact with ``step`` up to
        bf16 reassociation."""
        det = deterministic
        h = self.res_self.pre(c_t).astype(c_t.dtype)
        out, k, v = self.self_att.attend_step_shared(
            h, cache["k"], cache["v"], t, det,
            key_mask=masks.get("C_kpad"))
        C = self.res_self.post(c_t, out.astype(c_t.dtype), det)
        ha = self.res_A.pre(C).astype(c_t.dtype)
        out_a = self.enc_att_A.attend_folded(ha, mem["A"], masks["A_mask"],
                                             deterministic=det)
        Ca = self.res_A.post(C, out_a.astype(c_t.dtype), det)
        hv = self.res_V.pre(C).astype(c_t.dtype)
        out_v = self.enc_att_V.attend_folded(hv, mem["V"], masks["V_mask"],
                                             deterministic=det)
        Cv = self.res_V.post(C, out_v.astype(c_t.dtype), det)
        Ca = self.normCA(Ca.astype(jnp.float32))
        Cv = self.normCV(Cv.astype(jnp.float32))
        av_factor = nn.sigmoid(jnp.clip(self.a_v_constant, -2.0, 2.0))
        fused = av_factor * Cv + (1.0 - av_factor) * Ca
        return fused.astype(self.dtype), {"k": k, "v": v}

    def step_mem_pre(self, c_t, t, cache, deterministic: bool = True,
                     key_mask=None):
        """First half of step_mem, up to (but excluding) the two cross-
        attention contractions: self-attention + residual, branch pre-LNs,
        folded effective queries. Returns (C, q_eff_A (B, H, dA),
        q_eff_V (B, H, dV), cache). The contractions run OUTSIDE the
        per-stack vmap (ops.attention.folded_attend) so both stacks share
        ONE memory read per branch."""
        det = deterministic
        h = self.res_self.pre(c_t).astype(c_t.dtype)
        out, k, v = self.self_att.attend_step_shared(
            h, cache["k"], cache["v"], t, det, key_mask=key_mask)
        C = self.res_self.post(c_t, out.astype(c_t.dtype), det)
        ha = self.res_A.pre(C).astype(c_t.dtype)
        hv = self.res_V.pre(C).astype(c_t.dtype)
        return (C, self.enc_att_A.folded_q(ha), self.enc_att_V.folded_q(hv),
                {"k": k, "v": v})

    def step_mem_post(self, C, ctx_a, ctx_v, deterministic: bool = True):
        """Second half of step_mem: folded value/output projections of the
        branch contexts, residuals, per-branch LayerNorms, gated blend."""
        det = deterministic
        out_a = self.enc_att_A.folded_out(ctx_a)[:, None, :]
        Ca = self.res_A.post(C, out_a.astype(C.dtype), det)
        out_v = self.enc_att_V.folded_out(ctx_v)[:, None, :]
        Cv = self.res_V.post(C, out_v.astype(C.dtype), det)
        Ca = self.normCA(Ca.astype(jnp.float32))
        Cv = self.normCV(Cv.astype(jnp.float32))
        av_factor = nn.sigmoid(jnp.clip(self.a_v_constant, -2.0, 2.0))
        fused = av_factor * Cv + (1.0 - av_factor) * Ca
        return fused.astype(self.dtype)

    def __call__(self, x, masks, deterministic: bool = True, cross_kv=None):
        C, memory = x
        Av, Va = memory
        det = deterministic
        kv_A = cross_kv["A"] if cross_kv is not None else None
        kv_V = cross_kv["V"] if cross_kv is not None else None
        C = self.res_self(
            C, lambda h: self.self_att(h, h, h, masks["C_mask"],
                                       deterministic=det), det)
        Ca = self.res_A(
            C, lambda h: self.enc_att_A(h, Av, Av, masks["A_mask"],
                                        deterministic=det,
                                        precomputed_kv=kv_A), det)
        Cv = self.res_V(
            C, lambda h: self.enc_att_V(h, Va, Va, masks["V_mask"],
                                        deterministic=det,
                                        precomputed_kv=kv_V), det)
        Ca = self.normCA(Ca.astype(jnp.float32))
        Cv = self.normCV(Cv.astype(jnp.float32))
        av_factor = nn.sigmoid(jnp.clip(self.a_v_constant, -2.0, 2.0))
        fused = av_factor * Cv + (1.0 - av_factor) * Ca
        return fused.astype(self.dtype), memory


class BMFusion(nn.Module):
    """N-layer fusion decoder stack. ref: bm_hrl_agent.py:120-131."""

    d_model_A: int
    d_model_V: int
    d_model_C: int
    d_model: int
    d_ff_c: int
    dout_p: float
    H: int
    N: int
    dtype: jnp.dtype = jnp.bfloat16

    def setup(self):
        self.layers = [
            BMFusionLayer(
                self.d_model_A, self.d_model_V, self.d_model_C, self.d_model,
                self.d_ff_c, self.dout_p, self.H, dtype=self.dtype,
                name=f"layer_{i}")
            for i in range(self.N)]

    def precompute_kv(self, Av, Va):
        return [layer.precompute_kv(Av, Va) for layer in self.layers]

    def __call__(self, x, masks, deterministic: bool = True, cross_kv=None):
        C, memory = x
        for i, layer in enumerate(self.layers):
            kv = cross_kv[i] if cross_kv is not None else None
            C, memory = layer((C, memory), masks, deterministic, cross_kv=kv)
        return C

    def step_mem(self, c_t, t, caches, masks, mem, deterministic: bool = True):
        """Single-position pass attending the raw memories (folded K/V)."""
        new_caches = []
        for layer, cache in zip(self.layers, caches):
            c_t, cache = layer.step_mem(c_t, t, cache, masks, mem,
                                        deterministic)
            new_caches.append(cache)
        return c_t, new_caches


class Manager(nn.Module):
    """Goal emitter: linear(d_caps -> d_goal) + dropout, optional exploration
    noise scaled by detached nan-statistics of the activations, then segment
    goal expansion. ref: bm_hrl_agent.py:399-454."""

    d_model_caps: int
    d_goal: int
    dout_p: float
    mean_factor: float = 10.0
    std_factor: float = 5.0

    def setup(self):
        self.linear = nn.Dense(self.d_goal, dtype=jnp.float32, name="linear")
        self.drop = nn.Dropout(self.dout_p)

    def goal_step(self, manager_feat_t: jnp.ndarray, label_t: jnp.ndarray,
                  has_boundary: jnp.ndarray,
                  deterministic: bool = True) -> jnp.ndarray:
        """Goal for the single frontier position, with the reference
        expand_goals finalization quirks applied row-wise (ops.segments.
        frontier_goal). ``has_boundary``: (B,) any label at positions <= t,
        including t. No exploration noise in the incremental path — decode
        runs with exploration off."""
        from bmhrl_tpu.ops.segments import frontier_goal

        x = self.linear(manager_feat_t.astype(jnp.float32))
        x = self.drop(x, deterministic=deterministic)
        return frontier_goal(x, label_t, has_boundary)

    def __call__(
        self,
        x: jnp.ndarray,
        critic_mask: jnp.ndarray,
        exploration: bool = False,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        x = self.linear(x.astype(jnp.float32))
        x = self.drop(x, deterministic=deterministic)
        if exploration:
            mean = jnp.nanmean(x) / self.mean_factor
            std = jnp.sqrt(jnp.nanmean(jnp.abs(x - jnp.nanmean(x)) ** 2)) / self.std_factor
            mean = jax.lax.stop_gradient(mean)
            std = jax.lax.stop_gradient(std)
            rng = self.make_rng("noise")
            noise = jax.random.normal(rng, (self.d_goal,)) * std + mean - 0.5 * mean
            x = x + noise
        return expand_goals(x, critic_mask)


class Worker(nn.Module):
    """Goal-conditioned word head: 2-head attention of goals over worker
    features, concat, project to vocab log-probs. ref: bm_hrl_agent.py:456-487."""

    voc_size: int
    d_in: int
    d_goal: int
    dout_p: float
    d_model: int
    dtype: jnp.dtype = jnp.bfloat16

    def setup(self):
        self.goal_attention = MultiheadedAttention(
            self.d_goal, self.d_in, self.d_in, 2, self.dout_p, self.d_model,
            dtype=self.dtype, name="goal_attention")
        self.projection = nn.Dense(self.voc_size, dtype=jnp.float32,
                                   name="projection")

    def __call__(self, x, goal, mask, deterministic: bool = True) -> jnp.ndarray:
        goal_completion = self.goal_attention(
            goal.astype(self.dtype), x, x, mask, deterministic=deterministic)
        h = jnp.concatenate([x, goal_completion.astype(x.dtype)], axis=-1)
        logits = self.projection(h.astype(jnp.float32))
        return nn.log_softmax(logits, axis=-1)

    def step_raw(self, wf_t, goal_t, wf_cache, t, deterministic: bool = True,
                 key_mask=None):
        """Single-position head attending a RAW worker-feature cache
        (B, L, d_in) with the K/V/out projections of the goal attention
        folded into the query/output side (MultiheadedAttention.
        folded_weights): one cache write of d_in floats instead of two
        (B, H, L, d_k) projected caches, and no per-token K/V projections.
        Token-exact with ``step`` up to bf16 reassociation."""
        import jax

        wf_cache = jax.lax.dynamic_update_slice_in_dim(
            wf_cache, wf_t.astype(wf_cache.dtype), t, axis=1)
        att = self.goal_attention
        w_qk, b_qk, w_vo, b_vo = att.folded_weights()
        dt = self.dtype
        q = goal_t[:, 0].astype(dt)
        q_eff = (jnp.einsum("bq,hqk->bhk", q, w_qk.astype(dt),
                            preferred_element_type=jnp.float32) + b_qk[None])
        scores = jnp.einsum(
            "bhk,bsk->bhs", q_eff.astype(dt), wf_cache,
            preferred_element_type=jnp.float32
        ) / jnp.sqrt(jnp.asarray(att._d_k, jnp.float32))
        pos = jnp.arange(wf_cache.shape[1])[None, None, :]
        ok = pos <= t
        if key_mask is not None:  # PAD positions excluded, like C_mask
            ok = ok & key_mask[:, None, :]
        scores = jnp.where(ok, scores, -1e9)
        probs = nn.softmax(scores, axis=-1)
        ctx = jnp.einsum("bhs,bsk->bhk", probs.astype(dt), wf_cache,
                         preferred_element_type=jnp.float32)
        gc = (jnp.einsum("bhk,hko->bo", ctx.astype(dt), w_vo.astype(dt),
                         preferred_element_type=jnp.float32) + b_vo[None])
        h = jnp.concatenate(
            [wf_t[:, 0], gc.astype(wf_t.dtype)], axis=-1)
        logits = self.projection(h.astype(jnp.float32))
        return nn.log_softmax(logits, axis=-1), wf_cache

    def frontier(self, wf_t, worker_feat, goal_t, mask_row,
                 deterministic: bool = True) -> jnp.ndarray:
        """Frontier-only head: goal[t] (B, 1, d_goal) attends the FULL
        worker-feature buffer, but the vocab projection runs on the single
        frontier position instead of all L — the projection is the dominant
        per-token decode cost (L*V*d vs V*d). Token-exact with __call__'s
        row t. Returns (B, V) log-probs."""
        gc = self.goal_attention(
            goal_t.astype(self.dtype), worker_feat, worker_feat, mask_row,
            deterministic=deterministic)
        h = jnp.concatenate([wf_t, gc.astype(wf_t.dtype)], axis=-1)
        logits = self.projection(h.astype(jnp.float32))[:, 0]
        return nn.log_softmax(logits, axis=-1)


class BMHrlAgent(nn.Module):
    """Top-level bimodal hierarchical agent. ref: bm_hrl_agent.py:491-661.

    __call__(x=(V, A), trg, masks) -> (log_probs, worker_feat, manager_feat,
    goals, segment_labels); pass trg as a (y, y_hat) tuple plus ``mix_factor``
    for scheduled-sampling mixing (ref :611-625).
    """

    voc_size: int
    d_video: int = 1024
    d_audio: int = 128
    d_model: int = 1024
    d_model_caps: int = 300
    att_heads: int = 4
    att_layers: int = 2
    dout_p: float = 0.1
    d_goal: int = 64
    d_ff_v: int = 1024
    d_ff_a: int = 512
    d_ff_c: int = 2048
    critic_score_threshold: float = 0.25
    dtype: jnp.dtype = jnp.bfloat16

    def setup(self):
        self.pos_enc_A = PositionalEncoder(self.d_audio, self.dout_p)
        self.pos_enc_V = PositionalEncoder(self.d_video, self.dout_p)
        self.pos_enc_C = PositionalEncoder(self.d_model_caps, self.dout_p)
        self.critic = SegmentCritic(self.d_model_caps)
        self.emb_C = VocabularyEmbedder(self.voc_size, self.d_model_caps)
        self.bm_enc = BMEncoder(
            d_model_M1=self.d_video, d_model_M2=self.d_audio, d_model=self.d_model,
            d_ff_M1=self.d_ff_v, d_ff_M2=self.d_ff_a, dout_p=self.dout_p,
            H=self.att_heads, N=self.att_layers, dtype=self.dtype)
        fus = dict(
            d_model_A=self.d_audio, d_model_V=self.d_video,
            d_model_C=self.d_model_caps, d_model=self.d_model,
            d_ff_c=self.d_ff_c, dout_p=self.dout_p, H=self.att_heads,
            N=self.att_layers, dtype=self.dtype)
        self.bm_worker_fus = BMFusion(**fus)
        self.bm_manager_fus = BMFusion(**fus)
        self.manager = Manager(self.d_model_caps, self.d_goal, self.dout_p)
        self.worker = Worker(
            voc_size=self.voc_size, d_in=self.d_model_caps, d_goal=self.d_goal,
            dout_p=self.dout_p, d_model=self.d_model, dtype=self.dtype)

    # ---- pieces -----------------------------------------------------------
    def embed_caption(self, trg: jnp.ndarray) -> jnp.ndarray:
        return self.emb_C(trg)

    def segment_labels_of(self, C_emb: jnp.ndarray) -> jnp.ndarray:
        scores = nn.sigmoid(self.critic(C_emb))
        labels = (scores > self.critic_score_threshold).astype(jnp.int32)
        return labels[..., 0]  # (B, L)

    def encode(self, V, A, masks, deterministic: bool = True):
        V = self.pos_enc_V(V.astype(self.dtype), deterministic)
        A = self.pos_enc_A(A.astype(self.dtype), deterministic)
        return self.bm_enc((V, A), masks, deterministic)  # (Va, Av)

    def predict_with_features(
        self, C_emb, Va, Av, masks,
        exploration: bool = False, deterministic: bool = True,
    ):
        """ref: bm_hrl_agent.py:637-651 (encoder hoisted out by caller)."""
        segment_labels = self.segment_labels_of(C_emb)
        C = self.pos_enc_C(C_emb, deterministic).astype(self.dtype)
        worker_feat = self.bm_worker_fus((C, (Av, Va)), masks, deterministic)
        manager_feat = self.bm_manager_fus((C, (Av, Va)), masks, deterministic)
        goals = self.manager(
            manager_feat, segment_labels, exploration, deterministic)
        pred = self.worker(worker_feat, goals, masks["C_mask"], deterministic)
        return pred, worker_feat, manager_feat, goals, segment_labels

    def __call__(
        self, x, trg, masks,
        mix_factor: Optional[jnp.ndarray] = None,
        exploration: bool = False,
        deterministic: bool = True,
    ):
        V, A = x
        if isinstance(trg, (tuple, list)):
            # scheduled-sampling mix of GT and model tokens (ref :611-625)
            y, y_hat = trg
            f = mix_factor if mix_factor is not None else jnp.asarray(1.0)
            C_emb = self.emb_C(y) * (1.0 - f) + self.emb_C(y_hat) * f
        else:
            C_emb = self.emb_C(trg)
        Va, Av = self.encode(V, A, masks, deterministic)
        return self.predict_with_features(
            C_emb, Va, Av, masks, exploration, deterministic)

    # -- incremental decode support -----------------------------------------
    def critic_init_state(self, B: int):
        return self.critic.init_state(B)

    def critic_step(self, token_t: jnp.ndarray, state):
        """Advance the frozen critic by one token (B,) -> ((B,) logit, state).
        Input is the raw token id; embedding+scaling happens here so the
        decode loop never re-embeds the whole buffer for the critic."""
        emb_t = self.emb_C(token_t[:, None])[:, 0]
        score, state = self.critic.step(emb_t, state)
        return score[:, 0], state

    def precompute_fusion_kv(self, Va, Av):
        """Cross-attention K/V of the static A/V memories for every fusion
        layer — computed once per clip by the decode loop."""
        return {"worker": self.bm_worker_fus.precompute_kv(Av, Va),
                "manager": self.bm_manager_fus.precompute_kv(Av, Va)}

    # -- fully incremental decode (O(1) positions per generated token) ------
    def init_decode_caches(self, B: int, L: int):
        def mha_cache(mha):
            z = jnp.zeros(mha.kv_cache_shape(B, L), self.dtype)
            return {"k": z, "v": jnp.zeros_like(z)}

        return {
            "critic": self.critic.init_state(B),
            "wself": [mha_cache(l.self_att) for l in self.bm_worker_fus.layers],
            "mself": [mha_cache(l.self_att) for l in self.bm_manager_fus.layers],
            # raw worker-feature cache for the folded goal attention
            # (Worker.step_raw) — one (B, L, Dc) buffer, not projected K/V
            "goal": jnp.zeros((B, L, self.d_model_caps), self.dtype),
            # per-row "has any boundary yet" flag for the expand_goals
            # finalization quirks (ops.segments.frontier_goal)
            "hb": jnp.zeros((B,), bool),
        }

    # param-tree keys of the two identically-shaped fusion stacks; the
    # decode loop stacks them on a leading axis and runs both through ONE
    # vmapped BMFusion (see train/decode.make_stacked_fusion)
    FUSION_PARAM_KEYS = ("bm_worker_fus", "bm_manager_fus")

    def decode_step_head(self, tok_t, t, crit_state):
        """Embed token t, advance the frozen critic one cell, position-encode:
        the shared prefix of the incremental decode step (the decode loop
        runs the two fusion stacks stacked/vmapped in between, then
        decode_step_tail)."""
        from bmhrl_tpu.models.blocks import sinusoid_table

        emb_t = self.emb_C(tok_t[:, None])
        score_t, crit = self.critic.step(emb_t[:, 0], crit_state)
        label_t = (nn.sigmoid(score_t[:, 0])
                   > self.critic_score_threshold).astype(jnp.int32)
        table = jnp.asarray(sinusoid_table(3660, self.d_model_caps))
        c_t = (emb_t + table[t][None, None, :]).astype(self.dtype)
        return c_t, label_t, crit

    def decode_step_tail(self, wf_t, mf_t, label_t, hb, goal_cache, t,
                         deterministic: bool = True, key_mask=None):
        """Goal emission + worker head: the suffix of decode_step.
        goal_cache: raw (B, L, Dc) worker-feature buffer (Worker.step_raw);
        key_mask: (B, L) non-PAD validity of cached positions (the
        full-buffer path's C_mask equivalent)."""
        hb = hb | label_t.astype(bool)
        goal_t = self.manager.goal_step(mf_t, label_t, hb, deterministic)
        logits, goal_cache = self.worker.step_raw(
            wf_t, goal_t, goal_cache, t, deterministic, key_mask=key_mask)
        return logits, goal_cache, hb

    def decode_with_labels(
        self, trg, segment_labels, Va, Av, masks,
        exploration: bool = False, deterministic: bool = True,
        fusion_kv=None,
    ):
        """Caption-side forward with externally supplied critic segment
        labels (maintained incrementally by the decode loop via
        ``critic_step``) and optionally precomputed cross-attention K/V.
        Removes the critic's full-sequence RNN rescan AND the memory K/V
        projections from every decode iteration."""
        C_emb = self.emb_C(trg)
        C = self.pos_enc_C(C_emb, deterministic).astype(self.dtype)
        wkv = fusion_kv["worker"] if fusion_kv is not None else None
        mkv = fusion_kv["manager"] if fusion_kv is not None else None
        worker_feat = self.bm_worker_fus((C, (Av, Va)), masks, deterministic,
                                         cross_kv=wkv)
        manager_feat = self.bm_manager_fus((C, (Av, Va)), masks, deterministic,
                                           cross_kv=mkv)
        goals = self.manager(
            manager_feat, segment_labels, exploration, deterministic)
        pred = self.worker(worker_feat, goals, masks["C_mask"], deterministic)
        return pred, worker_feat, manager_feat, goals, segment_labels

    def decode_frontier(
        self, trg, segment_labels, Va, Av, masks, t,
        exploration: bool = False, deterministic: bool = True,
        fusion_kv=None,
    ):
        """decode_with_labels with the heads collapsed to frontier position
        ``t``: the fusion stacks still run over the (static-shape) buffer,
        but the manager linear, goal attention query and the dominant vocab
        projection run on ONE position. Token-exact with selecting row t of
        decode_with_labels (goal expansion at the frontier reduces to
        goal[t] = x[t] * label[t], since labels beyond t are zero).

        Exploration noise follows ref bm_hrl_agent.py:444-452 with stats
        over positions <= t — exactly the reference's growing buffer.
        Returns (B, V) log-probs."""
        C_emb = self.emb_C(trg)
        C = self.pos_enc_C(C_emb, deterministic).astype(self.dtype)
        wkv = fusion_kv["worker"] if fusion_kv is not None else None
        mkv = fusion_kv["manager"] if fusion_kv is not None else None
        worker_feat = self.bm_worker_fus((C, (Av, Va)), masks, deterministic,
                                         cross_kv=wkv)
        manager_feat = self.bm_manager_fus((C, (Av, Va)), masks, deterministic,
                                           cross_kv=mkv)
        mf_t = jax.lax.dynamic_slice_in_dim(manager_feat, t, 1, axis=1)
        label_t = jax.lax.dynamic_slice_in_dim(
            segment_labels, t, 1, axis=1)[:, 0]
        x_t = self.manager.linear(mf_t.astype(jnp.float32))
        x_t = self.manager.drop(x_t, deterministic=deterministic)
        if exploration:
            x_full = self.manager.linear(manager_feat.astype(jnp.float32))
            from bmhrl_tpu.ops.segments import frontier_exploration_noise

            x_t = x_t + frontier_exploration_noise(
                x_full, t, self.d_goal, self.make_rng("noise"),
                self.manager.mean_factor, self.manager.std_factor)
        goal_t = expand_goals_frontier(
            x_t, label_t, segment_labels.any(axis=1))
        wf_t = jax.lax.dynamic_slice_in_dim(worker_feat, t, 1, axis=1)
        mask_row = jax.lax.dynamic_slice_in_dim(masks["C_mask"], t, 1, axis=1)
        return self.worker.frontier(wf_t, worker_feat, goal_t, mask_row,
                                    deterministic)

    def decode_logits(
        self, trg, Va, Av, masks,
        exploration: bool = False, deterministic: bool = True,
        valid_len: Optional[jnp.ndarray] = None,
    ):
        """Caption-side forward against precomputed A/V memories — the decode
        loop calls this per step so the bimodal encoder runs ONCE per clip
        (the reference re-runs the full forward every token,
        ref: epoch_loops/captioning_bmrl_loops.py:61-76).

        ``valid_len`` masks critic segment labels beyond the current decode
        position: the reference decodes on a growing buffer, so labels past
        the frontier must not exist (they would leak into goal expansion)."""
        C_emb = self.emb_C(trg)
        segment_labels = self.segment_labels_of(C_emb)
        if valid_len is not None:
            pos = jnp.arange(trg.shape[1])[None, :]
            segment_labels = jnp.where(pos <= valid_len, segment_labels, 0)
        C = self.pos_enc_C(C_emb, deterministic).astype(self.dtype)
        worker_feat = self.bm_worker_fus((C, (Av, Va)), masks, deterministic)
        manager_feat = self.bm_manager_fus((C, (Av, Va)), masks, deterministic)
        goals = self.manager(
            manager_feat, segment_labels, exploration, deterministic)
        pred = self.worker(worker_feat, goals, masks["C_mask"], deterministic)
        return pred, worker_feat, manager_feat, goals, segment_labels

    def inference(self, x, trg, masks):
        return self(x, trg, masks, deterministic=True)[0]


class BMWorkerValueFunction(nn.Module):
    """Worker reward baseline: FFN(d, 2d) -> ReLU -> Linear(d -> 1) on worker
    features (the goal input is accepted and ignored, matching the reference).
    ref: bm_hrl_agent.py:251-269."""

    d_model_caps: int = 300
    dout_p: float = 0.1

    @nn.compact
    def __call__(self, x, deterministic: bool = True) -> jnp.ndarray:
        w_feat = x[0] if isinstance(x, (tuple, list)) else x
        d = self.d_model_caps
        h = PositionwiseFeedForward(d, 2 * d, self.dout_p, jnp.float32,
                                    name="value_function")(
            w_feat.astype(jnp.float32), deterministic)
        h = nn.relu(h)
        return nn.Dense(1, dtype=jnp.float32, name="projection")(h)


class BMManagerValueFunction(nn.Module):
    """Manager reward baseline. ref: bm_hrl_agent.py:272-286."""

    d_model_caps: int = 300
    dout_p: float = 0.1

    @nn.compact
    def __call__(self, x, deterministic: bool = True) -> jnp.ndarray:
        d = self.d_model_caps
        h = PositionwiseFeedForward(d, 2 * d, self.dout_p, jnp.float32,
                                    name="value_function")(
            x.astype(jnp.float32), deterministic)
        h = nn.relu(h)
        return nn.Dense(1, dtype=jnp.float32, name="projection")(h)
