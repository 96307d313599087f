"""Unimodal ablation agents (AHRL audio-only / VHRL video-only).

Parity target: model/bm_hrl_agent.py:133-183 (UnimodalFusion/Layer), :238-248
(UnimodalEncoder), :289-325 (UnimodalEncoderLayer), :664-809 (UnimodalAgent,
AudioAgent, VideoAgent).

Call-compatible with BMHrlAgent (takes x=(V, A) and the masks dict, picks its
modality internally) so StepFactory / decode / the orchestrator work
unchanged across model families.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from bmhrl_tpu.models.attention import MultiheadedAttention
from bmhrl_tpu.models.blocks import (
    PositionalEncoder, PositionwiseFeedForward, ResidualConnection,
    VocabularyEmbedder)
from bmhrl_tpu.models.bmhrl import Manager, Worker
from bmhrl_tpu.models.critic import SegmentCritic


class UnimodalEncoderLayer(nn.Module):
    """Self-attention + FFN with prenorm residuals (the reference skips its
    middle residual slot, using indices 0 and 2 — mirrored here).
    ref: bm_hrl_agent.py:289-325."""

    d_m1: int
    d_model: int
    d_ff: int
    dout_p: float
    H: int
    dtype: jnp.dtype = jnp.bfloat16

    def setup(self):
        self.self_att_M1 = MultiheadedAttention(
            self.d_m1, self.d_m1, self.d_m1, self.H, self.dout_p,
            self.d_model, dtype=self.dtype)
        self.ff_M1 = PositionwiseFeedForward(self.d_m1, self.d_ff,
                                             self.dout_p, self.dtype)
        self.res_M1_0 = ResidualConnection(self.d_m1, self.dout_p)
        self.res_M1_2 = ResidualConnection(self.d_m1, self.dout_p)

    def __call__(self, x, mask, deterministic: bool = True):
        det = deterministic
        x = self.res_M1_0(x, lambda h: self.self_att_M1(
            h, h, h, mask, deterministic=det), det)
        x = self.res_M1_2(x, lambda h: self.ff_M1(h, det), det)
        return x


class UnimodalFusionLayer(nn.Module):
    """Caption self-attention + cross-attention into the modality memory +
    LayerNorm. ref: bm_hrl_agent.py:147-183."""

    d_m1: int
    d_model_C: int
    d_model: int
    d_ff_c: int
    dout_p: float
    H: int
    dtype: jnp.dtype = jnp.bfloat16

    def setup(self):
        self.self_att = MultiheadedAttention(
            self.d_model_C, self.d_model_C, self.d_model_C, self.H,
            self.dout_p, self.d_model, dtype=self.dtype, name="self_att")
        self.enc_att = MultiheadedAttention(
            self.d_model_C, self.d_m1, self.d_m1, self.H, self.dout_p,
            self.d_model, dtype=self.dtype, name="enc_att")
        self.res_self = ResidualConnection(self.d_model_C, self.dout_p,
                                           name="res_self_att")
        self.res_enc = ResidualConnection(self.d_model_C, self.dout_p,
                                          name="res_enc_att")
        self.normC = nn.LayerNorm(epsilon=1e-5, name="normC")

    def __call__(self, C, memory, m1_mask, c_mask, deterministic: bool = True):
        det = deterministic
        C = self.res_self(
            C, lambda h: self.self_att(h, h, h, c_mask, deterministic=det),
            det)
        Cm = self.res_enc(
            C, lambda h: self.enc_att(h, memory, memory, m1_mask,
                                      deterministic=det), det)
        Cm = self.normC(Cm.astype(jnp.float32))
        return Cm.astype(self.dtype)

    def step_mem(self, c_t, t, cache, m1_mask, mem,
                 deterministic: bool = True, key_mask=None):
        """Single-position fusion step: KV-cached self-attention (merged
        QKV matmul) + folded cross-attention over the RAW modality memory
        (no K/V caches materialized) — the unimodal mirror of
        BMFusionLayer.step_mem. Token-exact with ``__call__``'s row t up
        to bf16 reassociation."""
        det = deterministic
        h = self.res_self.pre(c_t).astype(c_t.dtype)
        out, k, v = self.self_att.attend_step_shared(
            h, cache["k"], cache["v"], t, det, key_mask=key_mask)
        C = self.res_self.post(c_t, out.astype(c_t.dtype), det)
        he = self.res_enc.pre(C).astype(c_t.dtype)
        out_e = self.enc_att.attend_folded(he, mem, m1_mask,
                                           deterministic=det)
        Cm = self.res_enc.post(C, out_e.astype(c_t.dtype), det)
        Cm = self.normC(Cm.astype(jnp.float32))
        return Cm.astype(self.dtype), {"k": k, "v": v}


class UnimodalFusionStack(nn.Module):
    """Standalone N-layer stack with ``layer_{i}`` naming — the decode loop
    maps the agent's flat ``uni_{worker,manager}_fus_layer_{i}`` param keys
    onto it and runs both stacks as ONE vmapped computation over params
    stacked on a leading axis of 2 (same trick as train/decode's stacked
    BMFusion)."""

    d_m1: int
    d_model_C: int
    d_model: int
    d_ff_c: int
    dout_p: float
    H: int
    N: int
    dtype: jnp.dtype = jnp.bfloat16

    def setup(self):
        self.layers = [
            UnimodalFusionLayer(
                self.d_m1, self.d_model_C, self.d_model, self.d_ff_c,
                self.dout_p, self.H, dtype=self.dtype, name=f"layer_{i}")
            for i in range(self.N)]

    def step_mem(self, c_t, t, caches, m1_mask, mem,
                 deterministic: bool = True, key_mask=None):
        new_caches = []
        for layer, cache in zip(self.layers, caches):
            c_t, cache = layer.step_mem(c_t, t, cache, m1_mask, mem,
                                        deterministic, key_mask=key_mask)
            new_caches.append(cache)
        return c_t, new_caches


class UnimodalAgent(nn.Module):
    """Single-modality hierarchical agent. ref: bm_hrl_agent.py:664-799."""

    voc_size: int
    d_m1: int
    d_ff_m1: int
    modality: str  # "audio" | "video"
    d_model: int = 1024
    d_model_caps: int = 300
    att_heads: int = 4
    att_layers: int = 2
    dout_p: float = 0.1
    d_goal: int = 64
    critic_score_threshold: float = 0.25
    dtype: jnp.dtype = jnp.bfloat16

    def setup(self):
        self.pos_enc = PositionalEncoder(self.d_m1, self.dout_p)
        self.pos_enc_C = PositionalEncoder(self.d_model_caps, self.dout_p)
        self.critic = SegmentCritic(self.d_model_caps)
        self.emb_C = VocabularyEmbedder(self.voc_size, self.d_model_caps)
        self.uni_enc = [
            UnimodalEncoderLayer(self.d_m1, self.d_model, self.d_ff_m1,
                                 self.dout_p, self.att_heads, self.dtype,
                                 name=f"uni_enc_layer_{i}")
            for i in range(self.att_layers)]
        self.uni_worker_fus = [
            UnimodalFusionLayer(self.d_m1, self.d_model_caps, self.d_model,
                                self.d_ff_m1, self.dout_p, self.att_heads,
                                self.dtype, name=f"uni_worker_fus_layer_{i}")
            for i in range(self.att_layers)]
        self.uni_manager_fus = [
            UnimodalFusionLayer(self.d_m1, self.d_model_caps, self.d_model,
                                self.d_ff_m1, self.dout_p, self.att_heads,
                                self.dtype, name=f"uni_manager_fus_layer_{i}")
            for i in range(self.att_layers)]
        self.manager = Manager(self.d_model_caps, self.d_goal, self.dout_p)
        self.worker = Worker(
            voc_size=self.voc_size, d_in=self.d_model_caps,
            d_goal=self.d_goal, dout_p=self.dout_p, d_model=self.d_model,
            dtype=self.dtype)

    def _pick(self, x, masks):
        V, A = x
        if self.modality == "audio":
            return A, masks["A_mask"]
        return V, masks["V_mask"]

    def encode(self, V, A, masks, deterministic: bool = True):
        m1, m1_mask = self._pick((V, A), masks)
        m1 = self.pos_enc(m1.astype(self.dtype), deterministic)
        for layer in self.uni_enc:
            m1 = layer(m1, m1_mask, deterministic)
        # return in (Va, Av) slot convention: memory + its mask source
        return m1, m1

    def _heads(self, C_emb, memory, masks, exploration, deterministic,
               valid_len=None):
        scores = nn.sigmoid(self.critic(C_emb))
        segment_labels = (scores > self.critic_score_threshold
                          ).astype(jnp.int32)[..., 0]
        if valid_len is not None:
            pos = jnp.arange(segment_labels.shape[1])[None, :]
            segment_labels = jnp.where(pos <= valid_len, segment_labels, 0)
        C = self.pos_enc_C(C_emb, deterministic).astype(self.dtype)
        m1_mask = masks["A_mask"] if self.modality == "audio" else masks["V_mask"]
        wf = C
        for layer in self.uni_worker_fus:
            wf = layer(wf, memory, m1_mask, masks["C_mask"], deterministic)
        mf = C
        for layer in self.uni_manager_fus:
            mf = layer(mf, memory, m1_mask, masks["C_mask"], deterministic)
        goals = self.manager(mf, segment_labels, exploration, deterministic)
        pred = self.worker(wf, goals, masks["C_mask"], deterministic)
        return pred, wf, mf, goals, segment_labels

    def __call__(self, x, trg, masks, mix_factor=None, exploration=False,
                 deterministic: bool = True):
        V, A = x
        if isinstance(trg, (tuple, list)):
            y, y_hat = trg
            f = mix_factor if mix_factor is not None else jnp.asarray(1.0)
            C_emb = self.emb_C(y) * (1.0 - f) + self.emb_C(y_hat) * f
        else:
            C_emb = self.emb_C(trg)
        memory, _ = self.encode(V, A, masks, deterministic)
        return self._heads(C_emb, memory, masks, exploration, deterministic)

    def decode_logits(self, trg, Va, Av, masks, exploration=False,
                      deterministic: bool = True, valid_len=None):
        C_emb = self.emb_C(trg)
        return self._heads(C_emb, Va, masks, exploration, deterministic,
                           valid_len)

    # -- incremental decode support (same contract as BMHrlAgent) -----------
    # flat param-key prefixes of the two identically-shaped fusion stacks;
    # the decode loop collects {prefix}_layer_{i} subtrees into a
    # UnimodalFusionStack tree and vmaps over them stacked on axis 0
    UNI_FUSION_PARAM_PREFIXES = ("uni_worker_fus", "uni_manager_fus")

    def make_fusion_stack(self):
        """Unbound UnimodalFusionStack matching this agent's hyperparams
        (constructed standalone — flax forbids helper calls on unbound
        modules)."""
        return UnimodalFusionStack(
            d_m1=self.d_m1, d_model_C=self.d_model_caps,
            d_model=self.d_model, d_ff_c=self.d_ff_m1, dout_p=self.dout_p,
            H=self.att_heads, N=self.att_layers, dtype=self.dtype)

    def critic_init_state(self, B: int):
        return self.critic.init_state(B)

    def critic_step(self, token_t, state):
        emb_t = self.emb_C(token_t[:, None])[:, 0]
        score, state = self.critic.step(emb_t, state)
        return score[:, 0], state

    def init_decode_caches(self, B: int, L: int):
        def mha_cache(mha):
            z = jnp.zeros(mha.kv_cache_shape(B, L), self.dtype)
            return {"k": z, "v": jnp.zeros_like(z)}

        return {
            "critic": self.critic.init_state(B),
            "wself": [mha_cache(l.self_att) for l in self.uni_worker_fus],
            "mself": [mha_cache(l.self_att) for l in self.uni_manager_fus],
            "goal": jnp.zeros((B, L, self.d_model_caps), self.dtype),
            "hb": jnp.zeros((B,), bool),
        }

    def decode_step_head(self, tok_t, t, crit_state):
        """Embed token t, advance the frozen critic, position-encode — the
        shared prefix of the incremental decode step (same contract as
        BMHrlAgent.decode_step_head)."""
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
        """Goal emission + worker head (same contract as
        BMHrlAgent.decode_step_tail)."""
        hb = hb | label_t.astype(bool)
        goal_t = self.manager.goal_step(mf_t, label_t, hb, deterministic)
        logits, goal_cache = self.worker.step_raw(
            wf_t, goal_t, goal_cache, t, deterministic, key_mask=key_mask)
        return logits, goal_cache, hb

    def decode_with_labels(self, trg, segment_labels, Va, Av, masks,
                           exploration=False, deterministic: bool = True):
        C_emb = self.emb_C(trg)
        C = self.pos_enc_C(C_emb, deterministic).astype(self.dtype)
        m1_mask = masks["A_mask"] if self.modality == "audio" else masks["V_mask"]
        wf = C
        for layer in self.uni_worker_fus:
            wf = layer(wf, Va, m1_mask, masks["C_mask"], deterministic)
        mf = C
        for layer in self.uni_manager_fus:
            mf = layer(mf, Va, m1_mask, masks["C_mask"], deterministic)
        goals = self.manager(mf, segment_labels, exploration, deterministic)
        pred = self.worker(wf, goals, masks["C_mask"], deterministic)
        return pred, wf, mf, goals, segment_labels

    def decode_frontier(self, trg, segment_labels, Va, Av, masks, t,
                        exploration=False, deterministic: bool = True):
        """Fusion stacks over the full buffer; manager linear, goal-attention
        query and vocab projection at the frontier position only (same
        contract as BMHrlAgent.decode_frontier; exploration noise stats over
        positions <= t per ref bm_hrl_agent.py:444-452)."""
        import jax

        C_emb = self.emb_C(trg)
        C = self.pos_enc_C(C_emb, deterministic).astype(self.dtype)
        m1_mask = masks["A_mask"] if self.modality == "audio" else masks["V_mask"]
        wf = C
        for layer in self.uni_worker_fus:
            wf = layer(wf, Va, m1_mask, masks["C_mask"], deterministic)
        mf = C
        for layer in self.uni_manager_fus:
            mf = layer(mf, Va, m1_mask, masks["C_mask"], deterministic)
        mf_t = jax.lax.dynamic_slice_in_dim(mf, t, 1, axis=1)
        label_t = jax.lax.dynamic_slice_in_dim(
            segment_labels, t, 1, axis=1)[:, 0]
        x_t = self.manager.linear(mf_t.astype(jnp.float32))
        x_t = self.manager.drop(x_t, deterministic=deterministic)
        if exploration:
            x_full = self.manager.linear(mf.astype(jnp.float32))
            from bmhrl_tpu.ops.segments import frontier_exploration_noise

            x_t = x_t + frontier_exploration_noise(
                x_full, t, self.d_goal, self.make_rng("noise"),
                self.manager.mean_factor, self.manager.std_factor)
        from bmhrl_tpu.ops.segments import frontier_goal

        goal_t = frontier_goal(x_t, label_t, segment_labels.any(axis=1))
        wf_t = jax.lax.dynamic_slice_in_dim(wf, t, 1, axis=1)
        mask_row = jax.lax.dynamic_slice_in_dim(masks["C_mask"], t, 1, axis=1)
        return self.worker.frontier(wf_t, wf, goal_t, mask_row, deterministic)

    def inference(self, x, trg, masks):
        return self(x, trg, masks)[0]


class AudioAgent:
    """ref: bm_hrl_agent.py:802-804."""

    @staticmethod
    def build(cfg, voc_size: int, dtype) -> UnimodalAgent:
        return UnimodalAgent(
            voc_size=voc_size, d_m1=cfg.d_aud, d_ff_m1=cfg.rl_ff_a,
            modality="audio", d_model=cfg.d_model,
            d_model_caps=cfg.d_model_caps, att_heads=cfg.rl_att_heads,
            att_layers=cfg.rl_att_layers, dout_p=cfg.dout_p,
            d_goal=cfg.rl_goal_d,
            critic_score_threshold=cfg.rl_critic_score_threshhold,
            dtype=dtype)


class VideoAgent:
    """ref: bm_hrl_agent.py:807-809."""

    @staticmethod
    def build(cfg, voc_size: int, dtype) -> UnimodalAgent:
        return UnimodalAgent(
            voc_size=voc_size, d_m1=cfg.d_vid, d_ff_m1=cfg.rl_ff_v,
            modality="video", d_model=cfg.d_model,
            d_model_caps=cfg.d_model_caps, att_heads=cfg.rl_att_heads,
            att_layers=cfg.rl_att_layers, dout_p=cfg.dout_p,
            d_goal=cfg.rl_goal_d,
            critic_score_threshold=cfg.rl_critic_score_threshhold,
            dtype=dtype)
