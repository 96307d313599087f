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

    @nn.compact
    def __call__(self, x, mask, deterministic: bool = True):
        att = MultiheadedAttention(
            self.d_m1, self.d_m1, self.d_m1, self.H, self.dout_p,
            self.d_model, dtype=self.dtype, name="self_att_M1")
        ff = PositionwiseFeedForward(self.d_m1, self.d_ff, self.dout_p,
                                     self.dtype, name="ff_M1")
        res0 = ResidualConnection(self.d_m1, self.dout_p, name="res_M1_0")
        res2 = ResidualConnection(self.d_m1, self.dout_p, name="res_M1_2")
        det = deterministic
        x = res0(x, lambda h: att(h, h, h, mask, deterministic=det), det)
        x = res2(x, lambda h: ff(h, det), det)
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

    @nn.compact
    def __call__(self, C, memory, m1_mask, c_mask, deterministic: bool = True):
        self_att = MultiheadedAttention(
            self.d_model_C, self.d_model_C, self.d_model_C, self.H,
            self.dout_p, self.d_model, dtype=self.dtype, name="self_att")
        enc_att = MultiheadedAttention(
            self.d_model_C, self.d_m1, self.d_m1, self.H, self.dout_p,
            self.d_model, dtype=self.dtype, name="enc_att")
        res_self = ResidualConnection(self.d_model_C, self.dout_p,
                                      name="res_self_att")
        res_enc = ResidualConnection(self.d_model_C, self.dout_p,
                                     name="res_enc_att")
        det = deterministic
        C = res_self(C, lambda h: self_att(h, h, h, c_mask, deterministic=det), det)
        Cm = res_enc(C, lambda h: enc_att(h, memory, memory, m1_mask,
                                          deterministic=det), det)
        Cm = nn.LayerNorm(epsilon=1e-5, name="normC")(Cm.astype(jnp.float32))
        return Cm.astype(self.dtype)


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
    def critic_init_state(self, B: int):
        return self.critic.init_state(B)

    def critic_step(self, token_t, state):
        emb_t = self.emb_C(token_t[:, None])[:, 0]
        score, state = self.critic.step(emb_t, state)
        return score[:, 0], state

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
