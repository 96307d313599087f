"""DETR-style captioner (mode=DETR, the reference CLI's default).

Parity targets:
- model/det_bmhrl_agent.py:12-208 (DetrCaption: stacked Conv1d+GroupNorm
  temporal projections, post-norm TransformerEncoder over video, ObjectDetect
  head feeding decoder cross-attention, TransformerDecoder worker,
  manager path disabled via use_manager=False, end tokens replaced by pad in
  the input);
- model/encoder.py:10-75 (post-norm encoder; Q,K get positional encoding, V
  does not);
- model/decoder.py:7-107 (decoder with causal self-attention when the
  pos-enc callable is used, cross-attention to memory with the *pre-self-att*
  queries — a reference quirk kept here — optional goal attention, optional
  detected-object attention whose mask the reference drops);
- model/object_detector.py:8-46 (mini-DETR: 100 learned queries, 6-layer
  encoder/decoder @ 256, class head over vocab+1 with a "no word" class).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from bmhrl_tpu.models.attention import MultiheadedAttention
from bmhrl_tpu.models.blocks import PositionalEncoder, VocabularyEmbedder
from bmhrl_tpu.models.critic import SegmentCritic

PAD, EOS = 1, 3


def _torch_bias_init(fan_in: int):
    """torch Conv1d/Linear bias init: uniform(-1/sqrt(fan_in), +...)."""
    bound = 1.0 / float(np.sqrt(fan_in))

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class DetrEncoderLayer(nn.Module):
    """Post-norm encoder layer; Q,K carry position, V does not.
    ref: encoder.py:39-75."""

    d_model: int
    nhead: int
    dim_ff: int
    dout_p: float
    dtype: jnp.dtype = jnp.bfloat16

    def setup(self):
        self.self_attn = MultiheadedAttention(
            self.d_model, self.d_model, self.d_model, self.nhead,
            self.dout_p, self.d_model, dtype=self.dtype)
        self.norm1 = nn.LayerNorm(epsilon=1e-5)
        self.norm2 = nn.LayerNorm(epsilon=1e-5)
        self.linear1 = nn.Dense(self.dim_ff, dtype=self.dtype)
        self.linear2 = nn.Dense(self.d_model, dtype=self.dtype)
        self.drop = nn.Dropout(self.dout_p)

    def __call__(self, src, mask, pos_enc, deterministic: bool = True):
        q = pos_enc(src, deterministic)
        src2 = self.self_attn(q, q, src, mask, deterministic=deterministic)
        src = src + self.drop(src2, deterministic=deterministic)
        src = self.norm1(src.astype(jnp.float32)).astype(self.dtype)
        h = nn.relu(self.linear1(src))
        h = self.drop(h, deterministic=deterministic)
        src2 = self.linear2(h)
        src = src + self.drop(src2, deterministic=deterministic)
        return self.norm2(src.astype(jnp.float32)).astype(self.dtype)


class DetrEncoder(nn.Module):
    """ref: encoder.py:10-36 (return_intermediate=False path + final norm)."""

    d_model: int
    nhead: int
    dim_ff: int
    dout_p: float
    num_layers: int
    final_norm: bool = True
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, src, mask, pos_enc, deterministic: bool = True):
        out = src
        for i in range(self.num_layers):
            out = DetrEncoderLayer(
                self.d_model, self.nhead, self.dim_ff, self.dout_p,
                self.dtype, name=f"layer_{i}")(out, mask, pos_enc, deterministic)
        if self.final_norm:
            out = nn.LayerNorm(epsilon=1e-5, name="norm")(out.astype(jnp.float32)).astype(self.dtype)
        return out


class DetrDecoderLayer(nn.Module):
    """ref: decoder.py:39-107 — including the reference's quirky orders:
    self-att residual adds the attention output to the *normed* tgt; the
    cross/goal/object attentions use the pre-self-attention queries; the
    object-attention mask is dropped."""

    d_model: int  # memory dim
    nhead: int
    d_model_C: int
    d_goal: int
    dim_ff: int
    dout_p: float
    d_obj: int = 256
    dtype: jnp.dtype = jnp.bfloat16

    def setup(self):
        dd = dict(dout_p=self.dout_p, d_model=self.d_model, dtype=self.dtype)
        self.self_attn = MultiheadedAttention(
            self.d_model_C, self.d_model_C, self.d_model_C, self.nhead,
            name="self_attn", **dd)
        self.multihead_attn = MultiheadedAttention(
            self.d_model_C, self.d_model, self.d_model, self.nhead,
            name="multihead_attn", **dd)
        self.goal_attention = MultiheadedAttention(
            self.d_model_C, self.d_goal, self.d_goal, self.nhead,
            name="goal_attention", **dd)
        self.detected_attention = MultiheadedAttention(
            self.d_model_C, self.d_obj, self.d_obj, self.nhead,
            name="detected_attention", **dd)
        self.norms = {i: nn.LayerNorm(epsilon=1e-5, name=f"norm{i}")
                      for i in (1, 2, 3, 4, 5)}
        self.drops = {i: nn.Dropout(self.dout_p, name=f"dropout{i}")
                      for i in (1, 2, 3, 4, 5)}
        self.linear1 = nn.Dense(self.dim_ff, dtype=self.dtype, name="linear1")
        self.linear2 = nn.Dense(self.d_model_C, dtype=self.dtype,
                                name="linear2")
        self.ff_drop = nn.Dropout(self.dout_p)

    def __call__(self, tgt, memory, memory_mask, pos_enc, query_pos_enc,
                 query_mask, goal=None, goal_mask=None, goal_pos_enc=None,
                 add_pos: Optional[jnp.ndarray] = None,
                 detected_objects=None, deterministic: bool = True,
                 mem_kv=None, obj_kv=None):
        """``mem_kv``/``obj_kv``: optional per-clip precomputed projected
        K/V for the memory cross-attention / object attention (decode-time
        only — they fold the deterministic pos_enc(memory), so callers must
        not pass them when dropout is live). The goal attention K/V is NOT
        cacheable: goals change retroactively during pre_goal decode."""
        self_attn = self.self_attn
        cross_attn = self.multihead_attn
        goal_attn = self.goal_attention
        det_attn = self.detected_attention
        det = deterministic
        drop = lambda i, x: self.drops[i](x, deterministic=det)

        if add_pos is None:
            q = k = query_pos_enc(tgt, det)
            causal = True
        else:
            q = k = tgt + add_pos
            causal = False
        tgt2 = self_attn(q, k, tgt, query_mask, causal=causal, deterministic=det)
        # reference order: norm BEFORE the residual add (decoder.py:77-78)
        tgt = self.norms[1](tgt.astype(jnp.float32)).astype(self.dtype)
        tgt = tgt + drop(1, tgt2)

        if mem_kv is not None:
            tgt2 = cross_attn(q, None, None, memory_mask, deterministic=det,
                              precomputed_kv=mem_kv)
        else:
            tgt2 = cross_attn(q, pos_enc(memory, det), memory, memory_mask,
                              deterministic=det)
        tgt = tgt + drop(2, tgt2)
        tgt = self.norms[2](tgt.astype(jnp.float32)).astype(self.dtype)
        if goal is not None:
            tgt2 = goal_attn(query_pos_enc(tgt, det), goal_pos_enc(goal, det),
                             goal, goal_mask, deterministic=det)
            tgt = tgt + drop(4, tgt2)
            tgt = self.norms[4](tgt.astype(jnp.float32)).astype(self.dtype)
        if detected_objects is not None or obj_kv is not None:
            # the reference drops the object mask (decoder.py:107)
            tgt2 = det_attn(q, detected_objects, detected_objects, None,
                            deterministic=det, precomputed_kv=obj_kv)
            tgt = tgt + drop(5, tgt2)
            tgt = self.norms[5](tgt.astype(jnp.float32)).astype(self.dtype)
        h = self.linear1(tgt)
        h = nn.relu(h)
        h = self.ff_drop(h, deterministic=det)
        tgt2 = self.linear2(h)
        tgt = tgt + drop(3, tgt2)
        return self.norms[3](tgt.astype(jnp.float32)).astype(self.dtype)

    def step(self, tgt_t, t, cache, memory_mask, kv_mem, obj_mem, pe_row,
             deterministic: bool = True, key_mask=None):
        """Single-position decode step for the caption path (add_pos=None,
        no goal stream): KV-cached causal self-attention (Q/K from the
        pos-encoded stream, V from the raw stream — the reference quirk),
        cross-attention against per-clip precomputed projected memory K/V,
        folded object attention over the raw detected-object embeddings
        (mask dropped, like the reference), then the FFN with the
        reference's norm-before/after-residual orders. tgt_t: (B, 1, Dc)
        raw stream position; pe_row: (1, 1, Dc) positional-encoding row t;
        kv_mem from multihead_attn.project_kv(pos_enc(memory), memory);
        obj_mem: (B, 100, d_obj) raw. Token-exact with ``__call__``'s
        row t."""
        det = deterministic
        q_t = (tgt_t + pe_row).astype(self.dtype)
        tgt2, k, v = self.self_attn.attend_step_qkv(
            q_t, q_t, tgt_t, cache["k"], cache["v"], t, det,
            key_mask=key_mask)
        tgt = self.norms[1](tgt_t.astype(jnp.float32)).astype(self.dtype)
        tgt = tgt + tgt2.astype(self.dtype)

        tgt2 = self.multihead_attn(q_t, None, None, memory_mask,
                                   deterministic=det, precomputed_kv=kv_mem)
        tgt = tgt + tgt2.astype(self.dtype)
        tgt = self.norms[2](tgt.astype(jnp.float32)).astype(self.dtype)

        tgt2 = self.detected_attention.attend_folded(
            q_t, obj_mem, None, deterministic=det)
        tgt = tgt + tgt2.astype(self.dtype)
        tgt = self.norms[5](tgt.astype(jnp.float32)).astype(self.dtype)

        h = self.linear1(tgt)
        h = nn.relu(h)
        tgt2 = self.linear2(h)
        tgt = tgt + tgt2.astype(self.dtype)
        return (self.norms[3](tgt.astype(jnp.float32)).astype(self.dtype),
                {"k": k, "v": v})


class DetrDecoder(nn.Module):
    """ref: decoder.py:7-36 (return_intermediate=False + final norm)."""

    d_model: int
    nhead: int
    d_model_C: int
    d_goal: int
    dim_ff: int
    dout_p: float
    num_layers: int
    d_obj: int = 256
    dtype: jnp.dtype = jnp.bfloat16

    def setup(self):
        self.layers = [
            DetrDecoderLayer(
                self.d_model, self.nhead, self.d_model_C, self.d_goal,
                self.dim_ff, self.dout_p, self.d_obj, self.dtype,
                name=f"layer_{i}")
            for i in range(self.num_layers)]
        self.final_norm = nn.LayerNorm(epsilon=1e-5, name="norm")

    def __call__(self, tgt, memory, memory_mask, pos_enc, query_pos_enc,
                 query_mask, goal=None, goal_mask=None, goal_pos_enc=None,
                 add_pos=None, detected_objects=None,
                 deterministic: bool = True, mem_kv=None, obj_kv=None):
        out = tgt
        for i, layer in enumerate(self.layers):
            out = layer(
                out, memory, memory_mask, pos_enc, query_pos_enc, query_mask,
                goal, goal_mask, goal_pos_enc, add_pos, detected_objects,
                deterministic,
                mem_kv=None if mem_kv is None else mem_kv[i],
                obj_kv=None if obj_kv is None else obj_kv[i])
        return self.final_norm(out.astype(jnp.float32)).astype(self.dtype)

    def precompute_mem_kv(self, memory, deterministic: bool = True):
        """Per-layer projected cross-attention K/V of the static encoded
        memory — K from the pos-encoded memory, V from the raw memory (the
        reference's convention) — computed once per clip."""
        from bmhrl_tpu.models.blocks import sinusoid_table

        # bitwise-identical to PositionalEncoder: table cast to the memory
        # dtype BEFORE the add
        table = jnp.asarray(sinusoid_table(3660, memory.shape[-1]))
        mem_pe = memory + table[None, :memory.shape[1]].astype(memory.dtype)
        return [layer.multihead_attn.project_kv(mem_pe, memory)
                for layer in self.layers]

    def precompute_obj_kv(self, detected_objects):
        """Per-layer projected K/V of the static detected-object embeddings
        (the object attention uses the raw embeddings for both, no pos-enc,
        mask dropped — decoder.py:107)."""
        return [layer.detected_attention.project_kv(detected_objects,
                                                    detected_objects)
                for layer in self.layers]

    def step(self, tgt_t, t, caches, memory_mask, kv_mem, obj_mem, pe_row,
             deterministic: bool = True, key_mask=None):
        """Single-position pass through the stack + final norm."""
        new_caches = []
        for layer, cache, kv in zip(self.layers, caches, kv_mem):
            tgt_t, cache = layer.step(tgt_t, t, cache, memory_mask, kv,
                                      obj_mem, pe_row, deterministic,
                                      key_mask=key_mask)
            new_caches.append(cache)
        return (self.final_norm(tgt_t.astype(jnp.float32)).astype(self.dtype),
                new_caches)


class ObjectDetect(nn.Module):
    """Mini-DETR word-set detector. ref: object_detector.py:8-46."""

    voc_size: int
    d_model: int
    d_goal: int
    dout_p: float
    hidden_dim: int = 256
    num_queries: int = 100
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, samples, mask, deterministic: bool = True):
        num_classes = self.voc_size + 1
        x = nn.Dense(self.hidden_dim, dtype=self.dtype,
                     name="input_projection")(samples)
        pos_enc = PositionalEncoder(self.hidden_dim, self.dout_p,
                                    name="pos_enc")
        memory = DetrEncoder(
            self.hidden_dim, 4, 2048, self.dout_p, 6, dtype=self.dtype,
            name="encoder")(x, mask, pos_enc, deterministic)
        B = samples.shape[0]
        query_pos = self.param(
            "query_embed", nn.initializers.normal(1.0),
            (self.num_queries, self.hidden_dim))
        qp = jnp.broadcast_to(query_pos[None], (B, self.num_queries,
                                                self.hidden_dim)).astype(self.dtype)
        tgt = jnp.zeros_like(qp)
        hs = DetrDecoder(
            self.hidden_dim, 4, self.hidden_dim, self.d_goal, 2048,
            self.dout_p, 6, dtype=self.dtype, name="decoder")(
            tgt, memory, mask, pos_enc, pos_enc, None, add_pos=qp,
            deterministic=deterministic)
        predicted_words = nn.Dense(num_classes, dtype=jnp.float32,
                                   name="class_embed")(hs.astype(jnp.float32))
        no_word = (jnp.argmax(nn.softmax(predicted_words, -1), -1)
                   == (num_classes - 1))
        return predicted_words, jax.lax.stop_gradient(hs), jax.lax.stop_gradient(no_word)


class DetrCaption(nn.Module):
    """DETR-variant captioner. ref: det_bmhrl_agent.py:12-208.

    Default path: use_manager=False, pre_goal_attention=False (ref :165).

    ``pre_goal_attention=True`` enables the goal-fusion path the reference
    *designed* but cannot execute: its forward reads ``goals`` under
    ``if self.pre_goal_attention`` (ref :188-199) while the block computing
    ``goals`` is gated by the hardcoded ``use_manager = False`` (ref :165),
    so the shipped code raises NameError. We implement the intended
    composition — manager_decoder context -> critic segment labels with the
    first-end-token boundary forcing (ref :177-185) -> Manager goals ->
    goal/goal-feature attention fusion into the caption stream
    (ref :188-199) — with a widened (d_caps + d_goal) worker decoder and
    vocab head (ref :46-56)."""

    voc_size: int
    d_model: int = 1024
    d_model_caps: int = 300
    d_goal: int = 64
    nhead: int = 4
    num_layers: int = 3
    n_time: int = 3
    dim_ff: int = 2048
    dout_p: float = 0.1
    critic_score_threshold: float = 0.25
    pre_goal_attention: bool = False
    dtype: jnp.dtype = jnp.bfloat16

    def setup(self):
        self.pos_enc = PositionalEncoder(self.d_model, self.dout_p)
        self.pos_enc_C = PositionalEncoder(self.d_model_caps, self.dout_p)
        self.emb_C = VocabularyEmbedder(self.voc_size, self.d_model_caps)
        self.critic = SegmentCritic(self.d_model_caps)
        # stacked temporal Conv1d projections with GroupNorm (ref :79-91).
        # torch Conv1d init (kaiming-uniform weight, uniform NONZERO bias):
        # flax's zero bias init makes conv(0) == 0 exactly, so a clip whose
        # features are missing (zero-filled, data/features.py) keeps the
        # whole stack identically zero — every GroupNorm/LayerNorm then
        # normalizes a zero-variance input and the backward amplifies by
        # 1/sqrt(eps) per norm layer, overflowing to inf/nan in the first
        # DETR update. The reference never hits this precisely because
        # torch biases are nonzero at init.
        def conv_fan_in(i):
            d_in = 1024 if i == 0 else self.d_model  # i3d features first
            return d_in * 3 * (i + 1)

        self.input_proj = [
            nn.Conv(self.d_model, kernel_size=(3 * (i + 1),), padding="SAME",
                    dtype=self.dtype,
                    kernel_init=nn.initializers.variance_scaling(
                        1.0 / 3.0, "fan_in", "uniform"),
                    bias_init=_torch_bias_init(conv_fan_in(i)),
                    name=f"input_proj_{i}")
            for i in range(self.n_time)]
        self.input_norms = [
            nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=jnp.float32,
                         name=f"input_norm_{i}")
            for i in range(self.n_time)]
        self.encoder = DetrEncoder(
            self.d_model, self.nhead, self.dim_ff, self.dout_p,
            self.num_layers, dtype=self.dtype, name="encoder")
        self.object_detector = ObjectDetect(
            self.voc_size, self.d_model, self.d_goal, self.dout_p,
            dtype=self.dtype, name="object_detector")
        # pre_goal_attention widens the worker stream to d_caps + d_goal
        # (ref det_bmhrl_agent.py:46-56)
        d_worker = self.d_model_caps + (self.d_goal if self.pre_goal_attention
                                        else 0)
        self.worker_decoder = DetrDecoder(
            self.d_model, self.nhead, d_worker, self.d_goal,
            self.dim_ff, self.dout_p, self.num_layers, dtype=self.dtype,
            name="worker_decoder")
        self.linear = nn.Dense(self.voc_size, dtype=jnp.float32, name="linear")
        if self.pre_goal_attention:
            from bmhrl_tpu.models.bmhrl import Manager

            self.manager_decoder = DetrDecoder(
                self.d_model, self.nhead, self.d_model_caps, self.d_goal,
                self.dim_ff, self.dout_p, self.num_layers, dtype=self.dtype,
                name="manager_decoder")
            self.manager = Manager(self.d_model_caps, self.d_goal,
                                   self.dout_p, name="manager")
            self.pos_enc_goal = PositionalEncoder(self.d_goal, self.dout_p)
            self.pos_enc_concat = PositionalEncoder(d_worker, self.dout_p)
            att = dict(dout_p=self.dout_p, d_model=self.d_model,
                       dtype=self.dtype)
            self.goal_attention = MultiheadedAttention(
                self.d_model_caps, self.d_goal, self.d_goal, self.nhead,
                name="goal_attention", **att)
            self.goal_feature_attention = MultiheadedAttention(
                self.d_goal, self.d_model_caps, self.d_model_caps, self.nhead,
                name="goal_feature_attention", **att)
            self.goal_norm = nn.LayerNorm(epsilon=1e-5, name="goal_norm")
            self.goal_dropout = nn.Dropout(self.dout_p)

    # -- pieces --------------------------------------------------------------
    def project_video(self, x_video, deterministic: bool = True):
        vf = x_video.astype(self.dtype)
        for conv, norm in zip(self.input_proj, self.input_norms):
            vf = conv(vf)
            vf = norm(vf.astype(jnp.float32)).astype(self.dtype)
        return vf

    def encode(self, V, A, masks, deterministic: bool = True):
        """Returns (memory, detected-object embeddings) in the generic
        (Va, Av) memory slots used by the decode loop."""
        vf = self.project_video(V, deterministic)
        mask = masks["V_mask"]
        _, hs_obj, _ = self.object_detector(vf, mask, deterministic)
        memory = self.encoder(vf, mask, self.pos_enc, deterministic)
        return memory, hs_obj

    def _forced_segment_labels(self, trg, C):
        """Critic labels with the first-end-token boundary forced to 1 and
        everything after it zeroed (ref det_bmhrl_agent.py:177-185;
        vectorized instead of the reference's per-row host loop). ``trg``
        already has EOS replaced by PAD."""
        segments = nn.sigmoid(self.critic(C))
        labels = (segments[..., 0] > self.critic_score_threshold).astype(
            jnp.int32)
        L = trg.shape[1]
        pad_count = jnp.sum((trg == PAD).astype(jnp.int32), axis=-1)
        first_end = L - 1 - pad_count  # (B,)
        pos = jnp.arange(L)[None, :]
        labels = jnp.where(pos == first_end[:, None], 1, labels)
        return jnp.where(pos > first_end[:, None], 0, labels)

    def caption_head(self, trg, memory, hs_obj, masks,
                     exploration: bool = False, deterministic: bool = True,
                     fusion_kv=None):
        wf = self.caption_features(trg, memory, hs_obj, masks, exploration,
                                   deterministic, fusion_kv=fusion_kv)
        pred = nn.log_softmax(self.linear(wf.astype(jnp.float32)), axis=-1)
        return pred, wf

    def precompute_fusion_kv(self, Va, Av):
        """Per-clip projected K/V of everything static under decode: the
        worker (and pre_goal manager) decoder memory cross-attentions and
        the worker object attention. The goal stream is NOT cacheable — its
        forced-boundary labels change retroactively as generation proceeds
        (ref det_bmhrl_agent.py:188-199) — but the memory/object K/V are
        per-clip constants regardless. Used by the frontier decode loop
        (train/decode._decode_loop). Va = encoded memory, Av = detected
        objects (the generic decode slots)."""
        kv = {"worker_mem": self.worker_decoder.precompute_mem_kv(Va),
              "worker_obj": self.worker_decoder.precompute_obj_kv(Av)}
        if self.pre_goal_attention:
            kv["manager_mem"] = self.manager_decoder.precompute_mem_kv(Va)
        return kv

    def caption_features(self, trg, memory, hs_obj, masks,
                         exploration: bool = False,
                         deterministic: bool = True, fusion_kv=None):
        trg = jnp.where(trg == EOS, PAD, trg)  # ref :151-152
        C = self.emb_C(trg)
        det = deterministic
        fkv = fusion_kv or {}
        if self.pre_goal_attention:
            # the goal-fusion path (ref :167-199, intent — see class doc)
            worker_context = self.manager_decoder(
                C.astype(self.dtype), memory, masks["V_mask"], self.pos_enc,
                self.pos_enc_C, masks["C_mask"], deterministic=det,
                mem_kv=fkv.get("manager_mem"))
            labels = self._forced_segment_labels(trg, C)
            goals = self.manager(worker_context.astype(jnp.float32), labels,
                                 exploration, det)
            gfa = self.goal_feature_attention(
                self.pos_enc_goal(goals.astype(self.dtype), det),
                self.pos_enc_C(C, det).astype(self.dtype), C.astype(self.dtype),
                masks["C_mask"], deterministic=det)
            tgt2 = self.goal_attention(
                self.pos_enc_C(C, det).astype(self.dtype),
                self.pos_enc_goal(goals.astype(self.dtype), det),
                goals.astype(self.dtype), masks["C_mask"], deterministic=det)
            C = C + self.goal_dropout(tgt2.astype(C.dtype), deterministic=det)
            C = self.goal_norm(C.astype(jnp.float32))
            C = jnp.concatenate([C.astype(self.dtype),
                                 gfa.astype(self.dtype)], axis=-1)
            query_pe = self.pos_enc_concat
        else:
            query_pe = self.pos_enc_C
        return self.worker_decoder(
            C.astype(self.dtype), memory, masks["V_mask"], self.pos_enc,
            query_pe, masks["C_mask"], detected_objects=hs_obj,
            deterministic=det, mem_kv=fkv.get("worker_mem"),
            obj_kv=fkv.get("worker_obj"))

    def __call__(self, x, trg, masks, mix_factor=None, exploration=False,
                 deterministic: bool = True):
        """Returns (pred, worker_feat[:, :, :300], memory, None-goals,
        None-segments, prediction_classes) — the reference 6-tuple with the
        unused slots as zeros (static shapes). ref :148-208."""
        V, A = x
        vf = self.project_video(V, deterministic)
        mask = masks["V_mask"]
        classified_words, hs_obj, _ = self.object_detector(
            vf, mask, deterministic)
        memory = self.encoder(vf, mask, self.pos_enc, deterministic)
        pred, wf = self.caption_head(trg, memory, hs_obj, masks,
                                     exploration, deterministic)
        B, Lc = trg.shape
        zeros_goal = jnp.zeros((B, Lc, self.d_goal), jnp.float32)
        zeros_seg = jnp.zeros((B, Lc), jnp.int32)
        return (pred, wf[:, :, : self.d_model_caps], memory, zeros_goal,
                zeros_seg, classified_words)

    # -- decode-loop contract (shared with BMHrlAgent) -----------------------
    # The executed DETR path disables the manager (use_manager=False,
    # ref :165-186), so segment labels never influence decoding; the critic
    # hooks are inert zero-cost stubs (the critic module itself is also
    # unused at init, matching the reference's dead critic on this path).
    def critic_init_state(self, B: int):
        return jnp.zeros((B,), jnp.float32)

    def critic_step(self, token_t, state):
        return jnp.full(token_t.shape, -1e9, jnp.float32), state

    def decode_with_labels(self, trg, segment_labels, Va, Av, masks,
                           exploration=False, deterministic: bool = True,
                           fusion_kv=None):
        pred, wf = self.caption_head(trg, Va, Av, masks, exploration,
                                     deterministic, fusion_kv=fusion_kv)
        return pred, wf, Va, None, segment_labels

    def decode_frontier(self, trg, segment_labels, Va, Av, masks, t,
                        exploration=False, deterministic: bool = True,
                        fusion_kv=None):
        """Decoder stack over the full buffer, vocab projection only at the
        frontier position t (the dominant per-token decode matmul); the
        static memory/object K/V come precomputed per clip (fusion_kv)."""
        wf = self.caption_features(trg, Va, Av, masks, exploration,
                                   deterministic, fusion_kv=fusion_kv)
        wf_t = jax.lax.dynamic_slice_in_dim(wf, t, 1, axis=1)
        logits = self.linear(wf_t.astype(jnp.float32))[:, 0]
        return nn.log_softmax(logits, axis=-1)

    # -- fully incremental decode (default path only: the pre_goal path's
    # forced-boundary labels change retroactively as generation proceeds,
    # so its goal stream is not incrementally cacheable) -------------------
    DETR_INCREMENTAL = True

    def init_decode_caches(self, B: int, L: int):
        def c(layer):
            z = jnp.zeros(layer.self_attn.kv_cache_shape(B, L), self.dtype)
            return {"k": z, "v": jnp.zeros_like(z)}

        return {"dec": [c(l) for l in self.worker_decoder.layers]}

    def precompute_decode_mem(self, memory):
        """Per-clip projected cross-attention K/V for every decoder layer."""
        return self.worker_decoder.precompute_mem_kv(memory)

    def decode_step(self, tok_t, t, caches, masks, kv_mem, hs_obj,
                    key_mask=None, deterministic: bool = True):
        """One-token decode: EOS->PAD input quirk, embed, pos-encode the
        query stream, KV-cached decoder stack step, frontier vocab head.
        Token-exact with decode_frontier (tested)."""
        from bmhrl_tpu.models.blocks import sinusoid_table

        tok = jnp.where(tok_t == EOS, PAD, tok_t)  # ref :151-152
        C_t = self.emb_C(tok[:, None]).astype(self.dtype)
        table = jnp.asarray(sinusoid_table(3660, self.d_model_caps))
        pe_row = table[t][None, None, :].astype(self.dtype)
        wf_t, dec = self.worker_decoder.step(
            C_t, t, caches["dec"], masks["V_mask"], kv_mem, hs_obj, pe_row,
            deterministic, key_mask=key_mask)
        logits = self.linear(wf_t.astype(jnp.float32))[:, 0]
        return nn.log_softmax(logits, axis=-1), {"dec": dec}

    def inference(self, x, trg, masks):
        return self(x, trg, masks)[0]

    @staticmethod
    def build(cfg, voc_size: int, dtype) -> "DetrCaption":
        return DetrCaption(
            voc_size=voc_size, d_model=cfg.d_model,
            d_model_caps=cfg.d_model_caps, d_goal=cfg.rl_goal_d,
            nhead=cfg.rl_att_heads, dout_p=cfg.dout_p,
            pre_goal_attention=getattr(cfg, "pre_goal_attention", False),
            dtype=dtype)
