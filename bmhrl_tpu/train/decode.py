"""Jitted autoregressive decoders.

The reference's greedy decoder re-runs the ENTIRE model (bimodal encoder over
up to 300 video / 800 audio frames + the 6-layer critic RNN over the whole
caption) once per generated token inside a Python while-loop
(ref: epoch_loops/captioning_bmrl_loops.py:61-76). Here:

- the bimodal encoder runs once per clip;
- the frozen critic's RNN state is carried across steps (6 cell updates per
  token instead of a full 6-layer rescan — also keeps the compiled loop body
  free of nested scans, which compile/dispatch pathologically on TPU);
- the token loop is a ``lax.while_loop`` over a static (B, max_len+1) buffer
  with the reference's stop condition (all rows emitted </s> or max_len);
- per step only the caption-side stack (fusion decoders + heads over <=31
  positions) runs.

Tokens appended after a row finishes are garbage exactly like the reference;
detokenization truncates at the first </s>, so outputs match.
"""
from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from bmhrl_tpu.ops.masking import c_mask


def sample_filter(logits: jnp.ndarray, temperature: float = 1.0,
                  top_k: int = 0, top_p: float = 0.0) -> jnp.ndarray:
    """Sampling controls over per-step (B, V) log-probs: temperature
    scaling, top-k truncation, nucleus (top-p) truncation — serving
    diversity knobs the reference lacks (its sampled rollout is plain
    categorical, ref: captioning_bmrl_loops.py:277-283). Masked-out
    entries get -1e9 (the codebase's masking convention); the top-1 token
    always survives."""
    if temperature != 1.0:
        logits = logits / temperature
    if top_k and top_k > 0:
        kth = jax.lax.top_k(logits, top_k)[0][..., -1:]
        logits = jnp.where(logits < kth, -1e9, logits)
    if top_p and top_p > 0.0:
        sl = jnp.flip(jnp.sort(logits, axis=-1), axis=-1)
        probs = jax.nn.softmax(sl, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # smallest prefix whose mass reaches top_p (top-1 always kept)
        keep = jnp.maximum(jnp.sum((cum - probs) < top_p, axis=-1,
                                   keepdims=True), 1)
        thresh = jnp.take_along_axis(sl, keep - 1, axis=-1)
        logits = jnp.where(logits < thresh, -1e9, logits)
    return logits


def make_stacked_fusion(model):
    """Standalone BMFusion with the agent's hyperparams (constructed here —
    flax forbids calling helper methods on an unbound module)."""
    from bmhrl_tpu.models.bmhrl import BMFusion

    return BMFusion(
        d_model_A=model.d_audio, d_model_V=model.d_video,
        d_model_C=model.d_model_caps, d_model=model.d_model,
        d_ff_c=model.d_ff_c, dout_p=model.dout_p, H=model.att_heads,
        N=model.att_layers, dtype=model.dtype)


def make_stacked_uni_fusion(model):
    """Standalone UnimodalFusionStack with the agent's hyperparams."""
    from bmhrl_tpu.models.unimodal import UnimodalFusionStack

    return UnimodalFusionStack(
        d_m1=model.d_m1, d_model_C=model.d_model_caps,
        d_model=model.d_model, d_ff_c=model.d_ff_m1, dout_p=model.dout_p,
        H=model.att_heads, N=model.att_layers, dtype=model.dtype)


def _decode_loop(
    model,
    params,
    Va,
    Av,
    masks_src: Dict[str, jnp.ndarray],
    B: int,
    max_len: int,
    start_idx: int,
    end_idx: int,
    pad_idx: int,
    greedy: bool,
    rng: Optional[jax.Array],
    exploration: bool = False,
    sample_args=(1.0, 0, 0.0),
):
    L = max_len + 1
    trg0 = jnp.full((B, L), pad_idx, jnp.int32).at[:, 0].set(start_idx)
    done0 = jnp.zeros((B,), bool)
    labels0 = jnp.zeros((B, L), jnp.int32)
    crit0 = model.apply(params, B, method="critic_init_state")
    if rng is None:
        rng = jax.random.PRNGKey(0)
    thresh = model.critic_score_threshold
    # cross-attention K/V of the static memories: once per clip, not per
    # token (the dominant per-step matmuls otherwise)
    if hasattr(type(model), "precompute_fusion_kv"):
        fusion_kv = model.apply(params, Va, Av, method="precompute_fusion_kv")
        extra = {"fusion_kv": fusion_kv}
    else:
        extra = {}

    def cond(carry):
        t = carry[0]
        done = carry[2]
        return (t < max_len) & ~jnp.all(done)

    # frontier mode: stacks run over the full buffer, but the manager
    # linear / goal-attention query / vocab projection collapse to the one
    # frontier position (the vocab projection alone is ~25% of decode FLOPs)
    use_frontier = hasattr(type(model), "decode_frontier")

    def body(carry):
        t, trg, done, rng, probs, crit, labels = carry
        # advance the frozen critic with the token at position t
        score_t, crit = model.apply(
            params, trg[jnp.arange(B), t], crit, method="critic_step")
        lab_t = (jax.nn.sigmoid(score_t) > thresh).astype(jnp.int32)
        labels = labels.at[:, t].set(lab_t)

        masks = dict(masks_src)
        masks["C_mask"] = c_mask(trg, pad_idx)
        noise_rng = {"noise": jax.random.fold_in(rng, 2 * t + 1)}
        if use_frontier:
            logits_t = model.apply(
                params, trg, labels, Va, Av, masks, t,
                exploration=exploration, method="decode_frontier", **extra,
                rngs=noise_rng)
        else:
            preds = model.apply(
                params, trg, labels, Va, Av, masks, exploration=exploration,
                method="decode_with_labels", **extra, rngs=noise_rng,
            )[0]
            logits_t = preds[jnp.arange(B), t]  # (B, V) log-probs at pos t
        rng, sub = jax.random.split(rng)
        if greedy:
            nxt = jnp.argmax(logits_t, axis=-1).astype(jnp.int32)
        else:
            nxt = jax.random.categorical(
                sub, sample_filter(logits_t, *sample_args),
                axis=-1).astype(jnp.int32)
        p_t = jnp.take_along_axis(
            jnp.exp(logits_t), nxt[:, None], axis=-1)[:, 0]
        trg = trg.at[:, t + 1].set(nxt)
        probs = probs.at[:, t + 1].set(p_t)
        done = done | (nxt == end_idx)
        return (t + 1, trg, done, rng, probs, crit, labels)

    probs0 = jnp.zeros((B, L), jnp.float32)
    carry = jax.lax.while_loop(
        cond, body, (jnp.int32(0), trg0, done0, rng, probs0, crit0, labels0))
    return carry[1], carry[4]


def _fast_setup(model, params, Va, Av, masks_src, B, L, beam_share: int = 1):
    """Shared setup of the fully incremental decode step — used by the
    greedy/sampled loop (_decode_loop_fast) and the fast beam loop
    (_beam_loop_fast). Returns (caches0, valid0, step_fn, gather_caches)
    where ``step_fn(tok_t, t, caches, valid) -> (logits_t, caches)`` and
    ``gather_caches(caches, idx)`` reindexes every cache's batch rows
    (beam-search parent gather).

    ``beam_share`` > 1 (bimodal folded-kernel path only): ``B`` counts
    ROWS (clips x beams, clip-major) while ``Va/Av/masks_src`` stay at
    CLIP level — the W beams of a clip fold into the query-group axis of
    ops.attention.folded_attend, so each clip's raw memory streams from
    HBM ONCE per step for all beams instead of W times (the dominant
    token-loop traffic at serving batch; a repeated-memory beam pays W x).
    O(1) positions per token (KV-cached
    self-attention, carried critic state, folded cross-attention over the
    raw encoder memories). Exact for exploration=False. Requires the model
    to expose ``FUSION_PARAM_KEYS`` (BMHrlAgent). TPU structure:
    - the worker and manager fusion stacks — identical architectures —
      run as ONE vmapped computation over params stacked on a leading
      axis of 2 (halves the op count of the loop body);
    - cross-attention attends the RAW A/V memories with the K/V/output
      projections folded into the query/output side
      (MultiheadedAttention.folded_weights): the (B, H, Sk, d_k)
      per-layer K/V caches are never materialized, the raw memories are
      shared across the two stacks by the vmap, and per-token HBM
      traffic — the dominant decode cost at serving batch sizes — drops
      ~2.4x. The worker goal-attention head caches raw worker features
      the same way (Worker.step_raw);
    - a validity mask over generated positions (token != PAD) reproduces
      the full-buffer path's C_mask semantics for the caption-side
      attentions — a degenerate model can emit PAD mid-caption."""
    caches0 = model.apply(params, B, L, method="init_decode_caches")

    # folded-KV path: attend the raw encoder memories directly (shared
    # across the two stacked fusion stacks — vmap broadcasts them), no
    # (B, H, Sk, d_k) cross-attention caches at all
    stack2 = lambda a, b: jnp.stack([a, b])  # noqa: E731
    detr = hasattr(type(model), "DETR_INCREMENTAL")
    bimodal = (not detr) and hasattr(type(model), "FUSION_PARAM_KEYS")
    if detr:
        # single decoder stack, no critic/goal machinery on this path;
        # Va = encoded memory, Av = detected-object embeddings
        kv_mem = model.apply(params, Va, method="precompute_decode_mem")
    elif bimodal:
        mem = {"A": Av, "V": Va}
        fus = make_stacked_fusion(model)
        wk, mk = model.FUSION_PARAM_KEYS
        fus_params = jax.tree.map(
            stack2, params["params"][wk], params["params"][mk])
    else:  # unimodal: one memory, flat per-layer param keys
        mem = Va  # encode() returns the single modality memory in both slots
        fus = make_stacked_uni_fusion(model)
        wk, mk = model.UNI_FUSION_PARAM_PREFIXES

        def collect(prefix):
            return {f"layer_{i}": params["params"][f"{prefix}_layer_{i}"]
                    for i in range(model.att_layers)}

        fus_params = jax.tree.map(stack2, collect(wk), collect(mk))
        m1_mask_row = (masks_src["A_mask"] if model.modality == "audio"
                       else masks_src["V_mask"])
    if not detr:
        caches0 = dict(caches0)
        caches0["fus"] = jax.tree.map(
            stack2, caches0.pop("wself"), caches0.pop("mself"))
    # PAD-validity of consumed positions (<s> at 0 is valid by definition)
    valid0 = jnp.zeros((B, L), bool).at[:, 0].set(True)

    from bmhrl_tpu.ops import attention as fused_ops

    N_layers = fus.N if not detr else 0
    att_scale = (1.0 / float(model.d_model // model.att_heads) ** 0.5
                 if not detr else 1.0)
    if detr:
        use_folded_kernel = False
    elif bimodal:
        maskA = masks_src["A_mask"][:, 0, :]  # (B_clips, Sa) key-pad mask
        maskV = masks_src["V_mask"][:, 0, :]
        use_folded_kernel = (
            fused_ops.folded_qualifies(Av.shape[1], Av.shape[2])
            and fused_ops.folded_qualifies(Va.shape[1], Va.shape[2]))
    else:
        use_folded_kernel = False
    assert beam_share == 1 or (bimodal and use_folded_kernel), (
        "beam_share needs the bimodal folded-kernel path (caller must "
        "pre-check folded_qualifies and repeat memories otherwise)")

    def collapse(q2):  # (2, B, H, d) -> (B, 2H, d)
        return q2.transpose(1, 0, 2, 3).reshape(
            q2.shape[1], 2 * q2.shape[2], q2.shape[3])

    def uncollapse(c):  # (B, 2H, d) -> (2, B, H, d)
        B_, G, d = c.shape
        return c.reshape(B_, 2, G // 2, d).transpose(1, 0, 2, 3)

    def step_stacked_kernel(c_t, t, fcaches0, valid):
        """Per-layer split: the fused Pallas contraction serves both stacks
        with ONE memory read per branch (default —
        ops.attention.enable_folded_kernel)."""
        c2 = jnp.broadcast_to(c_t, (2,) + c_t.shape)
        fcaches = []
        for i in range(N_layers):
            def pre_i(m, c, cache, _i=i):
                return m.layers[_i].step_mem_pre(c, t, cache,
                                                 key_mask=valid)

            def one_pre(p, c, cache):
                return fus.apply({"params": p}, c, cache, method=pre_i)

            C2, qA2, qV2, cache_i = jax.vmap(one_pre)(
                fus_params, c2, fcaches0[i])

            def share_attend(q_rows, m, key_mask):
                # (rows, G, d) -> (clips, beams*G, d): W beams of a clip
                # share ONE HBM read of its memory (clip-major layout)
                if beam_share == 1:
                    return fused_ops.folded_attend(q_rows, m, key_mask,
                                                   att_scale)
                R, G, d_ = q_rows.shape
                q_c = q_rows.reshape(R // beam_share, beam_share * G, d_)
                ctx = fused_ops.folded_attend(q_c, m, key_mask, att_scale)
                return ctx.reshape(R, G, d_)

            ctxA = uncollapse(share_attend(collapse(qA2), mem["A"], maskA))
            ctxV = uncollapse(share_attend(collapse(qV2), mem["V"], maskV))

            def post_i(m, C, ca, cv, _i=i):
                return m.layers[_i].step_mem_post(C, ca, cv)

            def one_post(p, C, ca, cv):
                return fus.apply({"params": p}, C, ca, cv, method=post_i)

            c2 = jax.vmap(one_post)(fus_params, C2, ctxA, ctxV)
            fcaches.append(cache_i)
        return c2, fcaches

    def step_stacked(tok_t, t, caches, valid):
        c_t, label_t, crit = model.apply(
            params, tok_t, t, caches["critic"], method="decode_step_head")
        if use_folded_kernel:
            cf, fcaches = step_stacked_kernel(c_t, t, caches["fus"], valid)
        elif bimodal:
            # monolithic vmapped stack step (fastest measured XLA layout:
            # the per-layer split's extra transposes don't pay unless the
            # fused contraction kernel is on)
            masks = dict(masks_src)
            masks["C_kpad"] = valid

            def one(p, cache):
                return fus.apply({"params": p}, c_t, t, cache, masks,
                                 mem, method="step_mem")

            cf, fcaches = jax.vmap(one)(fus_params, caches["fus"])
        else:
            def one(p, cache):
                return fus.apply({"params": p}, c_t, t, cache, m1_mask_row,
                                 mem, key_mask=valid, method="step_mem")

            cf, fcaches = jax.vmap(one)(fus_params, caches["fus"])
        logits_t, goal_cache, hb = model.apply(
            params, cf[0], cf[1], label_t, caches["hb"], caches["goal"], t,
            method="decode_step_tail", key_mask=valid)
        return logits_t, {"critic": crit, "fus": fcaches,
                          "goal": goal_cache, "hb": hb}

    def step_detr(tok_t, t, caches, valid):
        return model.apply(
            params, tok_t, t, caches, masks_src, kv_mem, Av,
            key_mask=valid, method="decode_step")

    step_fn = step_detr if detr else step_stacked

    def gather_caches(caches, idx):
        """Reindex every cache's batch rows; the stacked-fusion caches
        carry the worker/manager axis FIRST, batch second."""
        if detr:
            return jax.tree.map(lambda x: x[idx], caches)
        return {
            "critic": jax.tree.map(lambda x: x[idx], caches["critic"]),
            "fus": jax.tree.map(lambda x: x[:, idx], caches["fus"]),
            "goal": caches["goal"][idx],
            "hb": caches["hb"][idx],
        }

    return caches0, valid0, step_fn, gather_caches


def _decode_loop_fast(
    model, params, Va, Av, masks_src, B, max_len, start_idx, end_idx,
    pad_idx, greedy, rng, sample_args=(1.0, 0, 0.0),
):
    """Fully incremental greedy/sampled decode loop (step machinery and
    exactness notes: _fast_setup). ``sample_args`` = (temperature, top_k,
    top_p) for the sampled branch (sample_filter)."""
    L = max_len + 1
    trg0 = jnp.full((B, L), pad_idx, jnp.int32).at[:, 0].set(start_idx)
    done0 = jnp.zeros((B,), bool)
    if rng is None:
        rng = jax.random.PRNGKey(0)
    caches0, valid0, step_fn, _ = _fast_setup(
        model, params, Va, Av, masks_src, B, L)

    def cond(carry):
        t, _, done = carry[0], carry[1], carry[2]
        return (t < max_len) & ~jnp.all(done)

    def body(carry):
        t, trg, done, rng, probs, caches, valid = carry
        tok_t = trg[jnp.arange(B), t]
        valid = valid.at[:, t].set(tok_t != pad_idx).at[:, 0].set(True)
        logits_t, caches = step_fn(tok_t, t, caches, valid)
        rng, sub = jax.random.split(rng)
        if greedy:
            nxt = jnp.argmax(logits_t, axis=-1).astype(jnp.int32)
        else:
            nxt = jax.random.categorical(
                sub, sample_filter(logits_t, *sample_args),
                axis=-1).astype(jnp.int32)
        # recorded prob is the model's TRUE prob of the chosen token (the
        # sampling filter only shapes the proposal distribution)
        p_t = jnp.take_along_axis(jnp.exp(logits_t), nxt[:, None], axis=-1)[:, 0]
        trg = trg.at[:, t + 1].set(nxt)
        probs = probs.at[:, t + 1].set(p_t)
        done = done | (nxt == end_idx)
        return (t + 1, trg, done, rng, probs, caches, valid)

    probs0 = jnp.zeros((B, L), jnp.float32)
    carry = jax.lax.while_loop(
        cond, body,
        (jnp.int32(0), trg0, done0, rng, probs0, caches0, valid0))
    return carry[1], carry[4]


@partial(jax.jit, static_argnames=(
    "model", "max_len", "start_idx", "end_idx", "pad_idx", "greedy",
    "exploration", "use_fast", "temperature", "top_k", "top_p"))
def decode(
    model,
    params,
    feats: Dict[str, jnp.ndarray],
    masks_src: Dict[str, jnp.ndarray],
    max_len: int,
    start_idx: int,
    end_idx: int,
    pad_idx: int,
    greedy: bool = True,
    rng: Optional[jax.Array] = None,
    exploration: bool = False,
    use_fast: Optional[bool] = None,
    temperature: float = 1.0,
    top_k: int = 0,
    top_p: float = 0.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy/sampled decode. feats: {'rgb','flow','audio'}; V = rgb + flow
    (ref: captioning_bmrl_loops.py:92). Returns (tokens (B, max_len+1),
    per-step chosen-token probs — the model's TRUE probs; temperature/
    top_k/top_p only shape the sampling proposal (sample_filter)."""
    V = feats["rgb"] + feats["flow"]
    A = feats["audio"]
    B = V.shape[0]
    Va, Av = model.apply(
        params, V, A, masks_src, method="encode")
    # The O(1)-positions incremental loop (folded cross-attention over the
    # raw memories + KV-cached self-attention) is token-exact with the full
    # path (tested) and measured faster at every batch size on the v5e
    # (B=256: ~3000 vs 943 clips/s; 4477 at B=1024 with the fused folded
    # contraction, since no per-layer K/V caches are materialized) —
    # default ON for BMHRL and the unimodal agents; the full-buffer
    # frontier loop remains for exploration mode and models without an
    # incremental step contract (DETR).
    if use_fast is None:
        use_fast = not exploration
    incremental = (hasattr(type(model), "FUSION_PARAM_KEYS")
                   or hasattr(type(model), "UNI_FUSION_PARAM_PREFIXES")
                   or (hasattr(type(model), "DETR_INCREMENTAL")
                       and not model.pre_goal_attention))
    sample_args = (temperature, top_k, top_p)
    if use_fast and incremental and not exploration:
        return _decode_loop_fast(
            model, params, Va, Av, masks_src, B, max_len, start_idx,
            end_idx, pad_idx, greedy, rng, sample_args)
    return _decode_loop(
        model, params, Va, Av, masks_src, B, max_len, start_idx, end_idx,
        pad_idx, greedy, rng, exploration, sample_args)


def _beam_pick(trg, scores, lengths, B, W, length_penalty):
    """Final beam selection: GNMT length normalization, best row per clip."""
    if length_penalty > 0.0:
        lp = ((5.0 + lengths.astype(jnp.float32)) / 6.0) ** length_penalty
        ranked = scores / lp
    else:
        ranked = scores
    best = jnp.argmax(ranked.reshape(B, W), axis=-1)   # (B,)
    rows = jnp.arange(B) * W + best
    return trg[rows], scores[rows]


@partial(jax.jit, static_argnames=(
    "model", "max_len", "start_idx", "end_idx", "pad_idx", "beam_width",
    "length_penalty", "use_fast"))
def beam_decode(
    model,
    params,
    feats: Dict[str, jnp.ndarray],
    masks_src: Dict[str, jnp.ndarray],
    max_len: int,
    start_idx: int,
    end_idx: int,
    pad_idx: int,
    beam_width: int = 4,
    length_penalty: float = 0.0,
    use_fast: Optional[bool] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Beam-search decode (serving quality knob — the reference decodes
    greedily only, ref: epoch_loops/captioning_bmrl_loops.py:61-76).

    Standard batched beam search in a clip-major (B*W) layout: candidates
    are cumulative log-probs, parent beams are gathered by top-k index,
    finished beams continue with a forced PAD at unchanged score.
    ``length_penalty`` applies GNMT-style normalization
    score / ((5+len)/6)^a at the final selection. Models with an
    incremental step contract run the O(1)-positions KV-cached loop with
    per-step cache reindexing (token-exact with the full-buffer beam,
    tested); the rest re-run the full buffer per token. Returns (tokens
    (B, max_len+1) of the best beam, its cumulative log-prob (B,))."""
    W = int(beam_width)
    V_feat = feats["rgb"] + feats["flow"]
    A_feat = feats["audio"]
    B = V_feat.shape[0]
    Va, Av = model.apply(params, V_feat, A_feat, masks_src, method="encode")

    incremental = (hasattr(type(model), "FUSION_PARAM_KEYS")
                   or hasattr(type(model), "UNI_FUSION_PARAM_PREFIXES")
                   or (hasattr(type(model), "DETR_INCREMENTAL")
                       and not model.pre_goal_attention))
    if use_fast is None:
        use_fast = True
    if use_fast and incremental:
        return _beam_loop_fast(model, params, Va, Av, masks_src, B,
                               max_len, start_idx, end_idx, pad_idx, W,
                               length_penalty)

    rep = lambda x: jnp.repeat(x, W, axis=0)  # clip-major: row b*W + w
    Va_b = jax.tree.map(rep, Va)
    Av_b = jax.tree.map(rep, Av)
    masks_b = {k: rep(v) for k, v in masks_src.items()}
    if hasattr(type(model), "precompute_fusion_kv"):
        fusion_kv = model.apply(params, Va_b, Av_b,
                                method="precompute_fusion_kv")
        extra = {"fusion_kv": fusion_kv}
    else:
        extra = {}

    BW = B * W
    L = max_len + 1
    NEG = jnp.float32(-1e9)
    trg0 = jnp.full((BW, L), pad_idx, jnp.int32).at[:, 0].set(start_idx)
    done0 = jnp.zeros((BW,), bool)
    labels0 = jnp.zeros((BW, L), jnp.int32)
    crit0 = model.apply(params, BW, method="critic_init_state")
    # beams 1..W-1 start dead so step 0 selects from beam 0's candidates
    scores0 = jnp.tile(jnp.concatenate(
        [jnp.zeros((1,), jnp.float32), jnp.full((W - 1,), NEG)]), B)
    len0 = jnp.zeros((BW,), jnp.int32)
    thresh = model.critic_score_threshold
    use_frontier = hasattr(type(model), "decode_frontier")
    noise_rng = {"noise": jax.random.PRNGKey(0)}  # exploration is off

    def cond(carry):
        t, done = carry[0], carry[2]
        return (t < max_len) & ~jnp.all(done)

    def body(carry):
        t, trg, done, scores, crit, labels, lengths = carry
        score_t, crit = model.apply(
            params, trg[jnp.arange(BW), t], crit, method="critic_step")
        lab_t = (jax.nn.sigmoid(score_t) > thresh).astype(jnp.int32)
        labels = labels.at[:, t].set(lab_t)

        masks = dict(masks_b)
        masks["C_mask"] = c_mask(trg, pad_idx)
        if use_frontier:
            logits_t = model.apply(
                params, trg, labels, Va_b, Av_b, masks, t,
                exploration=False, method="decode_frontier", **extra,
                rngs=noise_rng)
        else:
            preds = model.apply(
                params, trg, labels, Va_b, Av_b, masks, exploration=False,
                method="decode_with_labels", **extra, rngs=noise_rng)[0]
            logits_t = preds[jnp.arange(BW), t]  # (BW, V) log-probs
        voc = logits_t.shape[-1]
        # finished beams: single PAD continuation at unchanged score
        pad_row = jnp.full((voc,), NEG).at[pad_idx].set(0.0)
        logp = jnp.where(done[:, None], pad_row[None], logits_t)
        cand = (scores[:, None] + logp).reshape(B, W * voc)
        top_s, top_i = jax.lax.top_k(cand, W)          # (B, W)
        parent = top_i // voc
        token = (top_i % voc).astype(jnp.int32)
        flat_parent = (jnp.arange(B)[:, None] * W + parent).reshape(-1)

        prev_done = done[flat_parent]
        trg = trg[flat_parent].at[:, t + 1].set(token.reshape(-1))
        labels = labels[flat_parent]
        crit = jax.tree.map(lambda x: x[flat_parent], crit)
        lengths = lengths[flat_parent] + (~prev_done).astype(jnp.int32)
        done = prev_done | (token.reshape(-1) == end_idx)
        scores = top_s.reshape(-1)
        return (t + 1, trg, done, scores, crit, labels, lengths)

    carry = jax.lax.while_loop(
        cond, body,
        (jnp.int32(0), trg0, done0, scores0, crit0, labels0, len0))
    return _beam_pick(carry[1], carry[3], carry[6], B, W, length_penalty)


def _beam_loop_fast(model, params, Va, Av, masks_src, B, max_len,
                    start_idx, end_idx, pad_idx, W, length_penalty):
    """Beam search over the incremental step: O(1) positions per token,
    with every per-row cache (KV, critic RNN state, goal buffer, boundary
    flag, validity mask) gathered by parent beam each step
    (_fast_setup.gather_caches)."""
    from bmhrl_tpu.ops import attention as fused_ops

    L = max_len + 1
    BW = B * W
    share = (hasattr(type(model), "FUSION_PARAM_KEYS")
             and fused_ops.folded_qualifies(Av.shape[1], Av.shape[2])
             and fused_ops.folded_qualifies(Va.shape[1], Va.shape[2]))
    if share:
        # memories/masks stay at CLIP level: the folded kernel serves all
        # W beams of a clip from ONE HBM read per step (see _fast_setup)
        caches0, valid0, step_fn, gather_caches = _fast_setup(
            model, params, Va, Av, masks_src, BW, L, beam_share=W)
    else:
        rep = lambda x: jnp.repeat(x, W, axis=0)  # noqa: E731  clip-major
        Va_b = jax.tree.map(rep, Va)
        Av_b = jax.tree.map(rep, Av)
        masks_b = {k: rep(v) for k, v in masks_src.items()}
        caches0, valid0, step_fn, gather_caches = _fast_setup(
            model, params, Va_b, Av_b, masks_b, BW, L)

    NEG = jnp.float32(-1e9)
    trg0 = jnp.full((BW, L), pad_idx, jnp.int32).at[:, 0].set(start_idx)
    done0 = jnp.zeros((BW,), bool)
    # beams 1..W-1 start dead so step 0 selects from beam 0's candidates
    scores0 = jnp.tile(jnp.concatenate(
        [jnp.zeros((1,), jnp.float32), jnp.full((W - 1,), NEG)]), B)
    len0 = jnp.zeros((BW,), jnp.int32)

    def cond(carry):
        t, done = carry[0], carry[2]
        return (t < max_len) & ~jnp.all(done)

    def body(carry):
        t, trg, done, scores, caches, valid, lengths = carry
        tok_t = trg[jnp.arange(BW), t]
        valid = valid.at[:, t].set(tok_t != pad_idx).at[:, 0].set(True)
        logits_t, caches = step_fn(tok_t, t, caches, valid)
        voc = logits_t.shape[-1]
        pad_row = jnp.full((voc,), NEG).at[pad_idx].set(0.0)
        logp = jnp.where(done[:, None], pad_row[None], logits_t)
        cand = (scores[:, None] + logp).reshape(B, W * voc)
        top_s, top_i = jax.lax.top_k(cand, W)          # (B, W)
        parent = top_i // voc
        token = (top_i % voc).astype(jnp.int32)
        flat_parent = (jnp.arange(B)[:, None] * W + parent).reshape(-1)
        prev_done = done[flat_parent]
        trg = trg[flat_parent].at[:, t + 1].set(token.reshape(-1))
        valid = valid[flat_parent]
        caches = gather_caches(caches, flat_parent)
        lengths = lengths[flat_parent] + (~prev_done).astype(jnp.int32)
        done = prev_done | (token.reshape(-1) == end_idx)
        scores = top_s.reshape(-1)
        return (t + 1, trg, done, scores, caches, valid, lengths)

    carry = jax.lax.while_loop(
        cond, body,
        (jnp.int32(0), trg0, done0, scores0, caches0, valid0, len0))
    return _beam_pick(carry[1], carry[3], carry[6], B, W, length_penalty)


def detokenize(tokens, itos, end_token: str = "</s>") -> list:
    """ids -> capitalized sentences: strip <s>, cut at first </s>.
    ref: epoch_loops/validation_loops.py:62-85."""
    out = []
    for row in tokens:
        words = [itos[int(i)] for i in row][1:]
        if end_token in words:
            words = words[: words.index(end_token)]
        out.append(" ".join(words).capitalize())
    return out
