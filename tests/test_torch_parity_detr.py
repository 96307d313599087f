"""Cross-framework parity for DetrCaption vs the reference torch model
(/root/reference/model/det_bmhrl_agent.py:12-208), through our
``export_torch_detr`` checkpoint files with a STRICT load_state_dict.

Two configurations are validated:
- the executed default path (use_manager=False, pre_goal_attention=False):
  full forward output comparison against the reference model itself;
- the pre_goal_attention goal-fusion path: the reference's shipped forward
  CRASHES here (``goals`` is read at det_bmhrl_agent.py:189 while the block
  computing it is gated by the hardcoded ``use_manager = False`` at :165),
  so the torch ground truth is composed in this test from the reference's
  OWN modules following its designed dataflow (:148-208 with the manager
  block active), and our implementation must match it.

The reference's object_detector module imports an unused torchvision symbol
(object_detector.py:3); torchvision is absent in this image, so a stub
module is installed before import.
"""
from __future__ import annotations

import io
import contextlib
import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "model")),
    reason="reference repo unavailable")

B, Sv, Sa, Lc = 2, 7, 5, 8
VOC = 50
D = dict(d_model=32, d_model_caps=16, d_goal=8, nhead=2)


def _stub_torchvision():
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tvm = types.ModuleType("torchvision.models")
        tvm.VisionTransformer = object
        tv.models = tvm
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tvm


def _inputs():
    rng = np.random.RandomState(3)
    rgb = (rng.rand(B, Sv, D["d_model"]) + 0.1).astype(np.float32)
    audio = (rng.rand(B, Sa, 12) + 0.1).astype(np.float32)
    rgb[1, 5:] = 0.0
    trg = np.array([[2, 5, 9, 13, 3, 1, 1, 1],
                    [2, 8, 4, 17, 30, 44, 3, 1]], np.int64)
    return rgb, audio, trg


def _build(tmp_path, pre_goal: bool):
    import jax
    import jax.numpy as jnp

    from bmhrl_tpu.models.detr import DetrCaption
    from bmhrl_tpu.ops.masking import make_masks
    from bmhrl_tpu.utils.checkpoint import export_torch_detr

    model = DetrCaption(voc_size=VOC, pre_goal_attention=pre_goal,
                        dtype=jnp.float32, dout_p=0.1, **D)
    rgb, audio, trg = _inputs()
    feats = {"rgb": jnp.asarray(rgb), "audio": jnp.asarray(audio)}
    trg_j = jnp.asarray(trg, jnp.int32)
    masks = make_masks(feats, trg_j, "audio_video", 1)
    k = jax.random.PRNGKey(1)
    params = jax.jit(model.init)(
        {"params": k, "dropout": k, "noise": k},
        (jnp.asarray(rgb), jnp.asarray(audio)), trg_j, masks)
    pt = str(tmp_path / f"detr_{pre_goal}.pt")
    export_torch_detr(params, pt, d_goal=D["d_goal"],
                      pre_goal_attention=pre_goal)
    return model, params, masks, pt


def _patch_causal_attention_for_cpu():
    """The reference's causal branch builds its tril mask with
    ``device=sm_input.get_device()`` (multihead_attention.py:19), which is -1
    on CPU and crashes. Replace the module-level ``attention`` with a copy
    identical except for ``device=sm_input.device``."""
    import numpy as np
    import torch
    import torch.nn.functional as F

    import model.multihead_attention as mha_mod

    def attention(Q, K, V, mask, dropout=None, causal=False):
        d_k = Q.size(-1)
        sm_input = Q.matmul(K.transpose(-1, -2)) / np.sqrt(d_k)
        if mask is not None:
            if causal:
                cm = torch.tril(torch.ones(
                    (mask.shape[-1], mask.shape[-1]),
                    device=sm_input.device)).unsqueeze(0).unsqueeze(0).repeat(
                    sm_input.shape[0], 1, 1, 1) > 0
                sm_input = sm_input.masked_fill(cm == False, -1e9)  # noqa: E712
            sm_input = sm_input.masked_fill(mask == False, -1e9)  # noqa: E712
        out = F.softmax(sm_input, dim=-1).matmul(V)
        if dropout is not None:
            out = dropout(out)
        return out

    mha_mod.attention = attention


def _torch_model(pt_path, critic_cp, pre_goal: bool):
    _stub_torchvision()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import torch
    from types import SimpleNamespace

    _patch_causal_attention_for_cpu()

    cfg = SimpleNamespace(
        d_vid=D["d_model"], d_aud=12, d_model_video=D["d_model"],
        d_model_audio=12, d_model=D["d_model"],
        d_model_caps=D["d_model_caps"], rl_att_heads=D["nhead"],
        rl_att_layers=2, rl_goal_d=D["d_goal"], rl_ff_v=24, rl_ff_a=20,
        rl_ff_c=28, rl_projection_d=16, dout_p=0.1,
        rl_critic_score_threshhold=0.25, unfreeze_word_emb=False,
        pre_goal_attention=pre_goal, rl_critic_path=critic_cp,
        device="cpu", device_ids=[0])
    ds = SimpleNamespace(trg_voc_size=VOC,
                         train_vocab=SimpleNamespace(vectors=None))
    from model.det_bmhrl_agent import DetrCaption as TorchDetr

    with contextlib.redirect_stdout(io.StringIO()):
        tm = TorchDetr(cfg, ds)
        sd = torch.load(pt_path, map_location="cpu", weights_only=True)
        tm.load_state_dict(sd, strict=True)
        tm.eval()
        tm.set_inference_mode(True)
    return tm


def _zero_critic_cp(path):
    """A structurally valid all-zeros critic.cp so the reference's
    SegmentCritic constructor (which force-loads cfg.rl_critic_path,
    bm_hrl_agent.py:201) can run; the DETR default path never uses it and
    load_state_dict overwrites it anyway."""
    import torch

    d = D["d_model_caps"]
    sd = {}
    for l in range(4):
        sd[f"lstm.weight_ih_l{l}"] = torch.zeros(8 * d, d if l == 0 else 2 * d)
        sd[f"lstm.weight_hh_l{l}"] = torch.zeros(8 * d, 2 * d)
        sd[f"lstm.bias_ih_l{l}"] = torch.zeros(8 * d)
        sd[f"lstm.bias_hh_l{l}"] = torch.zeros(8 * d)
    for l in range(2):
        sd[f"gru.weight_ih_l{l}"] = torch.zeros(6 * d, 2 * d)
        sd[f"gru.weight_hh_l{l}"] = torch.zeros(6 * d, 2 * d)
        sd[f"gru.bias_ih_l{l}"] = torch.zeros(6 * d)
        sd[f"gru.bias_hh_l{l}"] = torch.zeros(6 * d)
    sd["lin.weight"] = torch.zeros(1, 2 * d)
    sd["lin.bias"] = torch.zeros(1)
    for r in ["relu", "relu2"]:
        sd[f"{r}.alpha"] = torch.tensor([0.9])
        sd[f"{r}.beta"] = torch.tensor([2.0])
    torch.save(sd, path)
    return path


def test_detr_default_path_parity(tmp_path):
    """Default (executed) path: our full forward matches the reference
    model's forward on identical inputs and weights."""
    import jax
    import jax.numpy as jnp
    import torch

    model, params, masks, pt = _build(tmp_path, pre_goal=False)
    cp = _zero_critic_cp(str(tmp_path / "critic.cp"))
    tm = _torch_model(pt, cp, pre_goal=False)

    rgb, audio, trg = _inputs()
    pred, wf, memory, _, _, classified = jax.jit(model.apply)(
        params, (jnp.asarray(rgb), jnp.asarray(audio)),
        jnp.asarray(trg, jnp.int32), masks)

    from model.masking import make_masks as t_make_masks

    fs = {"rgb": torch.tensor(rgb), "audio": torch.tensor(audio)}
    t_masks = t_make_masks(fs, torch.tensor(trg), "audio_video", 1)
    with torch.no_grad():
        t_pred, t_wf, t_mem, _, _, t_cls = tm(
            (fs["rgb"], fs["audio"]), torch.tensor(trg), t_masks)

    np.testing.assert_allclose(np.asarray(memory), t_mem.numpy(),
                               atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(classified), t_cls.numpy(),
                               atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(wf), t_wf.numpy(),
                               atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(pred), t_pred.numpy(),
                               atol=2e-4, rtol=1e-3)


def test_detr_pre_goal_attention_parity(tmp_path):
    """pre_goal_attention path vs the reference's designed dataflow composed
    from its own modules (its shipped forward crashes; see module doc)."""
    import jax
    import jax.numpy as jnp
    import torch

    model, params, masks, pt = _build(tmp_path, pre_goal=True)
    from bmhrl_tpu.utils.checkpoint import export_torch_critic

    cp = str(tmp_path / "critic_live.cp")
    export_torch_critic(params["params"]["critic"], cp)
    tm = _torch_model(pt, cp, pre_goal=True)

    rgb, audio, trg = _inputs()
    pred, wf, memory, _, _, classified = jax.jit(model.apply)(
        params, (jnp.asarray(rgb), jnp.asarray(audio)),
        jnp.asarray(trg, jnp.int32), masks)

    from model.masking import make_masks as t_make_masks

    fs = {"rgb": torch.tensor(rgb), "audio": torch.tensor(audio)}
    t_masks = t_make_masks(fs, torch.tensor(trg), "audio_video", 1)
    with torch.no_grad():
        trg_t = torch.tensor(trg).clone()
        trg_t[trg_t == 3] = 1
        C = tm.emb_C(trg_t)
        mask = t_masks["V_mask"]
        vf = fs["rgb"].transpose(1, 2)
        for i in range(tm.n_time):
            vf = tm.input_proj[i](vf)
        xv = vf.transpose(1, 2)
        t_cls, hs_ob, ob_mask = tm.object_detector(xv, mask)
        t_mem = tm.encoder(xv, mask, tm.pos_enc)
        worker_context = tm.manager_decoder(
            C, t_mem, mask, tm.pos_enc, tm.pos_enc_C, t_masks["C_mask"],
            None, None, None)
        segments = torch.sigmoid(tm.critic(C))
        labels = (segments > tm.critic_score_threshhold).squeeze().int(
            ).reshape(B, -1)
        segment_padding = (trg_t == 1).sum(dim=1)
        for i in range(B):
            fe = trg_t.shape[1] - 1 - segment_padding[i]
            labels[i][fe] = 1
            labels[i][fe + 1:] = 0
        goals = tm.manager(worker_context, labels)
        gfa = tm.goal_feature_attention(
            tm.pos_enc_goal(goals), tm.pos_enc_C(C), C, t_masks["C_mask"])
        tgt2 = tm.goal_attention(
            tm.pos_enc_C(C), tm.pos_enc_goal(goals), goals,
            t_masks["C_mask"])
        C = C + tm.goal_dropout(tgt2)
        C = tm.goal_norm(C)
        C_features = torch.cat([C, gfa], dim=-1)
        t_wf = tm.worker_decoder(
            C_features, t_mem, mask, tm.pos_enc, tm.pos_enc_concat,
            t_masks["C_mask"], None, None, None, detected_objects=hs_ob,
            obj_mask=ob_mask)
        t_pred = tm.activation(tm.linear(t_wf))

    np.testing.assert_allclose(np.asarray(classified), t_cls.numpy(),
                               atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(pred), t_pred.numpy(),
                               atol=2e-4, rtol=1e-3)
