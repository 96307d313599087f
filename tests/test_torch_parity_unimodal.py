"""Cross-framework parity: flax UnimodalAgent (AHRL/VHRL) vs the ACTUAL
reference torch UnimodalAgent (model/bm_hrl_agent.py:663-799) on our
exported weights — forward outputs at fp32 tolerance + strict
load_state_dict interop (same ground-truth methodology as
test_torch_parity.py)."""
from __future__ import annotations

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "model")),
    reason="reference repo unavailable")

B, Sv, Sa, Lc = 2, 7, 9, 8
VOC = 50
DIMS = dict(d_video=20, d_audio=12, d_model=16, d_model_caps=16,
            att_heads=2, att_layers=2, d_goal=8, d_ff_v=24, d_ff_a=20)


def _inputs():
    rng = np.random.RandomState(11)
    rgb = (rng.rand(B, Sv, DIMS["d_video"]) + 0.1).astype(np.float32)
    flow = (rng.rand(B, Sv, DIMS["d_video"]) + 0.1).astype(np.float32)
    audio = (rng.rand(B, Sa, DIMS["d_audio"]) + 0.1).astype(np.float32)
    rgb[1, 5:] = 0.0
    flow[1, 5:] = 0.0
    audio[1, 7:] = 0.0
    trg = np.array([[2, 5, 9, 13, 3, 1, 1, 1],
                    [2, 8, 4, 17, 30, 44, 3, 1]], np.int64)
    return rgb, flow, audio, trg


@pytest.mark.parametrize("modality", ["video", "audio"])
def test_unimodal_forward_logit_parity(modality, tmp_path):
    import jax
    import jax.numpy as jnp
    import torch

    from bmhrl_tpu.models.unimodal import UnimodalAgent
    from bmhrl_tpu.ops.masking import make_masks
    from bmhrl_tpu.utils.checkpoint import (export_torch_critic,
                                            export_torch_unimodal)

    d_m1 = DIMS["d_video"] if modality == "video" else DIMS["d_audio"]
    d_ff = DIMS["d_ff_v"] if modality == "video" else DIMS["d_ff_a"]
    model = UnimodalAgent(
        voc_size=VOC, d_m1=d_m1, d_ff_m1=d_ff, modality=modality,
        d_model=DIMS["d_model"], d_model_caps=DIMS["d_model_caps"],
        att_heads=DIMS["att_heads"], att_layers=DIMS["att_layers"],
        d_goal=DIMS["d_goal"], dtype=jnp.float32)
    rgb, flow, audio, trg = _inputs()
    feats = {"rgb": jnp.asarray(rgb), "audio": jnp.asarray(audio)}
    trg_j = jnp.asarray(trg, jnp.int32)
    masks = make_masks(feats, trg_j, "audio_video", 1)
    k = jax.random.PRNGKey(0)
    params = jax.jit(model.init)(
        {"params": k, "dropout": k, "noise": k},
        (jnp.asarray(rgb + flow), jnp.asarray(audio)), trg_j, masks)

    critic_path = str(tmp_path / "critic.cp")
    export_torch_critic(params["params"]["critic"], critic_path)
    agent_path = str(tmp_path / "unimodal_hrl_agent.pt")
    export_torch_unimodal(params, agent_path,
                          n_layers=DIMS["att_layers"], d_ff_c=d_ff)

    if REF not in sys.path:
        sys.path.insert(0, REF)
    from types import SimpleNamespace

    cfg = SimpleNamespace(
        d_vid=DIMS["d_video"], d_aud=DIMS["d_audio"],
        d_model=DIMS["d_model"], d_model_caps=DIMS["d_model_caps"],
        rl_att_heads=DIMS["att_heads"], rl_att_layers=DIMS["att_layers"],
        rl_goal_d=DIMS["d_goal"], rl_ff_v=DIMS["d_ff_v"],
        rl_ff_a=DIMS["d_ff_a"], rl_projection_d=DIMS["d_model"], dout_p=0.1,
        rl_critic_score_threshhold=0.25, unfreeze_word_emb=False,
        rl_critic_path=critic_path, device="cpu", device_ids=[0])
    ds = SimpleNamespace(trg_voc_size=VOC,
                         train_vocab=SimpleNamespace(vectors=None))
    from model.bm_hrl_agent import AudioAgent as TAudio
    from model.bm_hrl_agent import VideoAgent as TVideo

    tm = (TVideo if modality == "video" else TAudio)(cfg, ds)
    sd = torch.load(agent_path, map_location="cpu", weights_only=True)
    tm.load_state_dict(sd, strict=True)
    tm.eval()
    tm.set_inference_mode(True)

    from model.masking import make_masks as t_make_masks

    fs = {"rgb": torch.tensor(rgb), "flow": torch.tensor(flow),
          "audio": torch.tensor(audio)}
    trg_t = torch.tensor(trg)
    t_masks = t_make_masks(fs, trg_t, "audio_video", 1)
    m1 = (fs["rgb"] + fs["flow"]) if modality == "video" else fs["audio"]
    m1_mask = t_masks["V_mask"] if modality == "video" else t_masks["A_mask"]
    with torch.no_grad():
        t_pred, t_wf, t_mf, t_goals, t_labels = tm(
            m1, trg_t, (m1_mask, t_masks["C_mask"]))

    pred, wf, mf, goals, labels = jax.jit(model.apply)(
        params, (jnp.asarray(rgb + flow), jnp.asarray(audio)), trg_j, masks)

    np.testing.assert_array_equal(np.asarray(labels), t_labels.numpy())
    np.testing.assert_allclose(np.asarray(wf), t_wf.numpy(),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(mf), t_mf.numpy(),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(goals), t_goals.numpy(),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(pred), t_pred.numpy(),
                               atol=5e-5, rtol=1e-4)
