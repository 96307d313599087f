"""Checkpointing: orbax per-component saves + PyTorch interop.

Mirrors the reference layout (per-component files in epoch dirs,
ref: bm_hrl_agent.py:547-553, train_rl_captioning_module.py:214-240) using
orbax for the native format, plus converters for the reference's ``.pt`` /
``.cp`` files:
- ``load_torch_critic``: pretrained SegmentCritic weights (``critic.cp``,
  ref: bm_hrl_agent.py:201) -> our flax critic params. Torch gate
  layouts map 1:1 because models/critic.py uses torch cell math.
- full-agent import/export for BMHrlAgent ``bm_hrl_agent.pt`` state_dicts.
"""
from __future__ import annotations

import os
from typing import Any, Dict

import jax
import numpy as np


# ---------------------------------------------------------------------------
# orbax native checkpoints
# ---------------------------------------------------------------------------

def save_checkpoint(ckpt_dir: str, state, name: str = "state") -> str:
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(ckpt_dir, name))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.tree.map(np.asarray, state), force=True)
    ckptr.wait_until_finished()
    return path


def load_checkpoint(ckpt_dir: str, abstract_state, name: str = "state"):
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(ckpt_dir, name))
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, abstract_state)


def load_model_params(ckpt_dir: str, abstract_params, name: str = "state"):
    """Model variables ({"params": ...}) from a checkpoint dir that holds
    EITHER a full TrainState (train/loop.py's save) or bare params.

    An abstract-tree restore needs the checkpoint's exact topology, which
    inference CLIs don't know (they have no value nets / optimizer state);
    orbax restores WITHOUT an abstract tree into plain nested dicts, so we
    take the topology from disk, extract ``cap_params``, and then verify
    leaf shapes against ``abstract_params`` so dimension mismatches fail
    loudly instead of at apply time."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(ckpt_dir, name))
    raw = ocp.StandardCheckpointer().restore(path)
    params = raw.get("cap_params", raw) if isinstance(raw, dict) else raw
    ref = jax.tree.leaves_with_path(abstract_params)
    got = dict(jax.tree.leaves_with_path(params))
    missing = [jax.tree_util.keystr(p) for p, _ in ref if p not in got]
    if missing:
        raise ValueError(
            f"checkpoint {path} is missing {len(missing)} model params "
            f"(first: {missing[:3]}); is this a checkpoint for this "
            f"model/mode?")
    for p, leaf in ref:
        if tuple(np.shape(got[p])) != tuple(np.shape(leaf)):
            raise ValueError(
                f"checkpoint {path}: shape mismatch at "
                f"{jax.tree_util.keystr(p)}: {np.shape(got[p])} vs model "
                f"{np.shape(leaf)}")
    return params


# ---------------------------------------------------------------------------
# torch interop
# ---------------------------------------------------------------------------

def _load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.detach().numpy() for k, v in sd.items()}


def load_torch_critic(path: str) -> Dict[str, Any]:
    """critic.cp (torch state_dict of the reference SegmentCritic) -> flax
    params subtree for models.critic.SegmentCritic."""
    sd = _load_torch_state_dict(path)
    out: Dict[str, Any] = {}
    for l in range(4):
        out[f"lstm_l{l}"] = {
            "weight_ih": sd[f"lstm.weight_ih_l{l}"],
            "weight_hh": sd[f"lstm.weight_hh_l{l}"],
            "bias_ih": sd[f"lstm.bias_ih_l{l}"],
            "bias_hh": sd[f"lstm.bias_hh_l{l}"],
        }
    for l in range(2):
        out[f"gru_l{l}"] = {
            "weight_ih": sd[f"gru.weight_ih_l{l}"],
            "weight_hh": sd[f"gru.weight_hh_l{l}"],
            "bias_ih": sd[f"gru.bias_ih_l{l}"],
            "bias_hh": sd[f"gru.bias_hh_l{l}"],
        }
    out["lin"] = {"kernel": sd["lin.weight"].T, "bias": sd["lin.bias"]}
    out["relu"] = {"alpha": sd["relu.alpha"], "beta": sd["relu.beta"]}
    out["relu2"] = {"alpha": sd["relu2.alpha"], "beta": sd["relu2.beta"]}
    return jax.tree.map(np.asarray, out)


def export_torch_critic(critic_params: Dict[str, Any], path: str) -> str:
    """Inverse of load_torch_critic: our flax critic subtree -> a torch
    state_dict file in the reference SegmentCritic layout (critic.cp)."""
    import torch

    p = jax.tree.map(np.asarray, critic_params)
    sd = {}
    for l in range(4):
        for k in ("weight_ih", "weight_hh", "bias_ih", "bias_hh"):
            sd[f"lstm.{k}_l{l}"] = torch.tensor(p[f"lstm_l{l}"][k])
    for l in range(2):
        for k in ("weight_ih", "weight_hh", "bias_ih", "bias_hh"):
            sd[f"gru.{k}_l{l}"] = torch.tensor(p[f"gru_l{l}"][k])
    sd["lin.weight"] = torch.tensor(p["lin"]["kernel"].T)
    sd["lin.bias"] = torch.tensor(p["lin"]["bias"])
    for r in ("relu", "relu2"):
        sd[f"{r}.alpha"] = torch.tensor(p[r]["alpha"])
        sd[f"{r}.beta"] = torch.tensor(p[r]["beta"])
    torch.save(sd, path)
    return path


def install_critic(cap_params, critic_path: str):
    """Overwrite the agent's critic subtree with pretrained torch weights."""
    critic = load_torch_critic(critic_path)
    params = jax.tree.map(lambda x: x, cap_params)  # shallow copy
    params["params"] = dict(params["params"])
    params["params"]["critic"] = critic
    return params


# -- full BMHrlAgent torch <-> flax mapping ---------------------------------

def _mha_map(sd, prefix, tree):
    for tname, pname in [("linear_Q2d", "linear_Q2d"), ("linear_K2d", "linear_K2d"),
                         ("linear_V2d", "linear_V2d"), ("linear_d2Q", "linear_d2Q")]:
        tree[pname] = {
            "kernel": sd[f"{prefix}.{tname}.weight"].T,
            "bias": sd[f"{prefix}.{tname}.bias"],
        }


def _dense(sd, prefix):
    return {"kernel": sd[f"{prefix}.weight"].T, "bias": sd[f"{prefix}.bias"]}


def _ln(sd, prefix):
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def _ff(sd, prefix):
    return {"fc1": _dense(sd, f"{prefix}.fc1"), "fc2": _dense(sd, f"{prefix}.fc2")}


def _res(sd, prefix):
    return {"norm": _ln(sd, f"{prefix}.norm")}


def _mha(sd, prefix):
    t: Dict[str, Any] = {}
    _mha_map(sd, prefix, t)
    return t


def import_torch_bmhrl(path: str, n_layers: int = 2) -> Dict[str, Any]:
    """bm_hrl_agent.pt (reference state_dict) -> flax params['params'] tree
    for models.bmhrl.BMHrlAgent. ref module names: bm_hrl_agent.py:509-536."""
    sd = _load_torch_state_dict(path)
    p: Dict[str, Any] = {}

    # embedding (plain nn.Embedding path; the GloVe adapter variant uses
    # embedder.0/1 keys — handled if present)
    if "emb_C.embedder.weight" in sd:
        p["emb_C"] = {"embedding": {"embedding": sd["emb_C.embedder.weight"]}}
    else:
        p["emb_C"] = {"embedding": {"embedding": sd["emb_C.embedder.0.weight"]}}

    # critic
    crit: Dict[str, Any] = {}
    for l in range(4):
        crit[f"lstm_l{l}"] = {
            "weight_ih": sd[f"critic.lstm.weight_ih_l{l}"],
            "weight_hh": sd[f"critic.lstm.weight_hh_l{l}"],
            "bias_ih": sd[f"critic.lstm.bias_ih_l{l}"],
            "bias_hh": sd[f"critic.lstm.bias_hh_l{l}"],
        }
    for l in range(2):
        crit[f"gru_l{l}"] = {
            "weight_ih": sd[f"critic.gru.weight_ih_l{l}"],
            "weight_hh": sd[f"critic.gru.weight_hh_l{l}"],
            "bias_ih": sd[f"critic.gru.bias_ih_l{l}"],
            "bias_hh": sd[f"critic.gru.bias_hh_l{l}"],
        }
    crit["lin"] = _dense(sd, "critic.lin")
    crit["relu"] = {"alpha": sd["critic.relu.alpha"], "beta": sd["critic.relu.beta"]}
    crit["relu2"] = {"alpha": sd["critic.relu2.alpha"], "beta": sd["critic.relu2.beta"]}
    p["critic"] = crit

    # encoder stack (reference LayerStack: bm_enc.encoder.layers.{i})
    enc: Dict[str, Any] = {}
    for i in range(n_layers):
        pref = f"bm_enc.encoder.layers.{i}"
        layer: Dict[str, Any] = {}
        for name in ["self_att_M1", "self_att_M2", "bi_modal_att_M1", "bi_modal_att_M2"]:
            layer[name] = _mha(sd, f"{pref}.{name}")
        layer["ff_M1"] = _ff(sd, f"{pref}.feed_forward_M1")
        layer["ff_M2"] = _ff(sd, f"{pref}.feed_forward_M2")
        for j in range(3):
            layer[f"res_M1_{j}"] = _res(sd, f"{pref}.res_layers_M1.{j}")
            layer[f"res_M2_{j}"] = _res(sd, f"{pref}.res_layers_M2.{j}")
        enc[f"layer_{i}"] = layer
    p["bm_enc"] = enc

    # fusion stacks
    for ours, theirs in [("bm_worker_fus", "bm_worker_fus"),
                         ("bm_manager_fus", "bm_manager_fus")]:
        fus: Dict[str, Any] = {}
        for i in range(n_layers):
            pref = f"{theirs}.decoder.layers.{i}"
            layer = {
                "self_att": _mha(sd, f"{pref}.self_att"),
                "enc_att_A": _mha(sd, f"{pref}.enc_att_A"),
                "enc_att_V": _mha(sd, f"{pref}.enc_att_V"),
                "res_self_att": _res(sd, f"{pref}.res_layer_self_att"),
                "res_enc_att_A": _res(sd, f"{pref}.res_layer_enc_att_A"),
                "res_enc_att_V": _res(sd, f"{pref}.res_layer_enc_att_V"),
                "normCA": _ln(sd, f"{pref}.normCA"),
                "normCV": _ln(sd, f"{pref}.normCV"),
                "a_v_constant": sd[f"{pref}.a_v_constant"],
            }
            fus[f"layer_{i}"] = layer
        p[ours] = fus

    p["manager"] = {"linear": _dense(sd, "manager.linear")}
    p["worker"] = {
        "goal_attention": _mha(sd, "worker.goal_attention"),
        "projection": _dense(sd, "worker.core.projection"),
    }
    return jax.tree.map(np.asarray, p)


def export_torch_bmhrl(params: Dict[str, Any], path: str, n_layers: int = 2,
                       d_ff_c: int = 2048):
    """Inverse of import_torch_bmhrl (checkpoint export for reference users).

    Also emits the reference's dead parameters (the BMFusionLayer
    feed_forward that its forward never applies, bm_hrl_agent.py:66,73-117,
    and Manager.core's unused LinearCore, :404-406,438) as zero tensors so
    a strict ``load_state_dict`` on the reference model succeeds."""
    import torch

    p = jax.tree.map(np.asarray, params.get("params", params))
    sd: Dict[str, Any] = {}

    def put(key, arr):
        sd[key] = torch.tensor(np.asarray(arr))

    def put_zeros(key, shape):
        sd[key] = torch.zeros(*shape)

    def dense(prefix, t):
        put(f"{prefix}.weight", t["kernel"].T)
        put(f"{prefix}.bias", t["bias"])

    def ln(prefix, t):
        put(f"{prefix}.weight", t["scale"])
        put(f"{prefix}.bias", t["bias"])

    def mha(prefix, t):
        for n in ["linear_Q2d", "linear_K2d", "linear_V2d", "linear_d2Q"]:
            dense(f"{prefix}.{n}", t[n])

    put("emb_C.embedder.weight", p["emb_C"]["embedding"]["embedding"])
    crit = p["critic"]
    for l in range(4):
        for k in ["weight_ih", "weight_hh", "bias_ih", "bias_hh"]:
            put(f"critic.lstm.{k}_l{l}", crit[f"lstm_l{l}"][k])
    for l in range(2):
        for k in ["weight_ih", "weight_hh", "bias_ih", "bias_hh"]:
            put(f"critic.gru.{k}_l{l}", crit[f"gru_l{l}"][k])
    dense("critic.lin", crit["lin"])
    for r in ["relu", "relu2"]:
        put(f"critic.{r}.alpha", crit[r]["alpha"])
        put(f"critic.{r}.beta", crit[r]["beta"])
    for i in range(n_layers):
        layer = p["bm_enc"][f"layer_{i}"]
        pref = f"bm_enc.encoder.layers.{i}"
        for n in ["self_att_M1", "self_att_M2", "bi_modal_att_M1", "bi_modal_att_M2"]:
            mha(f"{pref}.{n}", layer[n])
        for ours, theirs in [("ff_M1", "feed_forward_M1"), ("ff_M2", "feed_forward_M2")]:
            dense(f"{pref}.{theirs}.fc1", layer[ours]["fc1"])
            dense(f"{pref}.{theirs}.fc2", layer[ours]["fc2"])
        for j in range(3):
            ln(f"{pref}.res_layers_M1.{j}.norm", layer[f"res_M1_{j}"]["norm"])
            ln(f"{pref}.res_layers_M2.{j}.norm", layer[f"res_M2_{j}"]["norm"])
    d_caps = p["manager"]["linear"]["kernel"].shape[0]
    d_goal = p["manager"]["linear"]["kernel"].shape[1]
    for name in ["bm_worker_fus", "bm_manager_fus"]:
        for i in range(n_layers):
            layer = p[name][f"layer_{i}"]
            pref = f"{name}.decoder.layers.{i}"
            for n in ["self_att", "enc_att_A", "enc_att_V"]:
                mha(f"{pref}.{n}", layer[n])
            for ours, theirs in [("res_self_att", "res_layer_self_att"),
                                 ("res_enc_att_A", "res_layer_enc_att_A"),
                                 ("res_enc_att_V", "res_layer_enc_att_V")]:
                ln(f"{pref}.{theirs}.norm", layer[ours]["norm"])
            ln(f"{pref}.normCA", layer["normCA"])
            ln(f"{pref}.normCV", layer["normCV"])
            put(f"{pref}.a_v_constant", layer["a_v_constant"])
            # dead feed_forward the reference constructs but never applies
            put_zeros(f"{pref}.feed_forward.fc1.weight", (d_ff_c, d_caps))
            put_zeros(f"{pref}.feed_forward.fc1.bias", (d_ff_c,))
            put_zeros(f"{pref}.feed_forward.fc2.weight", (d_caps, d_ff_c))
            put_zeros(f"{pref}.feed_forward.fc2.bias", (d_caps,))
    dense("manager.linear", p["manager"]["linear"])
    # Manager's unused LinearCore (ref :404-406; forward uses .linear).
    # The reference registers the SAME module twice (bm_hrl_agent.py:532-534:
    # self.manager_core and manager.core), so both key sets must exist for a
    # strict load_state_dict.
    put_zeros("manager.core.linear.weight", (d_goal, d_caps))
    put_zeros("manager.core.linear.bias", (d_goal,))
    put_zeros("manager_core.linear.weight", (d_goal, d_caps))
    put_zeros("manager_core.linear.bias", (d_goal,))
    mha("worker.goal_attention", p["worker"]["goal_attention"])
    dense("worker.core.projection", p["worker"]["projection"])

    import torch

    torch.save(sd, path)
    return path


def export_torch_unimodal(params: Dict[str, Any], path: str, *,
                          n_layers: int = 2, d_ff_c: int = 2048):
    """Export a flax UnimodalAgent (AHRL/VHRL) as the reference
    ``unimodal_hrl_agent.pt`` state dict (model/bm_hrl_agent.py:663-799),
    emitting the reference's dead parameters (each fusion layer's unapplied
    feed_forward, the encoder's unused middle residual LayerNorm, and
    Manager.core) so a strict ``load_state_dict`` succeeds."""
    import torch

    p = jax.tree.map(np.asarray, params.get("params", params))
    sd: Dict[str, Any] = {}

    def put(key, arr):
        sd[key] = torch.tensor(np.asarray(arr))

    def dense(prefix, t):
        put(f"{prefix}.weight", t["kernel"].T)
        put(f"{prefix}.bias", t["bias"])

    def ln(prefix, t):
        put(f"{prefix}.weight", t["scale"])
        put(f"{prefix}.bias", t["bias"])

    def mha(prefix, t):
        for n in ["linear_Q2d", "linear_K2d", "linear_V2d", "linear_d2Q"]:
            dense(f"{prefix}.{n}", t[n])

    put("emb_C.embedder.weight", p["emb_C"]["embedding"]["embedding"])
    crit = p["critic"]
    for l in range(4):
        for k in ["weight_ih", "weight_hh", "bias_ih", "bias_hh"]:
            put(f"critic.lstm.{k}_l{l}", crit[f"lstm_l{l}"][k])
    for l in range(2):
        for k in ["weight_ih", "weight_hh", "bias_ih", "bias_hh"]:
            put(f"critic.gru.{k}_l{l}", crit[f"gru_l{l}"][k])
    dense("critic.lin", crit["lin"])
    for r in ["relu", "relu2"]:
        put(f"critic.{r}.alpha", crit[r]["alpha"])
        put(f"critic.{r}.beta", crit[r]["beta"])

    d_m1 = p["uni_enc_layer_0"]["self_att_M1"]["linear_Q2d"]["kernel"].shape[0]
    for i in range(n_layers):
        layer = p[f"uni_enc_layer_{i}"]
        pref = f"uni_enc.encoder.layers.{i}"
        mha(f"{pref}.self_att_M1", layer["self_att_M1"])
        dense(f"{pref}.feed_forward_M1.fc1", layer["ff_M1"]["fc1"])
        dense(f"{pref}.feed_forward_M1.fc2", layer["ff_M1"]["fc2"])
        ln(f"{pref}.res_layers_M1.0.norm", layer["res_M1_0"]["norm"])
        ln(f"{pref}.res_layers_M1.2.norm", layer["res_M1_2"]["norm"])
        # unused middle residual slot (the reference clones 3, applies 0 & 2)
        put(f"{pref}.res_layers_M1.1.norm.weight", np.ones((d_m1,), np.float32))
        put(f"{pref}.res_layers_M1.1.norm.bias", np.zeros((d_m1,), np.float32))

    d_caps = p["manager"]["linear"]["kernel"].shape[0]
    d_goal = p["manager"]["linear"]["kernel"].shape[1]
    for name in ["uni_worker_fus", "uni_manager_fus"]:
        for i in range(n_layers):
            layer = p[f"{name}_layer_{i}"]
            pref = f"{name}.decoder.layers.{i}"
            mha(f"{pref}.self_att", layer["self_att"])
            mha(f"{pref}.enc_att", layer["enc_att"])
            ln(f"{pref}.res_layer_self_att.norm", layer["res_self_att"]["norm"])
            ln(f"{pref}.res_layer_enc_att.norm", layer["res_enc_att"]["norm"])
            ln(f"{pref}.normC", layer["normC"])
            # dead feed_forward (constructed, never applied; width d_ff_c
            # = the agent's d_ff_m1)
            d_ff = d_ff_c
            put(f"{pref}.feed_forward.fc1.weight",
                np.zeros((d_ff, d_caps), np.float32))
            put(f"{pref}.feed_forward.fc1.bias", np.zeros((d_ff,), np.float32))
            put(f"{pref}.feed_forward.fc2.weight",
                np.zeros((d_caps, d_ff), np.float32))
            put(f"{pref}.feed_forward.fc2.bias",
                np.zeros((d_caps,), np.float32))

    dense("manager.linear", p["manager"]["linear"])
    put("manager.core.linear.weight", np.zeros((d_goal, d_caps), np.float32))
    put("manager.core.linear.bias", np.zeros((d_goal,), np.float32))
    mha("worker.goal_attention", p["worker"]["goal_attention"])
    dense("worker.core.projection", p["worker"]["projection"])
    torch.save(sd, path)
    return path


def export_torch_detr(params: Dict[str, Any], path: str, *,
                      d_goal: int = 64, num_layers: int = 3,
                      n_time: int = 3, dim_ff: int = 2048,
                      obj_hidden: int = 256, obj_layers: int = 6,
                      pre_goal_attention: bool = False) -> str:
    """flax DetrCaption params -> a torch state_dict in the reference
    ``detr_agent.pt`` layout (model/det_bmhrl_agent.py:12-91 +
    encoder.py/decoder.py/object_detector.py module trees), suitable for a
    STRICT ``load_state_dict`` on the reference model.

    The reference registers many parameters its executed forward never
    touches (the whole manager_decoder stack, per-layer goal_attention,
    norm4, the empty ``positional_encoding``, encoder ``embed`` heads,
    query_embed(80,300), object_detector.linear); those are emitted as
    zeros. With ``pre_goal_attention=True`` the goal-path modules are live
    and exported from ``params`` instead."""
    import torch

    p = jax.tree.map(np.asarray, params.get("params", params))
    sd: Dict[str, Any] = {}

    def put(key, arr):
        sd[key] = torch.tensor(np.asarray(arr))

    def zeros(key, *shape):
        sd[key] = torch.zeros(*shape) if shape else torch.zeros(0)

    def dense(prefix, t):
        put(f"{prefix}.weight", t["kernel"].T)
        put(f"{prefix}.bias", t["bias"])

    def ln(prefix, t):
        put(f"{prefix}.weight", t["scale"])
        put(f"{prefix}.bias", t["bias"])

    def ln_dead(prefix, d):
        zeros(f"{prefix}.weight", d)
        zeros(f"{prefix}.bias", d)

    def mha(prefix, t):
        for n in ["linear_Q2d", "linear_K2d", "linear_V2d", "linear_d2Q"]:
            dense(f"{prefix}.{n}", t[n])

    def mha_dead(prefix, dq, dk, dv, d_att):
        for n, din, dout in [("linear_Q2d", dq, d_att),
                             ("linear_K2d", dk, d_att),
                             ("linear_V2d", dv, d_att),
                             ("linear_d2Q", d_att, dq)]:
            zeros(f"{prefix}.{n}.weight", dout, din)
            zeros(f"{prefix}.{n}.bias", dout)

    emb = p["emb_C"]["embedding"]["embedding"]
    voc, d_caps = emb.shape
    d_model = p["encoder"]["layer_0"]["self_attn"]["linear_Q2d"][
        "kernel"].shape[0]
    d_worker = d_caps + (d_goal if pre_goal_attention else 0)

    put("emb_C.embedder.weight", emb)

    if "critic" in p:
        crit = p["critic"]
        for l in range(4):
            for k in ["weight_ih", "weight_hh", "bias_ih", "bias_hh"]:
                put(f"critic.lstm.{k}_l{l}", crit[f"lstm_l{l}"][k])
        for l in range(2):
            for k in ["weight_ih", "weight_hh", "bias_ih", "bias_hh"]:
                put(f"critic.gru.{k}_l{l}", crit[f"gru_l{l}"][k])
        dense("critic.lin", crit["lin"])
        for r in ["relu", "relu2"]:
            put(f"critic.{r}.alpha", crit[r]["alpha"])
            put(f"critic.{r}.beta", crit[r]["beta"])
    else:
        # default DETR path: the critic is dead (flax creates no params for
        # it) but the reference registers it — emit zeros of the right shapes
        for l in range(4):
            zeros(f"critic.lstm.weight_ih_l{l}", 8 * d_caps,
                  d_caps if l == 0 else 2 * d_caps)
            zeros(f"critic.lstm.weight_hh_l{l}", 8 * d_caps, 2 * d_caps)
            zeros(f"critic.lstm.bias_ih_l{l}", 8 * d_caps)
            zeros(f"critic.lstm.bias_hh_l{l}", 8 * d_caps)
        for l in range(2):
            zeros(f"critic.gru.weight_ih_l{l}", 6 * d_caps, 2 * d_caps)
            zeros(f"critic.gru.weight_hh_l{l}", 6 * d_caps, 2 * d_caps)
            zeros(f"critic.gru.bias_ih_l{l}", 6 * d_caps)
            zeros(f"critic.gru.bias_hh_l{l}", 6 * d_caps)
        zeros("critic.lin.weight", 1, 2 * d_caps)
        zeros("critic.lin.bias", 1)
        for r in ["relu", "relu2"]:
            zeros(f"critic.{r}.alpha", 1)
            zeros(f"critic.{r}.beta", 1)

    def encoder_stack(tname, tree, d, nl):
        """TransformerEncoder: live self_attn/linear1/linear2/norm1/norm2,
        dead ``embed`` (Linear d->300, encoder.py:50)."""
        for i in range(nl):
            layer = tree[f"layer_{i}"]
            pref = f"{tname}.layers.{i}"
            mha(f"{pref}.self_attn", layer["self_attn"])
            dense(f"{pref}.linear1", layer["linear1"])
            dense(f"{pref}.linear2", layer["linear2"])
            zeros(f"{pref}.embed.weight", 300, d)
            zeros(f"{pref}.embed.bias", 300)
            ln(f"{pref}.norm1", layer["norm1"])
            ln(f"{pref}.norm2", layer["norm2"])
        ln(f"{tname}.norm", tree["norm"])

    def decoder_stack(tname, tree, d_mem, d_C, d_g, d_att, nl,
                      live_detected, live=True):
        """TransformerDecoder: per layer self_attn/multihead_attn live,
        detected_attention live only on the worker path, goal_attention +
        norm4 always dead, positional_encoding an empty Parameter
        (decoder.py:39-66)."""
        for i in range(nl):
            layer = tree[f"layer_{i}"] if live else None
            pref = f"{tname}.layers.{i}"
            zeros(f"{pref}.positional_encoding")
            if live:
                mha(f"{pref}.self_attn", layer["self_attn"])
                mha(f"{pref}.multihead_attn", layer["multihead_attn"])
            else:
                mha_dead(f"{pref}.self_attn", d_C, d_C, d_C, d_att)
                mha_dead(f"{pref}.multihead_attn", d_C, d_mem, d_mem, d_att)
            if live and live_detected:
                mha(f"{pref}.detected_attention", layer["detected_attention"])
                ln(f"{pref}.norm5", layer["norm5"])
            else:
                mha_dead(f"{pref}.detected_attention", d_C, 256, 256, d_att)
                ln_dead(f"{pref}.norm5", d_C)
            mha_dead(f"{pref}.goal_attention", d_C, d_g, d_g, d_att)
            ln_dead(f"{pref}.norm4", d_C)
            if live:
                dense(f"{pref}.linear1", layer["linear1"])
                dense(f"{pref}.linear2", layer["linear2"])
                ln(f"{pref}.norm1", layer["norm1"])
                ln(f"{pref}.norm2", layer["norm2"])
                ln(f"{pref}.norm3", layer["norm3"])
            else:
                zeros(f"{pref}.linear1.weight", dim_ff, d_C)
                zeros(f"{pref}.linear1.bias", dim_ff)
                zeros(f"{pref}.linear2.weight", d_C, dim_ff)
                zeros(f"{pref}.linear2.bias", d_C)
                for n in ["norm1", "norm2", "norm3"]:
                    ln_dead(f"{pref}.{n}", d_C)
        if live:
            ln(f"{tname}.norm", tree["norm"])
        else:
            ln_dead(f"{tname}.norm", d_C)

    encoder_stack("encoder", p["encoder"], d_model, num_layers)
    decoder_stack("worker_decoder", p["worker_decoder"], d_model, d_worker,
                  d_goal, d_model, num_layers, live_detected=True)
    if pre_goal_attention:
        decoder_stack("manager_decoder", p["manager_decoder"], d_model,
                      d_caps, d_goal, d_model, num_layers,
                      live_detected=False)
        dense("manager.linear", p["manager"]["linear"])
        ln("goal_norm", p["goal_norm"])
        mha("goal_attention", p["goal_attention"])
        mha("goal_feature_attention", p["goal_feature_attention"])
    else:
        decoder_stack("manager_decoder", None, d_model, d_caps, d_goal,
                      d_model, num_layers, live_detected=False, live=False)
        # On the default path the reference ALIASES one LayerNorm object as
        # both worker_decoder.norm and manager_decoder.norm
        # (det_bmhrl_agent.py:43: ``worker_decoder_norm = decoder_norm =
        # nn.LayerNorm(...)``; TransformerDecoder keeps the object, no clone),
        # so both keys map to the same tensor and the LAST one loaded wins —
        # emit the live values under both keys.
        ln("manager_decoder.norm", p["worker_decoder"]["norm"])
        zeros("manager.linear.weight", d_goal, d_caps)
        zeros("manager.linear.bias", d_goal)
        ln_dead("goal_norm", d_caps)
        mha_dead("goal_attention", d_caps, d_goal, d_goal, d_model)
        mha_dead("goal_feature_attention", d_goal, d_caps, d_caps, d_model)
    dense("linear", p["linear"])
    zeros("query_embed.weight", 80, 300)  # dead (det_bmhrl_agent.py:74)

    od = p["object_detector"]
    dense("object_detector.class_embed", od["class_embed"])
    put("object_detector.query_embed.weight", od["query_embed"])
    dense("object_detector.input_projection", od["input_projection"])
    zeros("object_detector.linear.weight", voc, obj_hidden)  # dead
    zeros("object_detector.linear.bias", voc)
    encoder_stack("object_detector.encoder", od["encoder"], obj_hidden,
                  obj_layers)
    decoder_stack("object_detector.decoder", od["decoder"], obj_hidden,
                  obj_hidden, d_goal, obj_hidden, obj_layers,
                  live_detected=False)

    for i in range(n_time):
        # torch Conv1d weight (out, in, k) <- flax Conv kernel (k, in, out)
        put(f"input_proj.{i}.0.weight",
            p[f"input_proj_{i}"]["kernel"].transpose(2, 1, 0))
        put(f"input_proj.{i}.0.bias", p[f"input_proj_{i}"]["bias"])
        put(f"input_proj.{i}.1.weight", p[f"input_norm_{i}"]["scale"])
        put(f"input_proj.{i}.1.bias", p[f"input_norm_{i}"]["bias"])

    torch.save(sd, path)
    return path
