"""Utility tests: metafile builder, proposals toolkit, checkpoint interop."""
import json
import os

import numpy as np
import pytest

from bmhrl_tpu.utils.captioning import (
    average_metrics_in_two_dicts, build_caption_corpus, clean_caption,
    make_metafile)
from bmhrl_tpu.utils.proposals import (
    kmeans_anchors, nms, select_topk_predictions, tiou_vectorized)


def test_clean_caption():
    assert clean_caption("A man runs.\nFast.") == "A man runs Fast"
    assert clean_caption("It’s 3.5 meters.") == "It's 3.5 meters"
    assert clean_caption("a  b   c") == "a b c"


def test_make_metafile(tmp_path):
    gt = {
        "v_x": {"duration": 10.0, "timestamps": [[0, 5], [5, 10]],
                "sentences": ["First part.", "Second  part."]},
        "v_y": {"duration": 4.0, "timestamps": [[0, 4]],
                "sentences": ["Only one."]},
    }
    jp = tmp_path / "train.json"
    jp.write_text(json.dumps(gt))
    out = tmp_path / "train.csv"
    n = make_metafile(str(jp), str(out))
    assert n == 3
    lines = out.read_text().strip().split("\n")
    assert lines[0].split("\t") == ["video_id", "caption", "start", "end",
                                    "duration", "phase", "idx"]
    assert lines[1].split("\t")[1] == "First part"
    # availability filter
    avail = tmp_path / "avail.txt"
    avail.write_text("v_y\n")
    n2 = make_metafile(str(jp), str(out), str(avail))
    assert n2 == 1


def test_build_caption_corpus(tmp_path):
    gt = {"v": {"duration": 1, "timestamps": [[0, 1]], "sentences": ["A b."]}}
    jp = tmp_path / "a.json"
    jp.write_text(json.dumps(gt))
    out = tmp_path / "corpus.csv"
    assert build_caption_corpus([str(jp), str(jp)], str(out)) == 2


def test_average_metrics():
    a = {"avg": {"M": 1.0, "B": 3.0}}
    b = {"avg": {"M": 3.0, "B": 5.0}}
    assert average_metrics_in_two_dicts(a, b) == {"avg": {"M": 2.0, "B": 4.0}}


def test_tiou_and_nms():
    segs = np.array([[0, 10], [1, 11], [20, 30]], np.float32)
    iou = tiou_vectorized(segs, segs)
    assert iou.shape == (3, 3)
    np.testing.assert_allclose(np.diag(iou), 1.0, rtol=1e-5)
    assert iou[0, 2] == 0.0
    keep = nms(segs, np.array([0.9, 0.8, 0.7]), 0.5)
    assert list(keep) == [0, 2]  # near-duplicate suppressed


def test_topk_and_kmeans():
    segs = np.array([[0, 1], [1, 2], [2, 3]], np.float32)
    s, sc = select_topk_predictions(segs, np.array([0.1, 0.9, 0.5]), 2)
    assert sc.tolist() == [0.9, 0.5]
    anchors = kmeans_anchors(np.array([1, 1.1, 5, 5.2, 9.9, 10.1]), 3)
    assert len(anchors) == 3
    np.testing.assert_allclose(anchors, [1.05, 5.1, 10.0], atol=0.1)


def test_torch_checkpoint_roundtrip(tmp_path):
    """export_torch_bmhrl -> import_torch_bmhrl must be the identity on the
    mapped params, and a synthetic critic.cp must load into the agent."""
    import jax
    import jax.numpy as jnp
    import torch

    from bmhrl_tpu.models.bmhrl import BMHrlAgent
    from bmhrl_tpu.ops.masking import make_masks
    from bmhrl_tpu.utils.checkpoint import (
        export_torch_bmhrl, import_torch_bmhrl, load_torch_critic)

    model = BMHrlAgent(
        voc_size=20, d_video=16, d_audio=8, d_model=16, d_model_caps=12,
        att_heads=2, att_layers=2, d_ff_v=16, d_ff_a=8, d_ff_c=16, d_goal=8,
        dtype=jnp.float32)
    feats = {"rgb": jnp.ones((1, 4, 16)), "audio": jnp.ones((1, 5, 8))}
    trg = jnp.asarray([[2, 4, 3, 1]], jnp.int32)
    masks = make_masks(feats, trg, "audio_video", 1)
    k = jax.random.PRNGKey(0)
    params = jax.jit(model.init)(
        {"params": k, "dropout": k, "noise": k},
        (feats["rgb"], feats["audio"]), trg, masks)

    pt = tmp_path / "bm_hrl_agent.pt"
    export_torch_bmhrl(params, str(pt), n_layers=2)
    back = import_torch_bmhrl(str(pt), n_layers=2)

    flat_a = jax.tree_util.tree_flatten_with_path(params["params"])[0]
    flat_b = dict(jax.tree_util.tree_flatten_with_path(back)[0])
    checked = 0
    for path, leaf in flat_a:
        if path in flat_b:
            np.testing.assert_allclose(
                np.asarray(leaf), np.asarray(flat_b[path]), rtol=1e-6,
                err_msg=str(path))
            checked += 1
    assert checked > 50  # the full mapped surface

    # synthetic critic.cp in the reference torch layout
    sd = {}
    D, H = 12, 24
    rng = np.random.RandomState(0)
    for l in range(4):
        din = D if l == 0 else H
        sd[f"lstm.weight_ih_l{l}"] = torch.tensor(rng.randn(4 * H, din).astype(np.float32))
        sd[f"lstm.weight_hh_l{l}"] = torch.tensor(rng.randn(4 * H, H).astype(np.float32))
        sd[f"lstm.bias_ih_l{l}"] = torch.tensor(rng.randn(4 * H).astype(np.float32))
        sd[f"lstm.bias_hh_l{l}"] = torch.tensor(rng.randn(4 * H).astype(np.float32))
    for l in range(2):
        sd[f"gru.weight_ih_l{l}"] = torch.tensor(rng.randn(3 * H, H).astype(np.float32))
        sd[f"gru.weight_hh_l{l}"] = torch.tensor(rng.randn(3 * H, H).astype(np.float32))
        sd[f"gru.bias_ih_l{l}"] = torch.tensor(rng.randn(3 * H).astype(np.float32))
        sd[f"gru.bias_hh_l{l}"] = torch.tensor(rng.randn(3 * H).astype(np.float32))
    sd["lin.weight"] = torch.tensor(rng.randn(1, H).astype(np.float32))
    sd["lin.bias"] = torch.tensor(rng.randn(1).astype(np.float32))
    for r in ("relu", "relu2"):
        sd[f"{r}.alpha"] = torch.tensor([0.9])
        sd[f"{r}.beta"] = torch.tensor([2.0])
    cp = tmp_path / "critic.cp"
    torch.save(sd, str(cp))
    crit = load_torch_critic(str(cp))
    assert crit["lstm_l0"]["weight_ih"].shape == (4 * H, D)
    assert crit["lin"]["kernel"].shape == (H, 1)


def test_critic_matches_torch_rnn(tmp_path):
    """Our critic with imported torch weights must reproduce torch's
    LSTM/GRU outputs (gate-order compatibility)."""
    import torch

    from bmhrl_tpu.models.critic import GRULayer, LSTMLayer

    D, H, B, L = 6, 8, 2, 5
    rng = np.random.RandomState(1)
    x = rng.randn(B, L, D).astype(np.float32)

    t_lstm = torch.nn.LSTM(D, H, num_layers=1, batch_first=True)
    with torch.no_grad():
        want, _ = t_lstm(torch.tensor(x))
    params = {"params": {
        "weight_ih": t_lstm.weight_ih_l0.detach().numpy(),
        "weight_hh": t_lstm.weight_hh_l0.detach().numpy(),
        "bias_ih": t_lstm.bias_ih_l0.detach().numpy(),
        "bias_hh": t_lstm.bias_hh_l0.detach().numpy(),
    }}
    got = LSTMLayer(D, H).apply(params, x)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-4,
                               atol=1e-5)

    t_gru = torch.nn.GRU(D, H, num_layers=1, batch_first=True)
    with torch.no_grad():
        want_g, _ = t_gru(torch.tensor(x))
    params_g = {"params": {
        "weight_ih": t_gru.weight_ih_l0.detach().numpy(),
        "weight_hh": t_gru.weight_hh_l0.detach().numpy(),
        "bias_ih": t_gru.bias_ih_l0.detach().numpy(),
        "bias_hh": t_gru.bias_hh_l0.detach().numpy(),
    }}
    got_g = GRULayer(D, H).apply(params_g, x)
    np.testing.assert_allclose(np.asarray(got_g), want_g.numpy(), rtol=1e-4,
                               atol=1e-5)


def test_cleanup_stale_run_dirs(tmp_path):
    """ref: utilities/folder_cleanup.py (intent-fixed: explicit callable)."""
    from bmhrl_tpu.utils.logging import cleanup_stale_run_dirs

    stale_tb = tmp_path / "run_a"
    stale_tb.mkdir()
    (stale_tb / "events.out.tfevents.123.host").write_text("")
    stale_jsonl = tmp_path / "run_b"
    stale_jsonl.mkdir()
    (stale_jsonl / "scalars.jsonl").write_text("{}")
    keep = tmp_path / "run_c"
    keep.mkdir()
    (keep / "scalars.jsonl").write_text("{}")
    (keep / "captioning_results_val_1_e3.json").write_text("{}")

    assert cleanup_stale_run_dirs(str(tmp_path)) == 2
    assert not stale_tb.exists() and not stale_jsonl.exists()
    assert keep.exists()
    assert cleanup_stale_run_dirs(str(tmp_path / "missing")) == 0
