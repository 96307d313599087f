"""Proposal-generator tests: YOLO target assignment, model contract,
synthetic learning, postprocess/eval math, and the learned-props
integration with the captioner's eval phase."""
import json
import os

import numpy as np
import pytest

from bmhrl_tpu.models.proposal import (MultimodalProposalGenerator,
                                       yolo_targets)

TINY = dict(d_vid=16, d_aud=8, d_model=16, d_model_aud=8, d_ff_v=16,
            d_ff_a=8, att_heads=2, att_layers=1, dout_p=0.0)


def test_yolo_targets_assignment():
    anchors = np.asarray([2.0, 8.0], np.float32)
    # one GT [4, 8] in a 10 s video over 10 valid cells (1 s per cell)
    tgt = yolo_targets(np.asarray([[4.0, 8.0]]), 10.0, 10, 16, anchors)
    assert tgt["obj"].shape == (16, 2)
    # center 6.0 s -> cell 6; length 4 -> best anchor ratio: a=2 gives .5,
    # a=8 gives .5 -> argmax picks the first (a=2)... ratios equal, index 0
    cell, k = 6, int(np.argmax(np.minimum(anchors / 4.0, 4.0 / anchors)))
    assert tgt["obj"][cell, k] == 1.0
    assert tgt["obj"].sum() == 1.0
    np.testing.assert_allclose(tgt["t_center"][cell, k], 0.0, atol=1e-6)
    np.testing.assert_allclose(tgt["t_length"][cell, k],
                               np.log(4.0 / anchors[k]), rtol=1e-5)
    # ignore: windows overlapping the GT above 0.5 tIoU, not the positive
    assert tgt["ignore"][cell, k] == 0.0
    # padded cells (>= orig_len) carry nothing
    assert tgt["obj"][10:].sum() == 0 and tgt["ignore"][10:].sum() == 0


def test_yolo_targets_empty_gt():
    tgt = yolo_targets(np.zeros((0, 2)), 10.0, 10, 16,
                       np.asarray([2.0], np.float32))
    assert tgt["obj"].sum() == 0 and tgt["ignore"].sum() == 0


def _synthetic_dataset(tmp_path, n_videos=6, seed=0):
    """Features with a bump over the event span: learnable localization."""
    from bmhrl_tpu.data.proposal import ProposalDataset

    rng = np.random.RandomState(seed)
    vdir, adir = tmp_path / "i3d", tmp_path / "vggish"
    vdir.mkdir(exist_ok=True); adir.mkdir(exist_ok=True)
    rows = []
    for i in range(n_videos):
        vid = f"v{i}"
        dur = 10.0
        s = float(rng.uniform(1, 5)); e = s + float(rng.uniform(2, 4))
        rgb = rng.rand(20, 16).astype(np.float32) * 0.1
        lo, hi = int(20 * s / dur), max(int(20 * e / dur), int(20 * s / dur) + 1)
        rgb[lo:hi] += 1.0  # the event signature
        aud = rng.rand(40, 8).astype(np.float32) * 0.1
        lo_a, hi_a = int(40 * s / dur), max(int(40 * e / dur), int(40 * s / dur) + 1)
        aud[lo_a:hi_a] += 1.0
        np.save(vdir / f"{vid}_rgb.npy", rgb)
        np.save(vdir / f"{vid}_flow.npy", np.zeros_like(rgb))
        np.save(adir / f"{vid}.npy", aud)
        rows.append((vid, "an event happens", s, e, dur))
    meta = tmp_path / "props_train.csv"
    with open(meta, "w") as f:
        f.write("video_id\tcaption\tstart\tend\tduration\tphase\tidx\n")
        for i, (v, c, s, e, d) in enumerate(rows):
            f.write(f"{v}\t{c}\t{s}\t{e}\t{d}\ttrain\t{i}\n")
    ds = ProposalDataset(str(meta), str(vdir), str(adir), pad_video_to=32,
                         pad_audio_to=64, num_anchors=3, d_vid=16, d_aud=8)
    return ds, meta, vdir, adir


def test_batches_smaller_dataset_than_batch_size(tmp_path):
    """A dataset smaller than B must still yield one batch per epoch
    (regression: training silently did nothing)."""
    ds, *_ = _synthetic_dataset(tmp_path)
    got = list(ds.batches(0, batch_size=64))
    assert len(got) == 1
    assert len(got[0]["video_ids"]) == len(ds)


def test_model_contract_and_loss(tmp_path):
    import jax
    import jax.numpy as jnp

    ds, *_ = _synthetic_dataset(tmp_path)
    batch = ds.make_batch([0, 1])
    model = MultimodalProposalGenerator(
        num_anchors=len(ds.anchors), dtype=jnp.float32, **TINY)
    k = jax.random.PRNGKey(0)
    fs = jax.tree.map(jnp.asarray, batch["feature_stacks"])
    tg = jax.tree.map(jnp.asarray, batch["targets"])
    mk = jax.tree.map(jnp.asarray, batch["masks"])
    params = jax.jit(model.init)({"params": k, "dropout": k}, fs, tg, mk)
    preds, loss, la, lv = model.apply(params, fs, tg, mk)
    # reference contract: (B, SvK + SaK, 3), scalar loss, per-modality dicts
    K = len(ds.anchors)
    assert preds.shape == (2, 32 * K + 64 * K, 3)
    assert np.isfinite(float(loss))
    assert set(la) == {"loss_loc", "loss_conf"} == set(lv)
    p = np.asarray(preds)
    # confidences in [0, 1]; padded cells forced to 0
    assert (p[:, :, 2] >= 0).all() and (p[:, :, 2] <= 1).all()
    # video stream: cells beyond orig_len (20) have conf 0 for every anchor
    pv = p[:, : 32 * K, 2].reshape(2, 32, K)
    assert pv[:, 20:].max() == 0.0


def test_proposal_learning_synthetic(tmp_path):
    """Loss falls and val F1@0.5 becomes nontrivial on bump-coded events."""
    import jax

    from bmhrl_tpu.train.steps_proposal import ProposalStepFactory
    from cli.train_proposals import evaluate_proposals, postprocess

    import jax.numpy as jnp

    ds, *_ = _synthetic_dataset(tmp_path)
    model = MultimodalProposalGenerator(
        num_anchors=len(ds.anchors), dtype=jnp.float32, **TINY)
    sf = ProposalStepFactory(model, lr=2e-3, grad_clip=1.0)
    batch = ds.make_batch(list(range(6)))

    def dev(b):
        return {k: jax.tree.map(jnp.asarray, b[k])
                for k in ("feature_stacks", "masks", "targets")}

    state = sf.init_state(jax.random.PRNGKey(0), batch)
    rng = jax.random.PRNGKey(1)
    losses = []
    for i in range(60):
        rng, sub = jax.random.split(rng)
        state, m = sf.train_step(state, dev(batch), sub)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] * 0.5, (losses[0], losses[-1])

    preds = np.asarray(sf.predict(state, dev(batch)))
    per_vid = postprocess(preds, batch["durations"], 10, 0.5)
    pred_segments = dict(zip(batch["video_ids"], per_vid))
    gt = {v: ds.videos[v]["segments"] for v in batch["video_ids"]}
    metrics = evaluate_proposals(pred_segments, gt, [0.5])
    assert metrics["avg"]["Recall"] > 0.5, metrics


def test_postprocess_and_eval_math():
    from cli.train_proposals import evaluate_proposals, postprocess

    # one video, three raw predictions; top-k FIRST then NMS at 0.5
    # (the reference's order: utilities/proposal_utils.py:195-250)
    preds = np.asarray([[[1.0, 5.0, 0.9], [1.2, 5.2, 0.8], [7.0, 9.0, 0.7]]])
    per_vid = postprocess(preds, [10.0], max_props=3, nms_tiou=0.5)
    # the 0.8 duplicate of [1,5] is suppressed; [7,9] survives
    assert len(per_vid[0]) == 2
    segs = np.asarray(per_vid[0])[:, :2]
    assert [1.0, 5.0] in segs.tolist() and [7.0, 9.0] in segs.tolist()

    metrics = evaluate_proposals({"v": per_vid[0]},
                                 {"v": [[1.0, 5.0], [7.0, 9.0]]}, [0.5])
    assert metrics[0.5]["Precision"] == 1.0
    assert metrics[0.5]["Recall"] == 1.0
    assert metrics["avg"]["F1"] == pytest.approx(1.0)


def test_train_proposals_cli_and_learned_props_integration(tmp_path):
    """CLI end-to-end on synthetic data; the emitted TSV must be consumable
    by the captioner's learned_props eval phase (data/dataset.py routing)."""
    from cli.train_proposals import main

    ds, meta, vdir, adir = _synthetic_dataset(tmp_path)
    log_dir = tmp_path / "log"
    best_f1 = main([
        "--train_meta_path", str(meta), "--val_meta_path", str(meta),
        "--video_features_path", str(vdir),
        "--audio_features_path", str(adir),
        "--log_dir", str(log_dir), "--B", "6", "--epochs", "2",
        "--lr", "2e-3", "--num_anchors", "3",
        "--d_vid", "16", "--d_aud", "8", "--d_model", "16",
        "--d_model_aud", "8", "--att_heads", "2", "--att_layers", "1",
        "--d_ff_v", "16", "--d_ff_a", "8",
        "--pad_video_to", "32", "--pad_audio_to", "64",
        "--nms_tiou_thresh", "0.5", "--compute_dtype", "float32",
    ])
    tsv = log_dir / "learned_props.csv"
    assert tsv.exists() and best_f1 >= 0.0
    assert (log_dir / "learned_proposals.json").exists()

    # the captioner's eval phase consumes exactly this TSV
    from bmhrl_tpu.config import Config
    from bmhrl_tpu.data.dataset import CaptioningDataset

    cfg = Config(train_meta_path=str(meta), val_prop_meta_path=str(tsv),
                 video_features_path=str(vdir),
                 audio_features_path=str(adir), B=2, to_log=False,
                 d_vid=16, d_aud=8, d_model_caps=12,
                 video_buckets=(32,), audio_buckets=(64,),
                 caption_buckets=(16,))
    cap_ds = CaptioningDataset(cfg, "learned_props")
    b = next(cap_ds.batches(0, shuffle=False, drop_last=False))
    assert b["rgb"].shape[0] >= 1 and b["rgb"].shape[2] == 16


def test_dense_caption_cli_end_to_end(tmp_path):
    """Full dense-captioning orchestration: train a tiny proposal model,
    then one command from features to {timestamp, sentence,
    proposal_score} segments."""
    from cli.dense_caption import main as dense_main
    from cli.train_proposals import main as props_main

    ds, meta, vdir, adir = _synthetic_dataset(tmp_path)
    log_dir = tmp_path / "plog"
    props_main([
        "--train_meta_path", str(meta), "--val_meta_path", str(meta),
        "--video_features_path", str(vdir),
        "--audio_features_path", str(adir),
        "--log_dir", str(log_dir), "--B", "6", "--epochs", "1",
        "--num_anchors", "3", "--d_vid", "16", "--d_aud", "8",
        "--d_model", "16", "--d_model_aud", "8", "--att_heads", "2",
        "--att_layers", "1", "--d_ff_v", "16", "--d_ff_a", "8",
        "--pad_video_to", "32", "--pad_audio_to", "64",
        "--compute_dtype", "float32",
    ])
    durs = {v: ds.videos[v]["duration"] for v in ds.video_ids[:3]}
    dpath = tmp_path / "durs.json"
    dpath.write_text(json.dumps(durs))
    # caption-side vocab needs a train TSV (captions present in meta)
    out = tmp_path / "dense.json"
    cap_overrides = dict(
        d_vid=16, d_aud=8, d_model=16, d_model_caps=12, rl_att_heads=2,
        rl_att_layers=1, rl_ff_c=16, rl_ff_v=16, rl_ff_a=8, rl_goal_d=8,
        rl_critic_path="/nonexistent", video_buckets=[32],
        audio_buckets=[64], caption_buckets=[16])
    preds = dense_main([
        "--durations_json", str(dpath),
        "--video_features_path", str(vdir),
        "--audio_features_path", str(adir),
        "--proposal_checkpoint", str(log_dir),
        "--train_meta_path", str(meta),
        "--prop_d_model", "16", "--prop_d_model_aud", "8",
        "--prop_att_heads", "2", "--prop_att_layers", "1",
        "--prop_d_ff_v", "16", "--prop_d_ff_a", "8",
        "--d_vid", "16", "--d_aud", "8",
        "--pad_video_to", "32", "--pad_audio_to", "64",
        "--max_props", "3", "--batch_size", "4", "--max_len", "8",
        "--compute_dtype", "float32",
        "--config_json", json.dumps(cap_overrides),
        "--out", str(out),
    ])
    saved = json.loads(out.read_text())
    assert set(saved["results"]) == set(durs)
    for vid, segs in saved["results"].items():
        assert 1 <= len(segs) <= 3
        for seg in segs:
            assert isinstance(seg["sentence"], str)
            assert "proposal_score" in seg
            s, e = seg["timestamp"]
            assert 0.0 <= s < e <= durs[vid] + 1e-6
