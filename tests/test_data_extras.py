"""VATEX integration + proposal dataset + critic trainer helpers."""
import json

import numpy as np
import pytest

from bmhrl_tpu.data.proposal import ProposalDataset, pad_segment_np
from bmhrl_tpu.data.vatex import VatexRow, convert_vatex_training


def test_vatex_conversion(tmp_path):
    data = [
        {"videoID": "CQzUU7-cVck_000006_000016",
         "enCap": ["a person climbs", "someone rappels down"]},
        {"videoID": "OMK0OJ4f_TI_000000_000010", "enCap": "single caption"},
    ]
    p = tmp_path / "vatex_training.json"
    p.write_text(json.dumps(data))
    rows = convert_vatex_training(str(p))
    assert rows[0].base_id == "CQzUU7-cVck"
    assert rows[0].start == 6 and rows[0].end == 16
    assert rows[0].feature_id() == "CQzUU7-cVck_000006_000016"
    assert len(rows[0].captions) == 2
    assert rows[1].captions == ["single caption"]


def test_train_with_all_concat(tmp_path):
    from bmhrl_tpu.config import Config
    from bmhrl_tpu.data.dataset import CaptioningDataset

    meta = tmp_path / "train.csv"
    meta.write_text(
        "video_id\tcaption\tstart\tend\tduration\tphase\tidx\n"
        "v_a\tA man runs\t0\t5\t10\ttrain\t0\n")
    vj = tmp_path / "vatex_training.json"
    vj.write_text(json.dumps([
        {"videoID": "XYZ_000000_000010",
         "enCap": ["caption one here", "caption two here"]}]))
    cfg = Config(train_meta_path=str(meta), train_with_all=True,
                 vatex_training_json=str(vj),
                 video_features_path=str(tmp_path),
                 audio_features_path=str(tmp_path), B=2, mesh_shape=(1, 1),
                 to_log=False)
    ds = CaptioningDataset(cfg, "train")
    assert len(ds.rows) == 2
    vrow = ds.rows[1]
    assert vrow.video_dir is not None and vrow.caption_choices is not None
    # epoch-seeded caption sampling is deterministic per epoch
    list(ds.batches(epoch=3, drop_last=False))
    cap_e3 = vrow.caption
    list(ds.batches(epoch=3, drop_last=False))
    assert vrow.caption == cap_e3


def test_pad_segment_np():
    f = np.ones((5, 4), np.float32)
    out = pad_segment_np(f, 8)
    assert out.shape == (8, 4) and out[5:].sum() == 0
    assert pad_segment_np(f, 3).shape == (3, 4)


def test_proposal_dataset(tmp_path):
    meta = tmp_path / "train.csv"
    meta.write_text(
        "video_id\tcaption\tstart\tend\tduration\tphase\tidx\n"
        "v_a\tc1\t0\t5\t10\ttrain\t0\n"
        "v_a\tc2\t5\t10\t10\ttrain\t1\n"
        "v_b\tc3\t0\t4\t8\ttrain\t2\n")
    np.save(tmp_path / "v_a_rgb.npy", np.ones((20, 8), np.float32))
    np.save(tmp_path / "v_a_flow.npy", np.ones((20, 8), np.float32))
    np.save(tmp_path / "v_a.npy", np.ones((30, 4), np.float32))
    ds = ProposalDataset(str(meta), str(tmp_path), str(tmp_path),
                         pad_video_to=32, pad_audio_to=40, num_anchors=2,
                         d_vid=8, d_aud=4)
    assert len(ds) == 2
    item = ds[0]
    assert item["rgb"].shape == (32, 8)
    assert item["audio"].shape == (40, 4)
    assert item["orig_len_video"] == 20
    assert item["gt_segments"].shape == (2, 2)
    tgt = ds.anchor_targets(item["gt_segments"], item["duration"], grid=16)
    assert tgt.shape == (16, len(ds.anchors))
    assert tgt.sum() > 0  # some anchors match the GT segments


def test_critic_synth_labels():
    from cli.train_critic import synth_labels

    toks = ["a", "man", "runs", ",", "jumps", "and", "lands"]
    lab = synth_labels(toks)
    assert lab[2] == 1  # before comma
    assert lab[4] == 1  # before "and"
    assert lab[-1] == 1  # caption end
    assert len(lab) == len(toks)


def test_video_tools(tmp_path):
    import numpy as np

    from bmhrl_tpu.data.video_tools import (
        build_val_csv, convert_meta_to_json, filter_missing_features)

    meta = tmp_path / "val.csv"
    meta.write_text(
        "video_id\tcaption\tstart\tend\tduration\tphase\tidx\n"
        "v_a\tc1\t0\t5\t10\tval\t0\n"
        "v_a\tc2\t5\t10\t10\tval\t1\n"
        "v_b\tc3\t0\t4\t8\tval\t2\n")
    out = tmp_path / "val.json"
    n = convert_meta_to_json(str(meta), str(out))
    assert n == 2
    data = json.loads(out.read_text())
    assert data["v_a"]["timestamps"] == [[0.0, 5.0], [5.0, 10.0]]
    assert len(data["v_a"]["sentences"]) == 2

    # val csv builder with feature filter
    np.save(tmp_path / "x_000000_000010_rgb.npy", np.ones((2, 2)))
    n2 = build_val_csv(
        [{"video_id": "x", "caption": "c", "start": 0, "end": 10},
         {"video_id": "y", "caption": "c2", "start": 0, "end": 5}],
        str(tmp_path / "v.csv"), "vatex_val", feature_dir=str(tmp_path))
    assert n2 == 1  # y filtered (no features)
    body = (tmp_path / "v.csv").read_text()
    assert "x_000000_000010" in body

    n3 = filter_missing_features(str(tmp_path / "v.csv"), str(tmp_path),
                                 str(tmp_path / "v2.csv"))
    assert n3 == 1
