"""End-to-end orchestrator test: warmstart -> RL (worker+manager alternation)
-> greedy eval with METEOR, on a tiny synthetic dataset built from the
bundled sample features. CPU, small model dims."""
import json
import os
import shutil

import numpy as np
import pytest

from bmhrl_tpu.config import Config
from bmhrl_tpu.train.loop import train_rl_cap

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{REF}/sample"), reason="sample assets missing")


@pytest.fixture(scope="module")
def tiny_data(tmp_path_factory):
    root = tmp_path_factory.mktemp("tiny")
    vdir = root / "i3d"
    adir = root / "vggish"
    vdir.mkdir(); adir.mkdir()
    # two "videos" from the one sample clip
    for vid in ("v_a", "v_b"):
        shutil.copy(f"{REF}/sample/women_long_jump_rgb.npy", vdir / f"{vid}_rgb.npy")
        shutil.copy(f"{REF}/sample/women_long_jump_flow.npy", vdir / f"{vid}_flow.npy")
        shutil.copy(f"{REF}/sample/women_long_jump_vggish.npy", adir / f"{vid}.npy")
    rows = [
        ("v_a", "A woman runs and jumps into the sand", 0.0, 5.0, 10.0),
        ("v_a", "The woman lands in a sand pit", 5.0, 10.0, 10.0),
        ("v_b", "A person is doing a long jump", 0.0, 8.0, 8.0),
        ("v_b", "People watch the jump from the side", 2.0, 8.0, 8.0),
    ] * 2
    header = "video_id\tcaption\tstart\tend\tduration\tphase\tidx\n"
    train_csv = root / "train.csv"
    with open(train_csv, "w") as f:
        f.write(header)
        for i, (v, c, s, e, d) in enumerate(rows):
            f.write(f"{v}\t{c}\t{s}\t{e}\t{d}\ttrain\t{i}\n")
    val_csv = root / "val_1.csv"
    with open(val_csv, "w") as f:
        f.write(header)
        for i, (v, c, s, e, d) in enumerate(rows[:4]):
            f.write(f"{v}\t{c}\t{s}\t{e}\t{d}\tval_1\t{i}\n")
    gt = {}
    for v, c, s, e, d in rows[:4]:
        gt.setdefault(v, {"duration": d, "timestamps": [], "sentences": []})
        gt[v]["timestamps"].append([s, e])
        gt[v]["sentences"].append(c)
    gt_path = root / "val_1_no_missings.json"
    gt_path.write_text(json.dumps(gt))
    return dict(root=root, train=train_csv, val=val_csv, gt=gt_path,
                vdir=vdir, adir=adir)


def test_train_rl_cap_end_to_end(tiny_data):
    cfg = Config(
        train_meta_path=str(tiny_data["train"]),
        val_1_meta_path=str(tiny_data["val"]),
        vatex_meta_path="/nonexistent", msrvtt_meta_path="/nonexistent",
        video_features_path=str(tiny_data["vdir"]),
        audio_features_path=str(tiny_data["adir"]),
        reference_paths=(str(tiny_data["gt"]),) * 4,
        rl_critic_path="/nonexistent",
        B=4, mesh_shape=(1, 1), epoch_num=3, rl_warmstart_epochs=1,
        one_by_one_starts_at=2, early_stop_after=30,
        d_model=32, d_model_caps=16, rl_att_heads=2, rl_att_layers=1,
        rl_ff_c=32, rl_ff_v=32, rl_ff_a=16, rl_goal_d=8,
        max_len=12, caption_buckets=(16,), video_buckets=(16,),
        audio_buckets=(64,), compute_dtype="float32",
        log_dir=str(tiny_data["root"] / "log"), seed=0)
    out = train_rl_cap(cfg, max_steps_per_epoch=2)
    assert "state" in out
    # eval ran at epoch 2 and produced a submission json
    log_root = cfg.log_path
    subs = [f for f in os.listdir(log_root) if f.startswith("captioning_results")]
    assert subs, os.listdir(log_root)
    sub = json.load(open(os.path.join(log_root, subs[0])))
    assert set(sub["results"].keys()) <= {"v_a", "v_b"}
    for segs in sub["results"].values():
        for seg in segs:
            assert isinstance(seg["sentence"], str)
            assert len(seg["timestamp"]) == 2


def test_eval_mode(tiny_data):
    cfg = Config(
        train_meta_path=str(tiny_data["train"]),
        val_1_meta_path=str(tiny_data["val"]),
        vatex_meta_path="/nonexistent", msrvtt_meta_path="/nonexistent",
        video_features_path=str(tiny_data["vdir"]),
        audio_features_path=str(tiny_data["adir"]),
        reference_paths=(str(tiny_data["gt"]),) * 4,
        rl_critic_path="/nonexistent", mode="eval",
        B=4, mesh_shape=(1, 1),
        d_model=32, d_model_caps=16, rl_att_heads=2, rl_att_layers=1,
        rl_ff_c=32, rl_ff_v=32, rl_ff_a=16, rl_goal_d=8,
        max_len=12, caption_buckets=(16,), video_buckets=(16,),
        audio_buckets=(64,), compute_dtype="float32", to_log=False, seed=0)
    results = train_rl_cap(cfg)
    assert "val_1" in results
    assert "METEOR" in results["val_1"]


def test_eval_learned_props(tiny_data):
    """Predicted-proposals eval: --mode eval + val_prop_meta_path routes the
    learned_props phase through the FULL tIoU sweep over all reference files
    (ref: validation_loops.py:34-49; VERDICT missing #4)."""
    import dataclasses

    root = tiny_data["root"]
    # predicted segments: perturbed copies of the GT segments
    prop_csv = root / "val_props.csv"
    rows = [("v_a", "placeholder", 0.5, 5.5, 10.0),
            ("v_a", "placeholder", 4.0, 9.5, 10.0),
            ("v_b", "placeholder", 0.0, 7.0, 8.0)]
    with open(prop_csv, "w") as f:
        f.write("video_id\tcaption\tstart\tend\tduration\tphase\tidx\n")
        for i, (v, c, s, e, d) in enumerate(rows):
            f.write(f"{v}\t{c}\t{s}\t{e}\t{d}\tlearned_props\t{i}\n")
    cfg = Config(
        train_meta_path=str(tiny_data["train"]),
        val_1_meta_path=str(tiny_data["val"]),
        vatex_meta_path="/nonexistent", msrvtt_meta_path="/nonexistent",
        video_features_path=str(tiny_data["vdir"]),
        audio_features_path=str(tiny_data["adir"]),
        reference_paths=(str(tiny_data["gt"]),) * 4,
        rl_critic_path="/nonexistent", mode="eval",
        val_prop_meta_path=str(prop_csv),
        B=4, mesh_shape=(1, 1),
        d_model=32, d_model_caps=16, rl_att_heads=2, rl_att_layers=1,
        rl_ff_c=32, rl_ff_v=32, rl_ff_a=16, rl_goal_d=8,
        max_len=12, caption_buckets=(16,), video_buckets=(16,),
        audio_buckets=(64,), compute_dtype="float32", to_log=False, seed=0)
    results = train_rl_cap(cfg)
    assert "learned_props" in results
    lp = results["learned_props"]
    # full sweep averages include captioning + detection metrics
    for m in ("METEOR", "Precision", "Recall"):
        assert m in lp and np.isfinite(lp[m])


def test_auto_resume_continues_from_latest_checkpoint(tiny_data):
    """--auto_resume restores the newest E_{n} under log_dir and continues
    at epoch n+1 with the alternation/warmstart schedule re-derived."""
    import glob

    common = dict(
        train_meta_path=str(tiny_data["train"]),
        val_1_meta_path=str(tiny_data["val"]),
        vatex_meta_path="/nonexistent", msrvtt_meta_path="/nonexistent",
        video_features_path=str(tiny_data["vdir"]),
        audio_features_path=str(tiny_data["adir"]),
        reference_paths=(str(tiny_data["gt"]),) * 4,
        rl_critic_path="/nonexistent",
        B=4, mesh_shape=(1, 1), rl_warmstart_epochs=1,
        one_by_one_starts_at=100, early_stop_after=30,
        d_model=32, d_model_caps=16, rl_att_heads=2, rl_att_layers=1,
        rl_ff_c=32, rl_ff_v=32, rl_ff_a=16, rl_goal_d=8,
        max_len=12, caption_buckets=(16,), video_buckets=(16,),
        audio_buckets=(64,), compute_dtype="float32", seed=0,
        log_dir=str(tiny_data["root"] / "log_resume"))
    cfg1 = Config(epoch_num=3, **common)
    out1 = train_rl_cap(cfg1, max_steps_per_epoch=1)
    assert out1["start_epoch"] == 0
    # periodic checkpoints E_0, E_2 exist under the run dir
    ckpts = glob.glob(os.path.join(cfg1.log_dir, "**", "checkpoints", "E_*"),
                      recursive=True)
    assert any(c.endswith("E_2") for c in ckpts), ckpts

    cfg2 = Config(epoch_num=5, auto_resume=True, **common)
    out2 = train_rl_cap(cfg2, max_steps_per_epoch=1)
    assert out2["start_epoch"] == 3  # newest is E_2 -> continue at 3
