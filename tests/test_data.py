"""Data pipeline tests on the reference-format assets (meta TSVs + sample npy)."""
import os

import numpy as np
import pytest

from bmhrl_tpu.data.features import crop_a_segment, load_features_from_npy, pick_bucket
from bmhrl_tpu.data.tokenizer import tokenize_lower
from bmhrl_tpu.data.vocab import BOS, EOS, PAD, UNK, Vocab

REF = "/root/reference"


def test_specials_convention():
    v = Vocab.build([["a", "b", "a"]])
    assert v.itos[:4] == ["<unk>", "<blank>", "<s>", "</s>"]
    assert (UNK, PAD, BOS, EOS) == (0, 1, 2, 3)
    # freq desc, then alphabetical
    assert v.itos[4:] == ["a", "b"]


def test_vocab_min_freq_and_unk():
    v = Vocab.build([["x", "x", "y"]], min_freq=2)
    assert "y" not in v.stoi
    assert v.encode(["x", "y"]) == [v.stoi["x"], UNK]


def test_tokenizer_basic():
    assert tokenize_lower("A man is Running.") == ["a", "man", "is", "running", "."]
    assert tokenize_lower("don't stop") == ["do", "n't", "stop"]
    assert tokenize_lower("the man's dog") == ["the", "man", "'s", "dog"]
    assert tokenize_lower("well-known fact") == ["well", "-", "known", "fact"]
    assert tokenize_lower('she said "hi"') == ["she", "said", '"', "hi", '"']


def test_crop_a_segment_proportional():
    f = np.arange(10)[:, None].astype(np.float32)
    out = crop_a_segment(f, 2.0, 5.0, 10.0)
    np.testing.assert_array_equal(out[:, 0], [2, 3, 4])
    # tiny segment fix
    out = crop_a_segment(f, 5.0, 5.01, 10.0)
    assert out.shape[0] == 1


@pytest.mark.skipif(not os.path.exists(f"{REF}/sample"), reason="no sample")
def test_load_sample_features(tmp_path):
    # arrange sample files under the expected naming
    import shutil

    vdir = tmp_path / "i3d"
    adir = tmp_path / "vggish"
    vdir.mkdir(); adir.mkdir()
    shutil.copy(f"{REF}/sample/women_long_jump_rgb.npy", vdir / "wlj_rgb.npy")
    shutil.copy(f"{REF}/sample/women_long_jump_flow.npy", vdir / "wlj_flow.npy")
    shutil.copy(f"{REF}/sample/women_long_jump_vggish.npy", adir / "wlj.npy")
    st = load_features_from_npy(str(vdir), str(adir), "wlj", 0.0, 10.0, 10.0)
    assert st["rgb"].shape == (14, 1024)
    assert st["flow"].shape == (14, 1024)
    assert st["audio"].shape == (36, 128)
    # missing video -> zero fill
    st = load_features_from_npy(str(vdir), str(adir), "nope", 0.0, 1.0, 1.0)
    assert st["rgb"].shape == (1, 1024) and st["rgb"].sum() == 0


def test_pick_bucket():
    assert pick_bucket(10, (32, 64)) == 32
    assert pick_bucket(33, (32, 64)) == 64
    assert pick_bucket(999, (32, 64)) == 64


@pytest.mark.skipif(not os.path.exists(f"{REF}/data/train.csv"), reason="no meta")
def test_dataset_batches(tmp_path, monkeypatch):
    """End-to-end batch assembly against the real train.csv meta (features
    missing on disk -> zero-filled), with a truncated vocab build."""
    import csv

    from bmhrl_tpu.config import Config
    from bmhrl_tpu.data.dataset import CaptioningDataset

    # small meta copy (50 rows)
    src = f"{REF}/data/train.csv"
    dst = tmp_path / "train.csv"
    with open(src) as f, open(dst, "w") as g:
        for i, line in enumerate(f):
            if i > 50:
                break
            g.write(line)
    cfg = Config(
        train_meta_path=str(dst), val_1_meta_path=str(dst),
        video_features_path=str(tmp_path), audio_features_path=str(tmp_path),
        B=4, mesh_shape=(1, 1), to_log=False)
    ds = CaptioningDataset(cfg, "train")
    assert ds.trg_voc_size > 10
    batches = list(ds.batches(epoch=0))
    assert len(batches) == 50 // 4
    b = batches[0]
    assert b["rgb"].shape[0] == 4 and b["rgb"].shape[2] == 1024
    assert b["audio"].shape[2] == 128
    assert b["caption_idx"].shape[0] == 4
    assert (b["caption_idx"][:, 0] == BOS).all()
    # each row must contain exactly one EOS
    assert ((b["caption_idx"] == EOS).sum(1) == 1).all()
    # deterministic shuffle
    b2 = next(iter(ds.batches(epoch=0)))
    assert b2["video_ids"] == b["video_ids"]


def test_glove_loading(tmp_path):
    from bmhrl_tpu.data.vocab import Vocab

    v = Vocab.build([["alpha", "beta", "alpha"]])
    glove = tmp_path / "glove.txt"
    glove.write_text(
        "alpha " + " ".join(["0.5"] * 4) + "\n"
        "gamma " + " ".join(["0.1"] * 4) + "\n")
    vecs = v.load_glove(str(glove), dim=4)
    assert vecs.shape == (len(v.itos), 4)
    np.testing.assert_allclose(vecs[v.stoi["alpha"]], 0.5)
    np.testing.assert_allclose(vecs[v.stoi["beta"]], 0.0)  # OOV -> zeros
