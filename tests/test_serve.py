"""Serving engine tests: length-aware batch planning, end-to-end batch
captioning on the bundled sample features, mesh-sharded serving parity,
and the CLI surface."""
import json
import os
import shutil

import numpy as np
import pytest

from bmhrl_tpu.config import Config
from bmhrl_tpu.serve import (CaptionServer, ClipRequest, plan_batches,
                             read_meta_tsv, read_proposals_json)

REF = "/root/reference"

TINY = dict(
    d_model=32, d_model_caps=16, rl_att_heads=2, rl_att_layers=1,
    rl_ff_c=32, rl_ff_v=32, rl_ff_a=16, rl_goal_d=8, max_len=10,
    caption_buckets=(16,), video_buckets=(16, 32), audio_buckets=(64,),
    compute_dtype="float32", to_log=False, rl_critic_path="/nonexistent",
)


@pytest.fixture(scope="module")
def feature_dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("serve")
    vdir, adir = root / "i3d", root / "vggish"
    vdir.mkdir(); adir.mkdir()
    rng = np.random.RandomState(0)
    # two length classes: short (14 frames, like the bundled sample) and
    # long (28 frames) -> distinct video buckets under TINY's (16, 32)
    for vid, n in (("s1", 14), ("s2", 14), ("s3", 14), ("l1", 28), ("l2", 28)):
        np.save(vdir / f"{vid}_rgb.npy", rng.rand(n, 1024).astype(np.float32))
        np.save(vdir / f"{vid}_flow.npy", rng.rand(n, 1024).astype(np.float32))
        np.save(adir / f"{vid}.npy", rng.rand(36, 128).astype(np.float32))
    return root, vdir, adir


@pytest.fixture(scope="module")
def train_tsv(tmp_path_factory):
    root = tmp_path_factory.mktemp("meta")
    path = root / "train.csv"
    rows = [("v", "a woman jumps far", 0.0, 5.0, 10.0),
            ("v", "people watch the jump", 5.0, 10.0, 10.0)]
    with open(path, "w") as f:
        f.write("video_id\tcaption\tstart\tend\tduration\tphase\tidx\n")
        for i, (v, c, s, e, d) in enumerate(rows):
            f.write(f"{v}\t{c}\t{s}\t{e}\t{d}\ttrain\t{i}\n")
    return path


def _reqs(vdir, adir):
    # full-span requests: post-crop length == file length
    return [ClipRequest(vid, 0.0, 10.0, 10.0, str(vdir), str(adir))
            for vid in ("s1", "l1", "s2", "l2", "s3")]


def test_plan_batches_groups_by_bucket(feature_dirs):
    root, vdir, adir = feature_dirs
    cfg = Config(video_features_path=str(vdir),
                 audio_features_path=str(adir), **TINY)
    reqs = _reqs(vdir, adir)
    plan = plan_batches(reqs, cfg, batch_size=2)
    # short clips (14 -> bucket 16): s1, s2, s3; long (28 -> 32): l1, l2
    by_bucket = {}
    for idxs, vb, ab in plan:
        assert ab == 64
        by_bucket.setdefault(vb, []).extend(idxs)
    assert sorted(by_bucket[16]) == [0, 2, 4]
    assert sorted(by_bucket[32]) == [1, 3]
    # batch_size respected: 3 shorts -> batches of 2 + 1
    sizes = sorted(len(i) for i, vb, _ in plan if vb == 16)
    assert sizes == [1, 2]


def test_plan_batches_crop_math_matches_loader(feature_dirs):
    """Planned bucket must fit the actually-loaded cropped features."""
    from bmhrl_tpu.data import features as F

    root, vdir, adir = feature_dirs
    cfg = Config(video_features_path=str(vdir),
                 audio_features_path=str(adir), **TINY)
    # segment crop: 14 frames cropped to [2, 9.5]/10 -> int math in
    # crop_a_segment; a missing-file request (zero fill, length 1); and an
    # out-of-range segment (end > duration: slice clamps, planner must too)
    reqs = [ClipRequest("s1", 2.0, 9.5, 10.0, str(vdir), str(adir)),
            ClipRequest("nope", 0.0, 5.0, 10.0, str(vdir), str(adir)),
            ClipRequest("s2", 8.0, 15.0, 10.0, str(vdir), str(adir))]
    plan = plan_batches(reqs, cfg, batch_size=4)
    for idxs, vb, ab in plan:
        for i in idxs:
            r = reqs[i]
            f = F.load_features_from_npy(str(vdir), str(adir), r.video_id,
                                         r.start, r.end, r.duration)
            assert f["rgb"].shape[0] <= vb
            assert f["audio"].shape[0] <= ab


def _build_server(cfg, train_tsv, mesh=None):
    import jax
    import jax.numpy as jnp

    from bmhrl_tpu.data.vocab import BOS, PAD, build_vocab_from_tsv
    from bmhrl_tpu.ops.masking import make_masks
    from bmhrl_tpu.train.loop import build_model

    vocab = build_vocab_from_tsv(str(train_tsv), 1, None, cfg.d_model_caps)
    model = build_model(cfg, len(vocab))
    feats0 = {"rgb": jnp.zeros((1, 8, cfg.d_vid)),
              "flow": jnp.zeros((1, 8, cfg.d_vid)),
              "audio": jnp.zeros((1, 8, cfg.d_aud))}
    trg0 = jnp.full((1, 4), PAD, jnp.int32).at[:, 0].set(BOS)
    masks0 = make_masks(feats0, trg0, "audio_video", PAD)
    k = jax.random.PRNGKey(0)
    params = jax.jit(model.init)(
        {"params": k, "dropout": k, "noise": k},
        (feats0["rgb"] + feats0["flow"], feats0["audio"]), trg0, masks0)
    return CaptionServer(cfg, model, params, vocab.itos, mesh=mesh), vocab


def test_caption_server_end_to_end(feature_dirs, train_tsv):
    root, vdir, adir = feature_dirs
    cfg = Config(video_features_path=str(vdir),
                 audio_features_path=str(adir), mesh_shape=(1, 1), **TINY)
    server, _ = _build_server(cfg, train_tsv)
    reqs = _reqs(vdir, adir)
    predictions, stats = server.caption(reqs, batch_size=2)
    assert stats.clips == len(reqs)
    assert stats.batches == 3  # shorts 2+1, longs 2
    # every request captioned, grouped under its video id
    segs = predictions["results"]
    assert sorted(segs) == ["l1", "l2", "s1", "s2", "s3"]
    for vid, lst in segs.items():
        assert lst[0]["timestamp"] == [0.0, 10.0]
        assert isinstance(lst[0]["sentence"], str)
    summ = stats.summary()
    assert summ["clips"] == 5 and summ["clips_per_sec"] > 0


def test_caption_server_mesh_parity(feature_dirs, train_tsv):
    """(8,1)-mesh serving produces the same sentences as single-device."""
    import jax

    from bmhrl_tpu.parallel import mesh as mesh_lib

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    root, vdir, adir = feature_dirs
    cfg = Config(video_features_path=str(vdir),
                 audio_features_path=str(adir), mesh_shape=(1, 1), **TINY)
    server1, _ = _build_server(cfg, train_tsv)
    reqs = _reqs(vdir, adir)
    pred1, _ = server1.caption(reqs, batch_size=4)

    cfg8 = Config(video_features_path=str(vdir),
                  audio_features_path=str(adir), mesh_shape=(8, 1), **TINY)
    mesh = mesh_lib.make_mesh((8, 1))
    server8, _ = _build_server(cfg8, train_tsv, mesh=mesh)
    pred8, stats8 = server8.caption(reqs, batch_size=4)
    assert stats8.clips == len(reqs)
    for vid in pred1["results"]:
        s1 = [x["sentence"] for x in pred1["results"][vid]]
        s8 = [x["sentence"] for x in pred8["results"][vid]]
        assert s1 == s8, vid


def test_caption_server_beam(feature_dirs, train_tsv):
    """Beam serving runs end-to-end; beam_width=1 server matches greedy."""
    root, vdir, adir = feature_dirs
    cfg = Config(video_features_path=str(vdir),
                 audio_features_path=str(adir), mesh_shape=(1, 1), **TINY)
    import jax

    from bmhrl_tpu.data.vocab import build_vocab_from_tsv

    server_g, vocab = _build_server(cfg, train_tsv)
    server_b = CaptionServer(cfg, server_g.model, server_g.params,
                             vocab.itos, beam_width=3, length_penalty=1.0)
    reqs = _reqs(vdir, adir)[:2]
    pred_g, _ = server_g.caption(reqs, batch_size=2)
    pred_b, stats = server_b.caption(reqs, batch_size=2)
    assert stats.clips == 2
    for vid in pred_b["results"]:
        for seg in pred_b["results"][vid]:
            assert isinstance(seg["sentence"], str)


def test_export_bundle_roundtrip(feature_dirs, train_tsv, tmp_path):
    """AOT bundle (jax.export blobs + params.npz) reproduces the live
    server's sentences exactly, including row-padded tail batches."""
    from bmhrl_tpu.serve import plan_batches
    from bmhrl_tpu.serve_export import (ExportedCaptionServer,
                                        export_decode_bundle)

    root, vdir, adir = feature_dirs
    cfg = Config(video_features_path=str(vdir),
                 audio_features_path=str(adir), mesh_shape=(1, 1), **TINY)
    server, vocab = _build_server(cfg, train_tsv)
    reqs = _reqs(vdir, adir)
    pred_live, _ = server.caption(reqs, batch_size=2)

    plan = plan_batches(reqs, cfg, 2)
    shapes = sorted({(2, vb, ab) for _, vb, ab in plan})
    bundle = tmp_path / "bundle"
    manifest = export_decode_bundle(cfg, server.model, server.params,
                                    vocab.itos, shapes, str(bundle))
    assert sorted(manifest["shapes"]) == [list(s) for s in shapes]
    assert (bundle / "bundle.json").exists()
    assert (bundle / "params.npz").exists()

    exp_server = ExportedCaptionServer(str(bundle), str(vdir), str(adir))
    pred_exp, stats = exp_server.caption(reqs, batch_size=2)
    assert stats.clips == len(reqs)
    for vid in pred_live["results"]:
        live = [x["sentence"] for x in pred_live["results"][vid]]
        exp = [x["sentence"] for x in pred_exp["results"][vid]]
        assert live == exp, vid
    # unknown shape is a clear error, not silent retracing
    with pytest.raises(ValueError):
        exp_server.caption(reqs, batch_size=3)


def test_read_proposals_json(tmp_path):
    data = {"v_x": {"duration": 10.0, "timestamps": [[0.0, 5.0], [5.0, 10.0]]}}
    p = tmp_path / "props.json"
    p.write_text(json.dumps(data))
    reqs = read_proposals_json(str(p))
    assert len(reqs) == 2
    assert reqs[0].video_id == "v_x" and reqs[1].start == 5.0
    # submission-style wrappers carry no durations: explicit ones required
    # (guessing from max proposal end would mis-crop features)
    sub = {"results": {"v_x": [{"sentence": "s", "timestamp": [0.0, 4.0]}]}}
    p2 = tmp_path / "sub.json"
    p2.write_text(json.dumps(sub))
    with pytest.raises(ValueError, match="durations"):
        read_proposals_json(str(p2))
    reqs2 = read_proposals_json(str(p2), durations={"v_x": 10.0})
    assert len(reqs2) == 1 and reqs2[0].end == 4.0
    assert reqs2[0].duration == 10.0


def test_prefetcher_propagates_loader_errors():
    """A loader crash must raise at the consumer, not silently truncate
    the batch stream (serving would emit null sentences and exit 0)."""
    from bmhrl_tpu.data.dataset import Prefetcher

    def bad_iter():
        yield {"x": 1}
        raise ValueError("corrupt npy")

    it = iter(Prefetcher(bad_iter(), depth=2, to_device=False))
    assert next(it) == {"x": 1}
    with pytest.raises(RuntimeError, match="source iterator failed"):
        next(it)


def test_load_model_params_from_trainstate_checkpoint(tmp_path):
    """Inference CLIs must load params out of a full-TrainState checkpoint
    without knowing its topology (regression: the abstract-tree restore
    raised on structure mismatch and the fallback repeated the same call)."""
    import collections

    from bmhrl_tpu.utils.checkpoint import load_model_params, save_checkpoint

    TS = collections.namedtuple("TS", ["cap_params", "opt_state", "step"])
    params = {"params": {"dense": {"kernel": np.ones((3, 2), np.float32)}}}
    state = TS(params, {"mu": np.zeros(4, np.float32)}, np.int32(7))
    save_checkpoint(str(tmp_path), state, name="state")
    got = load_model_params(str(tmp_path), params)
    np.testing.assert_array_equal(got["params"]["dense"]["kernel"],
                                  params["params"]["dense"]["kernel"])
    # shape mismatches fail loudly, not at apply time
    bad = {"params": {"dense": {"kernel": np.ones((5, 2), np.float32)}}}
    with pytest.raises(ValueError, match="shape mismatch"):
        load_model_params(str(tmp_path), bad)
    # bare-params checkpoints load too
    save_checkpoint(str(tmp_path / "bare"), params, name="state")
    got2 = load_model_params(str(tmp_path / "bare"), params)
    np.testing.assert_array_equal(got2["params"]["dense"]["kernel"],
                                  params["params"]["dense"]["kernel"])


def test_caption_server_sampling(feature_dirs, train_tsv):
    """Stochastic serving runs; sampling + beam together is rejected."""
    root, vdir, adir = feature_dirs
    cfg = Config(video_features_path=str(vdir),
                 audio_features_path=str(adir), mesh_shape=(1, 1), **TINY)
    server_g, vocab = _build_server(cfg, train_tsv)
    server_s = CaptionServer(cfg, server_g.model, server_g.params,
                             vocab.itos, sample=True, temperature=0.8,
                             top_p=0.9, sample_seed=3)
    reqs = _reqs(vdir, adir)[:2]
    pred, stats = server_s.caption(reqs, batch_size=2)
    assert stats.clips == 2
    with pytest.raises(ValueError, match="not both"):
        CaptionServer(cfg, server_g.model, server_g.params, vocab.itos,
                      sample=True, beam_width=2)


def test_read_meta_tsv(train_tsv):
    reqs = read_meta_tsv(str(train_tsv))
    assert len(reqs) == 2
    assert reqs[0].video_id == "v" and reqs[1].start == 5.0


def test_serve_cli(feature_dirs, train_tsv, tmp_path):
    from cli.serve_captions import main

    root, vdir, adir = feature_dirs
    props = {"s1": {"duration": 10.0, "timestamps": [[0.0, 10.0]]},
             "l1": {"duration": 10.0, "timestamps": [[0.0, 10.0]]}}
    ppath = tmp_path / "props.json"
    ppath.write_text(json.dumps(props))
    out = tmp_path / "sub.json"
    overrides = {k: v for k, v in TINY.items()
                 if k not in ("max_len", "to_log", "compute_dtype")}
    stats = main([
        "--proposals", str(ppath),
        "--video_features_path", str(vdir),
        "--audio_features_path", str(adir),
        "--train_meta_path", str(train_tsv),
        "--batch_size", "2", "--max_len", "10",
        "--config_json", json.dumps(overrides),
        "--out", str(out),
    ])
    assert stats.clips == 2
    sub = json.loads(out.read_text())
    assert sorted(sub["results"]) == ["l1", "s1"]
