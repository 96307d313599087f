"""Unit tests for the acquisition (network) half of video_loader parity
(bmhrl_tpu/data/acquisition.py vs reference captioning_datasets/
video_loader.py:15-112, :166-199).

All network/media backends are faked — the orchestration (skip-existing,
filename mangle, batch dispatch + consumed-file cleanup, failure
tolerance) is what these tests pin down.
"""
import json
import os

import pytest

from bmhrl_tpu.data.acquisition import (
    ClipSpec, acquire, default_clipper, default_downloader,
    feature_done_path, msrvtt_meta, vatex_meta)


def _fake_backends(tmp_path, fail_ids=()):
    calls = {"downloads": [], "clips": [], "dispatches": []}

    def downloader(video_id, dst):
        if video_id in fail_ids:
            raise ValueError("unavailable")
        calls["downloads"].append(video_id)
        with open(dst, "w") as f:
            f.write("raw:" + video_id)

    def clipper(src, dst, start, end, audio):
        calls["clips"].append((os.path.basename(src), start, end, audio))
        with open(src) as f:
            raw = f.read()
        with open(dst, "w") as f:
            f.write(f"{raw}[{start}:{end}]")

    class _Proc:
        def __init__(self):
            self.waited = False

        def wait(self):
            self.waited = True

    def dispatch(cmd):
        with open(tmp_path / "data.txt") as f:
            listed = [ln.strip() for ln in f if ln.strip()]
        p = _Proc()
        calls["dispatches"].append((cmd, listed, p))
        return p

    return downloader, clipper, dispatch, calls


def test_vatex_meta_videoid_mangle(tmp_path):
    # ref video_loader.py:25-31 — range packed into videoID's tail
    meta = [{"videoID": "abcDEF12345_000017_000042",
             "enCap": ["a cat", "a dog"]}]
    p = tmp_path / "vatex.json"
    p.write_text(json.dumps(meta))
    (spec,) = vatex_meta(str(p))
    assert spec.video_id == "abcDEF12345"
    assert (spec.start, spec.end) == (17, 42)
    assert spec.prefix == "abcDEF12345_000017_000042"
    assert spec.captions == ["a cat", "a dog"]


def test_msrvtt_meta_url_carve_and_split(tmp_path):
    # ref :166-199 — video_id = url[32:], captions joined, val split by id
    data = {
        "videos": [
            {"url": "https://www.youtube.com/watch?v=vidAAAAAAAA",
             "start time": "3", "end time": "9", "video_id": "video1"},
            {"url": "https://www.youtube.com/watch?v=vidBBBBBBBB",
             "start time": "0", "end time": "5", "video_id": "video2"},
        ],
        "sentences": [
            {"video_id": "video1", "caption": "hello"},
            {"video_id": "video1", "caption": "world"},
            {"video_id": "video2", "caption": "only"},
        ],
    }
    p = tmp_path / "msrvtt.json"
    p.write_text(json.dumps(data))
    allspecs = msrvtt_meta(str(p))
    assert [s.video_id for s in allspecs] == ["vidAAAAAAAA", "vidBBBBBBBB"]
    assert allspecs[0].captions == ["hello", "world"]
    assert (allspecs[0].start, allspecs[0].end) == (3, 9)
    val = msrvtt_meta(str(p), val_ids=["video2"], split="val")
    assert [s.video_id for s in val] == ["vidBBBBBBBB"]
    train = msrvtt_meta(str(p), val_ids=["video2"], split="train")
    assert [s.video_id for s in train] == ["vidAAAAAAAA"]


def test_acquire_skips_existing_features(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    specs = [ClipSpec("vidA", 0, 5), ClipSpec("vidB", 2, 7)]
    # mark vidA done: the i3d skip check is the _flow.npy file (ref :50-57)
    done = feature_done_path(specs[0], "vatex_i3d", str(tmp_path / "feats"))
    os.makedirs(os.path.dirname(done))
    open(done, "w").close()

    downloader, clipper, dispatch, calls = _fake_backends(tmp_path)
    stats = acquire(specs, "vatex_i3d", str(tmp_path / "vids"),
                    "./extract.sh", str(tmp_path / "feats"),
                    downloader, clipper, dispatch, batch_size=50)
    assert stats == {"downloaded": 1, "skipped": 1, "failed": 0}
    assert calls["downloads"] == ["vidB"]
    # video leg: audio=False, mp4 names, tmp_ removed after clipping
    assert calls["clips"] == [("tmp_vidB_000002_000007.mp4", 2, 7, False)]
    assert not os.path.exists(tmp_path / "vids" / "tmp_vidB_000002_000007.mp4")
    assert os.path.exists(tmp_path / "vids" / "vidB_000002_000007.mp4")


def test_acquire_batches_dispatch_and_cleanup(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    specs = [ClipSpec(f"vid{i}", 0, 3) for i in range(5)]
    downloader, clipper, dispatch, calls = _fake_backends(tmp_path)
    stats = acquire(specs, "vatex_vggish", str(tmp_path / "vids"),
                    "./extract_vggish.sh", str(tmp_path / "feats"),
                    downloader, clipper, dispatch, batch_size=2)
    assert stats["downloaded"] == 5
    # 2 + 2 + final flush of 1
    assert [len(listed) for _c, listed, _p in calls["dispatches"]] == [2, 2, 1]
    assert all(c == "./extract_vggish.sh"
               for c, _l, _p in calls["dispatches"])
    # audio leg: .wav names
    first = calls["dispatches"][0][1][0]
    assert first.endswith("vid0_000000_000003.wav")
    # each earlier extractor was waited on and its consumed media deleted
    # before the next dispatch (ref :95-99)
    assert calls["dispatches"][0][2].waited
    assert calls["dispatches"][1][2].waited
    for _c, listed, _p in calls["dispatches"][:2]:
        for f in listed:
            assert not os.path.exists(f)
    # the final batch's media survives until its extractor consumes it
    assert os.path.exists(calls["dispatches"][2][1][0])


def test_acquire_tolerates_per_clip_failures(tmp_path, monkeypatch):
    # ref :88-91 catches every exception and moves on
    monkeypatch.chdir(tmp_path)
    specs = [ClipSpec("ok1", 0, 2), ClipSpec("bad", 0, 2),
             ClipSpec("ok2", 0, 2)]
    downloader, clipper, dispatch, calls = _fake_backends(
        tmp_path, fail_ids={"bad"})
    msgs = []
    stats = acquire(specs, "msrvtt_i3d", str(tmp_path / "vids"),
                    "./x.sh", str(tmp_path / "feats"),
                    downloader, clipper, dispatch, batch_size=50,
                    log=msgs.append)
    assert stats == {"downloaded": 2, "skipped": 0, "failed": 1}
    assert calls["downloads"] == ["ok1", "ok2"]
    assert len(msgs) == 1 and "bad_000000_000002" in msgs[0]


def test_default_backends_raise_with_recipe_offline():
    # this image has no pytube/yt-dlp/moviepy/ffmpeg — the defaults must
    # fail loudly with the pipeline recipe, not silently
    with pytest.raises(RuntimeError, match="pytube / yt-dlp"):
        default_downloader("vid", "/tmp/nope.mp4")
    with pytest.raises(RuntimeError, match="moviepy / ffmpeg"):
        default_clipper("/tmp/a.mp4", "/tmp/b.mp4", 0, 1, False)


def test_video_tools_entry_point_routes(tmp_path, monkeypatch):
    from bmhrl_tpu.data import video_tools
    monkeypatch.chdir(tmp_path)
    downloader, clipper, dispatch, _calls = _fake_backends(tmp_path)
    stats = video_tools.download_and_extract(
        [ClipSpec("v", 0, 1)], "vatex_i3d", str(tmp_path / "vids"),
        "./x.sh", str(tmp_path / "feats"),
        downloader=downloader, clipper=clipper, dispatch=dispatch)
    assert stats["downloaded"] == 1
