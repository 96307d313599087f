"""Dense-captioning end-to-end ON-CHIP drive at full dims (VERDICT r3
item 7): synthetic ActivityNet-shaped features -> 1-epoch proposal
training at production dims -> one `cli.dense_caption` invocation, whose
own stage timing reports proposals/sec and end-to-end clips/sec.

Everything runs at the production operating point: d_vid=1024, d_aud=128,
pad_video_to=300 / pad_audio_to=800, proposal model d_model=1024 (the
reference's MultimodalProposalGenerator dims), full-size BMHRL captioner
(58M params) with a ~10k-word vocabulary, serve batch 256, max_len=30.
Features are synthetic (no ActivityNet archives here) — throughput, not
METEOR, is the deliverable.

Run on the real chip:  python tools/dense_caption_onchip.py [n_videos]
"""
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_VIDEOS = int(sys.argv[1]) if len(sys.argv) > 1 else 64
VOCAB_WORDS = 10000


def make_data(root):
    rng = np.random.RandomState(0)
    vdir = os.path.join(root, "i3d")
    adir = os.path.join(root, "vggish")
    os.makedirs(vdir)
    os.makedirs(adir)
    durations = {}
    rows = []
    idx = 0
    for i in range(N_VIDEOS):
        vid = f"v_{i:05d}"
        dur = float(rng.uniform(30.0, 120.0))
        durations[vid] = dur
        tv = max(8, int(dur * 2.0))          # ~2 fps i3d-ish
        ta = max(8, int(dur * 5.2))          # ~0.96 s vggish hops
        rgb = rng.rand(tv, 1024).astype(np.float32) * 0.1
        flow = rng.rand(tv, 1024).astype(np.float32) * 0.1
        aud = rng.rand(ta, 128).astype(np.float32) * 0.1
        # two event bumps per video so the proposal model has signal
        for _ in range(2):
            s = float(rng.uniform(0.05, 0.6)) * dur
            e = s + float(rng.uniform(0.1, 0.3)) * dur
            lo, hi = int(tv * s / dur), max(int(tv * e / dur),
                                            int(tv * s / dur) + 1)
            rgb[lo:hi] += 1.0
            flow[lo:hi] += 1.0
            lo, hi = int(ta * s / dur), max(int(ta * e / dur),
                                            int(ta * s / dur) + 1)
            aud[lo:hi] += 1.0
            cap = " ".join(f"w{rng.randint(VOCAB_WORDS)}"
                           for _ in range(15))
            rows.append(f"{vid}\t{cap}\t{s:.2f}\t{e:.2f}\t{dur:.2f}"
                        f"\ttrain\t{idx}")
            idx += 1
        np.save(os.path.join(vdir, f"{vid}_rgb.npy"), rgb)
        np.save(os.path.join(vdir, f"{vid}_flow.npy"), flow)
        np.save(os.path.join(adir, f"{vid}_vggish.npy"), aud)
    # extra caption-only rows so the vocab reaches ~10k distinct words
    while idx < 700:
        cap = " ".join(f"w{rng.randint(VOCAB_WORDS)}" for _ in range(15))
        rows.append(f"v_00000\t{cap}\t0.0\t1.0\t30.0\ttrain\t{idx}")
        idx += 1
    meta = os.path.join(root, "train.csv")
    with open(meta, "w") as f:
        f.write("video_id\tcaption\tstart\tend\tduration\tphase\tidx\n")
        f.write("\n".join(rows) + "\n")
    durs_path = os.path.join(root, "durs.json")
    with open(durs_path, "w") as f:
        json.dump(durations, f)
    return meta, vdir, adir, durs_path


def main():
    from cli.dense_caption import main as dense_main
    from cli.train_proposals import main as props_main

    root = tempfile.mkdtemp(prefix="dense_onchip_")
    meta, vdir, adir, durs_path = make_data(root)
    log_dir = os.path.join(root, "plog")
    print(f"data: {N_VIDEOS} videos under {root}", flush=True)

    t0 = time.time()
    props_main([
        "--train_meta_path", meta, "--val_meta_path", meta,
        "--video_features_path", vdir, "--audio_features_path", adir,
        "--log_dir", log_dir, "--B", "8", "--epochs", "1",
        "--lr", "1e-4",
    ])
    print(f"proposal training (1 epoch, full dims): "
          f"{time.time() - t0:.1f}s", flush=True)

    out = os.path.join(root, "dense.json")
    t0 = time.time()
    dense_main([
        "--durations_json", durs_path,
        "--video_features_path", vdir, "--audio_features_path", adir,
        "--proposal_checkpoint", log_dir,
        "--train_meta_path", meta,
        "--max_props", "10", "--batch_size", "256",
        "--out", out,
    ])
    print(f"dense_caption total wall (incl. model init + compiles): "
          f"{time.time() - t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
