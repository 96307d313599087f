"""Dense video captioning in one command: propose segments, caption them.

The reference's end product (dense captioning on ActivityNet) requires
chaining its proposal module and captioner by hand; this orchestrates the
full path: full-clip features -> MultimodalProposalGenerator -> top-k/NMS
postprocess -> batch captioning (serve.CaptionServer: bucketed scheduling,
KV-cached decode, optional beam) -> one submission JSON whose segments
carry both the caption and the proposal confidence.

    python -m cli.dense_caption \
        --durations_json videos.json \
        --video_features_path .../i3d --audio_features_path .../vggish \
        --proposal_checkpoint ./log/props \
        --train_meta_path ./data/train.csv --checkpoint_dir CKPT \
        --out dense.json [--max_props 10 --nms_tiou_thresh 0.5 --beam_width 4]

``--proposal_checkpoint`` is a cli/train_proposals.py log dir (orbax
"props" + anchors.npy). Videos to process come from --durations_json
({vid: seconds} or ANet-format).
"""
from __future__ import annotations

import argparse
import json
import os
import tempfile
import time


def main(argv=None):
    p = argparse.ArgumentParser(description="Propose + caption in one pass")
    p.add_argument("--durations_json", required=True,
                   help="videos to process: {vid: seconds} or ANet JSON")
    p.add_argument("--video_features_path", required=True)
    p.add_argument("--audio_features_path", required=True)
    p.add_argument("--proposal_checkpoint", required=True,
                   help="cli/train_proposals.py log dir (props + anchors.npy)")
    p.add_argument("--train_meta_path", default="./data/train.csv")
    p.add_argument("--glove_path", default=None)
    p.add_argument("--checkpoint_dir", default=None,
                   help="captioner orbax dir (TrainState or bare params)")
    p.add_argument("--torch_checkpoint", default=None)
    p.add_argument("--mode", default="BMHRL",
                   choices=["BMHRL", "DETR", "AHRL", "VHRL"])
    # proposal-model dims (must match the checkpoint)
    p.add_argument("--prop_d_model", type=int, default=1024)
    p.add_argument("--prop_d_model_aud", type=int, default=128)
    p.add_argument("--prop_att_heads", type=int, default=4)
    p.add_argument("--prop_att_layers", type=int, default=2)
    p.add_argument("--prop_d_ff_v", type=int, default=1024)
    p.add_argument("--prop_d_ff_a", type=int, default=512)
    p.add_argument("--d_vid", type=int, default=1024)
    p.add_argument("--d_aud", type=int, default=128)
    p.add_argument("--pad_video_to", type=int, default=300)
    p.add_argument("--pad_audio_to", type=int, default=800)
    p.add_argument("--prop_B", type=int, default=8)
    p.add_argument("--max_props", type=int, default=10,
                   help="proposals kept per video (top confidence)")
    p.add_argument("--nms_tiou_thresh", type=float, default=0.5)
    # captioning knobs (mirror cli/serve_captions.py)
    p.add_argument("--batch_size", type=int, default=256)
    p.add_argument("--beam_width", type=int, default=1)
    p.add_argument("--length_penalty", type=float, default=0.0)
    p.add_argument("--max_len", type=int, default=30)
    p.add_argument("--compute_dtype", default="bfloat16")
    p.add_argument("--config_json", default=None,
                   help="captioner Config overrides (ablation dims)")
    p.add_argument("--out", required=True)
    args = p.parse_args(argv)

    from bmhrl_tpu.utils.jax_setup import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bmhrl_tpu.config import Config
    from bmhrl_tpu.data.proposal import ProposalDataset
    from bmhrl_tpu.data.vocab import BOS, PAD, build_vocab_from_tsv
    from bmhrl_tpu.models.proposal import MultimodalProposalGenerator
    from bmhrl_tpu.ops.masking import make_masks
    from bmhrl_tpu.serve import (CaptionServer, ClipRequest,
                                 read_durations_json)
    from bmhrl_tpu.train.loop import build_model
    from bmhrl_tpu.train.steps_proposal import ProposalStepFactory
    from bmhrl_tpu.utils.checkpoint import load_checkpoint
    from cli.train_proposals import postprocess

    durations = read_durations_json(args.durations_json)
    print(f"{len(durations)} videos")

    # ---- stage 1: propose ------------------------------------------------
    anchors_path = os.path.join(args.proposal_checkpoint, "anchors.npy")
    anchors = np.load(anchors_path)
    # a ProposalDataset over full clips: dummy [0, dur] rows feed the
    # feature loader / batching; targets are irrelevant at inference
    with tempfile.NamedTemporaryFile("w", suffix=".csv", delete=False) as f:
        f.write("video_id\tcaption\tstart\tend\tduration\tphase\tidx\n")
        for i, (vid, dur) in enumerate(durations.items()):
            f.write(f"{vid}\t-\t0.0\t{dur}\t{dur}\tinfer\t{i}\n")
        meta_tmp = f.name
    ds = ProposalDataset(meta_tmp, args.video_features_path,
                         args.audio_features_path,
                         pad_video_to=args.pad_video_to,
                         pad_audio_to=args.pad_audio_to,
                         d_vid=args.d_vid, d_aud=args.d_aud)
    ds.anchors = anchors
    dtype = jnp.bfloat16 if args.compute_dtype == "bfloat16" else jnp.float32
    prop_model = MultimodalProposalGenerator(
        d_vid=args.d_vid, d_aud=args.d_aud, d_model=args.prop_d_model,
        d_model_aud=args.prop_d_model_aud, d_ff_v=args.prop_d_ff_v,
        d_ff_a=args.prop_d_ff_a, att_heads=args.prop_att_heads,
        att_layers=args.prop_att_layers, num_anchors=len(anchors),
        dtype=dtype)
    sf = ProposalStepFactory(prop_model)
    first = ds.make_batch(list(range(min(args.prop_B, len(ds)))))
    state = sf.init_state(jax.random.PRNGKey(0), first)
    abstract = jax.tree.map(np.asarray, state)
    state = load_checkpoint(args.proposal_checkpoint, abstract, name="props")
    print(f"proposal model restored from {args.proposal_checkpoint}")

    def device_batch(b):
        return {k: jax.tree.map(jnp.asarray, b[k])
                for k in ("feature_stacks", "masks", "targets")}

    proposals = {}
    t_prop0 = time.time()
    prop_compile_s = 0.0
    for i, batch in enumerate(ds.batches(0, args.prop_B, shuffle=False)):
        preds = np.asarray(sf.predict(state, device_batch(batch)))
        if i == 0:  # first batch carries the predict compile
            prop_compile_s = time.time() - t_prop0
        per_vid = postprocess(preds, batch["durations"], args.max_props,
                              args.nms_tiou_thresh)
        for vid, rows in zip(batch["video_ids"], per_vid):
            proposals[vid] = rows
    propose_wall_s = time.time() - t_prop0
    n_props = sum(len(v) for v in proposals.values())
    print(f"{n_props} proposals across {len(proposals)} videos "
          f"in {propose_wall_s:.2f}s")

    # ---- stage 2: caption ------------------------------------------------
    overrides = json.loads(args.config_json) if args.config_json else {}
    cfg = Config(mode=args.mode, train_meta_path=args.train_meta_path,
                 glove_path=args.glove_path, max_len=args.max_len,
                 compute_dtype=args.compute_dtype, to_log=False,
                 video_features_path=args.video_features_path,
                 audio_features_path=args.audio_features_path,
                 mesh_shape=(1, 1), **overrides)
    vocab = build_vocab_from_tsv(cfg.train_meta_path, cfg.min_freq_caps,
                                 cfg.glove_path, cfg.d_model_caps)
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
    if args.torch_checkpoint:
        from bmhrl_tpu.utils import checkpoint as ckpt

        params = {"params": ckpt.import_torch_bmhrl(args.torch_checkpoint)}
    elif args.checkpoint_dir:
        from bmhrl_tpu.utils.checkpoint import load_model_params

        params = load_model_params(args.checkpoint_dir,
                                   jax.tree.map(np.asarray, params))

    reqs, confs = [], []
    for vid, rows in proposals.items():
        for s, e, conf in rows:
            reqs.append(ClipRequest(vid, float(s), float(e),
                                    durations[vid]))
            confs.append(float(conf))
    server = CaptionServer(cfg, model, params, vocab.itos,
                           beam_width=args.beam_width,
                           length_penalty=args.length_penalty)
    predictions, stats = server.caption(reqs, batch_size=args.batch_size)
    # attach proposal confidences (requests map 1:1 onto emitted segments
    # in order, per video)
    seg_iters = {}
    for r, conf in zip(reqs, confs):
        segs = predictions["results"][r.video_id]
        idx = seg_iters.get(r.video_id, 0)
        segs[idx]["proposal_score"] = conf
        seg_iters[r.video_id] = idx + 1
    with open(args.out, "w") as f:
        json.dump(predictions, f)
    os.unlink(meta_tmp)
    caption = stats.summary()
    e2e_s = propose_wall_s + caption["wall_s"]
    summary = {
        "videos": len(durations), "proposals": n_props,
        "propose_wall_s": round(propose_wall_s, 3),
        "propose_compile_s": round(prop_compile_s, 3),
        "props_per_sec": round(n_props / propose_wall_s, 2)
        if propose_wall_s else 0.0,
        "caption": caption,
        "e2e_wall_s": round(e2e_s, 3),
        "e2e_clips_per_sec": round(n_props / e2e_s, 2) if e2e_s else 0.0,
    }
    print(json.dumps(summary))
    return predictions


if __name__ == "__main__":
    main()
