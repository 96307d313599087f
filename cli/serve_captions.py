"""Batch-captioning serving CLI — caption every proposal in a JSON/TSV.

The production inference surface (the reference stops at the validation
loop, ref: epoch_loops/validation_loops.py:13-117). Length-aware bucketed
batching, KV-cached decode, optional data-parallel mesh; see bmhrl_tpu/serve.

    python -m cli.serve_captions \
        --proposals data/val_1_no_missings.json \
        --video_features_path DIR --audio_features_path DIR \
        --train_meta_path ./data/train.csv \
        --checkpoint_dir CKPT --out submission.json [--batch_size 256]

Prints one JSON stats line (clips/s, latency percentiles, shape count).
"""
from __future__ import annotations

import argparse
import json


def main(argv=None):
    p = argparse.ArgumentParser(description="Batch caption serving")
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--proposals", help="ANet-format proposals JSON")
    src.add_argument("--meta", help="reference meta TSV (captions ignored)")
    p.add_argument("--durations_json", default=None,
                   help="video durations ({vid: seconds} or ANet JSON); "
                        "required when --proposals is a submission-style "
                        "file (those carry no durations)")
    p.add_argument("--video_features_path", required=True)
    p.add_argument("--audio_features_path", required=True)
    p.add_argument("--train_meta_path", default="./data/train.csv",
                   help="vocab source (must match training)")
    p.add_argument("--glove_path", default=None)
    p.add_argument("--checkpoint_dir", default=None,
                   help="orbax TrainState dir; random init if omitted")
    p.add_argument("--torch_checkpoint", default=None,
                   help="reference bm_hrl_agent.pt to import instead")
    p.add_argument("--mode", default="BMHRL",
                   choices=["BMHRL", "DETR", "AHRL", "VHRL"])
    p.add_argument("--batch_size", type=int, default=256)
    p.add_argument("--beam_width", type=int, default=1,
                   help="beam-search width (1 = greedy); quality knob")
    p.add_argument("--length_penalty", type=float, default=0.0,
                   help="GNMT length-normalization exponent for beam rank")
    p.add_argument("--sample", action="store_true", default=False,
                   help="stochastic decode instead of greedy/beam")
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--top_k", type=int, default=0,
                   help="sampling truncation: keep the k best tokens")
    p.add_argument("--top_p", type=float, default=0.0,
                   help="nucleus sampling mass (0 = off)")
    p.add_argument("--sample_seed", type=int, default=0)
    p.add_argument("--max_len", type=int, default=30)
    p.add_argument("--mesh", type=int, default=1,
                   help="data-parallel mesh size (chips)")
    p.add_argument("--io_threads", type=int, default=8)
    p.add_argument("--compute_dtype", default="bfloat16")
    p.add_argument("--config_json", default=None,
                   help="JSON dict of extra Config overrides "
                        '(e.g. \'{"d_model": 64}\' for ablation models)')
    p.add_argument("--export_bundle", default=None,
                   help="instead of serving, AOT-export the decode for "
                        "exactly the shapes this request set plans to, "
                        "into this bundle dir (see bmhrl_tpu/serve_export)")
    p.add_argument("--from_bundle", default=None,
                   help="serve from an AOT bundle dir (no model build; "
                        "most model flags are ignored)")
    p.add_argument("--out", required=True, help="submission JSON path")
    args = p.parse_args(argv)

    from bmhrl_tpu.utils.jax_setup import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bmhrl_tpu.config import Config
    from bmhrl_tpu.data.vocab import BOS, PAD, build_vocab_from_tsv
    from bmhrl_tpu.ops.masking import make_masks
    from bmhrl_tpu.serve import (CaptionServer, read_durations_json,
                                 read_meta_tsv, read_proposals_json)
    from bmhrl_tpu.train.loop import build_model

    durations = (read_durations_json(args.durations_json)
                 if args.durations_json else None)
    reqs = (read_proposals_json(args.proposals, durations)
            if args.proposals else read_meta_tsv(args.meta))
    print(f"{len(reqs)} clip requests")

    if args.from_bundle:
        from bmhrl_tpu.serve_export import ExportedCaptionServer

        mesh = None
        if args.mesh > 1:
            from bmhrl_tpu.parallel import mesh as mesh_lib

            mesh = mesh_lib.make_mesh((args.mesh, 1))
        server = ExportedCaptionServer(
            args.from_bundle, args.video_features_path,
            args.audio_features_path, mesh=mesh)
        predictions, stats = server.caption(
            reqs, batch_size=args.batch_size, io_threads=args.io_threads)
        with open(args.out, "w") as f:
            json.dump(predictions, f)
        print(json.dumps(stats.summary()))
        return stats

    overrides = json.loads(args.config_json) if args.config_json else {}
    cfg = Config(
        mode=args.mode, train_meta_path=args.train_meta_path,
        glove_path=args.glove_path, max_len=args.max_len,
        compute_dtype=args.compute_dtype, to_log=False,
        video_features_path=args.video_features_path,
        audio_features_path=args.audio_features_path,
        mesh_shape=(args.mesh, 1), **overrides)
    vocab = build_vocab_from_tsv(cfg.train_meta_path, cfg.min_freq_caps,
                                 cfg.glove_path, cfg.d_model_caps)
    model = build_model(cfg, len(vocab))

    # init at a tiny shape just to materialize the param tree
    feats0 = {"rgb": jnp.zeros((1, 8, cfg.d_vid)),
              "flow": jnp.zeros((1, 8, cfg.d_vid)),
              "audio": jnp.zeros((1, 8, cfg.d_aud))}
    trg0 = jnp.full((1, 4), PAD, jnp.int32).at[:, 0].set(BOS)
    masks0 = make_masks(feats0, trg0, "audio_video", PAD)
    k = jax.random.PRNGKey(0)
    if args.mode == "DETR":
        params = jax.jit(model.init)(
            {"params": k, "dropout": k, "noise": k}, feats0["rgb"],
            feats0["audio"], trg0, masks0)
    else:
        params = jax.jit(model.init)(
            {"params": k, "dropout": k, "noise": k},
            (feats0["rgb"] + feats0["flow"], feats0["audio"]), trg0, masks0)
    if args.torch_checkpoint:
        from bmhrl_tpu.utils import checkpoint as ckpt

        importer = {"BMHRL": ckpt.import_torch_bmhrl}.get(args.mode)
        if importer is None:
            raise SystemExit(f"--torch_checkpoint unsupported for {args.mode}")
        params = {"params": importer(args.torch_checkpoint)}
    elif args.checkpoint_dir:
        from bmhrl_tpu.utils.checkpoint import load_model_params

        abstract = jax.tree.map(np.asarray, params)
        params = load_model_params(args.checkpoint_dir, abstract)
        print(f"restored {args.checkpoint_dir}")

    if args.export_bundle:
        from bmhrl_tpu.serve import plan_batches
        from bmhrl_tpu.serve_export import export_decode_bundle

        plan = plan_batches(reqs, cfg, args.batch_size)
        shapes = sorted({(args.batch_size, vb, ab) for _, vb, ab in plan})
        manifest = export_decode_bundle(
            cfg, model, params, vocab.itos, shapes, args.export_bundle,
            beam_width=args.beam_width, length_penalty=args.length_penalty)
        print(json.dumps({"exported": manifest["shapes"],
                          "bundle": args.export_bundle}))
        return manifest

    mesh = None
    if args.mesh > 1:
        from bmhrl_tpu.parallel import mesh as mesh_lib

        mesh = mesh_lib.make_mesh(cfg.mesh_shape)
    server = CaptionServer(cfg, model, params, vocab.itos, mesh=mesh,
                           beam_width=args.beam_width,
                           length_penalty=args.length_penalty,
                           sample=args.sample, temperature=args.temperature,
                           top_k=args.top_k, top_p=args.top_p,
                           sample_seed=args.sample_seed)
    predictions, stats = server.caption(reqs, batch_size=args.batch_size,
                                        io_threads=args.io_threads)
    with open(args.out, "w") as f:
        json.dump(predictions, f)
    print(json.dumps(stats.summary()))
    return stats


if __name__ == "__main__":
    main()
