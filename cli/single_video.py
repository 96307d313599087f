"""Single-video captioning demo — the reference's "hello world"
(ref: sample/single_vid_bmhrl.py:41-239: build agent + vocab, load features
from three .npy files, greedy-decode one caption).

    python -m cli.single_video \
        --rgb women_long_jump_rgb.npy --flow women_long_jump_flow.npy \
        --audio women_long_jump_vggish.npy \
        --train_meta_path ./data/train.csv [--checkpoint_dir <orbax dir>]
"""
from __future__ import annotations

import argparse

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description="Caption one clip (bmhrl_tpu)")
    p.add_argument("--rgb", required=True)
    p.add_argument("--flow", required=True)
    p.add_argument("--audio", required=True)
    p.add_argument("--train_meta_path", default="./data/train.csv")
    p.add_argument("--checkpoint_dir", default=None,
                   help="orbax TrainState dir; random init if omitted")
    p.add_argument("--torch_checkpoint", default=None,
                   help="reference bm_hrl_agent.pt to import instead")
    p.add_argument("--glove_path", default=None)
    p.add_argument("--max_len", type=int, default=30)
    p.add_argument("--beam_width", type=int, default=1,
                   help="beam-search width (1 = greedy)")
    p.add_argument("--length_penalty", type=float, default=0.0)
    p.add_argument("--start", type=float, default=0.0)
    p.add_argument("--end", type=float, default=0.0, help="0 = full clip")
    p.add_argument("--duration", type=float, default=0.0)
    p.add_argument("--compute_dtype", default="bfloat16")
    args = p.parse_args(argv)

    from bmhrl_tpu.utils.jax_setup import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp

    from bmhrl_tpu.config import Config
    from bmhrl_tpu.data.features import crop_a_segment
    from bmhrl_tpu.data.vocab import BOS, EOS, PAD, build_vocab_from_tsv
    from bmhrl_tpu.ops.masking import make_masks
    from bmhrl_tpu.train.decode import decode, detokenize
    from bmhrl_tpu.train.loop import build_model

    cfg = Config(train_meta_path=args.train_meta_path,
                 glove_path=args.glove_path, max_len=args.max_len,
                 compute_dtype=args.compute_dtype, to_log=False,
                 mesh_shape=(1, 1))
    vocab = build_vocab_from_tsv(cfg.train_meta_path, cfg.min_freq_caps,
                                 cfg.glove_path, cfg.d_model_caps)
    model = build_model(cfg, len(vocab))

    rgb = np.load(args.rgb).astype(np.float32)
    flow = np.load(args.flow).astype(np.float32)
    audio = np.load(args.audio).astype(np.float32)
    if args.end > 0:
        dur = args.duration or args.end
        rgb = crop_a_segment(rgb, args.start, args.end, dur)
        flow = crop_a_segment(flow, args.start, args.end, dur)
        audio = crop_a_segment(audio, args.start, args.end, dur)
    feats = {
        "rgb": jnp.asarray(rgb)[None],
        "flow": jnp.asarray(flow)[None],
        "audio": jnp.asarray(audio)[None],
    }

    k = jax.random.PRNGKey(0)
    trg0 = jnp.full((1, 4), PAD, jnp.int32).at[:, 0].set(BOS)
    masks0 = make_masks(feats, trg0, "audio_video", PAD)
    params = jax.jit(model.init)(
        {"params": k, "dropout": k, "noise": k},
        (feats["rgb"] + feats["flow"], feats["audio"]), trg0, masks0)
    if args.torch_checkpoint:
        from bmhrl_tpu.utils.checkpoint import import_torch_bmhrl

        params = {"params": import_torch_bmhrl(args.torch_checkpoint)}
        print(f"imported torch checkpoint {args.torch_checkpoint}")
    elif args.checkpoint_dir:
        from bmhrl_tpu.utils.checkpoint import load_model_params

        abstract = jax.tree.map(np.asarray, params)
        # checkpoints store the full TrainState; cap_params is the model
        params = load_model_params(args.checkpoint_dir, abstract)
        print(f"restored {args.checkpoint_dir}")

    masks_src = make_masks(feats, None, "audio_video", PAD)
    if args.beam_width > 1:
        from bmhrl_tpu.train.decode import beam_decode

        tokens, _ = beam_decode(model, params, feats, masks_src,
                                cfg.max_len, BOS, EOS, PAD,
                                beam_width=args.beam_width,
                                length_penalty=args.length_penalty)
    else:
        tokens, _ = decode(model, params, feats, masks_src, cfg.max_len,
                           BOS, EOS, PAD, greedy=True)
    sentence = detokenize(np.asarray(tokens), vocab.itos)[0]
    print(sentence)
    return sentence


if __name__ == "__main__":
    main()
