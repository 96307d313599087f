"""Experiment configuration.

Field set and defaults mirror the reference CLI/Config
(ref: runTraining.py:10-188, utilities/config_constructor.py:11-129), expressed
as a typed dataclass instead of an argparse attribute bag. Derived values
(batch sizes, log paths) are computed in ``__post_init__``.

TPU-specific additions live at the bottom (mesh shape, bucketing, precision).
"""
from __future__ import annotations

import dataclasses
import os
from time import localtime, strftime
from typing import Optional, Sequence, Tuple


@dataclasses.dataclass
class Config:
    # procedure / mode -------------------------------------------------------
    procedure: str = "train_rl_cap"
    mode: str = "BMHRL"  # DETR | BMHRL | BM | AHRL | VHRL | verbose | eval
    scorer: str = "CIDER"  # CIDER | METEOR | BLEU
    with_reinforce: bool = False
    pre_goal_attention: bool = False

    # dataset ----------------------------------------------------------------
    train_meta_path: str = "./data/train.csv"
    val_1_meta_path: str = "./data/val_1.csv"
    val_2_meta_path: str = "./data/val_2.csv"
    vatex_meta_path: str = "./data/vatex_val.csv"
    msrvtt_meta_path: str = "./data/msrvtt_val.csv"
    val_prop_meta_path: Optional[str] = None
    train_with_all: bool = False  # concat VATEX training captions
    vatex_training_json: str = "./data/vatex_training.json"
    modality: str = "audio_video"  # audio | video | audio_video
    video_feature_name: str = "i3d"
    audio_feature_name: str = "vggish"
    video_features_path: str = "./data/i3d_25fps_stack64step64_2stream_npy/"
    audio_features_path: str = "./data/vggish_npy/"
    d_vid: int = 1024
    d_aud: int = 128
    word_emb_caps: str = "glove.840B.300d"
    glove_path: Optional[str] = None  # explicit path to GloVe .txt; None -> random init
    unfreeze_word_emb: bool = False
    start_token: str = "<s>"
    end_token: str = "</s>"
    pad_token: str = "<blank>"
    max_len: int = 30
    min_freq_caps: int = 1

    # rl agent ---------------------------------------------------------------
    rl_high_level_enc_d: int = 256
    rl_low_level_enc_d: int = 512
    rl_worker_lstm: int = 1024
    rl_manager_lstm: int = 256
    rl_goal_d: int = 64
    rl_attn_d: int = 512
    rl_critic_path: str = "./data/models/critic.cp"
    rl_critic_score_threshhold: float = 0.25
    rl_gamma_worker: float = 0.0
    rl_gamma_manager: float = 0.0
    rl_pretrained_model_dir: Optional[str] = None
    rl_train_worker: bool = True
    rl_warmstart_epochs: int = 0
    rl_projection_d: int = 512
    rl_att_heads: int = 4
    rl_att_layers: int = 2
    rl_reward_weight_worker: float = 1.0
    rl_reward_weight_manager: float = 2.0
    rl_ff_c: int = 2048
    rl_ff_v: int = 1024
    rl_ff_a: int = 512
    rl_stabilize: bool = True
    rl_value_function_lr: float = 1e-4
    rl_cap_warmstart_lr: float = 1e-4
    rl_cap_lr: float = 1e-4

    # model ------------------------------------------------------------------
    d_model: int = 1024
    d_model_caps: int = 300
    d_model_video: Optional[int] = None
    d_model_audio: Optional[int] = None
    use_linear_embedder: bool = False
    dout_p: float = 0.1

    # training ---------------------------------------------------------------
    B: int = 16  # per-device batch
    inf_B_coeff: int = 2
    epoch_num: int = 50
    one_by_one_starts_at: int = 0
    early_stop_after: int = 30
    smoothing: float = 0.7
    grad_clip: Optional[float] = None
    optimizer: str = "adam"
    betas: Tuple[float, float] = (0.9, 0.999)
    eps: float = 1e-4
    lr: float = 1e-5
    weight_decay: float = 0.0
    scheduler: str = "constant"  # constant | reduce_on_plateau
    seed: int = 0

    # feature padding --------------------------------------------------------
    pad_audio_feats_up_to: int = 800
    pad_video_feats_up_to: int = 300

    # evaluation -------------------------------------------------------------
    reference_paths: Sequence[str] = (
        "./data/val_1_no_missings.json",
        "./data/val_2_no_missings.json",
        "./data/vatex_no_missings.json",
        "./data/msrvtt_no_missings.json",
    )
    tIoUs: Sequence[float] = (0.3, 0.5, 0.7, 0.9)
    max_prop_per_vid: int = 100
    prop_pred_path: Optional[str] = None
    # METEOR flavor for eval: "nltk" (RL-reward parity) or "meteor15"
    # (Java meteor-1.5.jar parity; supply the jar's paraphrase-en.gz via
    # meteor_paraphrase_path to enable its paraphrase stage)
    meteor_preset: str = "nltk"
    meteor_paraphrase_path: Optional[str] = None
    avail_mp4_path: str = "./data/available_mp4.txt"

    # logging ----------------------------------------------------------------
    to_log: bool = True
    log_dir: str = "./log/"

    # ----- TPU-native additions --------------------------------------------
    # device mesh: (data, model) axis sizes; 0 -> fill with all devices on data
    mesh_shape: Tuple[int, int] = (0, 1)
    # matmul/activation dtype; params stay f32
    compute_dtype: str = "bfloat16"
    # sequence buckets (static-shape compiles); captions always max_len+2
    video_buckets: Tuple[int, ...] = (32, 64, 128, 224, 300)
    audio_buckets: Tuple[int, ...] = (64, 128, 256, 512, 800)
    caption_buckets: Tuple[int, ...] = (32, 64)
    prefetch_batches: int = 2
    # eval/serving beam search (1 = greedy, the reference's only decoder);
    # length_penalty is the GNMT normalization exponent for beam ranking
    beam_width: int = 1
    length_penalty: float = 0.0
    # preemption-safe continuation: restore the newest E_{n} checkpoint
    # under log_dir and continue at epoch n+1 (data order is epoch-seeded)
    auto_resume: bool = False
    use_pallas_attention: bool = True
    num_data_workers: int = 8
    eval_max_batches: Optional[int] = None  # cap 1-by-1 eval batches (smoke runs)
    debug_nans: bool = False  # jax_debug_nans (dev-mode anomaly detection)
    profile_dir: Optional[str] = None  # jax.profiler trace output dir
    # one-batch-deep host-score pipeline: host reward scoring of batch t runs
    # while the device executes the already-dispatched step of batch t+1.
    # In RL epochs rollouts are then one optimizer update stale (depth-1
    # pipeline); False restores the reference's strictly sequential order.
    rl_pipeline: bool = True

    # derived (filled in __post_init__) --------------------------------------
    curr_time: str = dataclasses.field(default="", init=False)
    d_model_video_eff: int = dataclasses.field(default=0, init=False)
    d_model_audio_eff: int = dataclasses.field(default=0, init=False)
    train_batch_size: int = dataclasses.field(default=0, init=False)
    inference_batch_size: int = dataclasses.field(default=0, init=False)
    log_path: Optional[str] = dataclasses.field(default=None, init=False)
    model_checkpoint_path: Optional[str] = dataclasses.field(default=None, init=False)

    def __post_init__(self):
        self.curr_time = strftime("%y%m%d%H%M%S", localtime())
        if self.use_linear_embedder:
            self.d_model_video_eff = int(self.d_model_video or self.d_vid)
            self.d_model_audio_eff = int(self.d_model_audio or self.d_aud)
        else:
            # ref: utilities/config_constructor.py:80-86
            self.d_model_video_eff = self.d_vid
            self.d_model_audio_eff = self.d_aud
        n_data = self.num_data_devices()
        # global batch = per-device B * #data-shards (ref: config_constructor.py:94-95)
        self.train_batch_size = self.B * n_data
        self.inference_batch_size = self.inf_B_coeff * self.train_batch_size
        if self.to_log:
            exper_name = self.curr_time[2:]
            base = os.path.join(self.log_dir, self.procedure)
            self.log_path = os.path.join(base, exper_name)
            self.model_checkpoint_path = os.path.join(base, exper_name)
        else:
            self.log_path = None
            self.model_checkpoint_path = None

    # -- helpers -------------------------------------------------------------
    def num_data_devices(self) -> int:
        d, m = self.mesh_shape
        if d <= 0:
            try:
                import jax

                d = max(1, jax.device_count() // max(1, m))
            except Exception:
                d = 1
        return d

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)

    def caption_max(self) -> int:
        """Static caption buffer length: start + max_len + end."""
        return self.max_len + 2
