"""Per-setup configuration registry.

Rebuilds the capability of the reference's EasyDict config modules
(``config/config_avss.py``, ``config_avss_binary.py``,
``config_vpo_{ss,ms,msmi}.py`` and ``config/flags.py:82-96``'s setup
dispatch) as frozen-by-convention dataclasses with the same setup names
and field values. CLI flags (see :mod:`cavp_tpu.config.flags`) are
merged on top, CLI winning, mirroring ``main_avss.py:211-216``.
"""

from __future__ import annotations

import dataclasses
import os
from dataclasses import dataclass, field
from typing import List, Optional

from cavp_tpu.config.class_list import (
    COCO_CLASS_DICT,
    INDEX_TABLE_AVS,
    INDEX_TABLE_COCO,
)


@dataclass
class Config:
    """One training/eval setup. Defaults follow ``config/config_avss.py``."""

    setup: str = "avss"
    seed: int = 666

    # --- image ---
    image_width: int = 512
    image_height: int = 512
    image_mean: List[float] = field(default_factory=lambda: [0.485, 0.456, 0.406])
    image_std: List[float] = field(default_factory=lambda: [0.229, 0.224, 0.225])

    # --- audio ---
    audio_len: float = 1.0
    spec_min: float = -100.0
    spec_max: float = 100.0
    audio_mean: List[float] = field(default_factory=lambda: [0.0])
    audio_std: List[float] = field(default_factory=lambda: [12.0])

    # --- data roots ---
    use_vpo: bool = False
    root_dataset_dir: str = "../audio_visual"
    dataset_name: str = "avsbench_data_single_yh/"
    vgg_root: str = "vggsound_bench/VGGSound"
    vpo_root: str = ""
    vpo_num_classes: int = 22
    index_table: List[str] = field(default_factory=lambda: list(INDEX_TABLE_AVS))
    class_dict: Optional[dict] = None
    replace_name: bool = False

    # --- model ---
    visual_backbone: int = 50
    seg_model: str = "DeepLabV3Plus"
    last_three_dilation_stride: List[bool] = field(
        default_factory=lambda: [False, False, False]
    )
    audio_backbone: str = "vgg"
    visual_backbone_pretrain_path: Optional[str] = None
    audio_backbone_pretrain_path: Optional[str] = None
    in_plane: int = 1  # audio input channels (2 for VPO stereo)

    # --- optimisation ---
    lr: float = 1e-3
    lr_power: float = 0.9
    lr_aud: float = 1e-4
    lrs_seg: float = 10.0
    lrs_bkb: float = 0.5
    batch_size: int = 16
    epochs: int = 60
    momentum: float = 0.9
    weight_decay: float = 1e-4
    num_classes: int = 71
    warm_up_epoch: int = 0
    num_workers: int = 16
    ciou_thre: List[float] = field(default_factory=lambda: [0.3])
    pred_thre: float = 0.4
    loss_w: float = 0.1
    # CoroCL weight. The reference adds l_ctr_av unweighted
    # (trainer_cavp_avss_image.py:222, loss = l_ce + l_ctr_av), so the
    # default is 1.0; --corocl_w 0 is the ablation switch for the
    # objective-effect A/B (scripts/generalize_smoke.py).
    corocl_w: float = 1.0
    cl_temp: float = 0.1
    max_view: int = 512
    ow_rate: float = 0.5

    # --- runtime / harness ---
    gpus: int = 1  # kept for CLI compatibility; means "# data-parallel devices"
    nodes: int = 1
    local_rank: int = 0
    use_baseline: bool = False
    avsbench_split: str = "all"
    resize_flag: bool = False
    ignore_ckpt: bool = False
    debug: bool = False
    data_root: str = ""
    semi_ratio: str = "1/1"
    use_synthetic: bool = False
    use_multi_source: bool = False

    # --- precision / TPU knobs (new; no reference equivalent) ---
    compute_dtype: str = "bfloat16"  # dtype for conv/matmul activations
    param_dtype: str = "float32"
    use_pallas_mel: bool = False  # fused Pallas log-mel frontend
    # fused Pallas visual-fusion kernel on the eval path (projector +
    # patch embeds + sigmoid-CA block + final norm in one VMEM pass);
    # train keeps the flax composition (CoroCL needs the projector
    # output and BN stat mutation)
    use_pallas_fusion: bool = False
    # fused Pallas visual-fusion kernel on the TRAIN path (dup=2 chain
    # as one forward kernel + a full-recompute backward kernel wired as
    # a jax.custom_vjp — no AD activation stashes for the fusion stage
    # in HBM; ops/pallas/fusion_train_kernel.py). DeepLab variants.
    use_pallas_fusion_train: bool = False
    # hand-fused single-pass optimizer: exact multi_transform semantics
    # in one tree_map (engine/optim.py fused_optimizer; equivalence
    # pinned bitwise in tests/test_fused_optim.py). Opt-in until the
    # chip A/B justifies a flip.
    fused_optimizer: bool = False
    # fused Pallas residual-stage kernel for layer1 (the visual tower's
    # bandwidth-bound row: whole stage in one VMEM pass per image) on
    # the eval path; train keeps the flax composition
    use_pallas_layer1: bool = False
    # fused bilinear-upsample+argmax kernel on the eval metric path
    # (requires use_pallas_fusion; bitwise-equal pred)
    use_pallas_argmax: bool = False
    # drop padding frames (v1 videos fill 5 of 10 slots) from eval
    # batches and repack densely — exact same metric sums, fewer steps
    eval_dense_pack: bool = True
    # exact tap-matmul decomposition of heavily-dilated 3x3 convs
    # (layer4 surgery / ASPP rates at small maps; ops/dilated.py).
    # --no_dilated_taps restores plain conv_general_dilated.
    dilated_taps: bool = True
    # phase-decomposed input-gradient for stride-2 3x3 convs
    # (ops/stride2.py). Opt-in until the chip A/B justifies a flip.
    s2_phase_bwd: bool = False
    # exact decomposed-MLP dedup in the fusion block's train path: the
    # fc1 contraction of the MLP runs on B instead of the duplicated 2B
    # (LayerNorm is per-token affine, so its row scaling commutes with
    # the matmul; models/attn.py Block._mlp_dedup_update). Pure
    # reassociation, f64-parity-pinned. Measured NEGATIVE in context
    # (chip A/B b32: 72.0 ms on vs 69.0 off, -4.2% — the B-sized fc1
    # saving loses to breaking XLA's LN->matmul fusion; a first f32-
    # combine version was -15%). Kept opt-in as a recorded negative.
    fusion_mlp_dedup: bool = False
    # exact audio-tower dedup on the train path (avss + VGG tower only):
    # the shuffled half of the 2B clip batch is a permutation of the
    # matched half except for the <= floor(B*ow_rate) bank-overwritten
    # rows, and the VGG tower is per-clip (no BatchNorm) — so the tower
    # runs on B + floor(B*ow_rate) clips and the shuffled half is a
    # feature gather. --no_audio_dedup restores the 2B tower batch.
    audio_dedup: bool = True
    # "key=val,key=val" forwarded to XLA per-compile (TPU flags must NOT
    # go in XLA_FLAGS — the client parser aborts on them; see
    # docs/performance.md "Recorded ablations"). Example:
    # --compiler_options xla_tpu_enable_aggressive_loop_fusion_layout_opt=true
    compiler_options: str = ""
    use_tfdata: bool = False  # tf.data eval input pipeline (else thread pool)
    # video-uid whitelist for eval image uploads (utils/eval_list.txt,
    # trainer_cavp_avss_image.py:59-60,449-463)
    eval_list_path: str = ""
    ckpt_path: str = ""  # checkpoint to load (orbax dir or torch .pth)
    # optional auxiliary objectives (the reference's Losser holds these
    # but never applies them; enable with weight loss_w)
    extra_losses: List[str] = field(default_factory=list)  # "av_contrast", "pixel_contrast"
    class_slots: int = 16  # static per-batch class budget for CoroCL sampling
    eval_frames: int = 10  # padded frames per video in the batched eval step
    donate_state: bool = True

    # --- observability ---
    proj_name: str = "AVSBench-S"
    experiment_name: str = "ca+dp_ctr"
    display_iter: int = 1
    upload_iter: int = 100
    wandb_key: str = ""
    wandb_mode: str = "disabled"
    wandb_dir: str = "./"
    run_note: str = ""
    tags: List[str] = field(default_factory=list)

    # ------------------------------------------------------------------
    @property
    def data_path(self) -> str:
        return os.path.join(self.root_dataset_dir, self.dataset_name)

    @property
    def vgg_data_path(self) -> str:
        return os.path.join(self.root_dataset_dir, self.vgg_root)

    @property
    def vpo_data_path(self) -> str:
        return os.path.join(self.root_dataset_dir, self.vpo_root)

    @property
    def coco_img_root(self) -> str:
        return os.path.join(self.vpo_data_path, "data")

    @property
    def coco_mask_root(self) -> str:
        return os.path.join(self.vpo_data_path, "mask")

    @property
    def mel_frames(self) -> int:
        """Trainer-mel time frames kept: 96 for 1 s audio, 300 for 3 s."""
        return 96 if self.audio_len == 1.0 else 300

    @property
    def audio_samples(self) -> int:
        return int(16000 * self.audio_len)

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


def _avss() -> Config:
    return Config(setup="avss", proj_name="AVSBench-S")


def _avss_binary() -> Config:
    return Config(
        setup="avss_binary",
        image_width=224,
        image_height=224,
        dataset_name="avsbench_data_single_plus/",
        num_classes=2,
        proj_name="AVSBench-Binary",
    )


def _vpo(variant: str) -> Config:
    return Config(
        setup=f"vpo_{variant}",
        audio_len=3.0,
        dataset_name="avsbench_data_single_plus/",
        use_vpo=True,
        index_table=list(INDEX_TABLE_COCO),
        class_dict=dict(COCO_CLASS_DICT),
        vpo_root=f"VPO/VPO-{variant.upper()}/",
        vpo_num_classes=22,
        visual_backbone=101,
        last_three_dilation_stride=[False, True, True],
        audio_backbone="18",  # audio_len != 1 -> ResNet-18 audio tower
        epochs=80,
        weight_decay=5e-4,
        num_classes=24,
        num_workers=8,
        proj_name="VPO",
        experiment_name="baseline+audio(pretrain)" if variant == "ss" else "MS-TEST",
    )


SETUPS = {
    "avss": _avss,
    "avss_binary": _avss_binary,
    "vpo_ss": lambda: _vpo("ss"),
    "vpo_ms": lambda: _vpo("ms"),
    "vpo_msmi": lambda: _vpo("msmi"),
}


def get_config(setup: str) -> Config:
    """Return the base config for a ``--setup`` name (reference flag dispatch)."""
    try:
        return SETUPS[setup]()
    except KeyError:
        raise ValueError(f"Unknown setup {setup!r}; choose from {sorted(SETUPS)}")
