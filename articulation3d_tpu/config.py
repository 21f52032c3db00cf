"""Static configuration for the TPU-native Articulation3D framework.

Replaces the reference's yacs CfgNode tree
(`articulation3d/articulation3d/config/config.py:7-85` plus detectron2
defaults frozen into `articulation3d/config/config.yaml`) with frozen
dataclasses.  Everything here is *static* at trace time: capability toggles
(`plane_on/axis_on/depth_on/mask_on/refine_on`) and shape bounds (proposal /
detection padding) are resolved before `jax.jit`, so the whole forward pass
compiles to a single fixed-shape XLA program.

The `freeze` list keeps the reference's module-path contract
(`MODEL.FREEZE`, applied in `planercnn.py:51-58`): paths are matched as
prefixes against parameter pytree paths and drive both the optax gradient
mask and loss routing.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Mapping, Sequence, Tuple


def _tuple(x):
    if isinstance(x, (list, tuple)):
        return tuple(_tuple(v) for v in x)
    return x


@dataclass(frozen=True)
class ResNetConfig:
    """ResNet-50 backbone (reference `config/config.yaml:106-126`)."""

    depth: int = 50
    norm: str = "FrozenBN"        # frozen scale/bias folded at apply time
    stem_out_channels: int = 64
    res2_out_channels: int = 256
    stride_in_1x1: bool = True    # Caffe-style: stride on the 1x1 conv
    num_groups: int = 1
    width_per_group: int = 64
    freeze_at: int = 2            # stages <= freeze_at get stop_gradient
    out_features: Tuple[str, ...] = ("res2", "res3", "res4", "res5")
    # rematerialize each bottleneck on the backward pass (jax.checkpoint):
    # keeps only block I/O activations live, ~3x less backbone activation
    # HBM for ~1 extra backbone forward — the standard TPU memory/FLOPs
    # trade for large training batches (stage-1 at ims/batch 16 on one v5e
    # OOMs without it)
    remat: bool = False
    # compute the 7x7/s2 stem conv as an exactly-equivalent 4x4/s1 conv on
    # 2x2-regrouped pixels (12 input channels instead of 3 on the MXU's
    # contraction dim) — the standard TPU ResNet space-to-depth transform;
    # same (7,7,3,64) parameter, rearranged at apply time, so checkpoints
    # port 1:1 either way (models/resnet.py::_StemConvS2D).  Default OFF:
    # measured NO win on v5e (67.6 vs 63.7 ms backbone fwd, batch 64 —
    # XLA already pads the 3-channel stem efficiently); kept as a tested
    # option for parts where the stem dominates.  Exact at true f32 (CPU
    # parity test, tests/test_model.py); ON CHIP even f32 convs round MXU
    # inputs to bf16, so the regrouped conv's different tap-summation
    # order drifts activations ~2^-9 and borderline NMS orderings can
    # permute detection slots — detections agree as a SET (measured
    # on-chip: 14/16 within 2px/5e-2 on chaotic random-biased weights;
    # ties at NMS thresholds account for the rest).
    space_to_depth_stem: bool = False


@dataclass(frozen=True)
class FPNConfig:
    """FPN neck (reference `config/config.yaml:63-71`)."""

    in_features: Tuple[str, ...] = ("res2", "res3", "res4", "res5")
    out_channels: int = 256
    fuse_type: str = "sum"


@dataclass(frozen=True)
class AnchorConfig:
    """One anchor size per level x 3 ratios (`config/config.yaml:38-54`)."""

    sizes: Tuple[Tuple[float, ...], ...] = ((32.0,), (64.0,), (128.0,), (256.0,), (512.0,))
    aspect_ratios: Tuple[float, ...] = (0.5, 1.0, 2.0)
    offset: float = 0.0


@dataclass(frozen=True)
class RPNConfig:
    """Region proposal network (reference `config/config.yaml:270-297`)."""

    in_features: Tuple[str, ...] = ("p2", "p3", "p4", "p5", "p6")
    iou_thresholds: Tuple[float, float] = (0.3, 0.7)
    batch_size_per_image: int = 256
    positive_fraction: float = 0.5
    nms_thresh: float = 0.7
    pre_nms_topk_train: int = 2000
    post_nms_topk_train: int = 1000
    pre_nms_topk_test: int = 1000
    post_nms_topk_test: int = 1000
    bbox_reg_weights: Tuple[float, float, float, float] = (1.0, 1.0, 1.0, 1.0)
    smooth_l1_beta: float = 0.0
    loss_weight: float = 1.0
    min_size: float = 0.0
    boundary_thresh: float = -1.0
    # 1 = standard RPN head; 5 = the DRPN variant (PROPOSAL_GENERATOR: DRPN,
    # reference `modeling/proposal_generator/drpn.py:13-28`)
    head_convs: int = 1


@dataclass(frozen=True)
class BoxHeadConfig:
    """FastRCNN box head: 2xFC(1024) on 7x7 ROIAlignV2
    (reference `config/config.yaml:189-207`)."""

    num_fc: int = 2
    fc_dim: int = 1024
    pooler_resolution: int = 7
    pooler_sampling_ratio: int = 0
    pooler_type: str = "ROIAlignV2"
    bbox_reg_weights: Tuple[float, float, float, float] = (10.0, 10.0, 5.0, 5.0)
    smooth_l1_beta: float = 0.0
    cls_agnostic_bbox_reg: bool = False


@dataclass(frozen=True)
class ROIHeadsConfig:
    """Proposal sampling + test-time filtering (`config/config.yaml:209-226`)."""

    in_features: Tuple[str, ...] = ("p2", "p3", "p4", "p5")
    num_classes: int = 2          # arti_rot, arti_tran
    batch_size_per_image: int = 512
    positive_fraction: float = 0.25
    iou_threshold: float = 0.5
    proposal_append_gt: bool = True
    score_thresh_test: float = 0.7
    nms_thresh_test: float = 0.5
    detections_per_image: int = 100


@dataclass(frozen=True)
class MaskHeadConfig:
    """MaskRCNNConvUpsampleHead, class-agnostic (`config/config.yaml:245-255`)."""

    num_conv: int = 4
    conv_dim: int = 256
    pooler_resolution: int = 14
    pooler_sampling_ratio: int = 2
    pooler_type: str = "ROIAlign"
    cls_agnostic: bool = True
    mask_threshold: float = 0.5   # cfg.MODEL.ROI_MASK_HEAD.MASK_THRESHOLD
    nms: bool = False             # per-pixel mask NMS (`layers/mask_ops.py:126-127`)


@dataclass(frozen=True)
class PlaneHeadConfig:
    """Plane-parameter head (reference `modeling/roi_heads/plane_head.py:15-137`,
    defaults `config/config.py:34-48`)."""

    num_conv: int = 4
    conv_dim: int = 256
    num_fc: int = 1
    fc_dim: int = 1024
    param_dim: int = 3
    pooler_resolution: int = 14
    pooler_sampling_ratio: int = 0
    pooler_type: str = "ROIAlign"
    normal_only: bool = True
    loss_weight: float = 1.0


@dataclass(frozen=True)
class AxisHeadConfig:
    """Twin rotation/translation axis towers
    (reference `modeling/roi_heads/axis_head.py:15-216`)."""

    num_conv: int = 4
    conv_dim: int = 256
    num_fc: int = 1
    fc_dim: int = 1024
    pooler_resolution: int = 14
    pooler_sampling_ratio: int = 0
    pooler_type: str = "ROIAlign"
    loss_weight: float = 1.0
    smooth_l1_beta: float = 0.0


@dataclass(frozen=True)
class RefineHeadConfig:
    """NVIDIA-PlaneRCNN mask refinement network
    (reference `modeling/refine_net/refine_head.py:25-290`)."""

    height: int = 192             # internal resolution (refine_head.py:258)
    width: int = 256
    max_depth: float = 10.0       # planeXYZModule clamp (refine_head.py:192)
    focal_length: float = 571.623718  # get_ranges default (refine_head.py:167)
    loss_weight: float = 1.0


@dataclass(frozen=True)
class DepthHeadConfig:
    """Full-image FPN depth decoder
    (reference `modeling/depth_net/depth_head.py:49-103`)."""

    loss_weight: float = 1.0
    output_height: int = 480
    output_width: int = 640


@dataclass(frozen=True)
class SolverConfig:
    """SGD + WarmupMultiStepLR (reference `config/config.yaml:315-341`)."""

    base_lr: float = 1e-3
    momentum: float = 0.9
    weight_decay: float = 1e-4
    gamma: float = 0.1
    steps: Tuple[int, ...] = (210000, 250000)
    warmup_factor: float = 1e-3
    warmup_iters: int = 1000
    max_iter: int = 1_000_000
    ims_per_batch: int = 16
    checkpoint_period: int = 1000
    clip_gradients: bool = False
    clip_value: float = 1.0
    # the recipe's schedule was written for this many workers; 0 disables
    # auto-scaling (reference `SOLVER.REFERENCE_WORLD_SIZE`,
    # `config/config.yaml:332`, d2 `DefaultTrainer.auto_scale_workers`)
    reference_world_size: int = 0
    # dtype of the fused gradient all-reduce ("float32" | "bfloat16"):
    # bf16 gradient compression halves the per-step collective payload
    # (ICI on TPU, Gloo on CPU meshes); grads are averaged in the sync
    # dtype and cast back before the optimizer update
    grad_sync_dtype: str = "float32"
    # k-step fused dispatch: one device program executes k train steps
    # (`lax.scan` threading the donated TrainState) and returns only the
    # final state + stacked per-step metrics.  Amortizes per-dispatch
    # output-handle materialization k-fold on high-latency clients (the
    # measured ~1.4 s/step dev-tunnel tax, PROFILE.md); 1 = the reference's
    # per-iteration host loop (`tools/train_net.py:84-104` in d2's engine).
    # Log/checkpoint/eval cadences snap to multiples of k.
    steps_per_dispatch: int = 1


@dataclass(frozen=True)
class InputConfig:
    """Fixed 640x480 input, Caffe-style BGR mean (`config/config.yaml:90-97`)."""

    height: int = 480
    width: int = 640
    format: str = "BGR"
    pixel_mean: Tuple[float, float, float] = (103.53, 116.28, 123.675)
    pixel_std: Tuple[float, float, float] = (1.0, 1.0, 1.0)
    size_divisibility: int = 32


@dataclass(frozen=True)
class TestConfig:
    eval_gt_box: bool = False
    eval_period: int = 1000
    # `detector_postprocess` is invoked with box_score_threshold=0.1
    # (`modeling/meta_arch/planercnn.py:217`) — preserved as-is.
    box_score_threshold: float = 0.1
    # training-iteration visualization cadence: every `vis_period` steps the
    # trainer renders GT + current predictions for one minibatch image into
    # `output_dir/vis/iter_XXXXXXX.png` (reference `VIS_PERIOD` +
    # `MODEL.VIS_MINIBATCH`/`TEST.SAVE_VIS`: `config/config.yaml:367`,
    # `modeling/meta_arch/planercnn.py:41`, `roi_heads/roi_heads.py:30-33`).
    # 0 disables (the reference recipes ship with it off).
    vis_period: int = 0


@dataclass(frozen=True)
class ModelConfig:
    meta_architecture: str = "PlaneRCNN"
    # capability toggles (reference `config/config.py:12-16`)
    mask_on: bool = True
    plane_on: bool = True
    depth_on: bool = True
    axis_on: bool = True
    refine_on: bool = False
    # module-path freeze list (reference `MODEL.FREEZE`)
    freeze: Tuple[str, ...] = ()
    resnet: ResNetConfig = field(default_factory=ResNetConfig)
    fpn: FPNConfig = field(default_factory=FPNConfig)
    anchors: AnchorConfig = field(default_factory=AnchorConfig)
    rpn: RPNConfig = field(default_factory=RPNConfig)
    roi_heads: ROIHeadsConfig = field(default_factory=ROIHeadsConfig)
    box_head: BoxHeadConfig = field(default_factory=BoxHeadConfig)
    mask_head: MaskHeadConfig = field(default_factory=MaskHeadConfig)
    plane_head: PlaneHeadConfig = field(default_factory=PlaneHeadConfig)
    axis_head: AxisHeadConfig = field(default_factory=AxisHeadConfig)
    depth_head: DepthHeadConfig = field(default_factory=DepthHeadConfig)
    refine_head: RefineHeadConfig = field(default_factory=RefineHeadConfig)
    # compute dtype for the conv trunk; params stay f32
    dtype: str = "bfloat16"
    # ROIAlign implementation: "auto" = Pallas window-DMA kernel on TPU,
    # XLA gather formulation elsewhere; or force "pallas" / "xla"
    roi_pooler_impl: str = "auto"
    # serving-only lever: pool the detection cascade ONCE at the plane/axis
    # convention (14x14, sampling_ratio 0) and feed the mask head from the
    # same tensor.  The reference pools mask separately at sampling_ratio 2
    # (`config/config.yaml:255` vs `config/config.py:36-39`) — sharing drops
    # one full pool pass but changes mask-head inputs (delta quantified in
    # PROFILE.md).  Off in every parity config.
    share_detection_pool: bool = False


@dataclass(frozen=True)
class Config:
    model: ModelConfig = field(default_factory=ModelConfig)
    input: InputConfig = field(default_factory=InputConfig)
    solver: SolverConfig = field(default_factory=SolverConfig)
    test: TestConfig = field(default_factory=TestConfig)
    datasets_train: Tuple[str, ...] = ("arti_train",)
    datasets_test: Tuple[str, ...] = ("arti_val",)
    output_dir: str = "exps/inference"
    # model weights: orbax checkpoint dir, d2 .pth/.pkl (ported on load), or ""
    weights: str = ""
    seed: int = 0

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


def _update_dataclass(obj, overrides: Mapping[str, Any]):
    """Recursively apply a nested dict of overrides to a frozen dataclass."""
    kw = {}
    for key, val in overrides.items():
        if not hasattr(obj, key):
            raise KeyError(f"unknown config key {key!r} on {type(obj).__name__}")
        cur = getattr(obj, key)
        if dataclasses.is_dataclass(cur) and isinstance(val, Mapping):
            kw[key] = _update_dataclass(cur, val)
        else:
            kw[key] = _tuple(val)
    return dataclasses.replace(obj, **kw)


def auto_scale_workers(cfg: Config, num_workers: int) -> Config:
    """Linear-scaling-rule rewrite of the solver schedule for a new worker
    count (detectron2 ``DefaultTrainer.auto_scale_workers`` semantics; the
    reference only ships the knob, `config/config.yaml:332`).

    If ``solver.reference_world_size`` is 0 or already equals
    ``num_workers``, the config is returned unchanged.  Otherwise the total
    batch grows with the worker count and LR scales linearly, while
    iteration-denominated quantities (max_iter, warmup, decay steps, eval /
    checkpoint periods) shrink so the same number of epochs is covered.
    """
    old = cfg.solver.reference_world_size
    if old == 0 or old == num_workers:
        return cfg
    scale = num_workers / old
    s = cfg.solver
    solver = dataclasses.replace(
        s,
        ims_per_batch=int(round(s.ims_per_batch * scale)),
        base_lr=s.base_lr * scale,
        max_iter=int(round(s.max_iter / scale)),
        warmup_iters=int(round(s.warmup_iters / scale)),
        steps=tuple(int(round(x / scale)) for x in s.steps),
        checkpoint_period=int(round(s.checkpoint_period / scale)),
        reference_world_size=num_workers,
    )
    test = dataclasses.replace(cfg.test,
                               eval_period=int(round(cfg.test.eval_period /
                                                     scale)))
    return dataclasses.replace(cfg, solver=solver, test=test)


def load_config(yaml_path: str | None = None, overrides: Mapping[str, Any] | None = None) -> Config:
    """Build a Config, optionally merging a YAML file + a nested override dict.

    YAML layout mirrors the dataclass tree (snake_case), not detectron2's
    UPPER_CASE, e.g.::

        model:
          axis_on: true
          freeze: [backbone, rpn]
        solver:
          base_lr: 0.001
    """
    cfg = Config()
    if yaml_path is not None:
        import yaml  # lazy: only needed when loading files

        with open(yaml_path) as f:
            data = yaml.safe_load(f) or {}
        cfg = _update_dataclass(cfg, data)
    if overrides:
        cfg = _update_dataclass(cfg, overrides)
    return cfg


# ---------------------------------------------------------------------------
# Named recipe configs mirroring the reference's shipped YAMLs.
# ---------------------------------------------------------------------------

def inference_config() -> Config:
    """Everything on except refine (reference `config/config.yaml:55-112`)."""
    return Config(
        model=ModelConfig(
            mask_on=True, plane_on=True, depth_on=True, axis_on=True, refine_on=False,
            freeze=(
                "backbone", "proposal_generator",
                "roi_heads.box_head", "roi_heads.box_predictor",
                "roi_heads.axis_head",
            ),
        ),
    )


def serving_config() -> Config:
    """Deployment preset: parity math, trimmed padded capacity.

    The d2-parity caps (1000 post-NMS proposals, 100 detections/image —
    reference `config/config.yaml:221-226`) size the ROI stage for a padded
    capacity no real frame comes near (arti scenes carry well under 20
    instances).  Serving halves the box-stage ROI set (post-NMS 500) and
    pools the mask/plane/axis cascade on 30 final boxes instead of 100.

    Equivalence contract (tested, tests/test_serving_parity.py + the
    on-chip `# serving_vs_parity` check in bench.py):
      * per-box outputs are IDENTICAL to the parity config for every box
        both configs keep (measured bit-exact on CPU f32);
      * whenever <= 500 proposals survive RPN NMS (every real arti/ScanNet
        frame), the candidate pools coincide and the serving detections are
        EXACTLY parity's top-30 — full set equality;
      * if a frame overruns the cap (adversarial synthetic load), the extra
        parity candidates can shift class-NMS outcomes; measured divergence
        under cap-saturating biased-noise load stays <= ~2-5% of detections
        (quantified per bench run on stderr).
    Parity-vs-speed numbers: PROFILE.md "Serving preset".
    """
    cfg = inference_config()
    return cfg.replace(model=dataclasses.replace(
        cfg.model,
        rpn=dataclasses.replace(cfg.model.rpn, post_nms_topk_test=500),
        roi_heads=dataclasses.replace(cfg.model.roi_heads,
                                      detections_per_image=30)))


def step1_bbox_config() -> Config:
    """Stage 1: detector only (reference `config/step1_bbox.yaml`)."""
    return Config(
        model=ModelConfig(mask_on=False, plane_on=False, depth_on=False,
                          axis_on=False, refine_on=False),
        solver=SolverConfig(ims_per_batch=16),
        datasets_train=("arti_train",), datasets_test=("arti_val",),
    )


def step2_axis_config() -> Config:
    """Stage 2: axis head, frozen detector (reference `config/step2_axis.yaml`)."""
    return Config(
        model=ModelConfig(
            mask_on=False, plane_on=False, depth_on=False, axis_on=True,
            refine_on=False,
            freeze=("backbone", "proposal_generator",
                    "roi_heads.box_head", "roi_heads.box_predictor"),
        ),
        solver=SolverConfig(ims_per_batch=16),
        datasets_train=("arti_train",), datasets_test=("arti_val",),
    )


def step3_plane_config() -> Config:
    """Stage 3: mask+plane+depth, frozen detector+axis
    (reference `config/step3_plane.yaml`)."""
    return Config(
        model=ModelConfig(
            mask_on=True, plane_on=True, depth_on=True, axis_on=True,
            refine_on=False,
            freeze=("backbone", "proposal_generator",
                    "roi_heads.box_head", "roi_heads.box_predictor",
                    "roi_heads.axis_head"),
        ),
        solver=SolverConfig(ims_per_batch=8),
        datasets_train=("scannet_train",), datasets_test=("scannet_val",),
    )
