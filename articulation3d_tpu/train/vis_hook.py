"""Training-iteration visualization hook (reference VIS_PERIOD).

The reference dumps minibatch visualizations during training when
`MODEL.VIS_MINIBATCH` / `VIS_PERIOD` is set: the meta-arch stashes the
minibatch (`modeling/meta_arch/planercnn.py:41`), the ROI heads save
`_misc["images"]` panels (`modeling/roi_heads/roi_heads.py:30-33`), cadence
`VIS_PERIOD` (`config/config.yaml:367`).  Here the hook lives in the host
trainer instead of inside the jitted model (functional core stays pure):
every `test.vis_period` steps the trainer renders one train image twice —
GT boxes/axes and the CURRENT model's predictions — side by side into
`output_dir/vis/iter_XXXXXXX.png`.
"""

from __future__ import annotations

import os

import numpy as np


def save_train_vis(trainer, iteration: int) -> str:
    """Render GT | current-prediction panels for one train image.

    Reuses the trainer's cached batch-1 inference pipeline (compiled once);
    only the variables are refreshed to the current TrainState.
    """
    import cv2

    from ..data.catalog import get_dataset_dicts, get_metadata
    from ..data.mapper import PlaneRCNNMapper
    from ..vis.visualizer import ArtiVisualizer, draw_gt, draw_pred

    cfg = trainer.cfg
    name = cfg.datasets_train[0]
    metadata = get_metadata(name)

    sample = getattr(trainer, "_vis_sample", None)
    if sample is None:
        record = get_dataset_dicts(name)[0]
        mapper = PlaneRCNNMapper(cfg, is_train=False)
        sample = (record, mapper(record))
        trainer._vis_sample = sample
    record, mapped = sample

    pipeline = getattr(trainer, "_vis_pipeline", None)
    if pipeline is None:
        from ..video.pipeline import VideoPipeline
        pipeline = VideoPipeline(
            cfg, trainer.model,
            {"params": trainer.state.params,
             "batch_stats": trainer.state.batch_stats},
            batch_size=1, conf_threshold=0.0)
        trainer._vis_pipeline = pipeline
    else:
        pipeline.variables = {"params": trainer.state.params,
                              "batch_stats": trainer.state.batch_stats}

    img_bgr = mapped["images"].astype(np.uint8)
    img_rgb = img_bgr[..., ::-1]
    pred = pipeline.run([img_bgr])[0]

    gt_panel = draw_gt(ArtiVisualizer(img_rgb), record, metadata,
                       metadata.thing_classes)
    # conf 0.3: early-training scores rarely clear the reference's 0.7 vis
    # threshold; a debug panel that is always empty is useless
    pred_panel = draw_pred(ArtiVisualizer(img_rgb), pred, metadata,
                           metadata.thing_classes, conf_threshold=0.3)
    panel = np.concatenate([gt_panel, pred_panel], axis=1)

    out_dir = os.path.join(cfg.output_dir, "vis")
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, f"iter_{iteration:07d}.png")
    cv2.imwrite(out, panel[..., ::-1])
    return out
