from multimodal_tpu.examples.mdetr.postprocessors import post_process_flickr
from multimodal_tpu.examples.mdetr.flickr_eval import (
    Flickr30kEntitiesRecallEvaluator,
    RecallTracker,
    box_iou_xyxy,
    get_annotations,
    get_sentence_data,
    merge_boxes,
)
from multimodal_tpu.examples.mdetr.optimizer import (
    build_mdetr_optimizer,
    mdetr_lr_schedules,
    mdetr_param_labels,
)

__all__ = [
    "post_process_flickr",
    "Flickr30kEntitiesRecallEvaluator",
    "RecallTracker",
    "box_iou_xyxy",
    "get_annotations",
    "get_sentence_data",
    "merge_boxes",
    "build_mdetr_optimizer",
    "mdetr_lr_schedules",
    "mdetr_param_labels",
]
