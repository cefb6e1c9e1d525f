from .rle import encode_mask, decode_mask, rle_area
from .coco_eval import COCOEvaluator
from .recall import eval_recalls, fast_eval_recall
