from .crop_split import (quadrant_masks, box_crop_mask, crop_split,
                         assemble_masks, mask_bce_loss)
from .nms import hard_nms, soft_nms, multiclass_nms_idx, fast_nms
from .deform_conv import deform_conv2d, modulated_deform_conv2d
from .roi import (roi_align, roi_pool, grid_sample, masked_conv2d, carafe,
                  deform_roi_pool)
