from .boxes import bbox_overlaps, distance2bbox, center_size
from .points import level_points, all_points
from .targets import fcos_targets, centerness_target
from . import losses
