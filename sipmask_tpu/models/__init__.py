from .layers import ConvModule, Scale, FrozenBatchNorm
from .resnet import ResNet
from .fpn import FPN
from .sipmask_head import SipMaskHead
from .detector import SipMask, build_model
