from .transforms import TrainTransform, TestTransform, VISPairTransform
from .coco import CocoDataset
from .loader import build_train_loader, build_test_loader
from .ytvos import YTVOSDataset
from .loader import build_vis_train_loader
