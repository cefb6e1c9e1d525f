from .train import train_detector
from .test import evaluate_coco, run_inference
from .inference import (init_detector, inference_detector,
                        async_inference_detector, show_result)
