from .demo_inputs import demo_batch
