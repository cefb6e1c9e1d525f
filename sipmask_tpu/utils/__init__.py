from .demo_inputs import demo_batch
from .profiling import profile_time, StepTimer, trace
