from .cache import enable_compile_cache
from .demo_inputs import demo_batch
from .profiling import profile_time, StepTimer, trace
