from .profiling import flops_of, trace_context, StepTimer
