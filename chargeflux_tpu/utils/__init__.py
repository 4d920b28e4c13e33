from .checkpoint import load_checkpoint, save_checkpoint
from .profiling import phase_scope, step_timer, trace

__all__ = ["save_checkpoint", "load_checkpoint", "phase_scope", "trace",
           "step_timer"]
