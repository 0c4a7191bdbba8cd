"""Aux subsystems: debugging, profiling (SURVEY.md section 5)."""

from lintransunet_tpu.utils.debug import finite_check, nan_guard
from lintransunet_tpu.utils.profiling import profile_trace, timed

__all__ = ["nan_guard", "finite_check", "profile_trace", "timed"]
