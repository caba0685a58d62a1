"""Utilities: profiling, debugging tripwires, PRNG discipline."""

from gnfx.utils.profiling import trace_context, StepTimer  # noqa: F401
from gnfx.utils.debug import enable_nan_checks, checkify_call  # noqa: F401
