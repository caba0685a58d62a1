"""Numerical tripwires (SURVEY.md §5 'race detection / sanitizers').

TPU-native equivalents of sanitizers for a pure-functional stack:
  * `enable_nan_checks()` — global `jax_debug_nans`: any NaN produced under
    jit raises at the producing op (re-runs un-jitted to localise);
  * `checkify_call(fn)` — wraps a function with `jax.experimental.checkify`
    NaN/div checks so errors become returned values (usable inside jit
    without aborting the step, e.g. in the training loop);
  * the native C++ orbit counter builds with -fsanitize=address,undefined in
    its CI target (tests/test_native_sanitize.py).
"""

from __future__ import annotations

import jax
from jax.experimental import checkify


def enable_nan_checks(enable: bool = True):
    jax.config.update("jax_debug_nans", enable)


def checkify_call(fn, *args, **kwargs):
    """Run fn with NaN/float checks; returns (error, result). Raise with
    `err.throw()` on the host when convenient."""
    checked = checkify.checkify(fn, errors=checkify.float_checks)
    return checked(*args, **kwargs)
