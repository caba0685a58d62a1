"""Numerical-tripwire tests (SURVEY.md §5 sanitizers): the debug hooks the
train CLIs expose via `debug_nans=1` must actually trip on NaNs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gnfx.utils.debug import checkify_call, enable_nan_checks


def test_enable_nan_checks_raises_at_producing_op():
    enable_nan_checks(True)
    try:
        with pytest.raises(FloatingPointError):
            jax.jit(lambda x: jnp.log(x) * 0.0 + x)(jnp.array(-1.0)).block_until_ready()
    finally:
        enable_nan_checks(False)
    # and OFF really is off again
    y = jax.jit(lambda x: jnp.log(x))(jnp.array(-1.0))
    assert np.isnan(np.asarray(y))


def test_checkify_call_returns_error_value():
    def f(x):
        return jnp.log(x)

    err, out = checkify_call(f, jnp.array(-1.0))
    assert err.get() is not None and "nan" in err.get().lower()
    err2, out2 = checkify_call(f, jnp.array(2.0))
    assert err2.get() is None
    np.testing.assert_allclose(np.asarray(out2), np.log(2.0), rtol=1e-6)


def test_train_gnf_cli_accepts_debug_nans_flag():
    """The CLI flag is parsed out before config loading (it is not a config
    key) — load path must not choke on it. Uses the override-stripping code
    path directly via a tiny main() invocation guard: just ensure the flag
    round-trips through the parser by simulating its removal."""
    argv = ["smoke", "debug_nans=1", "train.num_steps=1"]
    overrides = [a for a in argv if a not in ("--resume",)]
    assert "debug_nans=1" in overrides
    # the real main() removes it then enables the check; here we only pin
    # that the config loader would reject it if NOT removed (guards against
    # the flag silently becoming a no-op config key)
    from gnfx.config import load_config
    with pytest.raises(Exception):
        load_config(["smoke", "debug_nans=1"])
