"""ae_from AE-config compatibility rules (scripts/train_gnf.ae_config_diff).

Regression for the round-4 queue failure: runs saved before a config field
existed have no key for it in config.json; the strict != check read that
as a mismatch (None vs today's default) and refused reuse of compatible
AEs (deep24 ae_from=community-small-pca vs the pre-bridge-field source).
"""

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from scripts.train_gnf import ae_config_diff  # noqa: E402

DEFAULTS = {"decoder_c": 10.0, "bridge_weight": 0.0, "bridge_mode": "dist",
            "canonicalize": "none", "canon_jitter": 0.05, "embed_dim": 20}


def test_identical_configs_pass():
    ours = dict(DEFAULTS)
    assert ae_config_diff(dict(DEFAULTS), ours, DEFAULTS) == {}


def test_absent_key_vs_default_passes():
    src = dict(DEFAULTS)
    del src["bridge_weight"], src["bridge_mode"]  # pre-field source run
    assert ae_config_diff(src, dict(DEFAULTS), DEFAULTS) == {}


def test_absent_key_vs_override_raises():
    src = dict(DEFAULTS)
    del src["bridge_weight"]
    ours = dict(DEFAULTS, bridge_weight=2.0)
    assert ae_config_diff(src, ours, DEFAULTS) == {
        "bridge_weight": (None, 2.0)}


def test_present_key_mismatch_raises():
    src = dict(DEFAULTS, decoder_c=100.0)
    diff = ae_config_diff(src, dict(DEFAULTS), DEFAULTS)
    assert diff == {"decoder_c": (100.0, 10.0)}


def test_canonicalize_fields_are_handoff_choices():
    src = dict(DEFAULTS, canonicalize="pca", canon_jitter=0.1)
    assert ae_config_diff(src, dict(DEFAULTS), DEFAULTS) == {}
