"""Multi-host path tests under mocked process topology (SURVEY.md §4 item 4:
no cluster available — process_index-dependent code is asserted under mocked
jax.process_index/process_count)."""

import os

import jax
import numpy as np

from gnfx.parallel.multihost import (initialize_multihost, is_coordinator,
                                     sync_global_devices)
from gnfx.train.checkpoint import save_checkpoint


def test_initialize_multihost_single_process_noop(monkeypatch):
    for var in ("COORDINATOR_ADDRESS", "NUM_PROCESSES", "PROCESS_ID"):
        monkeypatch.delenv(var, raising=False)
    info = initialize_multihost()
    assert info["process_index"] == 0
    assert info["process_count"] == 1
    assert info["global_devices"] == len(jax.devices())


def test_is_coordinator_mocked(monkeypatch):
    assert is_coordinator()
    monkeypatch.setattr(jax, "process_index", lambda: 2)
    assert not is_coordinator()


def test_non_coordinator_never_writes_checkpoints(monkeypatch, tmp_path):
    ckpt = str(tmp_path / "ck")
    monkeypatch.setattr(jax, "process_index", lambda: 1)
    out = save_checkpoint(ckpt, 10, {"a": np.ones(2)})
    assert out == ""
    assert not os.path.exists(ckpt)
    # coordinator writes
    monkeypatch.setattr(jax, "process_index", lambda: 0)
    out = save_checkpoint(ckpt, 10, {"a": np.ones(2)})
    assert out and os.path.exists(out)


def test_sync_global_devices_single_process():
    sync_global_devices("test-barrier")  # must be a no-op-safe barrier
