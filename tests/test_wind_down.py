"""Cooperative wind-down: the STOP sentinel makes train_flow checkpoint and
exit at a chunk boundary, and a resumed run reproduces the uninterrupted
trajectory exactly (tools/wind_down.sh relies on both properties to hand
the TPU chip back to the round-end bench without losing work)."""

import dataclasses

import numpy as np
import pytest


def _cfg_for(num_steps, ckpt_dir):
    from gnfx.config import PRESETS

    base = PRESETS["smoke"]
    return dataclasses.replace(
        base,
        flow=dataclasses.replace(base.flow, num_couplings=2, gnn_hidden=8,
                                 gnn_rounds=1),
        data=dataclasses.replace(base.data, batch_size=4),
        train=dataclasses.replace(base.train, num_steps=num_steps,
                                  steps_per_call=4,
                                  checkpoint_every=10**9, eval_every=10**9,
                                  checkpoint_dir=ckpt_dir),
    )


def test_stop_sentinel_checkpoints_and_resumes(tmp_path, monkeypatch):
    import jax

    from gnfx.data import create_dataset, dataset_to_arrays
    from gnfx.train import loop
    from gnfx.train.checkpoint import latest_step

    graphs, _, max_n = create_dataset("community-small", num_graphs=20)
    adj, n_node = dataset_to_arrays(graphs, max_n)
    rng = np.random.default_rng(3)
    feats = rng.normal(size=(adj.shape[0], max_n, 6)).astype(np.float32)

    sentinel = tmp_path / "STOP"
    monkeypatch.setattr(loop, "STOP_SENTINEL", str(sentinel))

    # uninterrupted 20-step run (no sentinel present)
    p_full = loop.train_flow(_cfg_for(20, str(tmp_path / "a")), adj, n_node,
                             None, embeddings=feats)

    # sentinel present from the start: exit at the FIRST chunk boundary
    # (smoke preset: steps_per_call=4) with a checkpoint, exit code 3
    sentinel.touch()
    with pytest.raises(SystemExit) as e:
        loop.train_flow(_cfg_for(20, str(tmp_path / "b")), adj, n_node, None,
                        embeddings=feats)
    assert e.value.code == 3
    assert latest_step(str(tmp_path / "b")) == 4

    # sentinel cleared: resume reproduces the uninterrupted params exactly
    sentinel.unlink()
    p_resumed = loop.train_flow(_cfg_for(20, str(tmp_path / "b")), adj,
                                n_node, None, embeddings=feats, resume=True)
    for a, b in zip(jax.tree.leaves(p_full), jax.tree.leaves(p_resumed)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-6)


def test_stop_sentinel_not_triggered_on_final_chunk(tmp_path, monkeypatch):
    """A sentinel that appears on the very last chunk must not pre-empt
    normal completion (the `not last` guard): the run finishes and returns
    params instead of raising."""
    from gnfx.data import create_dataset, dataset_to_arrays
    from gnfx.train import loop

    graphs, _, max_n = create_dataset("community-small", num_graphs=20)
    adj, n_node = dataset_to_arrays(graphs, max_n)
    rng = np.random.default_rng(3)
    feats = rng.normal(size=(adj.shape[0], max_n, 6)).astype(np.float32)

    sentinel = tmp_path / "STOP"
    sentinel.touch()
    monkeypatch.setattr(loop, "STOP_SENTINEL", str(sentinel))

    # num_steps == steps_per_call: single chunk, which is also the last
    p = loop.train_flow(_cfg_for(4, str(tmp_path / "c")), adj, n_node, None,
                        embeddings=feats)
    assert p is not None
