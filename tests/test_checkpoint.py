"""Checkpoint/resume tests (SURVEY.md §5): round trip, pruning, determinism
of the data stream under fast-forward."""

import numpy as np
import jax.numpy as jnp

from gnfx.data.batching import repeat_batches
from gnfx.train.checkpoint import latest_step, restore_checkpoint, save_checkpoint


def _state():
    return {
        "params": {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.zeros(3)},
        "step_stuff": [jnp.array(3), jnp.array([1.5, 2.5])],
    }


def test_round_trip(tmp_path):
    d = str(tmp_path)
    state = _state()
    save_checkpoint(d, 100, state, meta={"note": "x"})
    restored, step = restore_checkpoint(d, _state())
    assert step == 100
    np.testing.assert_array_equal(
        np.asarray(restored["params"]["w"]), np.asarray(state["params"]["w"])
    )
    np.testing.assert_array_equal(
        np.asarray(restored["step_stuff"][1]), [1.5, 2.5]
    )


def test_prune_and_latest(tmp_path):
    d = str(tmp_path)
    for s in [1, 2, 3, 4, 5]:
        save_checkpoint(d, s, _state(), keep=3)
    assert latest_step(d) == 5
    # only 3 newest remain
    import os
    files = sorted(f for f in os.listdir(d) if f.endswith(".npz"))
    assert files == ["ckpt_00000003.npz", "ckpt_00000004.npz", "ckpt_00000005.npz"]


def test_missing_raises(tmp_path):
    import pytest
    with pytest.raises(FileNotFoundError):
        restore_checkpoint(str(tmp_path), _state())


def test_data_stream_fast_forward_determinism():
    """Resume correctness: stream(start_step=k) == stream(0..)[k:]."""
    rng = np.random.default_rng(0)
    adj = (rng.random((10, 6, 6)) < 0.3).astype(np.float32)
    adj = np.triu(adj, 1)
    adj = adj + adj.transpose(0, 2, 1)
    n_node = rng.integers(3, 7, size=10).astype(np.int32)

    full = list(repeat_batches(adj, n_node, 4, 8, seed=42))
    tail = list(repeat_batches(adj, n_node, 4, 8, seed=42, start_step=5))
    assert len(tail) == 3
    for a, b in zip(full[5:], tail):
        np.testing.assert_array_equal(np.asarray(a.adj), np.asarray(b.adj))
        np.testing.assert_array_equal(np.asarray(a.n_node), np.asarray(b.n_node))


def test_resume_continuity(tmp_path):
    """Fault injection (SURVEY.md §5): kill training mid-run, restart from
    the checkpoint, and the final params must equal an uninterrupted run
    (deterministic data stream + saved optimizer state)."""
    import dataclasses
    import jax

    from gnfx.config import PRESETS
    from gnfx.data import create_dataset, dataset_to_arrays
    from gnfx.train.loop import train_flow

    base = PRESETS["smoke"]
    graphs, _, max_n = create_dataset("community-small", num_graphs=20)
    adj, n_node = dataset_to_arrays(graphs, max_n)
    rng = np.random.default_rng(3)
    feats = rng.normal(size=(adj.shape[0], max_n, 6)).astype(np.float32)

    def cfg_for(num_steps, ckpt_dir):
        return dataclasses.replace(
            base,
            flow=dataclasses.replace(base.flow, num_couplings=2, gnn_hidden=8,
                                     gnn_rounds=1),
            data=dataclasses.replace(base.data, batch_size=4),
            train=dataclasses.replace(base.train, num_steps=num_steps,
                                      checkpoint_every=10, eval_every=10**9,
                                      checkpoint_dir=ckpt_dir),
        )

    # uninterrupted 20-step run
    p_full = train_flow(cfg_for(20, str(tmp_path / "a")), adj, n_node, None,
                        embeddings=feats)
    # interrupted: 10 steps (checkpoint written at 10), then resume to 20
    train_flow(cfg_for(10, str(tmp_path / "b")), adj, n_node, None,
               embeddings=feats)
    p_resumed = train_flow(cfg_for(20, str(tmp_path / "b")), adj, n_node, None,
                           embeddings=feats, resume=True)
    for a, b in zip(jax.tree.leaves(p_full), jax.tree.leaves(p_resumed)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-6)

def test_stacked_batches_match_per_step():
    """stacked_repeat_batches chunk slices == repeat_batches per-step batches
    (chunk size must not change the data a given step sees)."""
    from gnfx.data.batching import stacked_repeat_batches

    rng = np.random.default_rng(1)
    adj = (rng.random((10, 6, 6)) < 0.3).astype(np.float32)
    adj = np.triu(adj, 1)
    adj = adj + adj.transpose(0, 2, 1)
    n_node = rng.integers(3, 7, size=10).astype(np.int32)

    per_step = list(repeat_batches(adj, n_node, 4, 11, seed=7))
    chunked = list(stacked_repeat_batches(adj, n_node, 4, 11, 4, seed=7))
    steps_seen = []
    for steps, gb in chunked:
        for j, s in enumerate(steps):
            steps_seen.append(int(s))
            np.testing.assert_array_equal(
                np.asarray(gb.adj[j]), np.asarray(per_step[s].adj)
            )
            np.testing.assert_array_equal(
                np.asarray(gb.n_node[j]), np.asarray(per_step[s].n_node)
            )
    assert steps_seen == list(range(11))  # ragged final chunk covered


def test_chunk_size_invariance(tmp_path):
    """Final params are identical whatever steps_per_call is — chunked
    dispatch is a pure scheduling change, not a semantic one."""
    import dataclasses
    import jax

    from gnfx.config import PRESETS
    from gnfx.data import create_dataset, dataset_to_arrays
    from gnfx.train.loop import train_flow

    base = PRESETS["smoke"]
    graphs, _, max_n = create_dataset("community-small", num_graphs=20)
    adj, n_node = dataset_to_arrays(graphs, max_n)
    rng = np.random.default_rng(5)
    feats = rng.normal(size=(adj.shape[0], max_n, 6)).astype(np.float32)

    def run(k, d):
        cfg = dataclasses.replace(
            base,
            flow=dataclasses.replace(base.flow, num_couplings=2, gnn_hidden=8,
                                     gnn_rounds=1),
            data=dataclasses.replace(base.data, batch_size=4),
            train=dataclasses.replace(base.train, num_steps=14,
                                      steps_per_call=k, checkpoint_every=10**9,
                                      eval_every=10**9, checkpoint_dir=d),
        )
        return train_flow(cfg, adj, n_node, None, embeddings=feats)

    p1 = run(1, str(tmp_path / "k1"))
    p5 = run(5, str(tmp_path / "k5"))  # ragged final chunk (14 = 5+5+4)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p5)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-6)


def test_ema_chunk_invariance_and_checkpoint(tmp_path):
    """With ema_decay on: (a) the EMA params are chunk-size invariant (EMA
    updates per optimizer step inside the scan, not per dispatch), (b) the
    checkpoint carries (params, opt_state, ema) so post-hoc selection can
    compare raw vs EMA, (c) train_flow returns the EMA."""
    import dataclasses
    import jax

    from gnfx.config import PRESETS
    from gnfx.data import create_dataset, dataset_to_arrays
    from gnfx.train.loop import train_flow

    base = PRESETS["smoke"]
    graphs, _, max_n = create_dataset("community-small", num_graphs=20)
    adj, n_node = dataset_to_arrays(graphs, max_n)
    rng = np.random.default_rng(5)
    feats = rng.normal(size=(adj.shape[0], max_n, 6)).astype(np.float32)

    def run(k, d):
        cfg = dataclasses.replace(
            base,
            flow=dataclasses.replace(base.flow, num_couplings=2, gnn_hidden=8,
                                     gnn_rounds=1),
            data=dataclasses.replace(base.data, batch_size=4),
            train=dataclasses.replace(base.train, num_steps=14,
                                      steps_per_call=k, checkpoint_every=10**9,
                                      eval_every=10**9, checkpoint_dir=d,
                                      ema_decay=0.9),
        )
        return cfg, train_flow(cfg, adj, n_node, None, embeddings=feats)

    cfg1, e1 = run(1, str(tmp_path / "k1"))
    _, e5 = run(5, str(tmp_path / "k5"))
    for a, b in zip(jax.tree.leaves(e1), jax.tree.leaves(e5)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-6)

    # the final checkpoint holds the 3-tuple; ema leaf == returned value and
    # differs from the raw params (decay 0.9 over 14 steps lags well behind)
    from gnfx.models.flow import init_flow
    from gnfx.train.loop import make_optimizer

    t = init_flow(jax.random.PRNGKey(0), dataclasses.replace(
        base.flow, num_couplings=2, gnn_hidden=8, gnn_rounds=1))
    tx = make_optimizer(cfg1.train.lr, cfg1.train.lr_warmup,
                        cfg1.train.grad_clip, cfg1.train.num_steps)
    state, step = restore_checkpoint(str(tmp_path / "k1"), (t, tx.init(t), t))
    assert step == 14
    raw_l, ema_l = jax.tree.leaves(state[0]), jax.tree.leaves(state[2])
    np.testing.assert_allclose(np.asarray(ema_l[0]),
                               np.asarray(jax.tree.leaves(e1)[0]), rtol=1e-6)
    assert any(
        not np.allclose(np.asarray(r), np.asarray(e)) for r, e in zip(raw_l, ema_l)
    )


def test_ae_resume_continuity(tmp_path):
    """Stage-1 AE mid-stage resume (round-3 verdict weak #4: a reimage
    during a long AE used to cost the whole stage): interrupt at 10 steps,
    resume to 20 — final params equal an uninterrupted 20-step run."""
    import dataclasses
    import jax

    from gnfx.config import PRESETS
    from gnfx.data import create_dataset, dataset_to_arrays
    from gnfx.train.loop import train_autoencoder

    base = PRESETS["smoke"]
    graphs, _, max_n = create_dataset("community-small", num_graphs=20)
    adj, n_node = dataset_to_arrays(graphs, max_n)

    def cfg_for(ae_steps, run_dir):
        return dataclasses.replace(
            base,
            ae=dataclasses.replace(base.ae, train_steps=ae_steps),
            data=dataclasses.replace(base.data, batch_size=4),
            train=dataclasses.replace(
                base.train, checkpoint_every=10, eval_every=10**9,
                checkpoint_dir=str(run_dir / "ckpt")),
        )

    p_full = train_autoencoder(cfg_for(20, tmp_path / "a"), adj, n_node,
                               resume=True)
    train_autoencoder(cfg_for(10, tmp_path / "b"), adj, n_node, resume=True)
    assert latest_step(str(tmp_path / "b" / "ckpt_ae")) == 10
    p_res = train_autoencoder(cfg_for(20, tmp_path / "b"), adj, n_node,
                              resume=True)
    for a, b in zip(jax.tree.leaves(p_full), jax.tree.leaves(p_res)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-6)
    # library callers without resume must not write ckpt_ae at all
    train_autoencoder(cfg_for(5, tmp_path / "c"), adj, n_node)
    assert latest_step(str(tmp_path / "c" / "ckpt_ae")) is None


def test_commit_run_artifacts(tmp_path):
    """In-job artifact commits: latest ckpt + run JSONs land in git at
    checkpoint cadence (throttled), pruned ckpts are committed as deletions,
    and a repo-less run_dir is a silent no-op."""
    import subprocess

    from gnfx.train.checkpoint import commit_run_artifacts

    repo = tmp_path / "repo"
    run = repo / "runs" / "x"
    run.mkdir(parents=True)

    def git(*args):
        return subprocess.run(["git", "-C", str(repo), *args],
                              capture_output=True, text=True, check=False)

    git("init", "-q")
    git("config", "user.email", "t@t")
    git("config", "user.name", "t")
    (repo / ".gitignore").write_text("runs/\n")
    git("add", ".gitignore")
    git("commit", "-q", "-m", "init")

    (run / "config.json").write_text("{}")
    save_checkpoint(str(run / "ckpt"), 10, _state(), keep=2)
    assert commit_run_artifacts(str(run), 10, min_interval_s=10**9)
    tracked = git("ls-files").stdout
    assert "runs/x/ckpt/ckpt_00000010.npz" in tracked
    assert "runs/x/config.json" in tracked

    # within the throttle window: no new commit
    save_checkpoint(str(run / "ckpt"), 20, _state(), keep=2)
    assert not commit_run_artifacts(str(run), 20, min_interval_s=10**9)
    # force (STOP / end-of-job) bypasses the throttle; prune deletions land
    save_checkpoint(str(run / "ckpt"), 30, _state(), keep=1)
    assert commit_run_artifacts(str(run), 30, force=True)
    tracked = git("ls-files").stdout
    assert "ckpt_00000030.npz" in tracked
    assert "ckpt_00000010.npz" not in tracked
    assert git("status", "--porcelain", "--", "runs/x").stdout.strip() == ""

    # outside any git repo: harmless no-op
    lone = tmp_path / "lone_run"
    (lone / "ckpt").mkdir(parents=True)
    assert not commit_run_artifacts(str(lone), 0, force=True)


def test_config_round_trip():
    """from_dict(to_dict(cfg)) == cfg for every preset (generate.py relies
    on rebuilding configs from a run's config.json)."""
    import json

    from gnfx.config import PRESETS, from_dict, to_dict

    for name, cfg in PRESETS.items():
        rebuilt = from_dict(json.loads(json.dumps(to_dict(cfg))))
        assert rebuilt == cfg, name


def test_device_stacked_batches_match_host():
    """device_stacked_repeat_batches (device-resident dataset + on-device
    gather) yields bit-identical chunks to stacked_repeat_batches — the
    round-4 transfer-volume fix must not change what any step sees."""
    import jax
    from gnfx.data.batching import (
        device_stacked_repeat_batches, stacked_repeat_batches,
    )

    rng = np.random.default_rng(2)
    adj = (rng.random((10, 6, 6)) < 0.3).astype(np.float32)
    adj = np.triu(adj, 1)
    adj = adj + adj.transpose(0, 2, 1)
    n_node = rng.integers(3, 7, size=10).astype(np.int32)
    feats = rng.normal(size=(10, 6, 4)).astype(np.float32)

    for nodes in (None, feats):
        host = list(stacked_repeat_batches(
            adj, n_node, 4, 11, 4, seed=7, start_step=3, nodes=nodes))
        dev = list(device_stacked_repeat_batches(
            adj, n_node, 4, 11, 4, seed=7, start_step=3, nodes=nodes))
        assert len(host) == len(dev)
        for (s_h, gb_h), (s_d, gb_d) in zip(host, dev):
            np.testing.assert_array_equal(s_h, s_d)
            for a, b in zip(jax.tree.leaves(gb_h), jax.tree.leaves(gb_d)):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
