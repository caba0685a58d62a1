"""Committable trace: 16-step chunks (the 256-step trace is ~140 MB raw;
a 16-step one is a few MB gzipped). Writes runs/trace-community-16/trace +
trace_summary.json."""
import os
import sys

sys.path.insert(0, "/root/repo")

import jax

from dataclasses import replace

from gnfx.config import PRESETS
from gnfx.data import create_dataset, dataset_to_arrays
from gnfx.models import autoencoder as _ae
from gnfx.train.checkpoint import restore_checkpoint
from gnfx.train.loop import train_flow

cfg = PRESETS["community-small-pca"]
run_dir = "runs/trace-community-16"
cfg = replace(cfg, name="trace-community-16",
              train=replace(cfg.train, num_steps=48, steps_per_call=16,
                            trace_chunks=1, eval_every=48,
                            checkpoint_every=48,
                            checkpoint_dir=os.path.join(run_dir, "ckpt")))

train_g, test_g, max_n = create_dataset(cfg.data.dataset, seed=cfg.data.seed)
adj_tr, n_tr = dataset_to_arrays(train_g, max_n)

tpl = {"ae": _ae.init_autoencoder(jax.random.PRNGKey(0), cfg.ae)}
ae_params = restore_checkpoint("runs/community-small-pca/params_ae", tpl)[0]["ae"]

train_flow(cfg, adj_tr, n_tr, ae_params, full_graph=True)

from scripts.trace_summary import main as summarize

summarize([os.path.join(run_dir, "trace"), "steps=16",
           f"out={os.path.join(run_dir, 'trace_summary.json')}"])
print("[trace-small] done", flush=True)
