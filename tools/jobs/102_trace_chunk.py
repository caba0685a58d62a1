"""Committed Perfetto trace of a real on-chip training chunk (round-3
verdict item 7): two 256-step chunks of the flagship community-small-pca
recipe via train_flow directly (no final-eval grid), chunk 1 traced into
runs/trace-community/trace. Pairs with runs/bench_mfu.json: the timeline
shows device occupancy vs host gaps behind the headline steps/s."""
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
run_dir = "runs/trace-community"
cfg = replace(cfg, name="trace-community",
              train=replace(cfg.train, num_steps=512, steps_per_call=256,
                            trace_chunks=1, eval_every=512,
                            checkpoint_every=512,
                            checkpoint_dir=os.path.join(run_dir, "ckpt")))

train_g, test_g, max_n = create_dataset(cfg.data.dataset, seed=cfg.data.seed)
adj_tr, n_tr = dataset_to_arrays(train_g, max_n)

tpl = {"ae": _ae.init_autoencoder(jax.random.PRNGKey(0), cfg.ae)}
ae_params = restore_checkpoint("runs/community-small-pca/params_ae", tpl)[0]["ae"]

train_flow(cfg, adj_tr, n_tr, ae_params, full_graph=True)
print("[trace-job] done; trace at", os.path.join(run_dir, "trace"), flush=True)
