"""Scaling-efficiency harness (BASELINE north star: ≥80% samples/s scaling
from 1 chip to N≥2 hosts).

Measures device-fanned inverse-flow sampling throughput (graphs/s) and
data-parallel training throughput (steps/s) on meshes of 1..N devices and
reports efficiency vs linear scaling from 1 device. On this box the real
chip count is 1, so the harness defaults to the 8-virtual-device CPU backend
(run with:  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu
XLA_FLAGS=--xla_force_host_platform_device_count=8 python
scripts/bench_scaling.py); on a pod slice it runs as-is on ICI.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from gnfx.config import AEConfig
from gnfx.graph import batch_from_dense
from gnfx.models.flow import FlowConfig, init_flow, log_prob
from gnfx.parallel.mesh import make_mesh, replicate, shard_batch
from gnfx.parallel.sampling import sample_graphs_sharded


def bench_training(mesh, fcfg, params, per_dev_batch, max_n, iters=30):
    n_dev = mesh.shape["data"]
    bsz = per_dev_batch * n_dev
    rng = np.random.default_rng(0)
    adj = (rng.random((bsz, max_n, max_n)) < 0.3).astype(np.float32)
    adj = np.triu(adj, 1)
    adj = adj + adj.transpose(0, 2, 1)
    n_node = rng.integers(max_n // 2, max_n + 1, size=bsz).astype(np.int32)
    gb = shard_batch(batch_from_dense(adj, n_node), mesh)
    x = jnp.asarray(rng.normal(size=(bsz, max_n, fcfg.node_dim)), jnp.float32)
    x = jax.device_put(x * gb.node_mask[..., None], NamedSharding(mesh, P("data")))
    p = replicate(params, mesh)
    tx = optax.adam(1e-3)
    opt = replicate(tx.init(params), mesh)

    @jax.jit
    def step(p, opt, x, gb):
        loss, grads = jax.value_and_grad(
            lambda p: -jnp.mean(log_prob(p, fcfg, x, gb))
        )(p)
        updates, opt = tx.update(grads, opt)
        return optax.apply_updates(p, updates), opt, loss

    p, opt, loss = step(p, opt, x, gb)
    loss.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        p, opt, loss = step(p, opt, x, gb)
    loss.block_until_ready()
    return iters / (time.perf_counter() - t0)


def bench_sampling(mesh, fcfg, acfg, params, per_dev_batch, max_n):
    size_dist = np.zeros(max_n + 1)
    size_dist[max_n // 2 :] = 1.0
    size_dist /= size_dist.sum()
    n = per_dev_batch * mesh.shape["data"] * 4
    # warmup (compile)
    sample_graphs_sharded(params, None, fcfg, acfg,
                          per_dev_batch * mesh.shape["data"],
                          size_dist, max_n, mesh, per_device_batch=per_dev_batch)
    t0 = time.perf_counter()
    graphs = sample_graphs_sharded(params, None, fcfg, acfg, n, size_dist,
                                   max_n, mesh, per_device_batch=per_dev_batch)
    return len(graphs) / (time.perf_counter() - t0)


def main():
    fcfg = FlowConfig(node_dim=14, num_couplings=10, gnn_hidden=64, gnn_rounds=3)
    acfg = AEConfig(embed_dim=14, feature_dim=14)
    params = init_flow(jax.random.PRNGKey(0), fcfg)
    max_n, per_dev = 20, 32

    n_avail = len(jax.devices())
    results = {"backend": jax.default_backend(), "devices": n_avail,
               "host_cpu_cores": os.cpu_count(), "rows": []}
    if jax.default_backend() == "cpu" and n_avail > (os.cpu_count() or 1):
        # virtual CPU devices share physical cores: beyond core saturation,
        # per-device compute halves each doubling, so measured "efficiency"
        # reflects host oversubscription, NOT collective/ICI overhead. The
        # curve validates the sharded code paths; the ≥80% north star is a
        # real-pod claim this box cannot measure.
        results["caveat"] = (
            f"{n_avail} virtual devices on {os.cpu_count()} physical cores; "
            "efficiency capped by host oversubscription, not collectives")
    base_train = base_sample = None
    sizes = [s for s in (1, 2, 4, 8) if s <= n_avail]
    for n in sizes:
        mesh = make_mesh(data=n, model=1, devices=jax.devices()[:n])
        tr = bench_training(mesh, fcfg, params, per_dev, max_n)
        sm = bench_sampling(mesh, fcfg, acfg, params, per_dev, max_n)
        if n == 1:
            base_train, base_sample = tr, sm
        row = {
            "devices": n,
            "train_steps_per_s": round(tr, 2),
            "graphs_per_s": round(sm, 1),
            # weak scaling: per-device batch fixed, so ideal TRAINING keeps
            # steps/s flat while the global batch grows n-fold; ideal
            # SAMPLING grows graphs/s n-fold.
            "train_scaling_eff": round(tr / base_train, 3),
            "sample_scaling_eff": round(sm / (base_sample * n), 3),
        }
        results["rows"].append(row)
        print(json.dumps(row), flush=True)
    print("SUMMARY " + json.dumps(results))
    # persist per backend: the ≥80% scaling-efficiency north star needs a
    # recorded artifact, not a scrollback line (round-1 verdict, weak #5)
    os.makedirs("runs", exist_ok=True)
    path = os.path.join("runs", f"scaling_{results['backend']}.json")
    with open(path, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {path}", flush=True)
    return results


if __name__ == "__main__":
    main()
