"""Importance-weighted held-out NLL with particle sharding + resampling
collectives (SURVEY.md §2.2 'particle/SMC parallel'; BASELINE north star).

The two-stage model's marginal likelihood of a graph G integrates over node
embeddings:  p(G) = ∫ p_flow(x) · p(G | x) dx, with p(G|x) the decoder's
Bernoulli likelihood on real node pairs. Two estimators:

* ``iwae_log_prob`` — K-particle importance sampling with proposal
  q(x|G) = N(encoder(G), σ_q² I). Particles shard over the mesh's data
  axis inside `shard_map`; the global logsumexp is a `pmax` + `psum`
  (numerically stable streaming reduction over ICI).

* ``smc_log_prob`` — sequential Monte Carlo on the tempered path
  π_β(x) ∝ p_flow(x) · p(G|x)^β, β: 0 → 1. Each stage reweights by the
  incremental likelihood, systematically **resamples across all devices**
  when the global ESS drops below half (weights `all_gather`ed, every
  device deterministically picks its slice of the global resampled index
  set — the resampling collective), and rejuvenates with a random-walk MH
  move targeting π_β. log Z accumulates per-stage log-mean incremental
  weights.

Both run on a mesh of any size, including 1 (collectives are legal on a
1-device axis), and are exercised on the 8-fake-device CPU backend in CI.

**Estimator of record: IWAE** (``ESTIMATOR_OF_RECORD``). Measured on a
trained run (runs/community-small-pca/smc.json), SMC at matched particle
budgets sits 97-198 nats BELOW the IWAE bound at ~100x the cost — its
documented role is a cross-check of the IWAE number (an independent
estimator family agreeing within its gap), never the quoted NLL. Every
`heldout_graph_nll_*` field in results.json/BASELINE.md is IWAE.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from gnfx.config import AEConfig
from gnfx.graph import GraphBatch
from gnfx.models import autoencoder as ae
from gnfx.models.flow import FlowConfig, log_prob

# The quoted held-out NLL is always the IWAE bound (see module docstring);
# consumers (scripts/smc_smoke.py, results.json writers) stamp their output
# with this so a SMC number can never silently become the quoted NLL.
ESTIMATOR_OF_RECORD = "iwae"

_LOG_2PI = math.log(2.0 * math.pi)


def edge_log_lik(ae_params: dict | None, x: jax.Array, graph: GraphBatch,
                 acfg: AEConfig) -> jax.Array:
    """log p(G | x) per batch element: Bernoulli log-likelihood of the true
    adjacency under the edge decoder, over real pairs u<v."""
    logits = ae.decode_edge_logits(ae_params, acfg, x)
    labels = graph.adj
    # log σ(l)·A + log σ(−l)·(1−A)  =  −softplus(−l)·A − softplus(l)·(1−A)
    ll = -jax.nn.softplus(-logits) * labels - jax.nn.softplus(logits) * (1.0 - labels)
    mask = graph.node_mask[:, :, None] * graph.node_mask[:, None, :]
    mask = mask * jnp.triu(jnp.ones_like(mask), k=1)
    return jnp.sum(ll * mask, axis=(1, 2))


def _tile_graph(graph: GraphBatch, k: int) -> GraphBatch:
    """Broadcast a B=1 GraphBatch to B=k (same graph for every particle)."""
    return jax.tree.map(lambda a: jnp.broadcast_to(a, (k,) + a.shape[1:]), graph)


def _log_q(x: jax.Array, mu: jax.Array, sigma, graph: GraphBatch) -> jax.Array:
    per = -0.5 * (((x - mu) / sigma) ** 2 + _LOG_2PI) - jnp.log(sigma)
    return jnp.sum(per * graph.node_mask[..., None], axis=(1, 2))


def iwae_log_prob(
    flow_params: dict,
    ae_params: dict,
    fcfg: FlowConfig,
    acfg: AEConfig,
    graph: GraphBatch,           # B = 1
    num_particles: int,
    key: jax.Array,
    mesh: Mesh,
    *,
    sigma_q: float = 1.0,
) -> jax.Array:
    """IWAE-K estimate of log p(G), particles sharded over 'data'.

    Proposal: a K-component MIXTURE q(x|G) = (1/K)·Σ_j N(encoder_j(G), σ_q²I)
    where each component's mean is the frozen encoder run on an INDEPENDENT
    draw of random node features. The posterior p(x|G) ∝ p_flow(x)·p(G|x) is
    multimodal (every feature draw maps G to a different valid embedding) and
    sharply peaked when decoder_c is large; a single-Gaussian proposal around
    one draw misses the other modes and made the bound loose by thousands of
    nats on community-small. The mixture's log-density is tractable
    (logsumexp over the K gathered means), so this stays a valid IWAE bound
    for any σ_q. Particle means live device-local; the mixture evaluation
    `all_gather`s the K means over the data axis (tiny: K·N·D floats)."""
    n_dev = mesh.shape["data"]
    if num_particles % n_dev:
        raise ValueError(f"num_particles {num_particles} % data axis {n_dev} != 0")
    local_k = num_particles // n_dev

    graph_k = _tile_graph(graph, local_k)
    run = _iwae_runner(fcfg, acfg, num_particles, local_k, mesh)
    return run(flow_params, ae_params, graph_k, jnp.float32(sigma_q),
               jax.random.fold_in(key, 1))


_IWAE_RUNNERS: dict = {}


def _iwae_runner(fcfg, acfg, num_particles, local_k, mesh):
    """Jitted shard_map runner, cached by config so repeated calls (per
    graph, per proposal width) reuse ONE compilation — σ_q and all params
    are traced arguments, and the remote-relay compile is minutes-slow."""
    cache_key = (fcfg, acfg, num_particles, local_k, id(mesh))
    if cache_key in _IWAE_RUNNERS:
        return _IWAE_RUNNERS[cache_key]

    @jax.jit
    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    def run(flow_p, ae_p, graph_k, sigma_q, k):
        dev = jax.lax.axis_index("data")
        kk = jax.random.fold_in(k, dev)
        k_feat, k_eps = jax.random.split(kk)
        # per-particle proposal means: independent encoder feature draws
        feats = ae.random_node_features(k_feat, graph_k, acfg.feature_dim)
        mu_k = ae.encode(ae_p, acfg, feats, graph_k)      # [k_local, N, D]
        # match the flow's training target (centered embeddings); jitter is
        # absorbed by the proposal width sigma_q
        mu_k = ae.canonicalize_embeddings(mu_k, acfg, graph_k.node_mask)
        eps = jax.random.normal(k_eps, mu_k.shape) * graph_k.node_mask[..., None]
        x = mu_k + sigma_q * eps

        g_full = graph_k.fully_connected()
        lp_flow = log_prob(flow_p, fcfg, x, g_full)
        lp_edges = edge_log_lik(ae_p, x, graph_k, acfg)

        # mixture log q: logsumexp over ALL K global component means
        mu_all = jax.lax.all_gather(mu_k, "data", tiled=True)  # [K, N, D]
        mask = graph_k.node_mask[0][..., None]                 # [N, 1] (shared graph)
        diff = (x[:, None] - mu_all[None]) * mask              # [k_local, K, N, D]
        sq = jnp.sum(diff * diff, axis=(2, 3)) / (sigma_q * sigma_q)
        dims = jnp.sum(graph_k.node_mask[0]) * x.shape[-1]     # n_real · D
        log_norm = -0.5 * dims * (_LOG_2PI + 2.0 * jnp.log(sigma_q))
        lq = (jax.nn.logsumexp(-0.5 * sq, axis=1) + log_norm
              - math.log(num_particles))

        logw = lp_flow + lp_edges - lq
        # global streaming logsumexp over the data axis
        m = jax.lax.pmax(jnp.max(logw), "data")
        s = jax.lax.psum(jnp.sum(jnp.exp(logw - m)), "data")
        return m + jnp.log(s) - math.log(num_particles)

    _IWAE_RUNNERS[cache_key] = run
    return run


def systematic_resample_indices(norm_w: jax.Array, u: jax.Array) -> jax.Array:
    """Systematic resampling: K indices from normalised weights w (global),
    one shared uniform u ∈ [0,1). Deterministic given (w, u) — every device
    computes the same global index set."""
    k = norm_w.shape[0]
    positions = (u + jnp.arange(k)) / k
    cdf = jnp.cumsum(norm_w)
    return jnp.searchsorted(cdf, positions, side="right").clip(0, k - 1)


def smc_log_prob(
    flow_params: dict,
    ae_params: dict,
    fcfg: FlowConfig,
    acfg: AEConfig,
    graph: GraphBatch,           # B = 1
    num_particles: int,
    key: jax.Array,
    mesh: Mesh,
    *,
    num_stages: int = 8,
    sigma_q: float = 1.0,
    mh_step: float = 0.2,
    ess_frac: float = 0.5,
) -> jax.Array:
    """SMC estimate of log p(G) over the tempered path, with cross-device
    systematic resampling and an MH rejuvenation move per stage."""
    n_dev = mesh.shape["data"]
    if num_particles % n_dev:
        raise ValueError(f"num_particles {num_particles} % data axis {n_dev} != 0")
    local_k = num_particles // n_dev

    feats = ae.random_node_features(jax.random.fold_in(key, 0), graph,
                                    acfg.feature_dim)
    mu = ae.encode(ae_params, acfg, feats, graph)
    mu = ae.canonicalize_embeddings(mu, acfg, graph.node_mask)
    graph_k = _tile_graph(graph, local_k)
    mu_k = jnp.broadcast_to(mu, (local_k,) + mu.shape[1:])

    run = _smc_runner(fcfg, acfg, num_particles, local_k, num_stages, mesh)
    return run(flow_params, ae_params, graph_k, mu_k, jnp.float32(sigma_q),
               jnp.float32(mh_step), jnp.float32(ess_frac),
               jax.random.fold_in(key, 1))


_SMC_RUNNERS: dict = {}


def _smc_runner(fcfg, acfg, num_particles, local_k, num_stages, mesh):
    """Jitted shard_map SMC runner, cached by config like `_iwae_runner`
    (the remote-relay compile is minutes-slow; σ_q / MH step / ESS fraction
    and all params are traced arguments, so one compilation serves every
    call at a given particle layout and graph shape)."""
    cache_key = (fcfg, acfg, num_particles, local_k, num_stages, id(mesh))
    if cache_key in _SMC_RUNNERS:
        return _SMC_RUNNERS[cache_key]

    @jax.jit
    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P(), P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    def run(flow_p, ae_p, graph_k, mu_k, sigma_q, mh_step, ess_frac, k):
        mask_k = graph_k.node_mask[..., None]
        g_full_k = graph_k.fully_connected()
        betas = jnp.linspace(0.0, 1.0, num_stages + 1)

        def target_logp(x, beta):
            return (log_prob(flow_p, fcfg, x, g_full_k)
                    + beta * edge_log_lik(ae_p, x, graph_k, acfg))

        dev = jax.lax.axis_index("data")
        k_init, k_scan = jax.random.split(jax.random.fold_in(k, dev))
        # init from the proposal; initial weights target π_0 = p_flow
        x0 = mu_k + sigma_q * jax.random.normal(k_init, mu_k.shape) * mask_k
        logw0 = (log_prob(flow_p, fcfg, x0, g_full_k)
                 - _log_q(x0, mu_k, sigma_q, graph_k))
        # normalise stage 0 into the running logZ
        m0 = jax.lax.pmax(jnp.max(logw0), "data")
        s0 = jax.lax.psum(jnp.sum(jnp.exp(logw0 - m0)), "data")
        logz0 = m0 + jnp.log(s0) - math.log(num_particles)
        logw0 = logw0 - (m0 + jnp.log(s0))   # normalised log-weights (global)

        def stage(carry, inp):
            x, logw, logz = carry
            beta_prev, beta, k_s = inp
            # incremental weight: p(G|x)^{Δβ}
            inc = (beta - beta_prev) * edge_log_lik(ae_p, x, graph_k, acfg)
            new_logw = logw + inc
            m = jax.lax.pmax(jnp.max(new_logw), "data")
            s = jax.lax.psum(jnp.sum(jnp.exp(new_logw - m)), "data")
            logz = logz + m + jnp.log(s)          # Σ_k w_k·inc (normalised w)
            logw_n = new_logw - (m + jnp.log(s))  # renormalised

            # global ESS
            ess = 1.0 / jax.lax.psum(jnp.sum(jnp.exp(2.0 * logw_n)), "data")

            # systematic resampling across all devices
            k_res, k_mh1, k_mh2 = jax.random.split(jax.random.fold_in(k_s, 0), 3)
            w_all = jax.lax.all_gather(jnp.exp(logw_n), "data", tiled=True)
            x_all = jax.lax.all_gather(x, "data", tiled=True)
            u = jax.random.uniform(k_res, ())      # same key on every device
            idx_all = systematic_resample_indices(w_all, u)
            my_idx = jax.lax.dynamic_slice_in_dim(idx_all, dev * local_k, local_k)

            do_resample = ess < ess_frac * num_particles
            x_rs = jnp.where(do_resample, x_all[my_idx], x)
            logw_rs = jnp.where(
                do_resample,
                jnp.full_like(logw_n, -math.log(num_particles)),
                logw_n,
            )

            # MH rejuvenation targeting π_β (device-local; chains independent)
            k_mh1 = jax.random.fold_in(k_mh1, dev)
            k_mh2 = jax.random.fold_in(k_mh2, dev)
            prop = x_rs + mh_step * jax.random.normal(k_mh1, x_rs.shape) * mask_k
            lp_cur = target_logp(x_rs, beta)
            lp_prop = target_logp(prop, beta)
            accept = (jnp.log(jax.random.uniform(k_mh2, lp_cur.shape))
                      < lp_prop - lp_cur)
            x_new = jnp.where(accept[:, None, None], prop, x_rs)
            return (x_new, logw_rs, logz), ess

        keys = jax.random.split(k_scan, num_stages)
        (x, logw, logz), _ = jax.lax.scan(
            stage, (x0, logw0, logz0),
            (betas[:-1], betas[1:], keys),
        )
        return logz

    _SMC_RUNNERS[cache_key] = run
    return run


def heldout_nll_iwae(
    flow_params, ae_params, fcfg, acfg, graphs: GraphBatch,
    num_particles: int, key: jax.Array, mesh: Mesh,
    sigma_grid: Tuple[float, ...] = (1.0, 0.3, 0.1, 0.03),
    **kw,
) -> jax.Array:
    """Mean IWAE held-out NLL over a batch of graphs (loops on the host;
    each graph's particles are device-sharded).

    Each IWAE-K run is a valid lower bound on log p(G) for ANY proposal
    width, so per graph we take the tightest bound over a small σ_q grid:
    sharp decoders (large decoder_c) concentrate the posterior far below
    the σ_q=1 default, and a mismatched proposal makes the bound loose by
    thousands of nats."""
    out = []
    for b in range(graphs.batch_size):
        g1 = jax.tree.map(lambda a, b=b: a[b : b + 1], graphs)
        best = None
        for sigma_q in sigma_grid:
            lp = iwae_log_prob(flow_params, ae_params, fcfg, acfg, g1,
                               num_particles, jax.random.fold_in(key, b),
                               mesh, sigma_q=sigma_q, **kw)
            best = lp if best is None else jnp.maximum(best, lp)
        out.append(-best)
    return jnp.stack(out)
