"""MMD evaluation — the GraphRNN protocol (SURVEY.md §2.1 #9, §3d).

Squared MMD between the statistic distributions of two graph sets, with the
Gaussian-EMD kernel:  k(p, q) = exp(−W₁(p, q)² / (2σ²)), where W₁ is the
1-D Wasserstein distance between histograms — computed exactly as the L1
distance of CDFs times bin width (no pyemd dependency; for 1-D histograms
this equals the reference's `pyemd.emd` with a linear ground distance).

Statistics (GraphRNN protocol, which the GNF paper states it follows —
SURVEY.md §6 MMD-parity note):
  * degree      — per-graph degree histogram, common support [0, max_deg],
                  normalised; σ = 1.0, linear bin distance.
  * clustering  — per-graph histogram of clustering coefficients, 100 bins
                  on [0, 1]; σ = 0.1, bin distance scaled by the bin count.
  * orbit       — mean 4-node-graphlet orbit-count vector per graph (via the
                  native orca counter, gnfx.eval.orbit); plain Gaussian-RBF
                  kernel on the vectors, σ = 30.

The estimator is the biased V-statistic (pairs include self-pairs), matching
the protocol.
"""

from __future__ import annotations

from typing import Callable, List, Sequence

import networkx as nx
import numpy as np


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

def emd_1d(p: np.ndarray, q: np.ndarray, bin_dist: float = 1.0) -> float:
    """Exact 1-D earth mover's distance between histograms on a shared
    support with uniform neighbouring-bin ground distance `bin_dist`.
    Histograms are normalised to probability vectors first (empty -> uniform
    agreement, distance 0)."""
    ps, qs = p.sum(), q.sum()
    p = p / ps if ps > 0 else p
    q = q / qs if qs > 0 else q
    return float(np.abs(np.cumsum(p - q)).sum() * bin_dist)


def gaussian_emd_kernel(sigma: float = 1.0, bin_dist: float = 1.0) -> Callable:
    def k(p, q):
        d = emd_1d(p, q, bin_dist)
        return np.exp(-d * d / (2.0 * sigma * sigma))
    return k


def gaussian_rbf_kernel(sigma: float = 1.0) -> Callable:
    def k(x, y):
        d = np.linalg.norm(np.asarray(x, np.float64) - np.asarray(y, np.float64))
        return np.exp(-d * d / (2.0 * sigma * sigma))
    return k


def compute_mmd(
    samples1: Sequence[np.ndarray],
    samples2: Sequence[np.ndarray],
    kernel: Callable,
) -> float:
    """Biased squared-MMD V-statistic between two sets of statistic vectors."""
    def disc(a, b):
        total = 0.0
        for x in a:
            for y in b:
                total += kernel(x, y)
        return total / (len(a) * len(b))

    return disc(samples1, samples1) + disc(samples2, samples2) - 2.0 * disc(
        samples1, samples2
    )


# ---------------------------------------------------------------------------
# graph statistics
# ---------------------------------------------------------------------------

def _degree_hists(graphs: Sequence[nx.Graph], max_deg: int) -> List[np.ndarray]:
    out = []
    for g in graphs:
        degs = [d for _, d in g.degree()]
        out.append(np.bincount(degs, minlength=max_deg + 1).astype(np.float64))
    return out


def degree_stats(graphs_ref: Sequence[nx.Graph], graphs_gen: Sequence[nx.Graph]) -> float:
    """MMD over degree histograms (σ=1, linear bin distance)."""
    if not graphs_ref or not graphs_gen:
        return float("nan")
    max_deg = max(
        max((d for _, d in g.degree()), default=0)
        for g in list(graphs_ref) + list(graphs_gen)
    )
    h1 = _degree_hists(graphs_ref, max_deg)
    h2 = _degree_hists(graphs_gen, max_deg)
    return compute_mmd(h1, h2, gaussian_emd_kernel(sigma=1.0))


def _clustering_hists(graphs: Sequence[nx.Graph], bins: int) -> List[np.ndarray]:
    out = []
    for g in graphs:
        coeffs = list(nx.clustering(g).values())
        hist, _ = np.histogram(coeffs, bins=bins, range=(0.0, 1.0), density=False)
        out.append(hist.astype(np.float64))
    return out


def clustering_stats(
    graphs_ref: Sequence[nx.Graph], graphs_gen: Sequence[nx.Graph], bins: int = 100
) -> float:
    """MMD over clustering-coefficient histograms (σ=0.1, distance scaled by
    bin count — the protocol's `distance_scaling=bins` with support [0,1])."""
    if not graphs_ref or not graphs_gen:
        return float("nan")
    h1 = _clustering_hists(graphs_ref, bins)
    h2 = _clustering_hists(graphs_gen, bins)
    return compute_mmd(h1, h2, gaussian_emd_kernel(sigma=0.1, bin_dist=1.0 / bins))


def orbit_stats(
    graphs_ref: Sequence[nx.Graph], graphs_gen: Sequence[nx.Graph],
    sigma: float = 30.0,
) -> float:
    """MMD over mean 4-node-orbit-count vectors (Gaussian RBF, σ=30).
    Orbit counting runs through the native counter (gnfx.eval.orbit)."""
    from gnfx.eval.orbit import orbit_counts_many

    if not graphs_ref or not graphs_gen:
        return float("nan")

    def mean_orbits(graphs):
        # threaded across host cores — counting is the wall-clock bound of
        # every big-N selection sweep (see orbit_counts_many)
        return [counts.mean(axis=0) if len(counts) else np.zeros(15)
                for counts in orbit_counts_many(graphs)]

    return compute_mmd(mean_orbits(graphs_ref), mean_orbits(graphs_gen),
                       gaussian_rbf_kernel(sigma=sigma))


def evaluate_generated(
    graphs_ref: Sequence[nx.Graph],
    graphs_gen: Sequence[nx.Graph],
    *,
    include_orbit: bool = True,
) -> dict:
    """The full protocol: degree / clustering / (orbit) MMDs + basic sanity
    statistics of the generated set."""
    gen_nodes = [g.number_of_nodes() for g in graphs_gen]
    gen_edges = [g.number_of_edges() for g in graphs_gen]
    out = {
        "mmd_degree": degree_stats(graphs_ref, graphs_gen),
        "mmd_clustering": clustering_stats(graphs_ref, graphs_gen),
        "gen_mean_nodes": float(np.mean(gen_nodes)) if gen_nodes else 0.0,
        "gen_mean_edges": float(np.mean(gen_edges)) if gen_edges else 0.0,
        "gen_frac_connected": float(
            np.mean([nx.is_connected(g) if g.number_of_nodes() > 0 else 0.0
                     for g in graphs_gen])
        ) if graphs_gen else 0.0,
    }
    if include_orbit:
        out["mmd_orbit"] = orbit_stats(graphs_ref, graphs_gen)
    return out
