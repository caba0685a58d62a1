"""Protocol pins (docs/PROTOCOL.md): the exact-EMD closed form is
cross-checked against an INDEPENDENT sequential mass-transport
implementation, and the kernel constants are pinned so an accidental
σ/binning change cannot slip through silently."""

import numpy as np
import pytest

from gnfx.eval.mmd import (
    clustering_stats, compute_mmd, degree_stats, emd_1d, gaussian_emd_kernel,
)


def sequential_transport_emd(p, q, bin_dist=1.0):
    """1-D EMD by explicit greedy transport: walk the bins left to right
    carrying the running surplus; each unit of surplus carried across a bin
    boundary costs `bin_dist`. This is the textbook optimal plan for a
    linear ground metric — an independent derivation of the CDF formula
    (docs/PROTOCOL.md §3), sharing no code with emd_1d."""
    p = np.asarray(p, np.float64)
    q = np.asarray(q, np.float64)
    if p.sum() > 0:
        p = p / p.sum()
    if q.sum() > 0:
        q = q / q.sum()
    cost, carry = 0.0, 0.0
    for i in range(len(p)):
        carry += p[i] - q[i]
        cost += abs(carry) * bin_dist
    return cost


@pytest.mark.parametrize("seed", range(5))
def test_emd_1d_matches_independent_transport(seed):
    rng = np.random.default_rng(seed)
    for _ in range(20):
        n = rng.integers(2, 40)
        p = rng.random(n) * (rng.random(n) < 0.7)
        q = rng.random(n) * (rng.random(n) < 0.7)
        for bd in (1.0, 0.01):
            assert emd_1d(p, q, bd) == pytest.approx(
                sequential_transport_emd(p, q, bd), abs=1e-12)


def test_emd_point_masses_distance():
    # point masses k bins apart: W1 = k * bin_dist exactly
    p = np.zeros(10); p[1] = 1.0
    q = np.zeros(10); q[7] = 1.0
    assert emd_1d(p, q, 1.0) == pytest.approx(6.0)
    assert emd_1d(p, q, 0.01) == pytest.approx(0.06)


def test_protocol_constants_pinned():
    """The three kernels' constants (docs/PROTOCOL.md §2), checked through
    observable kernel values rather than by reading source constants."""
    # degree: sigma=1, bin_dist=1 -> point masses 1 bin apart: k = exp(-1/2)
    k_deg = gaussian_emd_kernel(sigma=1.0, bin_dist=1.0)
    p = np.zeros(4); p[0] = 1.0
    q = np.zeros(4); q[1] = 1.0
    assert k_deg(p, q) == pytest.approx(np.exp(-0.5))

    # clustering: sigma=0.1, bin_dist=1/100 -> masses 100 bins apart (the
    # full [0,1] axis): W1 = 1.0, k = exp(-1/(2*0.01)) = exp(-50)
    k_clus = gaussian_emd_kernel(sigma=0.1, bin_dist=1.0 / 100)
    p = np.zeros(101); p[0] = 1.0
    q = np.zeros(101); q[100] = 1.0
    assert k_clus(p, q) == pytest.approx(np.exp(-50.0), rel=1e-9)


def test_mmd_is_biased_v_statistic():
    """V-statistic includes self-pairs: for a 1-point set against itself,
    MMD² = k(x,x) + k(x,x) - 2k(x,x) = 0; for two distinct 1-point sets,
    MMD² = 2 - 2k(x,y) (k(x,x)=k(y,y)=1 for any translation-invariant
    kernel). A U-statistic would be undefined (0/0) at m=1 — the formula
    below only holds for the V-form."""
    k = gaussian_emd_kernel(sigma=1.0, bin_dist=1.0)
    x = np.array([1.0, 0.0, 0.0])
    y = np.array([0.0, 0.0, 1.0])
    assert compute_mmd([x], [x], k) == pytest.approx(0.0, abs=1e-12)
    assert compute_mmd([x], [y], k) == pytest.approx(2.0 - 2.0 * k(x, y))


def test_degree_support_is_union():
    """Degree histograms share the max-degree support across BOTH sets;
    a generated set with a higher max degree must not be clipped."""
    import networkx as nx
    ref = [nx.path_graph(4)] * 3          # max degree 2
    gen = [nx.star_graph(5)] * 3          # max degree 5
    v = degree_stats(ref, gen)
    assert np.isfinite(v) and v > 0.0


def test_clustering_disjoint_supports_saturate():
    """docs/PROTOCOL.md §4: disjoint clustering supports (grids vs
    triangle-rich graphs) drive the MMD toward its ~2 saturation."""
    import networkx as nx
    grids = [nx.grid_2d_graph(3, 4)] * 4                  # all coeffs 0
    tris = [nx.complete_graph(5)] * 4                     # all coeffs 1
    v = clustering_stats(grids, tris)
    assert v == pytest.approx(2.0, abs=1e-6)
