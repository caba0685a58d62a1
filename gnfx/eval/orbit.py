"""Python binding for the native orbit counter (native/orca/orbits.cpp).

The reference invokes the ORCA binary as a subprocess with edge-list files
(SURVEY.md §3d). Here the native code is a shared library called in-process
through ctypes — no serialisation, no process boundary, and the build is
cached. A pure-Python brute-force counter (O(n⁴) over 4-subsets) is kept as
the test oracle and as a fallback when no C++ toolchain exists.
"""

from __future__ import annotations

import ctypes
import itertools
import os
import subprocess
import threading

import networkx as nx
import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "orca", "orbits.cpp")
_BUILD_DIR = os.path.join(_REPO_ROOT, "native", "build")
_LIB_PATH = os.path.join(_BUILD_DIR, "liborbits.so")

_lock = threading.Lock()
_lib = None
_lib_failed = False


def _load_library():
    """Compile (if stale) and load the native library; None on failure."""
    global _lib, _lib_failed
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        try:
            os.makedirs(_BUILD_DIR, exist_ok=True)
            if (not os.path.exists(_LIB_PATH)
                    or os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)):
                subprocess.run(
                    ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
                     "-o", _LIB_PATH, _SRC],
                    check=True, capture_output=True, timeout=120,
                )
            lib = ctypes.CDLL(_LIB_PATH)
            lib.orbit_counts_4.restype = ctypes.c_int
            lib.orbit_counts_4.argtypes = [
                ctypes.c_int, ctypes.c_int,
                np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
                np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
                np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            ]
            _lib = lib
        except Exception:
            _lib_failed = True
            _lib = None
        return _lib


def orbit_counts(g: nx.Graph) -> np.ndarray:
    """Per-node 4-node-graphlet orbit counts, int64[n, 15] (orbits 0–14)."""
    g = nx.convert_node_labels_to_integers(g)
    n = g.number_of_nodes()
    if n == 0:
        return np.zeros((0, 15), np.int64)
    lib = _load_library()
    if lib is None:
        return orbit_counts_bruteforce(g)
    edges = np.asarray(list(g.edges()), np.int32).reshape(-1, 2)
    u = np.ascontiguousarray(edges[:, 0])
    v = np.ascontiguousarray(edges[:, 1])
    out = np.zeros((n, 15), np.int64)
    rc = lib.orbit_counts_4(n, len(edges), u, v, out)
    if rc != 0:
        raise RuntimeError(f"orbit_counts_4 failed with code {rc}")
    return out


def orbit_counts_many(graphs, max_workers: int | None = None) -> list:
    """`orbit_counts` over a list of graphs, parallel across host cores.

    ctypes releases the GIL for the duration of the native call and
    `orbit_counts_4` keeps all state on its own stack, so a THREAD pool
    gives true parallelism with zero pickling. Host orbit counting is the
    measured wall-clock bound of every big-N selection sweep (round-10:
    minutes per dense probe at N≈500 — it dwarfed device sampling), so this
    is the difference between a feasible and an infeasible protein
    stepsweep. Order-preserving; falls back to serial when the native
    library is unavailable (the brute-force path holds the GIL anyway)."""
    graphs = list(graphs)
    if _load_library() is None or len(graphs) < 2:
        return [orbit_counts(g) for g in graphs]
    import concurrent.futures

    if max_workers is None:
        max_workers = min(4, os.cpu_count() or 1, len(graphs))
    with concurrent.futures.ThreadPoolExecutor(max_workers) as ex:
        return list(ex.map(orbit_counts, graphs))


def using_native() -> bool:
    return _load_library() is not None


# ---------------------------------------------------------------------------
# brute-force oracle (tests / fallback)
# ---------------------------------------------------------------------------

# orbit assignment tables: (num_edges_in_induced_subgraph, node_degree) -> orbit
_ORBIT3 = {(2, 1): 1, (2, 2): 2, (3, 2): 3}
_ORBIT4 = {
    # P4 vs star share 3 edges; disambiguated by max degree below
    (4, 2): 8, (4, 1): 9, (4, 3): 11,   # C4 vs paw share 4 edges (see below)
    (5, 2): 12, (5, 3): 13,
    (6, 3): 14,
}


def orbit_counts_bruteforce(g: nx.Graph) -> np.ndarray:
    g = nx.convert_node_labels_to_integers(g)
    n = g.number_of_nodes()
    a = (nx.to_numpy_array(g) > 0).astype(np.int64)
    out = np.zeros((n, 15), np.int64)
    out[:, 0] = a.sum(axis=1)
    for comb in itertools.combinations(range(n), 3):
        sub = a[np.ix_(comb, comb)]
        e = int(sub.sum()) // 2
        if e < 2 or not _connected(sub):
            continue
        for i, v in enumerate(comb):
            out[v, _ORBIT3[(e, int(sub[i].sum()))]] += 1
    for comb in itertools.combinations(range(n), 4):
        sub = a[np.ix_(comb, comb)]
        e = int(sub.sum()) // 2
        if e < 3 or not _connected(sub):
            continue
        degs = sub.sum(axis=1).astype(int)
        for i, v in enumerate(comb):
            d = int(degs[i])
            if e == 3:  # P4 (max deg 2) vs star (max deg 3)
                if degs.max() == 3:
                    orb = 7 if d == 3 else 6
                else:
                    orb = 5 if d == 2 else 4
            elif e == 4:  # C4 (all deg 2) vs paw
                if degs.max() == 2:
                    orb = 8
                else:
                    orb = {1: 9, 2: 10, 3: 11}[d]
            else:
                orb = _ORBIT4[(e, d)]
            out[v, orb] += 1
    return out


def _connected(sub: np.ndarray) -> bool:
    k = sub.shape[0]
    seen = {0}
    frontier = [0]
    while frontier:
        i = frontier.pop()
        for j in range(k):
            if sub[i, j] and j not in seen:
                seen.add(j)
                frontier.append(j)
    return len(seen) == k
