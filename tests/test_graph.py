"""GraphBatch representation tests (SURVEY.md §4.1)."""

import jax.numpy as jnp
import networkx as nx
import numpy as np

from gnfx.graph import (
    GraphBatch,
    arrays_to_networkx,
    batch_from_dense,
    make_node_mask,
    networkx_to_arrays,
    pad_node_count,
)


def _toy_graphs():
    return [nx.cycle_graph(5), nx.path_graph(3), nx.complete_graph(4)]


def test_networkx_round_trip():
    graphs = _toy_graphs()
    adj, n_node = networkx_to_arrays(graphs, max_nodes=8)
    back = arrays_to_networkx(adj, n_node)
    for g0, g1 in zip(graphs, back):
        assert nx.is_isomorphic(g0, g1)


def test_mask_and_padding():
    graphs = _toy_graphs()
    adj, n_node = networkx_to_arrays(graphs, max_nodes=8)
    gb = batch_from_dense(adj, n_node)
    assert gb.node_mask.shape == (3, 8)
    np.testing.assert_array_equal(np.asarray(gb.n_node), [5, 3, 4])
    # padded rows/cols must be zero
    m = np.asarray(gb.node_mask)
    a = np.asarray(gb.adj)
    assert np.all(a * (1 - m[:, :, None]) == 0)
    assert np.all(a * (1 - m[:, None, :]) == 0)
    # degrees of cycle graph = 2 on real nodes
    deg = np.asarray(gb.degrees())
    np.testing.assert_allclose(deg[0, :5], 2.0)
    np.testing.assert_allclose(deg[0, 5:], 0.0)


def test_fully_connected():
    graphs = _toy_graphs()
    adj, n_node = networkx_to_arrays(graphs, max_nodes=8)
    gb = batch_from_dense(adj, n_node).fully_connected()
    a = np.asarray(gb.adj)
    # graph 1 has 3 real nodes: complete K3 without self loops
    expect = np.ones((3, 3)) - np.eye(3)
    np.testing.assert_allclose(a[1, :3, :3], expect)
    assert np.all(a[1, 3:, :] == 0) and np.all(a[1, :, 3:] == 0)


def test_make_node_mask():
    m = make_node_mask(jnp.array([2, 0, 4]), 4)
    np.testing.assert_array_equal(
        np.asarray(m), [[1, 1, 0, 0], [0, 0, 0, 0], [1, 1, 1, 1]]
    )


def test_pad_buckets():
    assert pad_node_count(13, [8, 16, 32]) == 16
    assert pad_node_count(16, [8, 16, 32]) == 16


def test_create_dataset_real_file_hook(tmp_path, monkeypatch):
    """docs/DATA.md: data/<name>.graphs.npz replaces the substitute
    generator (same return contract, max_nodes from the array)."""
    import networkx as nx
    import numpy as np

    from gnfx.data import create_dataset
    from gnfx.graph import networkx_to_arrays

    graphs = [nx.path_graph(k) for k in (3, 4, 5, 6, 7)]
    adj, n_node = networkx_to_arrays(graphs, 9)
    d = tmp_path / "data"
    d.mkdir()
    np.savez(d / "grid.graphs.npz", adj=adj, n_node=n_node)
    monkeypatch.chdir(tmp_path)

    train, test, max_n = create_dataset("grid", seed=0)
    assert max_n == 9
    assert len(train) == 4 and len(test) == 1
    # order preserved: the 80/20 split is in array order
    assert [g.number_of_nodes() for g in train] == [3, 4, 5, 6]
    assert test[0].number_of_nodes() == 7
    assert nx.is_isomorphic(test[0], nx.path_graph(7))
