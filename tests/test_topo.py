"""DAG layering (extras/graph.dag_layers) — exact levels, bounded-round
saturation, isolated-node handling."""

import pyarrow as pa
import ray.data as rd

from anonymization_ray.extras.graph import dag_layers


def _layers(edges, rounds, nodes=None):
    eds = rd.from_arrow(
        pa.table(
            {
                "u": pa.array([e[0] for e in edges], pa.int64()),
                "v": pa.array([e[1] for e in edges], pa.int64()),
            }
        )
    )
    nds = (
        rd.from_arrow(pa.table({"node": pa.array(nodes, pa.int64())}))
        if nodes is not None
        else None
    )
    got = dag_layers(eds, rounds=rounds, nodes=nds).to_pandas()
    return dict(zip(got.node, got.layer))


def test_diamond_dag_levels():
    #   1 -> 2 -> 4,  1 -> 3 -> 4 -> 5; longest path to 5 has 3 edges
    got = _layers([(1, 2), (1, 3), (2, 4), (3, 4), (4, 5)], rounds=6)
    assert got == {1: 0, 2: 1, 3: 1, 4: 2, 5: 3}


def test_bounded_rounds_truncate_depth():
    # chain of length 5; 2 rounds see paths of at most 2 edges
    chain = [(i, i + 1) for i in range(5)]
    got = _layers(chain, rounds=2)
    assert got == {0: 0, 1: 1, 2: 2, 3: 2, 4: 2, 5: 2}
    # enough rounds recover the true layering
    assert _layers(chain, rounds=5) == {i: i for i in range(6)}


def test_isolated_nodes_layer_zero():
    got = _layers([(1, 2)], rounds=3, nodes=[1, 2, 9])
    assert got == {1: 0, 2: 1, 9: 0}


def test_cycle_saturates_at_rounds():
    # a cycle is a contract violation; bounded rounds still terminate,
    # saturating the cycle's layers at `rounds`
    got = _layers([(1, 2), (2, 1)], rounds=4)
    assert got == {1: 4, 2: 4}
