"""Property-based specs for the LLM-pipeline operators: Spark must agree
with a naive Python model on arbitrary inputs."""

from __future__ import annotations

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from kafka_to_nexus_spark.llm import dedup, similarity

PROP_SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

edge_lists = st.lists(
    st.tuples(st.integers(0, 12), st.integers(0, 12)).filter(lambda e: e[0] != e[1]),
    min_size=0,
    max_size=10,
)


def _model_components(edges: list[tuple[int, int]], vertices: list[int]) -> dict:
    parent = {v: v for v in vertices}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical = min member of each set
    comp: dict[int, int] = {}
    for v in vertices:
        root = find(v)
        members = [u for u in vertices if find(u) == root]
        comp[v] = min(members)
    return comp


@given(edge_lists)
@PROP_SETTINGS
def test_connected_components_matches_union_find(spark, edges):
    vertices = list(range(13))
    e = [(min(a, b), max(a, b)) for a, b in edges]
    edf = (
        spark.createDataFrame(e, ["id_a", "id_b"])
        if e
        else spark.createDataFrame([], "id_a long, id_b long")
    )
    vdf = spark.createDataFrame([(v,) for v in vertices], ["doc_id"])
    got = {
        r.doc_id: r.component_id
        for r in dedup.connected_components(edf, vdf).collect()
    }
    assert got == _model_components(e, vertices)


vectors = st.lists(
    st.lists(st.floats(-8, 8, allow_nan=False, width=32), min_size=8, max_size=8),
    min_size=1,
    max_size=6,
)


@given(vectors)
@PROP_SETTINGS
def test_srp_signature_matches_numpy_model(spark, vecs):
    planes = similarity.srp_planes(8, 8)
    H = np.array(planes)
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    got = {
        r.vec_id: r.srp_sig
        for r in similarity.srp_signatures(df, bits=8, dim=8).collect()
    }
    for i, v in enumerate(vecs):
        arr = np.asarray(v, dtype=np.float64)
        expect = sum(int(H[j] @ arr >= 0) << j for j in range(8))
        assert got[i] == expect
