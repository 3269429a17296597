"""Connected components: chains, cycles, stars, determinism."""

from bern_spark.operators.cc import connected_components


def _cc(spark, edges, **kw):
    df = spark.createDataFrame(edges, ["src", "dst"])
    return {r.node: r.cluster_id for r in connected_components(df, **kw).collect()}


def test_chain(spark):
    got = _cc(spark, [("b", "a"), ("c", "b"), ("d", "c")])
    assert got == {"a": "a", "b": "a", "c": "a", "d": "a"}


def test_cycle_and_self_loop(spark):
    got = _cc(spark, [("a", "b"), ("b", "c"), ("c", "a"), ("z", "z")])
    assert got["a"] == got["b"] == got["c"] == "a"
    assert got["z"] == "z"


def test_two_components(spark):
    got = _cc(spark, [("a", "b"), ("x", "y")])
    assert got["a"] == got["b"] == "a"
    assert got["x"] == got["y"] == "x"


def test_star_and_long_path(spark):
    edges = [("hub", f"leaf{i}") for i in range(20)]
    edges += [(f"p{i}", f"p{i+1}") for i in range(12)]
    got = _cc(spark, edges)
    assert all(got[f"leaf{i}"] == "hub" for i in range(20))
    assert len({got[f"p{i}"] for i in range(13)}) == 1


def test_determinism(spark):
    edges = [("b", "a"), ("c", "b"), ("d", "a"), ("x", "y"), ("y", "z")]
    assert _cc(spark, edges) == _cc(spark, list(reversed(edges)))
