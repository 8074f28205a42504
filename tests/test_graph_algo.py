"""Graph-algorithm unit tests: BFS reachability, iterative orphan prune,
dead-letter accounting."""

from __future__ import annotations

import pyarrow as pa
import ray.data

from clangd_to_neo4j_ray.stages.graph_algo import (
    prune_orphans_to_fixpoint,
    reachable_from,
)


def test_reachable_from_hop_distances():
    edges = ray.data.from_arrow(
        pa.table(
            {
                "src": ["a", "b", "c", "x"],
                "dst": ["b", "c", "a", "y"],
            }
        )
    )
    dist = reachable_from(edges, {"a"})
    assert dist == {"a": 0, "b": 1, "c": 2}


def test_prune_orphans_iterative():
    # chain a->b plus orphan o1; removing o1 leaves a,b intact;
    # then a dangling chain c (node without edges) cascades out
    nodes = ray.data.from_arrow(
        pa.table(
            {
                "node_id": ["a", "b", "o1", "c"],
                "label": ["N"] * 4,
                "name": ["a", "b", "o1", "c"],
            }
        )
    )
    edges = ray.data.from_arrow(
        pa.table({"src": ["a", "b"], "type": ["E", "E"], "dst": ["b", "c"]})
    )
    n2, e2 = prune_orphans_to_fixpoint(nodes, edges)
    ids = {r["node_id"] for r in n2.take_all()}
    assert ids == {"a", "b", "c"}  # all edge-incident; only o1 pruned
    assert e2.count() == 2


def test_dead_letter_rows_emitted():
    """Drop-vs-error policy (SURVEY §7.5): a pronoun sentence with no
    preceding anchored subject becomes a dead-letter row, not a silent drop."""
    from clangd_to_neo4j_ray.stages.canonicalize import dead_letter_stats
    from clangd_to_neo4j_ray.stages.linking import DEAD_LETTER, EntityLinker

    lut = {"Gamma": "e3"}
    linker = EntityLinker(lut)
    mentions, triples = linker.link_text("u1", "It links to Gamma.")
    assert len(triples) == 1
    assert triples[0][0] is None and triples[0][1] == DEAD_LETTER

    cand = ray.data.from_arrow(
        pa.table(
            {
                "subj": pa.array([None, "s"], type=pa.string()),
                "pred": pa.array([DEAD_LETTER, "links_to"], type=pa.string()),
                "obj": pa.array(["e3", "e4"], type=pa.string()),
                "evidence_url": pa.array(["u1", "u2"], type=pa.string()),
            }
        )
    )
    stats = dead_letter_stats(cand)
    assert stats["n"][0].as_py() == 1


def test_reachable_join_path_equals_broadcast_path():
    """VERDICT r2 #3: with broadcast_threshold=0 every frontier/visited set
    exceeds the threshold, so the whole BFS runs on bucketed semi/anti
    joins with nothing collected to the driver mid-loop — and must equal
    the broadcast fast path and a single-process BFS exactly."""
    import random

    import pandas as pd
    import ray.data

    from clangd_to_neo4j_ray.stages.graph_algo import reachable_from

    rng = random.Random(5)
    nodes = [f"n{i:03d}" for i in range(60)]
    edges = [
        (nodes[rng.randrange(60)], nodes[rng.randrange(60)]) for _ in range(120)
    ]
    # ensure a long chain so several hops happen
    edges += [(nodes[i], nodes[i + 1]) for i in range(0, 8)]
    df = pd.DataFrame(edges, columns=["src", "dst"])
    ds = ray.data.from_pandas(df)

    # single-process reference BFS
    adj: dict[str, set] = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
    exp = {"n000": 0}
    frontier = {"n000"}
    hop = 0
    while frontier and hop < 25:
        hop += 1
        nxt = set()
        for f in frontier:
            nxt |= adj.get(f, set())
        frontier = nxt - set(exp)
        for n in frontier:
            exp[n] = hop

    got_join = reachable_from(ds, {"n000"}, broadcast_threshold=0)
    got_bcast = reachable_from(ds, {"n000"}, broadcast_threshold=10**6)
    assert got_join == exp
    assert got_bcast == exp


def test_connected_components_multi_component_both_paths():
    """A 3-component graph (chain, triangle+pendant, isolated self-loop):
    labels must be each component's min name, identical on the driver
    union-find fast path and the forced distributed label-propagation
    path (threshold 1)."""
    import pyarrow as pa
    import ray.data

    from clangd_to_neo4j_ray.stages.graph_algo import connected_components_ds

    edges = [
        ("b", "a"), ("b", "c"), ("c", "d"),          # chain a-b-c-d
        ("x", "y"), ("y", "z"), ("z", "x"), ("z", "w"),  # triangle + pendant
        ("m", "m"),                                   # self-loop
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([e[0] for e in edges], type=pa.string()),
                "dst": pa.array([e[1] for e in edges], type=pa.string()),
            }
        )
    )
    expected = {
        "a": "a", "b": "a", "c": "a", "d": "a",
        "x": "w", "y": "w", "z": "w", "w": "w",
        "m": "m",
    }
    for thr in (100_000, 1):  # fast path, then forced label propagation
        out = connected_components_ds(ds, broadcast_threshold=thr).to_pandas()
        got = dict(zip(out["node"], out["label"]))
        assert got == expected, (thr, got)


def test_pagerank_star_graph_both_paths():
    """Star graph (spokes -> hub): the hub must outrank every spoke, ranks
    must be identical on the driver fast path and the forced distributed
    path, and the integer arithmetic must match a hand computation."""
    import pyarrow as pa
    import ray.data

    from clangd_to_neo4j_ray.stages.graph_algo import (
        PR_ITERS,
        PR_SCALE,
        pagerank_ds,
    )

    spokes = [f"s{i}" for i in range(4)]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array(spokes, type=pa.string()),
                "dst": pa.array(["hub"] * 4, type=pa.string()),
            }
        )
    )
    # hand-rolled reference of the exact integer recurrence
    n = 5
    init = PR_SCALE // n
    tele = (15 * init) // 100
    pr = {x: init for x in spokes + ["hub"]}
    for _ in range(PR_ITERS):
        nxt = {}
        for x in spokes + ["hub"]:
            s = sum(pr[sp] // 1 for sp in spokes) if x == "hub" else 0
            nxt[x] = tele + (85 * s) // 100
        pr = nxt
    for thr in (100_000, 1):
        out = pagerank_ds(ds, broadcast_threshold=thr).to_pandas()
        got = dict(zip(out["node"], out["pr_scaled"]))
        assert got == pr, (thr, got, pr)
    assert pr["hub"] > pr["s0"]


def test_connected_components_chain_converges_logarithmically():
    """A 64-node path graph under the forced distributed path with
    max_rounds=10: plain min-propagation would need ~63 rounds, so this
    passing proves the pointer-jumping (label-of-label) chase gives
    O(log n) convergence; non-convergence raises rather than returning
    partial labels."""
    import pyarrow as pa
    import ray.data

    from clangd_to_neo4j_ray.stages.graph_algo import connected_components_ds

    n = 64
    names = [f"n{i:03d}" for i in range(n)]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array(names[:-1], type=pa.string()),
                "dst": pa.array(names[1:], type=pa.string()),
            }
        )
    )
    out = connected_components_ds(
        ds, broadcast_threshold=1, max_rounds=10
    ).to_pandas()
    assert set(out["label"]) == {"n000"}
    assert len(out) == n


def test_connected_components_delta_rounds_shrink_edge_input():
    """Delta rounds (VERDICT r4 next #4): on a chain plus a large
    already-converged clique-free blob (star), the contribution join's
    per-round input edge count must be full |und| on round 1 and then
    strictly smaller in later rounds as nodes stop changing; the labels
    stay exact."""
    import pyarrow as pa
    import ray.data

    from clangd_to_neo4j_ray.stages.graph_algo import connected_components_ds

    n = 32
    names = [f"c{i:03d}" for i in range(n)]
    # chain c000-..-c031 plus star hub a00 with 40 leaves (converges fast)
    src = names[:-1] + ["a00"] * 40
    dst = names[1:] + [f"leaf{i:02d}" for i in range(40)]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array(src, type=pa.string()),
                "dst": pa.array(dst, type=pa.string()),
            }
        )
    )
    counts: list[int] = []
    out = connected_components_ds(
        ds, broadcast_threshold=1, max_rounds=12, round_edge_counts=counts
    ).to_pandas()
    labels = dict(zip(out["node"], out["label"]))
    assert all(labels[nm] == "c000" for nm in names)
    assert labels["a00"] == "a00" and labels["leaf00"] == "a00"
    # round 1 sees the full undirected edge set; the star converges after
    # round 1, so every later round's contribution input must be smaller
    assert counts[0] == 2 * len(src)
    assert len(counts) >= 3
    assert all(c < counts[0] for c in counts[1:])
    # and it keeps shrinking toward convergence (monotone non-increasing
    # tail is too strict for pointer jumping; require the last round to be
    # far below the first delta round)
    assert counts[-1] <= counts[1]


def test_triangles_handcrafted_graph():
    """K3 {a,b,c} plus pendant d on c, plus a triangle-free star at e:
    exact counts, degrees, and permille coefficients; direction and
    duplicate edges must not matter.  Driver and distributed paths must
    agree (threshold 0 forces the distributed plan)."""
    from clangd_to_neo4j_ray.stages.graph_algo import triangles_ds

    ds = ray.data.from_arrow(
        pa.table(
            {
                "src": ["a", "b", "a", "c", "c", "e", "e", "b"],
                "dst": ["b", "c", "c", "d", "a", "x", "y", "a"],
            }
        )
    )
    for thr in (100_000, 0):
        out = {
            r["node"]: (
                r["degree"], r["n_triangles"], r["clustering_permille"]
            )
            for r in triangles_ds(ds, broadcast_threshold=thr).take_all()
        }
        _check_triangle_fixture(out)


def _check_triangle_fixture(out):
    assert out["a"] == (2, 1, 1000)
    assert out["b"] == (2, 1, 1000)
    # c has degree 3 (a, b, d): 1 triangle of 3 possible pairs -> 333
    assert out["c"] == (3, 1, 333)
    assert out["d"] == (1, 0, 0)
    assert out["e"] == (2, 0, 0)
    assert out["x"] == (1, 0, 0)


def test_triangles_self_loops_dropped():
    from clangd_to_neo4j_ray.stages.graph_algo import triangles_ds

    ds = ray.data.from_arrow(
        pa.table({"src": ["a", "a", "b"], "dst": ["a", "b", "c"]})
    )
    for thr in (100_000, 0):
        out = {
            r["node"]: r["n_triangles"]
            for r in triangles_ds(ds, broadcast_threshold=thr).take_all()
        }
        assert out == {"a": 0, "b": 0, "c": 0}


def test_hits_both_paths_agree():
    """HITS: forced-distributed path (threshold 0) must equal the driver
    numpy kernel bit-for-bit; hub/authority ordering sanity on a small
    bipartite graph (h1 links to both authorities, h2 to one)."""
    from clangd_to_neo4j_ray.stages.graph_algo import hits_ds

    ds = ray.data.from_arrow(
        pa.table(
            {
                "src": ["h1", "h1", "h2"],
                "dst": ["a1", "a2", "a1"],
            }
        )
    )
    drv = {
        r["node"]: (r["auth_scaled"], r["hub_scaled"])
        for r in hits_ds(ds).take_all()
    }
    dist = {
        r["node"]: (r["auth_scaled"], r["hub_scaled"])
        for r in hits_ds(ds, broadcast_threshold=0).take_all()
    }
    assert drv == dist
    assert drv["a1"][0] > drv["a2"][0] > 0
    assert drv["h1"][1] > drv["h2"][1] > 0
    assert drv["h1"][0] == 0 and drv["a1"][1] == 0  # pure hub / authority


def test_weighted_pagerank_both_paths_and_weight_sensitivity():
    """Forced-distributed weighted PageRank equals the driver kernel
    bit-for-bit; unequal multiplicities must break the symmetry the
    unweighted rank would keep (s->a has 3 links, s->b has 1)."""
    from clangd_to_neo4j_ray.stages.graph_algo import (
        pagerank_ds,
        pagerank_weighted_ds,
    )

    ds = ray.data.from_arrow(
        pa.table(
            {
                "src": ["s", "s"],
                "dst": ["a", "b"],
                "w": [3, 1],
            }
        )
    )
    drv = {
        r["node"]: r["pr_scaled"] for r in pagerank_weighted_ds(ds).take_all()
    }
    dist = {
        r["node"]: r["pr_scaled"]
        for r in pagerank_weighted_ds(ds, broadcast_threshold=0).take_all()
    }
    assert drv == dist
    assert drv["a"] > drv["b"]  # 3x the link mass
    unw = {r["node"]: r["pr_scaled"] for r in pagerank_ds(ds).take_all()}
    assert unw["a"] == unw["b"]  # unweighted rank ignores multiplicity


def test_weighted_pagerank_multi_edges_sum():
    """Duplicate (src, dst) input rows aggregate their weights before the
    rank — 1+2 on one edge equals a single 3-weight edge."""
    from clangd_to_neo4j_ray.stages.graph_algo import pagerank_weighted_ds

    dup = ray.data.from_arrow(
        pa.table(
            {"src": ["s", "s", "s"], "dst": ["a", "a", "b"], "w": [1, 2, 1]}
        )
    )
    single = ray.data.from_arrow(
        pa.table({"src": ["s", "s"], "dst": ["a", "b"], "w": [3, 1]})
    )
    a = {r["node"]: r["pr_scaled"] for r in pagerank_weighted_ds(dup).take_all()}
    b = {
        r["node"]: r["pr_scaled"]
        for r in pagerank_weighted_ds(single).take_all()
    }
    assert a == b


def test_personalized_pagerank_both_paths_and_reachability():
    """Forced-distributed PPR equals the driver kernel bit-for-bit; mass
    concentrates at the seed, flows only along edges reachable from it,
    and a disconnected component ranks exactly 0."""
    from clangd_to_neo4j_ray.stages.graph_algo import pagerank_personalized_ds

    ds = ray.data.from_arrow(
        pa.table(
            {
                "src": ["s", "a", "x"],
                "dst": ["a", "b", "y"],
            }
        )
    )
    drv = {
        r["node"]: r["pr_scaled"]
        for r in pagerank_personalized_ds(ds, ["s"]).take_all()
    }
    dist = {
        r["node"]: r["pr_scaled"]
        for r in pagerank_personalized_ds(
            ds, ["s"], broadcast_threshold=0
        ).take_all()
    }
    assert drv == dist
    assert drv["s"] > drv["a"] > drv["b"] > 0
    assert drv["x"] == 0 and drv["y"] == 0  # not reachable from the seed
