"""Property-based differential testing (hypothesis): randomized
filter + aggregation shapes over lineitem must agree between the
Spark DataFrame API and DuckDB SQL.

This generalizes the fixed-query oracle suite: instead of 80 hand
written queries, hypothesis explores the predicate/grouping space and
shrinks any disagreement to a minimal counterexample.  Aggregates are
integer-exact (counts and cent-sums) so equality is exact, not
approximate.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"

NUM_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")
KEY_COLS = ("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber")
CAT_COLS = ("l_returnflag", "l_linestatus")
OPS = ("<", "<=", ">", ">=", "=", "<>")

# Constants chosen inside each column's live range so predicates are
# neither vacuous nor empty most of the time.
CONST = {
    "l_quantity": st.integers(1, 50),
    "l_extendedprice": st.integers(1000, 60000),
    "l_discount": st.sampled_from([0.0, 0.02, 0.05, 0.07, 0.1]),
    "l_tax": st.sampled_from([0.0, 0.02, 0.05, 0.08]),
    "l_orderkey": st.integers(0, 6000),
    "l_partkey": st.integers(0, 2000),
    "l_suppkey": st.integers(0, 100),
    "l_linenumber": st.integers(1, 7),
}

single_pred = st.sampled_from(NUM_COLS + KEY_COLS).flatmap(
    lambda col: st.tuples(st.just(col), st.sampled_from(OPS), CONST[col])
)
predicates = st.lists(single_pred, min_size=1, max_size=3)


@pytest.fixture(scope="module")
def duck001():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{SF}/lineitem.parquet')"
    )
    yield con
    con.close()


def _spark_pred(col, op, val):
    c = F.col(col)
    return {
        "<": c < val,
        "<=": c <= val,
        ">": c > val,
        ">=": c >= val,
        "=": c == val,
        "<>": c != val,
    }[op]


def _sql_pred(col, op, val):
    return f"{col} {op} {val!r}" if isinstance(val, str) else f"{col} {op} {val}"


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(preds=predicates, group=st.sampled_from(CAT_COLS + (None,)))
def test_random_filter_agg_matches_duckdb(spark, duck001, preds, group):
    l = spark.read.parquet(f"{SF}/lineitem.parquet")
    where_sql = " AND ".join(_sql_pred(*p) for p in preds)
    cond = None
    for p in preds:
        c = _spark_pred(*p)
        cond = c if cond is None else (cond & c)

    # explicit round() before the int cast: Spark truncates double→bigint
    # while DuckDB rounds, so the rounding must happen in the expression.
    cents = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    filtered = l.filter(cond)
    if group is None:
        got = filtered.agg(
            F.count(F.lit(1)).alias("n"), F.sum(cents).alias("cents")
        ).collect()
        want = duck001.execute(
            f"SELECT COUNT(*) AS n, SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS cents "
            f"FROM lineitem WHERE {where_sql}"
        ).fetchall()
        assert (got[0].n, got[0].cents) == want[0]
    else:
        got = {
            r[0]: (r[1], r[2])
            for r in filtered.groupBy(group)
            .agg(F.count(F.lit(1)).alias("n"), F.sum(cents).alias("cents"))
            .collect()
        }
        want = {
            r[0]: (r[1], r[2])
            for r in duck001.execute(
                f"SELECT {group}, COUNT(*) AS n, "
                f"SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS cents "
                f"FROM lineitem WHERE {where_sql} GROUP BY {group}"
            ).fetchall()
        }
        assert got == want


JOIN_TYPES = ("inner", "left", "left_semi", "left_anti")


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    how=st.sampled_from(JOIN_TYPES),
    cust_mod=st.integers(2, 9),
    price_cut=st.integers(1000, 400000),
)
def test_random_join_shapes_match_duckdb(spark, duck001j, how, cust_mod, price_cut):
    """Randomized join-type × filter combinations over orders ⋈ customer
    must agree with DuckDB on count and key-sum."""
    o = spark.read.parquet(f"{SF}/orders.parquet")
    c = spark.read.parquet(f"{SF}/customer.parquet").filter(
        (F.col("c_custkey") % cust_mod) == 0
    )
    of = o.filter(F.col("o_totalprice") < price_cut)
    joined = of.join(c, of.o_custkey == c.c_custkey, how)
    got = joined.agg(
        F.count(F.lit(1)).alias("n"), F.sum("o_orderkey").alias("ks")
    ).collect()[0]

    sql_join = {
        "inner": "JOIN",
        "left": "LEFT JOIN",
        "left_semi": "SEMI JOIN",
        "left_anti": "ANTI JOIN",
    }[how]
    want = duck001j.execute(
        f"""
        SELECT COUNT(*) AS n, SUM(o.o_orderkey) AS ks
        FROM (SELECT * FROM orders WHERE o_totalprice < {price_cut}) o
        {sql_join} (SELECT * FROM customer WHERE c_custkey % {cust_mod} = 0) c
          ON o.o_custkey = c.c_custkey
        """
    ).fetchall()[0]
    assert (got.n, got.ks) == want


@pytest.fixture(scope="module")
def duck001j():
    con = duckdb.connect()
    for t in ("orders", "customer"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    yield con
    con.close()


# ---------------------------------------------------------------------------
# Iterative / two-phase primitives vs pure-Python references
# ---------------------------------------------------------------------------

edges_strategy = st.lists(
    st.tuples(st.integers(0, 30), st.integers(0, 30)).filter(lambda e: e[0] != e[1]),
    min_size=0,
    max_size=40,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=edges_strategy)
def test_connected_components_matches_union_find(spark, edges):
    """Distributed min-label propagation must equal a driver-side
    union-find on random graphs (hypothesis shrinks any mismatch)."""
    from flaco_spark.operators.dedup import connected_components, release_caches

    nodes = sorted({n for e in edges for n in e} | set(range(5)))
    # union-find reference
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {n: min(m for m in nodes if find(m) == find(n)) for n in nodes}

    nodes_df = spark.createDataFrame([(n,) for n in nodes], ["doc_id"])
    edges_df = spark.createDataFrame(
        [(a, b) for a, b in edges] or [(0, 0)], ["doc1", "doc2"]
    )
    if not edges:
        edges_df = edges_df.filter("doc1 <> doc2")
    got = {
        r.doc_id: r.component_id
        for r in connected_components(nodes_df, edges_df).collect()
    }
    release_caches()
    assert got == want


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(n=st.integers(24, 80))
def test_connected_components_long_chain_bounded_rounds(spark, n):
    """A chain-shaped component (diameter n-1 > 20 hops) must converge
    WITHIN a round budget far below its diameter: pointer jumping
    contracts label chains geometrically, so 10 rounds cover any
    diameter up to ~2^10.  Plain propagation would need n-1 rounds and
    trip the loud non-convergence failure this asserts against."""
    from flaco_spark.operators.dedup import connected_components, release_caches

    nodes_df = spark.createDataFrame([(i,) for i in range(n)], ["doc_id"])
    edges_df = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], ["doc1", "doc2"]
    )
    got = {
        r.doc_id: r.component_id
        for r in connected_components(
            nodes_df, edges_df, max_iterations=10
        ).collect()
    }
    release_caches()
    assert got == {i: 0 for i in range(n)}


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 99), st.integers(0, 20)),
        min_size=1,
        max_size=80,
        unique_by=lambda r: (r[0], r[1]),
    ),
    k=st.integers(1, 6),
)
def test_topk_per_query_matches_python(spark, rows, k):
    """Two-phase top-k equals a python sort on random (query, id,
    score) data under the deterministic tie-break order."""
    from flaco_spark.operators.similarity import topk_per_query

    df = spark.createDataFrame(rows, ["qid", "nid", "score"]).repartition(7)
    got = sorted(
        map(
            tuple,
            topk_per_query(df, "qid", [F.desc("score"), F.asc("nid")], k)
            .select("qid", "nid", "score", "rn")
            .collect(),
        )
    )
    want = []
    for q in {r[0] for r in rows}:
        grp = sorted((r for r in rows if r[0] == q), key=lambda r: (-r[2], r[1]))
        want += [(q, nid, s, i + 1) for i, (_, nid, s) in enumerate(grp[:k])]
    assert got == sorted(want)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 40)),
        min_size=1,
        max_size=120,
    ),
    pct=st.sampled_from([0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 1.0]),
)
def test_histogram_percentile_matches_numpy(spark, rows, pct):
    """histogram_percentile_cont equals numpy's linear-interpolation
    percentile on random grouped integer data (integers keep the
    comparison exact)."""
    import numpy as np

    from flaco_spark.operators.relational_ext import histogram_percentile_cont

    df = spark.createDataFrame(rows, ["g", "x"]).repartition(5)
    got = {
        (r.g, r.p): r.v
        for r in histogram_percentile_cont(df, "g", "x", [pct]).collect()
    }
    for g in {r[0] for r in rows}:
        vals = [x for gg, x in rows if gg == g]
        want = float(np.percentile(vals, pct * 100, method="linear"))
        assert abs(got[(g, pct)] - want) < 1e-12, (g, pct, got[(g, pct)], want)


# ---------------------------------------------------------------------------
# random window specs vs DuckDB
# ---------------------------------------------------------------------------

WIN_FUNCS = ("row_number", "rank", "dense_rank", "lag", "lead", "running_sum")
ORDER_COLS = ("l_quantity", "l_extendedprice", "l_shipdate")


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    fn=st.sampled_from(WIN_FUNCS),
    part=st.sampled_from(CAT_COLS),
    order_col=st.sampled_from(ORDER_COLS),
    desc=st.booleans(),
)
def test_random_window_specs_match_duckdb(spark, duck001, fn, part, order_col, desc):
    """Random (function, partition, order, direction) window specs over
    lineitem must match DuckDB row-for-row.  The order key is extended
    to a TOTAL order — this fixture's (l_orderkey, l_linenumber) is
    NOT unique (rank/lag over a partially-ordered window is
    engine-nondeterministic by definition, not a defect), but
    appending (l_extendedprice, l_quantity, l_shipdate) is: the
    5-tuple also keys the row-for-row comparison."""
    from pyspark.sql import Window as W

    KEY = ("l_orderkey", "l_linenumber", "l_extendedprice", "l_quantity", "l_shipdate")
    l = spark.read.parquet(f"{SF}/lineitem.parquet").filter("l_orderkey < 500")
    direction = F.desc(order_col) if desc else F.asc(order_col)
    w = W.partitionBy(part).orderBy(direction, *[F.asc(k) for k in KEY])
    dir_sql = "DESC" if desc else "ASC"
    over = (
        f"PARTITION BY {part} ORDER BY {order_col} {dir_sql}, "
        + ", ".join(KEY)
    )
    cents = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    cents_sql = "CAST(round(l_extendedprice * 100) AS BIGINT)"
    if fn == "running_sum":
        expr = F.sum(cents).over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        sql_fn = (
            f"SUM({cents_sql}) OVER ({over} "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
        )
    elif fn in ("lag", "lead"):
        expr = getattr(F, fn)(cents, 1).over(w)
        sql_fn = f"{fn}({cents_sql}, 1) OVER ({over})"
    else:
        expr = getattr(F, fn)().over(w)
        sql_fn = f"{fn}() OVER ({over})"
    got = {
        tuple(r[:-1]): r[-1]
        for r in l.select(*KEY, expr.alias("v")).collect()
    }
    want = {
        tuple(r[:-1]): r[-1]
        for r in duck001.execute(
            f"SELECT {', '.join(KEY)}, {sql_fn} AS v "
            "FROM lineitem WHERE l_orderkey < 500"
        ).fetchall()
    }
    assert len(got) == len(want)
    assert got == want


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    values=st.lists(
        st.tuples(
            st.integers(0, 2),  # series id
            st.integers(-1000, 1000),  # value (as integer tenths)
        ),
        min_size=3,
        max_size=60,
    )
)
def test_mad_median_picks_match_python(spark, values):
    """ts21's row-number median/MAD picks must equal a pure-Python
    reference using the same convention (element at ceil(n/2) of the
    sorted values) — including ties, even counts, and per-series
    variation (hypothesis shrinks any mismatch)."""
    rows = [
        (i, f"s{s}", v / 10.0) for i, (s, v) in enumerate(values)
    ]
    from pyspark.sql import Window as W

    df = spark.createDataFrame(rows, ["event_id", "event_type", "value"])
    wv = W.partitionBy("event_type").orderBy("value", "event_id")
    wn = W.partitionBy("event_type")
    ranked = df.select(
        "event_type",
        "value",
        F.row_number().over(wv).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    got = {
        r.event_type: r.med
        for r in ranked.groupBy("event_type")
        .agg(
            F.max(
                F.when(
                    F.col("rn") == F.ceil(F.lit(0.5) * F.col("n")).cast("bigint"),
                    F.col("value"),
                )
            ).alias("med")
        )
        .collect()
    }

    import math
    from collections import defaultdict

    by_series = defaultdict(list)
    for _, (s, v) in enumerate(values):
        by_series[f"s{s}"].append(v / 10.0)
    want = {
        s: sorted(vals)[math.ceil(0.5 * len(vals)) - 1]
        for s, vals in by_series.items()
    }
    assert got == want


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 3),  # nation
            st.one_of(st.none(), st.integers(-50, 50)),  # acctbal (or NULL)
        ),
        min_size=1,
        max_size=25,
    )
)
def test_quantified_rewrite_null_paths_match_duckdb(spark, rows):
    """q97's > ALL / >= ANY aggregate rewrite must match DuckDB's
    NATIVE quantified comparisons on data with REAL NULLs — the 3VL
    arms the TPC-H fixture (no NULL acctbals) cannot exercise.
    Hypothesis shrinks any disagreement."""
    import duckdb as _d

    from flaco_spark.operators.relational_ext import quantified_comparison_flags

    data = [
        (i, f"s{i}", nation, None if bal is None else float(bal))
        for i, (nation, bal) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data, "s_suppkey int, s_name string, s_nationkey int, s_acctbal double"
    )
    got = {
        r.s_suppkey: (r.beats_all_in_nation, r.beats_any_abroad)
        for r in quantified_comparison_flags(df).collect()
    }

    con = _d.connect()
    con.execute(
        "CREATE TABLE supplier (s_suppkey INT, s_name VARCHAR, "
        "s_nationkey INT, s_acctbal DOUBLE)"
    )
    con.executemany("INSERT INTO supplier VALUES (?, ?, ?, ?)", data)
    want = {
        r[0]: (r[1], r[2])
        for r in con.execute(
            """
            SELECT s.s_suppkey,
                   s.s_acctbal > ALL (SELECT s2.s_acctbal FROM supplier s2
                                      WHERE s2.s_nationkey = s.s_nationkey
                                        AND s2.s_suppkey <> s.s_suppkey),
                   s.s_acctbal >= ANY (SELECT s3.s_acctbal FROM supplier s3
                                       WHERE s3.s_nationkey <> s.s_nationkey)
            FROM supplier s
            """
        ).fetchall()
    }
    con.close()

    # Known DuckDB decorrelation artifact: once the subquery COLUMN
    # contains any NULL, DuckDB's correlated > ALL / >= ANY return
    # NULL even for rows whose correlated set is EMPTY (regardless of
    # lhs NULLness) — its own UNCORRELATED forms, and PostgreSQL,
    # whose semantics this engine mirrors (PG docs 9.23.4: "if there
    # are no rows, the result of ALL is true"), return the vacuous
    # TRUE/FALSE.  Normalize the oracle to the standard on exactly
    # the empty-set corner (unreachable in the q97 fixture, which has
    # no NULL acctbals).
    for i, (_, _, nation, bal) in enumerate(data):
        n_others = sum(1 for j, (_, _, n2, _) in enumerate(data) if n2 == nation and j != i)
        n_abroad = sum(1 for _, _, n2, _ in data if n2 != nation)
        w_all, w_any = want[i]
        if n_others == 0:
            w_all = True
        if n_abroad == 0:
            w_any = False
        want[i] = (w_all, w_any)
    assert got == want


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(
        st.lists(st.sampled_from("abcde"), min_size=1, max_size=20).map(" ".join),
        min_size=2,
        max_size=12,
    ),
    window=st.integers(2, 5),
)
def test_exact_substring_profile_matches_python(spark, docs, window):
    """d24's duplicated-window fractions equal a pure-Python sliding
    window reference on random tiny-vocabulary corpora (the small
    alphabet forces heavy window collisions — the regime the postings
    join must count exactly, including intra-doc repeats that must
    NOT count as duplication on their own)."""
    from flaco_spark.operators.dedup import exact_substring_profile

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], ["doc_id", "text"]
    ).repartition(5)
    got = {
        r["doc_id"]: (r["n_windows"], r["dup_windows"])
        for r in exact_substring_profile(df, window=window).collect()
    }

    def wins(text):
        toks = text.split(" ")
        n = max(len(toks) - window + 1, 1)
        return [" ".join(toks[i : i + window]) for i in range(n)]

    owner = {}
    for i, t in enumerate(docs):
        for w in set(wins(t)):
            owner.setdefault(w, set()).add(i)
    want = {}
    for i, t in enumerate(docs):
        ws = wins(t)
        dup = sum(1 for w in ws if len(owner[w]) >= 2)
        want[i] = (len(ws), dup)
    assert got == want


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    raw_edges=st.lists(
        st.tuples(st.integers(0, 14), st.integers(0, 14)),
        min_size=1,
        max_size=40,
    ),
    rounds=st.integers(1, 3),
)
def test_label_propagation_matches_python(spark, raw_edges, rounds):
    """g03's synchronous LPA equals a pure-Python reference on random
    graphs: per round every node adopts its neighbors' most frequent
    label, ties toward the smallest label (multi-edges after
    symmetrization weight votes — both sides count them the same)."""
    from collections import Counter

    from flaco_spark.operators.graph import label_propagation

    edges = [(u, v) for u, v in raw_edges if u != v]
    if not edges:
        return
    sym = edges + [(v, u) for u, v in edges]
    df = spark.createDataFrame(sym, ["u", "v"]).repartition(5)
    got = {
        r["node"]: (r["label"], r["community_size"])
        for r in label_propagation(df, rounds).collect()
    }

    neigh = {}
    for u, v in sym:
        neigh.setdefault(u, []).append(v)
    lab = {n: n for n in neigh}
    for _ in range(rounds):
        lab = {
            n: min(
                (l for l, c in Counter(lab[m] for m in ms).items()
                 if c == max(Counter(lab[m] for m in ms).values()))
            )
            for n, ms in neigh.items()
        }
    sizes = Counter(lab.values())
    want = {n: (l, sizes[l]) for n, l in lab.items()}
    assert got == want


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    base=st.lists(
        st.lists(st.sampled_from("abcdefg"), min_size=3, max_size=12).map(" ".join),
        min_size=2,
        max_size=8,
        unique=True,
    ),
    copies=st.lists(st.integers(1, 4), min_size=2, max_size=8),
)
def test_minhash_collapse_reconstruction_matches_direct(spark, base, copies):
    """The exact-collapse-first pair pipeline must emit EXACTLY the
    relation the direct (no-collapse) banded-LSH computation emits,
    on corpora with planted duplicate families of random sizes —
    cross-family pairs carry the rep pair's jaccard, intra-family
    pairs appear at 1.0, nothing extra, nothing missing."""
    from flaco_spark.operators.dedup import (
        _pairs_over_distinct,
        minhash_near_dup_pairs,
        release_caches,
    )

    rows, nid = [], 0
    for text, k in zip(base, copies):
        for _ in range(k):
            rows.append((nid, text))
            nid += 1
    df = spark.createDataFrame(rows, ["doc_id", "text"]).repartition(5)
    got = sorted(
        (r["doc1"], r["doc2"], round(r["jaccard"], 9))
        for r in minhash_near_dup_pairs(df).collect()
    )
    release_caches()
    want = sorted(
        (r["doc1"], r["doc2"], round(r["jaccard"], 9))
        for r in _pairs_over_distinct(df).collect()
    )
    release_caches()
    assert got == want


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    obs=st.lists(
        st.tuples(st.integers(0, 23), st.integers(0, 5_000_000)),
        min_size=0,
        max_size=12,
        unique_by=lambda r: r[0],
    ),
)
def test_linear_interpolation_matches_python(spark, obs):
    """ts27's blend semantics on random observation patterns: a pure
    Python replay of the spec (carry prev/next observation, integer
    floor blend, NULL edges) must equal the window-expression result —
    the semantic anchor the cross-engine hash can't provide, since
    both engines run the same formula."""
    from pyspark.sql import Window as W

    have = dict(obs)
    rows = [(h, have.get(h)) for h in range(24)]
    df = spark.createDataFrame(rows, "hh long, m long").repartition(3)
    wp = W.orderBy("hh").rowsBetween(W.unboundedPreceding, 0)
    wf = W.orderBy("hh").rowsBetween(0, W.unboundedFollowing)
    obs_h = F.when(F.col("m").isNotNull(), F.col("hh"))
    ctx = df.select(
        "hh",
        "m",
        F.last("m", ignorenulls=True).over(wp).alias("pm"),
        F.last(obs_h, ignorenulls=True).over(wp).alias("ph"),
        F.first("m", ignorenulls=True).over(wf).alias("nm"),
        F.first(obs_h, ignorenulls=True).over(wf).alias("nh"),
    )
    blend = F.col("pm") + F.floor(
        ((F.col("nm") - F.col("pm")) * (F.col("hh") - F.col("ph")))
        / (F.col("nh") - F.col("ph"))
    ).cast("bigint")
    got = {
        r.hh: r.filled
        for r in ctx.select(
            "hh",
            F.when(F.col("m").isNotNull(), F.col("m"))
            .when(F.col("pm").isNull() | F.col("nm").isNull(), F.lit(None).cast("bigint"))
            .otherwise(blend)
            .alias("filled"),
        ).collect()
    }
    ks = sorted(have)
    want = {}
    for h in range(24):
        if h in have:
            want[h] = have[h]
            continue
        prev = max((k for k in ks if k < h), default=None)
        nxt = min((k for k in ks if k > h), default=None)
        if prev is None or nxt is None:
            want[h] = None
        else:
            import math as _m

            pm, nm = have[prev], have[nxt]
            want[h] = pm + _m.floor((nm - pm) * (h - prev) / (nxt - prev))
    assert got == want


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    # (user, offset-minutes) events; minute offsets force gap-boundary
    # collisions (deltas of exactly the 30-min gap) with high probability
    rows=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 300)),
        min_size=1,
        max_size=80,
    ),
)
def test_session_window_matches_python_sessionizer(spark, rows):
    """F.session_window (batch form — same merge semantics as st11's
    streaming run) equals a pure-Python gap sessionizer, pinning the
    CLOSED boundary: an event at exactly last + gap JOINS the session
    (only delta > gap splits).  The original version of this test
    asserted the opposite (>= splits) and hypothesis found the
    falsifier [(0, 0), (0, 30)] in round 7 — Spark merged them — so
    the ts03/st11 oracles were flipped to strict > and both queries
    FORCE_RECHECK'd."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    data = [
        (u, base + dt.timedelta(minutes=m)) for u, m in rows
    ]
    df = spark.createDataFrame(data, ["user_id", "ts"]).repartition(5)
    got = sorted(
        (r.user_id, r.w.start, r.w.end, r.n)
        for r in df.groupBy(
            F.session_window("ts", "30 minutes").alias("w"), "user_id"
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    want = []
    for u in {r[0] for r in data}:
        times = sorted(t for (uu, t) in data if uu == u)
        start, last, n = times[0], times[0], 1
        gap = dt.timedelta(minutes=30)
        for t in times[1:]:
            if t - last > gap:  # closed boundary: == gap merges
                want.append((u, start, last + gap, n))
                start, n = t, 1
            else:
                n += 1
            last = t
        want.append((u, start, last + gap, n))
    assert got == sorted(want)


def test_session_window_boundary_is_closed(spark):
    """Deterministic pin of the r7 find: 29/30/31-minute deltas against
    a 30-minute gap produce 1/1/2 sessions — the ts03/st11 oracle
    boundary (strict >) mirrors the engine, measured not assumed."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    for delta_min, want_sessions in ((29, 1), (30, 1), (31, 2)):
        df = spark.createDataFrame(
            [(0, base), (0, base + dt.timedelta(minutes=delta_min))],
            ["user_id", "ts"],
        )
        n = (
            df.groupBy(F.session_window("ts", "30 minutes"), "user_id")
            .count()
            .count()
        )
        assert n == want_sessions, (delta_min, n)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    ids=st.lists(st.integers(0, 500), min_size=2, max_size=200),
    n_a=st.integers(2, 6),
    n_b=st.integers(2, 6),
)
def test_hll_union_is_split_invariant(spark, ids, n_a, n_b):
    """DataSketches HLL: unions of two INDEPENDENT multi-sketch
    carvings of the same rows estimate identically — the
    associativity q123's merge_consistent column pins on the fixture,
    here under random data and random split arities.  Both sides must
    be REAL merges (≥2 sketch groups): a union fed a single sketch
    short-circuits to it, HIP estimator state included, while any
    real merge drops HIP for the composite estimator — so
    single-vs-multi equality is NOT an invariant (observed at sf0.1:
    direct 1484, every multi-sketch union 1488)."""
    data = [(i, v) for i, v in enumerate(ids)]
    df = spark.createDataFrame(data, ["rid", "v"])

    def union_est(split_col):
        return (
            df.withColumn("p", split_col)
            .groupBy("p")
            .agg(F.hll_sketch_agg("v").alias("sk"))
            .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
            .collect()[0]
            .est
        )

    a = union_est(F.col("rid") % n_a)
    b = union_est((F.col("rid") + 1) % n_b)
    assert a == b


# ---------------------------------------------------------------------------
# Bit-deterministic quantized graph sum (SCALING.md degree-skew hazard)
# ---------------------------------------------------------------------------

# Skewed by construction: ~80% of contributions land on one celebrity
# key, and x doubles exercise float non-associativity — under a NAIVE
# float sum the result would depend on partitioning; the quantized
# sum must not, bit-for-bit.
_qsum_rows = st.lists(
    st.tuples(
        st.sampled_from([0, 0, 0, 0, 1, 2]),  # key (0 = celebrity)
        st.floats(min_value=0.0, max_value=1.0, allow_nan=False, width=64),
    ),
    min_size=1,
    max_size=120,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_qsum_rows, nparts=st.integers(1, 9), bits=st.sampled_from([26, 40]))
def test_quantized_sum_partition_invariant(spark, rows, nparts, bits):
    """quantized_sum must be BIT-IDENTICAL to a driver-side exact
    integer replay — sum(floor(x·2^bits)) descaled — for EVERY
    partitioning of the input: quantization moves the aggregation
    into exact integer arithmetic, where addition is associative and
    commutative, so task order and combine-tree shape cannot change a
    single bit.  This is the invariant that lets g01/g05/g07 use a
    plain map-side-combining groupBy().sum() (no collect_list, no
    degree-sized rows) while still hash-matching the DuckDB oracle."""
    import math

    from flaco_spark.operators.graph import quantized_sum

    scale = float(2**bits)
    want: dict[int, float] = {}
    acc: dict[int, int] = {}
    for k, x in rows:
        acc[k] = acc.get(k, 0) + math.floor(x * scale)
    for k, total in acc.items():
        # float(int) rounds half-even — the same rounding the
        # engines apply casting the exact DECIMAL sum to double
        want[k] = float(total) / scale

    df = spark.createDataFrame(rows, ["k", "x"])
    got = {
        r.k: r.out
        for r in quantized_sum(
            df.repartition(nparts), "k", out="out", bits=bits
        ).collect()
    }
    # a second, different partitioning must give the same bits
    got2 = {
        r.k: r.out
        for r in quantized_sum(
            df.repartition(max(1, 10 - nparts), "k"), "k", out="out", bits=bits
        ).collect()
    }
    assert got == want
    assert got2 == want


def test_quantized_sum_rejects_ansi_off(spark):
    """quantized_sum's overflow-is-loud guarantee (a >2^63 long sum
    errors instead of wrapping) holds only under ANSI mode; a
    harness-provided session with ANSI off must be refused, not
    silently trusted (r6 ADVICE)."""
    import pytest

    from flaco_spark.errors import EngineError
    from flaco_spark.operators.graph import quantized_sum

    df = spark.createDataFrame([(1, 0.5)], ["k", "x"])
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try:
        with pytest.raises(EngineError, match="ansi"):
            quantized_sum(df, "k", out="out")
    finally:
        spark.conf.set("spark.sql.ansi.enabled", "true")
    # restored session works again
    assert quantized_sum(df, "k", out="out").collect()[0].out == 0.5


def test_g07_fails_fast_on_empty_edges(spark, tmp_path):
    """g07's per-round max-normalizer is a bounded 1-value collect;
    on an empty edge set it must fail with a clear EngineError, not
    an opaque None-division (r6 ADVICE).  Also documents the eager
    builder: the error surfaces at plan-CONSTRUCTION time."""
    import pytest

    from flaco_spark.errors import EngineError
    from flaco_spark.inventory import load_inventory

    REGISTRY = load_inventory()
    # empty orders/lineitem → zero edges
    spark.range(0).selectExpr(
        "id AS o_orderkey", "id AS o_custkey"
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    spark.range(0).selectExpr(
        "id AS l_orderkey", "id AS l_suppkey"
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    with pytest.raises(EngineError, match="empty edge set"):
        REGISTRY["g07_hits"].builder(spark, str(tmp_path))


# ---------------------------------------------------------------------------
# Avro OCF codec: property-based round-trip identity.  The r7 hot-loop
# rewrite (varint table + inlined emits on encode, bytes-cursor +
# raw-byte union dispatch on decode) is exactly the kind of change a
# fixed-fixture test can pass while an edge case regresses — hypothesis
# walks varint width boundaries (2^13/2^14 table edge, multi-byte
# continuation), NULL runs, empty strings/bytes, negative unscaled
# decimals, and block-boundary row counts.
# ---------------------------------------------------------------------------

_AVRO_PROP_SCHEMA = {
    "type": "record",
    "name": "prop",
    "fields": [
        {"name": "i", "type": ["null", "long"]},
        {"name": "s", "type": ["null", "string"]},
        {"name": "by", "type": ["null", "bytes"]},
        {"name": "dec", "type": ["null", {"type": "bytes",
         "logicalType": "decimal", "precision": 38, "scale": 3}]},
        {"name": "d", "type": ["null", "double"]},
        {"name": "b", "type": ["null", "boolean"]},
    ],
}

_avro_row = st.tuples(
    st.one_of(st.none(), st.integers(min_value=-(2**63), max_value=2**63 - 1)),
    st.one_of(st.none(), st.text(max_size=40)),
    st.one_of(st.none(), st.binary(max_size=40)),
    st.one_of(
        st.none(),
        # Full Spark precision 38 (>28 digits breaks context-bound
        # scaleb arithmetic — the r7 ADVICE defect); string construction
        # is context-free so the strategy itself stays exact.
        st.integers(min_value=-(10**38 - 1), max_value=10**38 - 1).map(
            lambda n: __import__("decimal").Decimal(f"{n}E-3")
        ),
    ),
    st.one_of(st.none(), st.floats(allow_nan=False)),
    st.one_of(st.none(), st.booleans()),
)


@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    rows=st.lists(_avro_row, max_size=60),
    codec=st.sampled_from(["null", "deflate"]),
    block_rows=st.sampled_from([1, 7, 4096]),
)
def test_avro_codec_roundtrip_property(rows, codec, block_rows):
    import io

    from flaco_spark.sources.avro_ocf import read_container, write_container

    fd = io.BytesIO()
    n = write_container(
        fd, _AVRO_PROP_SCHEMA, rows, codec=codec, block_rows=block_rows
    )
    assert n == len(rows)
    fd.seek(0)
    schema, back = read_container(fd)
    assert schema == _AVRO_PROP_SCHEMA
    assert back == [tuple(r) for r in rows]


@given(n=st.integers(min_value=-(2**63), max_value=2**63 - 1))
@settings(max_examples=200, deadline=None)
def test_avro_zigzag_identity(n):
    import io

    from flaco_spark.sources.avro_ocf import (
        _zigzag_decode,
        _zigzag_encode,
        _zz_read,
    )

    enc = _zigzag_encode(n)
    assert _zigzag_decode(io.BytesIO(enc)) == n
    val, pos = _zz_read(enc, 0)
    assert (val, pos) == (n, len(enc))


# ---------------------------------------------------------------------------
# PNG / GIF codecs: property-based round-trip identity (r8).  Same
# rationale as the Avro property test — hypothesis walks dimension
# edges (1-wide, 1-tall), filter-cycle on/off, all color types, and
# frame counts, where fixed fixtures can silently miss an unfilter or
# LZW width-bump arm.
# ---------------------------------------------------------------------------


@settings(max_examples=30, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    w=st.integers(min_value=1, max_value=40),
    h=st.integers(min_value=1, max_value=30),
    color_type=st.sampled_from([0, 2, 4, 6]),
    cycle=st.booleans(),
    data=st.data(),
)
def test_png_roundtrip_property(w, h, color_type, cycle, data):
    from flaco_spark.sources.png_codec import decode_png, encode_png, png_info

    ch = {0: 1, 2: 3, 4: 2, 6: 4}[color_type]
    pix = bytes(
        data.draw(st.lists(st.integers(0, 255), min_size=w * h * ch,
                           max_size=w * h * ch))
    )
    png = encode_png(pix, w, h, color_type=color_type, filter_cycle=cycle)
    assert png_info(png) == (w, h, 8, color_type)
    assert decode_png(png) == (w, h, ch, pix)


@settings(max_examples=30, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    w=st.integers(min_value=1, max_value=30),
    h=st.integers(min_value=1, max_value=20),
    n_frames=st.integers(min_value=1, max_value=4),
    data=st.data(),
)
def test_gif_roundtrip_property(w, h, n_frames, data):
    from flaco_spark.sources.gif_codec import decode_gif, encode_gif_gray

    frames = [
        bytes(data.draw(st.lists(st.integers(0, 255), min_size=w * h,
                                 max_size=w * h)))
        for _ in range(n_frames)
    ]
    gif = encode_gif_gray(frames, w, h)
    gw, gh, back, _gct = decode_gif(gif)
    assert (gw, gh) == (w, h)
    assert back == frames


@settings(max_examples=60, deadline=None)
@given(data=st.binary(max_size=3000), mcs=st.sampled_from([2, 5, 8]))
def test_gif_lzw_identity_property(data, mcs):
    from flaco_spark.sources.gif_codec import lzw_decode, lzw_encode

    capped = bytes(min(b, (1 << mcs) - 1) for b in data)
    assert lzw_decode(lzw_encode(capped, mcs), mcs) == capped


# ---------------------------------------------------------------------------
# JPEG codec (r10).  The lossy transform rules out a pixel-identity
# property, but two exact invariants remain: (1) the progressive
# spectral-selection script transmits the SAME quantized coefficients
# as baseline, so its decode must be BIT-IDENTICAL — this walks the
# whole multi-scan machinery (band bounds, EOB runs, per-scan
# predictor resets, restart resync) with zero tolerance slack; and
# (2) the decoder's error surface is closed: any corruption either
# decodes or raises EngineError, never struct.error / OverflowError /
# IndexError (the r10 review's fuzz harness found both escapes —
# this pins the class permanently).
# ---------------------------------------------------------------------------


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    w=st.integers(min_value=1, max_value=40),
    h=st.integers(min_value=1, max_value=30),
    ch=st.sampled_from([1, 3]),
    restart=st.sampled_from([0, 1, 3]),
    quality=st.sampled_from([60, 90, 97]),
    data=st.data(),
)
def test_jpeg_progressive_equals_baseline_property(w, h, ch, restart, quality, data):
    from flaco_spark.sources.jpeg_codec import decode_jpeg, encode_jpeg

    pix = bytes(
        data.draw(st.lists(st.integers(0, 255), min_size=w * h * ch,
                           max_size=w * h * ch))
    )
    base = encode_jpeg(pix, w, h, ch, quality=quality,
                       restart_interval=restart)
    prog = encode_jpeg(pix, w, h, ch, quality=quality,
                       restart_interval=restart, progressive=True)
    assert b"\xff\xc2" in prog[:260]
    assert decode_jpeg(prog) == decode_jpeg(base)


@settings(max_examples=80, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(data=st.data())
def test_jpeg_decode_corruption_error_surface_property(data):
    from flaco_spark.errors import EngineError
    from flaco_spark.sources.jpeg_codec import decode_jpeg, encode_jpeg

    gray = bytes((x * 7 + y * 11) % 256 for y in range(12) for x in range(17))
    j = bytearray(encode_jpeg(
        gray, 17, 12, 1, quality=90,
        restart_interval=data.draw(st.sampled_from([0, 2])),
        progressive=data.draw(st.booleans()),
    ))
    # corrupt: flip 1-4 bytes anywhere, and/or truncate
    for _ in range(data.draw(st.integers(1, 4))):
        pos = data.draw(st.integers(0, len(j) - 1))
        j[pos] = data.draw(st.integers(0, 255))
    if data.draw(st.booleans()):
        j = j[: data.draw(st.integers(2, len(j)))]
    try:
        decode_jpeg(bytes(j))
    except EngineError:
        pass  # the ONLY permitted failure class
