"""Distributed connected components over a near-duplicate pair Dataset —
the cluster-and-keep-one step modern training pipelines run AFTER
pairwise near-dup detection: pairs alone mishandle chains (A~B and B~C
must collapse to one kept document even when A and C are not direct
near-dups). The reference has no analog (its dedup is exact-hash only,
``src/model/EnvLogUniverseGenerator.py:91-94``); this is part of the
beyond-reference LLM-pipeline surface.

Algorithm: hash-min label propagation. Every node starts labeled with
its own id; each round co-locates labels with edge endpoints (bucketed
shuffle on ``hash(node) % B``), pushes ``min`` labels across edges, and
re-minimizes per node; a pointer-jumping step (label-of-label) after
each relax makes convergence O(log diameter). The driver sees one
scalar per round (the label sum, monotonically non-increasing;
equality ⇒ converged), never a label table or edge list. Per-round
cost: FOUR bucketed shuffles (propose+remin for the edge relax, then
propose+remin again for the jump) over |labels| + 2|edges| rows; state
is O(nodes) spread across buckets, nothing driver-side.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from .analytics import bucketed_group_agg


def connected_components(edges_ds, num_buckets: int = 32,
                         max_iters: int = 25,
                         small_graph_max_edges: int = 2_000_000):
    """Label-propagation connected components.

    ``edges_ds``: Dataset with int64 columns (id_a, id_b). Returns a
    Dataset of (node, component) where component = min node id reachable
    from ``node``. Only nodes appearing in an edge are returned
    (singletons are trivially their own component).

    Size-gated (the ann.broadcast_max_rows convention): near-dup edge
    sets are usually FAR smaller than the corpus (only near-duplicate
    pairs survive verification), and each distributed label round costs
    several fixed-overhead all-to-all exchanges — ~50 s for a 3k-edge
    graph regardless of data volume. Up to ``small_graph_max_edges``
    (16 B/edge ⇒ ≤32 MB driver state) the edges therefore collapse to
    a driver union-find (the same algorithm the parity test uses as
    its reference); past the gate the distributed O(log diameter)
    label-propagation loop below runs unchanged. Both paths return
    identical (node, min-reachable-id) rows.
    """
    import logging

    def halves(b: pd.DataFrame) -> pd.DataFrame:
        a = b["id_a"].to_numpy(dtype=np.int64)
        c = b["id_b"].to_numpy(dtype=np.int64)
        return pd.DataFrame({
            "key": np.concatenate([a, c]),
            "other": np.concatenate([c, a]),
            "is_label": np.zeros(2 * len(b), dtype=np.int8),
        })

    halves_ds = edges_ds.map_batches(halves,
                                     batch_format="pandas").materialize()

    n_edges = halves_ds.count() // 2
    if n_edges <= small_graph_max_edges:
        logging.getLogger(__name__).info(
            "connected_components: %d edges <= %d — driver union-find "
            "fast path", n_edges, small_graph_max_edges)
        import ray.data as _rd
        pairs = halves_ds.to_pandas()
        pairs = pairs[pairs["is_label"] == 0]
        key = pairs["key"].to_numpy(np.int64)
        other = pairs["other"].to_numpy(np.int64)
        # node universe from EVERY endpoint first (a node seen only in
        # a self-loop must still emit its singleton row, matching the
        # distributed path); then union over ONE direction only
        # (key < other) — self-loops are union no-ops and the second
        # direction always lands on equal roots, so both halve the
        # loop for free. Peak driver state ≈ the 2×edges frame + the
        # node arrays — tens of MB per million edges, which is what
        # the 2M gate bounds.
        nodes = np.unique(np.concatenate([key, other]))
        one = key < other
        key, other = key[one], other[one]
        inv = np.searchsorted(nodes, np.concatenate([key, other]))
        parent = np.arange(len(nodes), dtype=np.int64)

        def find(i: int) -> int:
            root = i
            while parent[root] != root:
                root = parent[root]
            while parent[i] != root:  # path compression
                parent[i], i = root, parent[i]
            return root

        half = len(key)
        for a, b in zip(inv[:half], inv[half:]):
            ra, rb = find(a), find(b)
            if ra != rb:
                # union by min node id so the root IS the component min
                if nodes[ra] <= nodes[rb]:
                    parent[rb] = ra
                else:
                    parent[ra] = rb
        comp = nodes[np.fromiter((find(i) for i in range(len(nodes))),
                                 np.int64, len(nodes))]
        return _rd.from_pandas(pd.DataFrame({"node": nodes,
                                             "component": comp}))
    logging.getLogger(__name__).info(
        "connected_components: %d edges > %d — distributed "
        "label-propagation path", n_edges, small_graph_max_edges)

    def init_labels(g: pd.DataFrame) -> pd.DataFrame:
        u = np.unique(g["key"].to_numpy(dtype=np.int64))
        return pd.DataFrame({"key": u, "other": u,
                             "is_label": np.ones(len(u), dtype=np.int8)})

    labels = bucketed_group_agg(halves_ds, ["key"], init_labels,
                                num_buckets=num_buckets).materialize()

    def propose(g: pd.DataFrame) -> pd.DataFrame:
        # one group-bucket of mixed label + edge rows, keyed by node:
        # each node's current label is the min over its label rows (one
        # per node), proposed to itself and across every incident edge
        lab = g[g["is_label"] == 1].groupby("key", sort=False)["other"].min()
        edge = g[g["is_label"] == 0]
        own = pd.DataFrame({"node": lab.index.to_numpy(dtype=np.int64),
                            "prop": lab.to_numpy(dtype=np.int64)})
        if len(edge):
            across = pd.DataFrame({
                "node": edge["other"].to_numpy(dtype=np.int64),
                "prop": lab.reindex(edge["key"]).to_numpy(dtype=np.int64),
            })
            own = pd.concat([own, across], ignore_index=True)
        return own

    def remin(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby("node", sort=False)["prop"].min()
        return pd.DataFrame({"key": m.index.to_numpy(dtype=np.int64),
                             "other": m.to_numpy(dtype=np.int64),
                             "is_label": np.ones(len(m), dtype=np.int8)})

    def jump_requests(b: pd.DataFrame) -> pd.DataFrame:
        # pointer-jumping: ask the node my label points AT for ITS label
        # (label-of-label), keyed so the same propose machinery answers —
        # turns O(diameter) convergence into O(log diameter), which is
        # what makes long accidental chains safe at corpus scale
        return pd.DataFrame({
            "key": b["other"].to_numpy(dtype=np.int64),
            "other": b["key"].to_numpy(dtype=np.int64),
            "is_label": np.zeros(len(b), dtype=np.int8),
        })

    prev_sum = None
    for _ in range(max_iters):
        # step 1: relax across edges
        mixed = labels.union(halves_ds)
        proposals = bucketed_group_agg(mixed, ["key"], propose,
                                       num_buckets=num_buckets)
        labels = bucketed_group_agg(proposals, ["node"], remin,
                                    num_buckets=num_buckets).materialize()
        # step 2: pointer-jump (label[node] = label[label[node]])
        reqs = labels.map_batches(jump_requests, batch_format="pandas")
        proposals = bucketed_group_agg(labels.union(reqs), ["key"], propose,
                                       num_buckets=num_buckets)
        labels = bucketed_group_agg(proposals, ["node"], remin,
                                    num_buckets=num_buckets).materialize()
        s = labels.sum("other")
        if s == prev_sum:
            break
        prev_sum = s
    else:
        # labels that stopped improving were caught by the break above;
        # reaching here means the sum was STILL falling at max_iters —
        # the labels are not component minima, so fail loudly
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} "
            "rounds; raise max_iters (pointer jumping makes this "
            "O(log diameter), so this indicates a pathological graph)")

    return labels.map_batches(
        lambda b: pd.DataFrame({"node": b["key"].astype(np.int64),
                                "component": b["other"].astype(np.int64)}),
        batch_format="pandas")


def q_dedup_components(sf_dir: str) -> pd.DataFrame:
    """Near-dup clustering in planted-CHAIN-recovery form: every
    eligible doc (the q_minhash_dups plant rule) gains TWO stacked
    near-dup copies (id+2^40 and id+2^41, each appending one more unique
    token), LSH+verify discovers the pairwise edges, and
    ``connected_components`` must collapse each chain into one component
    rooted at the original doc id — the closed-form SQL oracle.

    Edges are restricted to same-plant-family pairs (both endpoints
    ≡ base doc mod 2^40) so natural near-dup edges can't merge planted
    components nondeterministically; the unrestricted operator is
    exercised by the library API + pytest."""
    from ..stages.dedup import shingle_set_jaccard, verify_pairs_distributed
    from .text_pipelines import (
        PLANT_TEXT_ID_OFFSET,
        _docs,
        _PlantTextNearDups,
        minhash_candidate_pairs_ds,
    )
    from ..runtime import auto_concurrency

    docs = _docs(sf_dir, ["doc_id", "text"])
    planted = docs.map_batches(_PlantTextNearDups, batch_format="pyarrow",
                               concurrency=auto_concurrency(),
                               fn_constructor_kwargs={"chain_len": 2})
    corpus = docs.union(planted).materialize()
    cand = minhash_candidate_pairs_ds(corpus, as_dataset=True)
    ver = verify_pairs_distributed(corpus, cand, shingle_set_jaccard,
                                   "jaccard")

    base = np.int64(PLANT_TEXT_ID_OFFSET)

    def plant_family_edges(b: pd.DataFrame) -> pd.DataFrame:
        a = b["id_a"].to_numpy(dtype=np.int64)
        c = b["id_b"].to_numpy(dtype=np.int64)
        keep = ((b["jaccard"].to_numpy() >= 0.5)
                & (np.maximum(a, c) >= base) & (a % base == c % base))
        return pd.DataFrame({"id_a": a[keep], "id_b": c[keep]})

    edges = ver.map_batches(plant_family_edges, batch_format="pandas")
    comp = connected_components(edges).to_pandas()
    comp = comp.sort_values("node").reset_index(drop=True)
    return comp[["node", "component"]].astype(np.int64)


def q_neardup_canonical(sf_dir: str) -> rd.Dataset:
    """Near-dup CANONICALIZATION — the keep-one step clustering exists
    for: run the chain-components query, keep only each component's
    root (its minimum id — here always the original doc), drop every
    other member, and report each surviving doc with its component
    size (1 = no near-dups, 3 = the planted chain was collapsed).

    Composition: the components table is component-count-sized (tiny
    next to the corpus), so it broadcasts as a (root → size) dict plus
    a drop-set; the corpus then streams through one ``map_batches``
    that filters and annotates. Closed-form oracle: originals survive
    with size 3 iff plant-eligible, else 1."""
    import ray

    from .text_pipelines import _docs

    comp = q_dedup_components(sf_dir)
    sizes = comp.groupby("component").size().sort_index()
    drop = np.sort(comp.loc[comp["node"] != comp["component"], "node"]
                   .to_numpy(np.int64))
    info_ref = ray.put((sizes.index.to_numpy(np.int64),
                        sizes.to_numpy(np.int64), drop))

    def annotate(t: pa.Table) -> pd.DataFrame:
        # vectorized: sorted roots + np.isin/searchsorted, no per-row
        # Python membership on the streamed corpus
        roots, root_sizes, drop_arr = ray.get(info_ref)
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        kept = ids[~np.isin(ids, drop_arr)]
        n = np.ones(len(kept), np.int64)
        pos = np.searchsorted(roots, kept)
        pos = np.clip(pos, 0, max(len(roots) - 1, 0))
        if len(roots):
            hit = roots[pos] == kept
            n[hit] = root_sizes[pos[hit]]
        return pd.DataFrame({"doc_id": kept, "n_members": n})

    return (_docs(sf_dir, ["doc_id"])
            .map_batches(annotate, batch_format="pyarrow"))


# ---------------------------------------------------- triangle counting
def _segment_pairs(g: pd.DataFrame, key_col: str, val_col: str):
    """All ordered (v_i < v_j) value pairs within each key segment,
    emitted WITHOUT per-segment Python DataFrames: segments are grouped
    by size and each size class expands through one vectorized
    ``triu_indices`` gather over a (n_segments, size) matrix. Returns
    (lo_array, hi_array) or None when no segment has ≥ 2 values.
    Vectorization assumption: segment sizes are small and few-valued
    (lineitems per order ≤ 7; strong-graph out-degrees are modest) —
    each distinct size costs one gather."""
    g = g.sort_values([key_col, val_col], kind="mergesort")
    keys = g[key_col].to_numpy(np.int64)
    vals = g[val_col].to_numpy(np.int64)
    n = len(g)
    if n < 2:
        return None
    new_seg = np.ones(n, bool)
    new_seg[1:] = keys[1:] != keys[:-1]
    starts = np.flatnonzero(new_seg)
    sizes = np.diff(np.r_[starts, n])
    los, his = [], []
    for d in np.unique(sizes):
        if d < 2:
            continue
        seg_starts = starts[sizes == d]
        mat = vals[seg_starts[:, None] + np.arange(d)[None, :]]
        i, j = np.triu_indices(int(d), 1)
        los.append(mat[:, i].ravel())
        his.append(mat[:, j].ravel())
    if not los:
        return None
    return np.concatenate(los), np.concatenate(his)


def copurchase_triangles(sf_dir: str, min_pair_orders: int = 2,
                         num_buckets: int = 16) -> pd.DataFrame:
    """Exact triangle count on the STRONG co-purchase graph (part pairs
    sharing ≥ ``min_pair_orders`` orders) — the standard distributed
    wedge-check algorithm: every triangle {a<b<c} is counted exactly
    once as the wedge (b,c) centered at its minimum node a, validated
    against the edge set. Three bucketed shuffles, none quadratic in
    the graph: (1) order-keyed pair emission (orders are tiny — TPC-H
    lineitems per order ≤ 7), (2) pair-keyed support count + threshold
    (the strength filter is what keeps the graph sparse; raw
    co-purchase is near-clique), (3) wedge⋈edge existence check keyed
    on the wedge endpoints. Wedge volume is Σ_a outdeg(a)² over the
    min-node orientation; the classic further mitigation (orient edges
    low→high DEGREE so hubs never emit wedges) is documented here and
    unnecessary below ~10⁵ max-degree."""
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey"])

    def per_batch(t: pa.Table) -> pd.DataFrame:
        t = t.drop_null()
        return pd.DataFrame({
            "o": t["l_orderkey"].to_numpy(zero_copy_only=False)
            .astype(np.int64),
            "part": t["l_partkey"].to_numpy(zero_copy_only=False)
            .astype(np.int64),
        }).drop_duplicates()

    def emit_pairs(g: pd.DataFrame) -> pd.DataFrame:
        pairs = _segment_pairs(g.drop_duplicates(["o", "part"]),
                               "o", "part")
        if pairs is None:
            return pd.DataFrame({"lo": np.array([], np.int64),
                                 "hi": np.array([], np.int64),
                                 "n": np.array([], np.int64)})
        out = pd.DataFrame({"lo": pairs[0], "hi": pairs[1],
                            "n": np.int64(1)})
        return (out.groupby(["lo", "hi"], sort=False)["n"]
                .sum().reset_index())

    pair_counts = bucketed_group_agg(
        li.map_batches(per_batch, batch_format="pyarrow"),
        ["o"], emit_pairs, num_buckets=num_buckets)

    def strong(g: pd.DataFrame) -> pd.DataFrame:
        agg = (g.groupby(["lo", "hi"], sort=False)["n"].sum().reset_index())
        agg = agg[agg["n"] >= min_pair_orders]
        return agg[["lo", "hi"]].astype(np.int64)

    edges = bucketed_group_agg(pair_counts, ["lo", "hi"], strong,
                               num_buckets=num_buckets).materialize()
    n_edges = edges.count()

    def emit_wedges(g: pd.DataFrame) -> pd.DataFrame:
        pairs = _segment_pairs(g, "lo", "hi")
        if pairs is None:
            return pd.DataFrame({"x": np.array([], np.int64),
                                 "y": np.array([], np.int64)})
        return pd.DataFrame({"x": pairs[0], "y": pairs[1]})

    wedges = bucketed_group_agg(edges, ["lo"], emit_wedges,
                                num_buckets=num_buckets).materialize()
    n_wedges = wedges.count()

    # existence check: union edges (tagged) with wedges, co-locate by
    # the (x, y) endpoints, count wedge rows whose key is an edge
    def tag_edge(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"x": b["lo"].to_numpy(np.int64),
                             "y": b["hi"].to_numpy(np.int64),
                             "is_edge": np.int8(1)})

    def tag_wedge(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"x": b["x"].to_numpy(np.int64),
                             "y": b["y"].to_numpy(np.int64),
                             "is_edge": np.int8(0)})

    tagged = (edges.map_batches(tag_edge, batch_format="pandas")
              .union(wedges.map_batches(tag_wedge, batch_format="pandas")))

    def tri_partial(g: pd.DataFrame) -> pd.DataFrame:
        e = g[g["is_edge"] == 1][["x", "y"]]
        w = g[g["is_edge"] == 0][["x", "y"]]
        n = len(w.merge(e, on=["x", "y"])) if len(e) and len(w) else 0
        return pd.DataFrame({"n": [np.int64(n)]})

    parts = bucketed_group_agg(tagged, ["x", "y"], tri_partial,
                               num_buckets=num_buckets).to_pandas()
    n_tri = int(parts["n"].sum()) if len(parts) else 0
    return pd.DataFrame({"n_edges": [np.int64(n_edges)],
                         "n_wedges": [np.int64(n_wedges)],
                         "n_triangles": [np.int64(n_tri)]})


def q_copurchase_triangles(sf_dir: str) -> pd.DataFrame:
    return copurchase_triangles(sf_dir)


# --------------------------------------------------------------- PageRank
# Integer-exact damped PageRank over the tool-transition graph of the
# transcript view (node = tool, edge weight = how often tool a's turn is
# immediately followed by tool b's within one conversation). The
# reference has no graph analytics at all; this extends the repo's
# iterative family (connected components, k-means) with the canonical
# link-analysis algorithm a training-data pipeline uses to weight
# sources/tools by centrality.
#
# Every quantity is an int64: scores start at PR_SCALE, each edge
# contributes floor(score_src · 85 · w / (100 · out_w_src)) and each
# node restarts from floor(PR_SCALE · 15 / 100) — integer sums are
# order-independent, so the result is bit-identical across any
# partitioning AND expressible as unrolled integer SQL (derived oracle,
# no pin). Dangling nodes (in-edges only) keep the restart mass and
# forward nothing, pinned identically in the SQL.
#
# Scale shape: the expensive stage is the stream → transition-cell
# reduction (one conv-keyed bucketed shuffle over the full corpus, the
# ``type_transitions`` kernel); the iteration then runs on the
# cell-bounded edge table (≤ |tools|² rows — the same "cells, never
# rows" regime as value_histogram/type_drift), so it is driver-side
# numpy here. If |V| ever outgrew that regime the per-iteration step is
# the bucketed join + groupby-sum already shipped in ``joins.py``.
PR_SCALE = 1_000_000
PR_DAMP_NUM = 85          # damping 0.85 as an integer ratio
PR_DAMP_DEN = 100
PR_ITERS = 3


def tool_transition_cells(sf_dir: str, num_buckets: int = 16) -> rd.Dataset:
    """Distributed (src_tool, dst_tool, w) cells: hash-bucket by
    conversation, sort each bucket by (conv, ts, event_id) — the
    transcript view's turn order — and count adjacent tool pairs.
    Only pre-counted cells leave each bucket."""
    from ..functions.hashing import hash_ints
    from .temporal import _ts_us

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts", "props"])

    def prep(t: pa.Table) -> pd.DataFrame:
        t = t.drop_null()
        props = pd.Series(t["props"].to_numpy(zero_copy_only=False))
        df = pd.DataFrame({
            "event_id": t["event_id"].to_numpy(zero_copy_only=False),
            "conv": t["user_id"].to_numpy(zero_copy_only=False),
            "ts_us": _ts_us(t["ts"]),
            # the transcript view's tool mapping (transcripts.py:174)
            "tool": "k" + props.str.extract(r"(\d+)", expand=False)
                            .fillna(""),
        })
        df["bucket"] = (hash_ints(df["conv"]) %
                        np.uint64(num_buckets)).astype(np.int32)
        return df

    def pair_cells(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["conv", "ts_us", "event_id"], kind="mergesort")
        conv = g["conv"].to_numpy(np.int64)
        tool = g["tool"].to_numpy(object)
        keep = np.r_[False, conv[1:] == conv[:-1]]
        at = np.flatnonzero(keep)
        pairs = pd.DataFrame({"src": tool[at - 1], "dst": tool[at]})
        out = (pairs.groupby(["src", "dst"], sort=False)
               .size().rename("w").reset_index())
        out["w"] = out["w"].astype(np.int64)
        return out

    partials = (ev.map_batches(prep, batch_format="pyarrow")
                .groupby("bucket")
                .map_groups(lambda g: pair_cells(g.drop(columns=["bucket"])),
                            batch_format="pandas"))

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "src": [g["src"].iloc[0]],
            "dst": [g["dst"].iloc[0]],
            "w": np.array([g["w"].sum()], np.int64),
        })

    return partials.groupby(["src", "dst"]).map_groups(
        merge, batch_format="pandas")


def pagerank_edges(edges: pd.DataFrame, iters: int = PR_ITERS,
                   scale: int = PR_SCALE) -> pd.DataFrame:
    """Integer PageRank on an in-memory (src, dst, w) cell table.
    Returns (tool, pr_scaled) for every node appearing in any edge."""
    nodes = np.unique(np.concatenate([edges["src"].to_numpy(object),
                                      edges["dst"].to_numpy(object)]))
    idx = {t: i for i, t in enumerate(nodes)}
    src = edges["src"].map(idx).to_numpy(np.int64)
    dst = edges["dst"].map(idx).to_numpy(np.int64)
    w = edges["w"].to_numpy(np.int64)
    out_w = np.zeros(len(nodes), np.int64)
    np.add.at(out_w, src, w)
    base = scale * (PR_DAMP_DEN - PR_DAMP_NUM) // PR_DAMP_DEN
    score = np.full(len(nodes), scale, np.int64)
    for _ in range(iters):
        contrib = (score[src] * PR_DAMP_NUM * w) // (PR_DAMP_DEN * out_w[src])
        nxt = np.full(len(nodes), base, np.int64)
        np.add.at(nxt, dst, contrib)
        score = nxt
    return pd.DataFrame({"tool": nodes.astype(object),
                         "pr_scaled": score})


def pagerank_tools(sf_dir: str, iters: int = PR_ITERS,
                   num_buckets: int = 16) -> pd.DataFrame:
    cells = tool_transition_cells(sf_dir, num_buckets=num_buckets).to_pandas()
    if not len(cells):
        return pd.DataFrame({"tool": pd.Series([], dtype=object),
                             "pr_scaled": pd.Series([], dtype=np.int64)})
    return pagerank_edges(cells, iters=iters)


def q_pagerank_tools(sf_dir: str) -> pd.DataFrame:
    return pagerank_tools(sf_dir)
