"""Feature-selection experiment family — the ``src/experiment/`` port.

Reference analogs (semantics, not code):

- ``q_field_stats``: ``SeparatedVarianceSelector.calculate_variance``
  (``src/experiment/SeparatedVarianceSelector.py:31-116``): per field
  over a sampled event set — distinct non-NONE values, instance count,
  frequency = instances/total, uf = (1−unique/instances)·frequency,
  iuf = (unique/instances)·frequency. Both scores reduce to exact
  integer rationals ((i−u)/t and u/t), folded to basis points with
  integer division so the DuckDB oracle matches bit-for-bit.
- ``q_feature_label_counts`` / ``q_info_gain``:
  ``src/experiment/info_gain.py`` (mutual_info_classif over discrete
  count features): contingency counts of each feature column vs the
  event-type label, and I(X;Y) = Σ p(x,y)·ln(N·n_xy/(n_x·n_y)) in
  milli-nats per feature.
- ``q_dependency_pairs``: ``src/experiment/
  dependency_map_from_correlations.py``: the 'a -> b' dependency
  multimap, here DERIVED from the data instead of hardcoded — a
  functionally determines b iff #distinct (a,b) == #distinct a; the
  strength ratio is folded to integer bp.
- ``pfa_select`` / ``q_pfa_features``: ``src/experiment/PFA.py``:
  standardize → PCA components → k-means over component rows → the
  feature nearest each cluster center. The Gram/mean/var moments are
  computed DISTRIBUTED (one map_batches partial per block, fixed-size
  d×d partials merged on the driver — the only exchange); the d×d
  eigendecomposition and the tiny k-means run driver-side.

Every event-derived query samples with the same deterministic
multiplicative hash as ``analytics.q_sample_events`` (the
``instance_sample_rate`` analog, reproducible in SQL).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data as rd

from .analytics import bucketed_group_agg, hash_sample_mask

# ---------------------------------------------------------------- fields
# The normalized per-event field map (ConfigurableEventNormalizer
# analog): role/tool/hour/weekday always present; props_k_bin uses the
# reference's fields_to_bin semantics — NONE below the bin threshold,
# so frequency < 1 and the NONE-handling paths are exercised.
FIELDS = ("role", "tool", "hour", "weekday", "props_k_bin")


def _tool_from_props(props: pd.Series) -> pd.Series:
    # [0-9], not \d: python \d matches unicode digits RE2's does not
    return "k" + props.str.extract(r"([0-9]+)", expand=False).fillna("")


def _sampled(b: pd.DataFrame) -> pd.DataFrame:
    return b[hash_sample_mask(b["event_id"].to_numpy())]


def _field_frame(b: pd.DataFrame) -> pd.DataFrame:
    """One sampled event → one value per field ('NONE' when absent)."""
    ts = pd.to_datetime(b["ts"])
    # mirror the oracle's TRY_CAST(... AS INTEGER): non-numeric OR
    # out-of-int32-range digit runs become NONE instead of crashing
    raw = pd.to_numeric(b["props"].str.extract(r"([0-9]+)", expand=False),
                        errors="coerce")
    k = raw.where((raw >= -(2**31)) & (raw <= 2**31 - 1)).fillna(-1)
    return pd.DataFrame({
        "role": b["event_type"].to_numpy(),
        "tool": _tool_from_props(b["props"]).to_numpy(),
        "hour": ts.dt.hour.astype(str).to_numpy(),
        "weekday": ts.dt.dayofweek.astype(str).to_numpy(),
        "props_k_bin": np.where(k.to_numpy() >= 50, "big", "NONE"),
    })


def _field_value_counts(sf_dir: str) -> tuple[pd.DataFrame, int]:
    """Shared (field, value) → count pipeline over the hash-sampled
    event set: per-batch partial value_counts, bucketed sum. Returns
    (counts, total sampled events)."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "event_type", "ts", "props"])

    def partials(b: pd.DataFrame) -> pd.DataFrame:
        b = _sampled(b)
        f = _field_frame(b)
        frames = []
        for field in FIELDS:
            vc = f[field].value_counts()
            frames.append(pd.DataFrame({
                "field": field, "value": vc.index.to_numpy(),
                "cnt": vc.to_numpy().astype(np.int64)}))
        return pd.concat(frames, ignore_index=True)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["field", "value"], sort=False).agg(
            cnt=("cnt", "sum")).reset_index()
        return out

    # stage 1: per-batch (field, value, cnt) partials; stage 2: bucketed
    # sum by (field, value); stage 3: tiny per-field fold on the driver
    counts = bucketed_group_agg(
        ds.map_batches(partials, batch_format="pandas"),
        ["field", "value"], per_bucket, num_buckets=8).to_pandas()
    # role is never 'NONE', so its instance total IS the sampled event
    # count — no second scan of the events table needed
    total = int(counts.loc[counts["field"] == "role", "cnt"].sum())
    return counts, total


def q_field_stats(sf_dir: str) -> pd.DataFrame:
    """Per-field distinct/instance/frequency/uf/iuf stats over the
    hash-sampled event set (SeparatedVarianceSelector analog)."""
    counts, total = _field_value_counts(sf_dir)
    rows = []
    for field in FIELDS:
        sub = counts[(counts["field"] == field) & (counts["value"] != "NONE")]
        u = int(len(sub))
        i = int(sub["cnt"].sum())
        rows.append({
            "field": field, "n_values": u, "instances": i,
            "frequency_bp": (10000 * i) // total if total else 0,
            "uf_bp": (10000 * (i - u)) // total if total else 0,
            "iuf_bp": (10000 * u) // total if total else 0,
        })
    out = pd.DataFrame(rows).sort_values("field").reset_index(drop=True)
    for c in ("n_values", "instances", "frequency_bp", "uf_bp", "iuf_bp"):
        out[c] = out[c].astype(np.int64)
    return out


def q_low_variance(sf_dir: str, threshold_bp: int = 500) -> pd.DataFrame:
    """low_variance one-hot feature selection — the last FeatureSelector
    method with defined semantics (``FeatureSelector.low_variance``,
    src/experiment/FeatureSelector.py:128-138): sklearn-style
    VarianceThreshold at t(1−t) over one-hot k=v encodings keeps exactly
    the features whose Bernoulli rate p satisfies t < p < 1−t.

    Distributed as the same (field, value) count pipeline as
    q_field_stats; the selection is the exact rational rule
    ``cnt·10⁴ > t_bp·total AND cnt·10⁴ < (10⁴−t_bp)·total`` — integer
    arithmetic on both the engine and SQL sides, no float variance.
    (The remaining skfeature methods — lap_score/SPEC/UDFS/MCFS/NDFS —
    are excluded: scratch research code pinned to a dead library with
    graph-Laplacian semantics the miner never consumes; see SURVEY §8.)
    """
    counts, total = _field_value_counts(sf_dir)
    cnt = counts["cnt"].to_numpy()
    keep = ((cnt * 10000 > threshold_bp * total)
            & (cnt * 10000 < (10000 - threshold_bp) * total))
    out = counts[keep].copy()
    out["p_bp"] = (10000 * out["cnt"]) // max(total, 1)
    for c in ("cnt", "p_bp"):
        out[c] = out[c].astype(np.int64)
    return (out[["field", "value", "cnt", "p_bp"]]
            .sort_values(["field", "value"]).reset_index(drop=True))


# ------------------------------------------------------------ info gain
MI_FEATURES = ("tool", "hour", "weekday")


def feature_label_counts(sf_dir: str) -> pd.DataFrame:
    """Contingency counts n(feature, value, label) over sampled events
    (label = event_type) — the exact-integer ingredient of MI."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "event_type", "ts", "props"])

    def partials(b: pd.DataFrame) -> pd.DataFrame:
        b = _sampled(b)
        f = _field_frame(b).assign(label=b["event_type"].to_numpy())
        frames = []
        for feat in MI_FEATURES:
            vc = f.groupby([feat, "label"], sort=False).size().reset_index(name="n")
            frames.append(pd.DataFrame({
                "feature": feat, "value": vc[feat].to_numpy(),
                "label": vc["label"].to_numpy(),
                "n": vc["n"].to_numpy().astype(np.int64)}))
        return pd.concat(frames, ignore_index=True)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return (g.groupby(["feature", "value", "label"], sort=False)
                .agg(n=("n", "sum")).reset_index())

    out = bucketed_group_agg(
        ds.map_batches(partials, batch_format="pandas"),
        ["feature", "value", "label"], per_bucket, num_buckets=8).to_pandas()
    out["n"] = out["n"].astype(np.int64)
    return out.sort_values(["feature", "value", "label"]).reset_index(drop=True)


def q_feature_label_counts(sf_dir: str) -> pd.DataFrame:
    return feature_label_counts(sf_dir)


def q_info_gain(sf_dir: str) -> pd.DataFrame:
    """Mutual information I(feature; event_type) in milli-nats from the
    contingency table: Σ (n_xy/N)·ln(N·n_xy/(n_x·n_y)). The table is
    tiny post-aggregation, so the fold runs on the driver; the oracle
    recomputes the identical closed form in SQL. (Known bounded risk:
    the SUM is order-sensitive at the last-ulp level and DuckDB's
    summation order is its own, so a MI value landing within ~1e-12 of
    a 0.0005-nat fold boundary could flip the last milli-nat; per-term
    inputs are exact integer ratios on both sides, so the probability
    is negligible on any fixed corpus.)"""
    c = feature_label_counts(sf_dir)
    rows = []
    for feat, sub in c.groupby("feature", sort=True):
        n = sub["n"].to_numpy().astype(np.float64)
        total = n.sum()
        nx = sub.groupby("value")["n"].transform("sum").to_numpy().astype(np.float64)
        ny = sub.groupby("label")["n"].transform("sum").to_numpy().astype(np.float64)
        terms = (n / total) * np.log(total * n / (nx * ny))
        rows.append({"feature": feat,
                     "mi_millinats": int(np.floor(terms.sum() * 1000 + 0.5))})
    out = pd.DataFrame(rows)
    out["mi_millinats"] = out["mi_millinats"].astype(np.int64)
    return out


# ------------------------------------------------------- dependency map
def q_dependency_pairs(sf_dir: str) -> pd.DataFrame:
    """Data-derived dependency map over ordered field pairs: a → b is a
    functional dependency iff every a-value maps to exactly one b-value
    (#distinct (a,b) == #distinct a); strength_bp = 10⁴·n_a // n_pairs."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "event_type", "ts", "props"])
    pairs = [(a, b) for a in MI_FEATURES + ("role",)
             for b in MI_FEATURES + ("role",) if a != b]

    def partials(b: pd.DataFrame) -> pd.DataFrame:
        b = _sampled(b)
        f = _field_frame(b).assign(role=b["event_type"].to_numpy())
        frames = []
        for a, c in pairs:
            d = f[[a, c]].drop_duplicates()
            frames.append(pd.DataFrame({
                "pair": f"{a} -> {c}", "a": d[a].to_numpy(),
                "b": d[c].to_numpy()}))
        return pd.concat(frames, ignore_index=True)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates()

    d = bucketed_group_agg(
        ds.map_batches(partials, batch_format="pandas"),
        ["pair", "a", "b"], per_bucket, num_buckets=8).to_pandas()
    agg = d.groupby("pair").agg(
        n_a=("a", "nunique"),
        n_pairs=("a", "size")).reset_index()
    agg["is_dependency"] = (agg["n_a"] == agg["n_pairs"]).astype(np.int64)
    agg["strength_bp"] = (10000 * agg["n_a"]) // agg["n_pairs"]
    for c in ("n_a", "n_pairs", "strength_bp"):
        agg[c] = agg[c].astype(np.int64)
    return agg.sort_values("pair").reset_index(drop=True)


# ---------------------------------------------------------------- PFA
def _moments_partial(b: pd.DataFrame) -> pd.DataFrame:
    """Per-block moment partials for distributed standardization + Gram:
    (n, Σx, Σx², ΣxᵀX) serialized as one row of flat float64 arrays —
    fixed size d + d + d² regardless of block size."""
    mat = np.stack(b["embedding"].to_numpy()).astype(np.float64)
    return pd.DataFrame({
        "n": [np.int64(len(mat))],
        "sx": [mat.sum(axis=0).tobytes()],
        "sxx": [(mat * mat).sum(axis=0).tobytes()],
        "gram": [(mat.T @ mat).tobytes()],
    })


def distributed_correlation(emb_ds) -> tuple[np.ndarray, np.ndarray, np.ndarray, int]:
    """(corr_matrix, mean, std, n) from one streaming pass of fixed-size
    per-block partials (the 100 TB shape: d² floats per block is the
    only thing that leaves the workers)."""
    parts = emb_ds.map_batches(_moments_partial,
                               batch_format="pandas").to_pandas()
    # Ray's streaming executor does not preserve block order; float
    # summation is order-sensitive, so fix a deterministic merge order.
    # Sort on ALL partial blobs — two blocks can share identical column
    # sums (permuted rows) while differing in gram
    parts = parts.sort_values(["sx", "sxx", "gram"],
                              kind="mergesort").reset_index(drop=True)
    n = int(parts["n"].sum())
    sx = np.sum([np.frombuffer(v) for v in parts["sx"]], axis=0)
    sxx = np.sum([np.frombuffer(v) for v in parts["sxx"]], axis=0)
    d = len(sx)
    gram = np.sum([np.frombuffer(v).reshape(d, d) for v in parts["gram"]], axis=0)
    mean = sx / n
    var = sxx / n - mean**2
    std = np.sqrt(np.clip(var, 1e-24, None))
    # correlation of standardized X: (Gram/n − mean⊗mean) / (std⊗std)
    cov = gram / n - np.outer(mean, mean)
    corr = cov / np.outer(std, std)
    return corr, mean, std, n


def _kmeans_euclid(points: np.ndarray, k: int, iters: int = 25,
                   seed: int = 5) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    centers = points[rng.choice(len(points), size=k, replace=False)]
    assign = np.zeros(len(points), dtype=np.int64)
    for _ in range(iters):
        d2 = ((points[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for c in range(k):
            members = points[assign == c]
            if len(members):
                centers[c] = members.mean(axis=0)
    return assign, centers


def pfa_select(emb_ds, n_features: int = 8, q: int | None = None,
               seed: int = 5) -> pd.DataFrame:
    """Principal Feature Analysis (PFA.py:8-33): PCA the standardized
    correlation structure, k-means the component rows, keep the feature
    closest to each center. Moments are distributed; the d×d eig and the
    k-means over d points are driver-side (d ≪ n)."""
    corr, _, _, _ = distributed_correlation(emb_ds)
    d = corr.shape[0]
    q = q or d
    evals, evecs = np.linalg.eigh(corr)  # ascending
    order = np.argsort(evals)[::-1][:q]
    a_q = evecs[:, order]  # (d, q) — rows are features in component space
    assign, centers = _kmeans_euclid(a_q, n_features, seed=seed)
    rows = []
    for c in range(n_features):
        members = np.flatnonzero(assign == c)
        if not len(members):
            continue
        dist = ((a_q[members] - centers[c]) ** 2).sum(axis=1)
        best = members[np.lexsort((members, dist))[0]]
        rows.append({"cluster": c, "feature_idx": int(best),
                     "cluster_size": int(len(members))})
    out = pd.DataFrame(rows)
    for c in ("cluster", "feature_idx", "cluster_size"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values("cluster").reset_index(drop=True)


def q_pfa_features(sf_dir: str) -> pd.DataFrame:
    """PFA over the embeddings table: representative embedding dims
    (rows-only — PCA/k-means aren't SQL; pytest checks against a direct
    single-machine numpy recomputation)."""
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["embedding"])
    return pfa_select(emb, n_features=8)
