"""Semantics tests for pipelines.terms (document-term ranking, grouped
mode) — gate parity lives in test_oracle_parity.py; these pin tie and
partition-invariance behavior on crafted inputs."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _write_docs(tmp_path, rows):
    df = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source",
                                     "n_chars"])
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_top_terms_rarer_term_wins_tf_tie(ray_session, tmp_path):
    """Equal tf -> lower df (rarer in corpus) ranks first; equal
    (tf, df) -> lexicographic term order."""
    from associationabacminer_ray.pipelines.terms import top_terms_per_doc

    sf = _write_docs(tmp_path, [
        (1, "common rare common rare", "en", "s", 0),
        (2, "common zebra apple", "en", "s", 0),   # zebra/apple tf=1,df=1
    ])
    got = (top_terms_per_doc(sf).to_pandas()
           .sort_values(["doc_id", "rank"]).reset_index(drop=True))
    d1 = got[got["doc_id"] == 1]
    # doc 1: common & rare both tf=2; df(rare)=1 < df(common)=2
    assert d1["term"].tolist() == ["rare", "common"]
    d2 = got[got["doc_id"] == 2]
    # doc 2: all tf=1; df(apple)=df(zebra)=1 < df(common)=2; lexicographic
    assert d2["term"].tolist() == ["apple", "zebra", "common"]


def test_top_terms_empty_and_null_text(ray_session, tmp_path):
    from associationabacminer_ray.pipelines.terms import top_terms_per_doc

    sf = _write_docs(tmp_path, [
        (1, "", "en", "s", 0),
        (2, None, "en", "s", 0),
        (3, "only words", "en", "s", 0),
    ])
    got = top_terms_per_doc(sf).to_pandas()
    assert set(got["doc_id"]) == {3}


def test_top_terms_bucket_invariance(ray_session):
    """The per-batch prune + bucketed merge must give the identical
    result at 1 bucket vs 16 on real sf0.001 documents."""
    from associationabacminer_ray.pipelines.terms import top_terms_per_doc

    sf = "/root/testdata/sf0.001"
    cols = ["doc_id", "rank", "term", "tf", "df"]
    a = (top_terms_per_doc(sf, num_buckets=1).to_pandas()[cols]
         .sort_values(["doc_id", "rank"]).reset_index(drop=True))
    b = (top_terms_per_doc(sf, num_buckets=16).to_pandas()[cols]
         .sort_values(["doc_id", "rank"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


def test_grouped_mode_tiebreak(ray_session, tmp_path):
    """2-2 tie -> lexicographically smallest event_type."""
    from associationabacminer_ray.pipelines.terms import grouped_mode

    ts = pd.Timestamp("2024-01-10")
    df = pd.DataFrame({
        "event_id": [1, 2, 3, 4],
        "ts": [ts] * 4,
        "user_id": [9, 9, 9, 9],
        "event_type": ["view", "view", "click", "click"],
        "value": [1.0] * 4,
        "props": ["k1"] * 4,
    })
    t = pa.Table.from_pandas(df, preserve_index=False)
    t = t.set_column(t.schema.get_field_index("ts"),
                     pa.field("ts", pa.timestamp("us")),
                     t["ts"].cast(pa.timestamp("us")))
    pq.write_table(t, str(tmp_path / "events.parquet"))
    got = grouped_mode(str(tmp_path)).to_pandas()
    assert got["top_type"].tolist() == ["click"]
    assert got["n"].tolist() == [2]
