"""Chunker, PII redaction, embedding-cosine near-dup."""

import numpy as np
import pandas as pd
import pytest

from associationabacminer_ray.stages.text import Chunker, PIIRedactor

SF = "/root/testdata/sf0.001"


class TestChunker:
    def test_chunks_with_overlap(self):
        text = " ".join(f"w{i}" for i in range(100))
        out = Chunker(chunk_tokens=40, overlap=10)(
            pd.DataFrame({"doc_id": [1], "text": [text]}))
        # steps of 30: starts 0, 30, 60 — the start-60 chunk reaches the
        # end, so no redundant tail chunk is emitted
        assert out["chunk_idx"].tolist() == [0, 1, 2]
        assert out["n_chunk_tokens"].tolist() == [40, 40, 40]
        # overlap: chunk1 starts at token 30
        assert out.loc[1, "chunk_text"].split()[0] == "w30"
        # reconstruction: stitching non-overlap parts yields the original
        stitched = out.loc[0, "chunk_text"].split()
        for i in range(1, len(out)):
            stitched += out.loc[i, "chunk_text"].split()[10:]
        assert stitched == text.split()

    def test_short_and_empty_docs(self):
        out = Chunker(chunk_tokens=40, overlap=10)(
            pd.DataFrame({"doc_id": [1, 2], "text": ["two words", ""]}))
        assert len(out) == 2
        assert out["n_chunk_tokens"].tolist() == [2, 0]

    def test_invalid_overlap(self):
        with pytest.raises(ValueError):
            Chunker(chunk_tokens=8, overlap=8)


class TestPIIRedactor:
    def test_redacts_and_counts(self):
        df = pd.DataFrame({"text": [
            "contact me at jane.doe+x@example.com or 192.168.0.1",
            "card 1234567890123 and phone +1 (555) 123-4567",
            "clean text with no pii",
            None,
        ]})
        out = PIIRedactor()(df)
        assert "[EMAIL]" in out.loc[0, "text"] and "[IPV4]" in out.loc[0, "text"]
        assert "jane" not in out.loc[0, "text"]
        assert "[PHONE]" in out.loc[1, "text"] or "[DIGITS]" in out.loc[1, "text"]
        assert "1234567890123" not in out.loc[1, "text"]
        assert out.loc[2, "text"] == "clean text with no pii"
        assert out["n_pii_redacted"].tolist()[2:] == [0, 0]
        assert out.loc[0, "n_pii_redacted"] >= 2


class TestEmbeddingDups:
    def test_finds_planted_near_duplicate(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from associationabacminer_ray.pipelines.ann import q_embedding_dups

        base = pd.read_parquet(f"{SF}/embeddings.parquet")
        dup = base.iloc[[0]].copy()
        dup["vec_id"] = 99_999
        v = np.array(dup["embedding"].iloc[0], dtype=np.float32)
        noise = np.random.default_rng(3).normal(0, 0.01, v.shape).astype(np.float32)
        dup["embedding"] = [list(v + noise)]
        planted = pd.concat([base, dup], ignore_index=True)
        d = tmp_path / "emb"
        d.mkdir()
        pq.write_table(pa.Table.from_pandas(planted, preserve_index=False),
                       str(d / "embeddings.parquet"))
        out = q_embedding_dups(str(d), threshold=0.9)
        pairs = set(zip(out["id_a"], out["id_b"]))
        # the manually planted copy of vec 0 is found …
        assert (0, 99_999) in pairs
        # … alongside the query's own deterministic plants (vec_id+2^40
        # for every 10th vector), so the pair list is non-trivial
        assert (0, 1 << 40) in pairs
        n_auto = (base["vec_id"] % 10 == 0).sum()
        assert len(pairs) >= n_auto
