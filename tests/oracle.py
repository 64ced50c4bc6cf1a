"""Pure-Python BM25 oracle — the cross-implementation consistency check.

Reference parity: bliss-rs validates its pipeline against independently
generated librosa ``.npy`` goldens (/root/reference/src/utils.rs:528-541)
and cross-checks two decoders against each other
(/root/reference/src/song/mod.rs:636-689).  This module is our "second
decoder": a from-scratch scorer sharing only the tokenizer spec function,
no Spark."""

from __future__ import annotations

import math

from bliss_rs_spark.functions.tokenizer import term_counts


class OracleIndex:
    def __init__(self, docs: list[dict], k1: float = 1.2, b: float = 0.75,
                 lang_tagging: bool = False):
        self.k1, self.b = k1, b
        self.lang_tagging = lang_tagging
        self.tf: dict[int, dict[str, int]] = {}
        self.dl: dict[int, int] = {}
        for d in docs:
            counts = term_counts(d["content"], d.get("lang"), lang_tagging)
            self.tf[d["doc_id"]] = counts
            self.dl[d["doc_id"]] = sum(counts.values())
        self.n_docs = len(self.tf)
        self.avgdl = (sum(self.dl.values()) / self.n_docs) if self.n_docs else 0.0
        self.df: dict[str, int] = {}
        for counts in self.tf.values():
            for t in counts:
                self.df[t] = self.df.get(t, 0) + 1

    def idf(self, term: str) -> float:
        df = self.df.get(term, 0)
        return math.log((self.n_docs - df + 0.5) / (df + 0.5) + 1.0)

    def score(self, doc_id: int, terms: list[str]) -> float:
        s = 0.0
        dl = self.dl[doc_id]
        for t in sorted(set(terms)):
            tf = self.tf[doc_id].get(t, 0)
            if tf == 0:
                continue
            norm = 1.0 - self.b + self.b * dl / self.avgdl
            s += self.idf(t) * tf * (self.k1 + 1.0) / (tf + self.k1 * norm)
        return s

    def topk(self, query_text: str, k: int) -> list[tuple[int, float]]:
        terms = sorted(term_counts(query_text, None, self.lang_tagging).keys())
        scored = []
        for doc_id in self.tf:
            s = self.score(doc_id, terms)
            if s > 0.0:
                scored.append((doc_id, s))
        scored.sort(key=lambda x: (-x[1], x[0]))
        return scored[:k]
