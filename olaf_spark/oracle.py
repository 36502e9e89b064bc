"""Pure-Python single-node reference engine ("mem DB" move, SURVEY §7.2).

Reference analogue: Olaf validates its LMDB build against a trivially
correct in-memory implementation of the same interface
(`src/olaf_db_mem.c`, selected at compile time `src/olaf.c:66-69`).
This module is that referent for our Spark engine: a dict-of-lists
inverted index with exhaustive BM25 scoring, identical tokenizer bytes.
Every Spark query path must be rank-identical (top-k doc_ids and scores)
to this engine on the reference query set — the north_rule contract.

BM25 (fixed for the whole project; changing it invalidates indexes/goldens):

    idf(t)   = ln(1 + (N - df + 0.5) / (df + 0.5))          # Lucene-style, >= 0
    w(t, d)  = idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
    score    = sum over *distinct* query terms (qtf ignored)

Determinism: contributions are accumulated in ascending term order,
float64; ties broken by (score desc, doc_id asc).
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from olaf_spark.config import EngineConfig
from olaf_spark.tokenize import tokenize_py


class OracleIndex:
    def __init__(self, cfg: EngineConfig | None = None):
        self.cfg = cfg or EngineConfig()
        self.postings: dict[str, list[tuple[int, int]]] = defaultdict(list)  # term -> [(doc_id, tf)]
        self.doc_len: dict[int, int] = {}
        self.n_docs = 0
        self.avgdl = 0.0

    @classmethod
    def build(cls, docs: list[tuple[int, str]], cfg: EngineConfig | None = None) -> "OracleIndex":
        """docs: [(doc_id, text)]"""
        ix = cls(cfg)
        for doc_id, text in docs:
            toks = tokenize_py(text, ix.cfg)
            ix.doc_len[doc_id] = len(toks)
            for term, tf in Counter(toks).items():
                ix.postings[term].append((doc_id, tf))
        for term in ix.postings:
            ix.postings[term].sort()
        ix.n_docs = len(ix.doc_len)
        ix.avgdl = sum(ix.doc_len.values()) / ix.n_docs if ix.n_docs else 0.0
        return ix

    def idf(self, term: str) -> float:
        df = len(self.postings.get(term, ()))
        return math.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5))

    def score_all(self, query_text: str) -> dict[int, float]:
        """Exhaustive BM25 scores for all docs matching >=1 query term."""
        cfg = self.cfg
        terms = sorted(set(tokenize_py(query_text, cfg)))  # distinct, ascending order
        acc: dict[int, float] = defaultdict(float)
        for term in terms:
            plist = self.postings.get(term)
            if not plist:
                continue
            w_idf = self.idf(term)
            for doc_id, tf in plist:
                dl = self.doc_len[doc_id]
                norm = tf * (cfg.k1 + 1.0) / (tf + cfg.k1 * (1.0 - cfg.b + cfg.b * dl / self.avgdl))
                acc[doc_id] += w_idf * norm
        return dict(acc)

    def topk(self, query_text: str, k: int = 10) -> list[tuple[int, float]]:
        """[(doc_id, score)] sorted by (score desc, doc_id asc)."""
        scores = self.score_all(query_text)
        ranked = sorted(scores.items(), key=lambda x: (-x[1], x[0]))
        return ranked[:k]
