"""Model-scorer actor-pool stage (AnalyzeSentiment / AnalyzeToxicity
analogue, /root/reference/example_plugins/src/udfs/sentiment.py:81-132,
toxicity.py:45-87).

The reference calls an HTTP model server per event, gated by ``when_all``;
ours is the canonical Ray Data inference shape: a callable class whose
``__init__`` loads the model ONCE per actor, scoring whole Arrow batches,
with the gate applied so only gated rows are scored (ungated rows get
nulls — the reference skips the call the same way).

No ML runtime ships in this container, so ``_FakeSentimentModel`` is a
clearly-marked deterministic stand-in (token-hash valence).  Swap
``_load_model``/``_score`` for a real tokenizer+model (and give the stage
``num_gpus``) without touching the pipeline shape.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


class _FakeSentimentModel:
    """Deterministic stand-in: mean of per-token md5-derived valences in
    [-1, 1].  Stable across processes/runs (replay-safe), and md5 (not
    blake2b) so DuckDB can reproduce it exactly — ``score_batch_exact``
    additionally returns the per-row INTEGER token-valence sum and token
    count, the float-free duals the oracle aggregates over (round-2
    verdict item #5)."""

    def score_batch_exact(
        self, texts: list[str]
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        scores = np.empty(len(texts))
        vsums = np.zeros(len(texts), dtype=np.int64)
        ntoks = np.zeros(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            toks = t.split()
            if not toks:
                scores[i] = 0.0
                continue
            raw = [hashlib.md5(w.encode()).digest()[0] for w in toks]
            vsums[i] = sum(raw)
            ntoks[i] = len(raw)
            scores[i] = float(vsums[i]) / (127.5 * len(raw)) - 1.0
        return scores, vsums, ntoks

    def score_batch(self, texts: list[str]) -> np.ndarray:
        return self.score_batch_exact(texts)[0]


class SentimentScorer:
    """``ds.map_batches(SentimentScorer, batch_format='pyarrow',
    concurrency=N, batch_size=B)`` — model loaded once per actor."""

    def __init__(self, text_col: str = "text", gate_col: str | None = None):
        self.model = self._load_model()  # once per actor (the expensive part)
        self.text_col = text_col
        self.gate_col = gate_col

    @staticmethod
    def _load_model():
        # real path: load tokenizer + ONNX/torch model here
        return _FakeSentimentModel()

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t[self.text_col].to_pylist()
        if self.gate_col is not None:
            gate = pc.fill_null(t[self.gate_col], False).to_numpy(zero_copy_only=False)
        else:
            gate = np.ones(len(texts), dtype=bool)
        scores = np.full(len(texts), np.nan)
        vsums = np.zeros(len(texts), dtype=np.int64)
        ntoks = np.zeros(len(texts), dtype=np.int64)
        idx = [i for i in np.flatnonzero(gate) if texts[i] is not None]
        if idx:
            s, v, n = self.model.score_batch_exact([texts[i] for i in idx])
            scores[idx], vsums[idx], ntoks[idx] = s, v, n
        col = pa.array(scores, pa.float64())
        col = pc.if_else(pa.array(np.isnan(scores)), pa.nulls(len(texts), pa.float64()), col)
        t = t.append_column("sentiment_score", col)
        # integer duals of the fake score, used by the oracle aggregate
        t = t.append_column("sentiment_valence_sum", pa.array(vsums, pa.int64()))
        return t.append_column("sentiment_n_tokens", pa.array(ntoks, pa.int64()))


def score_documents(sf_dir: str, concurrency: int = 2):
    """documents → gated sentiment scoring (gate: en docs only), the
    reference's when_all gating re-expressed as a precomputed gate column."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"])

    def gate(t: pa.Table) -> pa.Table:
        return t.append_column("is_en", pc.equal(t["lang"], "en"))

    return ds.map_batches(gate, batch_format="pyarrow").map_batches(
        SentimentScorer,
        batch_format="pyarrow",
        batch_size=1024,
        concurrency=concurrency,
        fn_constructor_kwargs={"gate_col": "is_en"},
    )


def q_model_scoring(sf_dir: str):
    """Scored docs summary: per lang, count of scored rows + the integer
    token-valence sum and token count the fake model derives its scores
    from.  Fully integer aggregates over md5-derived values — DuckDB
    computes the identical numbers, so the driver hash-verifies the whole
    actor-pool inference shape (gate, init-once model, batching)."""
    from ray.data.aggregate import Sum

    ds = score_documents(sf_dir)

    def proj(t: pa.Table) -> pa.Table:
        scored = pc.cast(pc.if_else(t["sentiment_score"].is_valid(), 1, 0), pa.int64())
        return pa.table(
            {
                "lang": t["lang"],
                "scored": scored,
                "vs": t["sentiment_valence_sum"],
                "nt": t["sentiment_n_tokens"],
            }
        )

    return (
        ds.map_batches(proj, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(
            Sum("scored", alias_name="n_scored"),
            Sum("vs", alias_name="valence_sum"),
            Sum("nt", alias_name="n_tokens"),
        )
    )
