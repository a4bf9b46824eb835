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
    """Deterministic stand-in: mean of per-token blake2b-derived valences
    in [-1, 1].  Stable across processes/runs (replay-safe)."""

    def score_batch(self, texts: list[str]) -> np.ndarray:
        out = np.empty(len(texts))
        for i, t in enumerate(texts):
            toks = t.split()
            if not toks:
                out[i] = 0.0
                continue
            vals = [
                (hashlib.blake2b(w.encode(), digest_size=2).digest()[0] / 127.5) - 1.0
                for w in toks
            ]
            out[i] = float(np.mean(vals))
        return out


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
        idx = [i for i in np.flatnonzero(gate) if texts[i] is not None]
        if idx:
            scored = self.model.score_batch([texts[i] for i in idx])
            scores[idx] = scored
        col = pa.array(scores, pa.float64())
        col = pc.if_else(pa.array(np.isnan(scores)), pa.nulls(len(texts), pa.float64()), col)
        return t.append_column("sentiment_score", col)


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
    """Scored docs summary: per lang, count of scored rows + mean score in
    millis (int) — deterministic fake model → stable rows-only check."""
    from ray.data.aggregate import Sum

    ds = score_documents(sf_dir)

    def proj(t: pa.Table) -> pa.Table:
        scored = pc.if_else(t["sentiment_score"].is_valid(), 1, 0)
        millis = pc.cast(
            pc.round(pc.multiply(pc.fill_null(t["sentiment_score"], 0.0), 1000.0)),
            pa.int64(),
        )
        return pa.table({"lang": t["lang"], "scored": pc.cast(scored, pa.int64()), "millis": millis})

    return (
        ds.map_batches(proj, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Sum("scored", alias_name="n_scored"), Sum("millis", alias_name="score_millis_sum"))
    )
