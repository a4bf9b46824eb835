"""osprey_ray — a Ray-Data-native structured-streaming rules/CEP engine.

A from-scratch rebuild of the *capabilities* of haileyok/osprey (a real-time
event-stream safety rules engine) re-expressed Ray-Data-first:

- events are rows of a ``ray.data.Dataset`` (Arrow blocks), not one-at-a-time
  JSON actions;
- the rule DSL compiles to vectorized ``pyarrow.compute`` kernels applied via
  ``map_batches(batch_format='pyarrow')``;
- cross-event state (labels, sliding-window velocity counters, CEP sequences,
  session windows) lives in per-conversation keyed state, evaluated either
  per-group in a batch pipeline or in a sharded persistent actor pool in the
  streaming (micro-batch epoch) pipeline;
- verdicts flow to an idempotent exactly-once Parquet sink with per-partition
  epoch manifests; per-partition lineage (input offsets, watermark, state
  snapshot) makes a killed run resumable.

Reference semantics citations (``file:line`` into /root/reference) appear in
the relevant docstrings. No reference code is copied; the execution model is
per-batch columnar where the reference is per-event row-oriented.
"""

from osprey_ray.schema import TRANSCRIPT_SCHEMA, VERDICT_SCHEMA, LABEL_EVENT_SCHEMA  # noqa: F401
from osprey_ray.expr import col, lit, fn, and_, or_, not_, fmt  # noqa: F401
from osprey_ray.rules import (  # noqa: F401
    Feature,
    Rule,
    WhenRules,
    DeclareVerdict,
    LabelAdd,
    LabelRemove,
    RuleSpec,
)

__version__ = "0.1.0"
