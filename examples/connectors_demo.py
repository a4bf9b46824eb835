"""End-to-end connector demo: broker in → rules engine → external effects.

Wires every r5 seam together on synthetic data:

  MockPubSub (pull/ack broker)
    └─ PubSubStream (journal + dedupe window)        [source seam]
         └─ StreamingJob (watermarks, exactly-once manifests)
              ├─ results stream  → committed_dataset (lazy Ray Dataset)
              └─ labels stream   → EffectPump → MockEffectService
                                                     [effect-sink seam]

Includes a mid-run crash + broker redelivery of already-acked messages
to show the exactly-once guarantees doing real work.  Swap MockPubSub
for an adapter over your real subscriber client (PubSubLikeSubscriber
protocol: pull/ack) and MockEffectService for your service client
(EffectClient protocol: apply_labels) — nothing else changes.

Run:  PYTHONPATH=/root/repo python examples/connectors_demo.py
"""

import glob
import json
import shutil
import tempfile

import ray

if not ray.is_initialized():
    ray.init(address="local", num_cpus=8, include_dashboard=False,
             logging_level="ERROR")
from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False

import pyarrow.parquet as pq  # noqa: E402

from osprey_ray.datagen import ensure_dataset  # noqa: E402
from osprey_ray.expr import col, fn  # noqa: E402
from osprey_ray.rules import (  # noqa: E402
    DeclareVerdict,
    Feature,
    HasLabel,
    LabelAdd,
    Rule,
    RuleSpec,
    WhenRules,
)
from osprey_ray.streaming import (  # noqa: E402
    EffectPump,
    MockEffectService,
    MockPubSub,
    PubSubStream,
    StreamingJob,
)

# -- ruleset: flag spam text, label the conversation, react to the label --
spec = RuleSpec(
    features=[
        Feature("IsSpamText",
                fn("CheckCensorized", target=col("text"), words=("free money",))),
    ],
    stateful=[HasLabel("HasMark", label="spam_conv", status="added")],
    rules=[
        Rule("RuleSpam", [col("IsSpamText")]),
        Rule("RuleSawSpam", [col("HasMark")]),
    ],
    triggers=[
        WhenRules(["RuleSpam"], [LabelAdd("spam_conv"), DeclareVerdict("flag_spam")]),
        WhenRules(["RuleSawSpam"], [DeclareVerdict("watch")]),
    ],
)
spec.validate()

# -- publish synthetic transcript turns as JSON messages ------------------
d = ensure_dataset(6_000, seed=42)
broker = MockPubSub()
for p in sorted(glob.glob(f"{d}/stream/seg-*.parquet")):
    df = pq.read_table(p).to_pandas()
    for line in df.to_json(orient="records", lines=True,
                           date_format="iso", date_unit="us").splitlines():
        broker.publish(line.encode())
print(f"published {len(broker.messages)} messages")

out = tempfile.mkdtemp(prefix="demo_out_")
jdir = tempfile.mkdtemp(prefix="demo_journal_")

# -- run, crash after two epochs, redeliver acked messages, resume --------
job = StreamingJob(spec, None, out, {}, num_shards=4,
                   allowed_lateness_s=4000.0,
                   source=PubSubStream(broker, jdir, rows_per_epoch=1_000))
job.run(stop_after_epoch=1)
print(f"crashed after epoch {job.last_committed_epoch()}; "
      f"acked so far: {len(broker.acked)}")
broker.redeliver_acked([broker.messages[i][0] for i in sorted(broker.acked)[:25]])

job = StreamingJob(spec, None, out, {}, num_shards=4,
                   allowed_lateness_s=4000.0,
                   source=PubSubStream(broker, jdir, rows_per_epoch=1_000))
job.run(resume=True)
job.finalize()
assert broker.unacked_count() == 0
n_results = job.committed_dataset("results").count()
print(f"resumed to completion: {n_results} result rows, every message acked")

# -- emit the committed label mutations to the external service -----------
svc = MockEffectService()
pump = EffectPump(job, svc, tempfile.mkdtemp(prefix="demo_effects_"))
stats = pump.pump()
print(f"effects: {stats['rows_emitted']} label mutations emitted, "
      f"{len(svc.applied)} distinct external labels applied")
print("last committed manifest:",
      json.dumps({k: v for k, v in json.load(
          open(job._manifest_path(job.last_committed_epoch()))).items()
          if k in ("epoch", "watermark", "released_rows")}))

shutil.rmtree(out, ignore_errors=True)
shutil.rmtree(jdir, ignore_errors=True)
ray.shutdown()
