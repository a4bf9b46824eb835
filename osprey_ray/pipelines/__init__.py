"""Pipeline query registry.

``registry()`` enumerates every ``q_*`` callable across the pipeline
modules — the analytics/corpus queries a CLI user can run over a
directory of testdata-shaped parquet tables (``python -m osprey_ray
--query NAME --sf-dir DIR``).  The driver's ``__ray_entry__.queries()``
is a superset: it adds the flagship/streaming queries that synthesize
their own transcript datasets.
"""

from __future__ import annotations

from typing import Callable


def registry() -> dict[str, Callable]:
    from osprey_ray.pipelines import analytics, ann, multimodal, textops

    out: dict[str, Callable] = {}
    for mod in (analytics, ann, multimodal, textops):
        for name in dir(mod):
            if name.startswith("q_"):
                fn = getattr(mod, name)
                if callable(fn):
                    out[name[2:]] = fn
    return out
