"""Remaining plugin-pack kernels (SURVEY §2.2/§2.3 tail).

- ``ExtractEmoji`` — example_plugins/src/udfs/string.py:22-123 (same public
  Unicode emoji block ranges).
- ``CensorizedListContains`` — example_plugins/src/udfs/list.py family:
  obfuscation-tolerant wordlist match over a token list.
- ``EntityJson`` — stdlib/udfs/entity.py:25-64: entity id pulled from the
  JSON payload by path.
- ``DidFromUri`` — example_plugins/src/udfs/atproto/diduri.py:17-29:
  authority segment of an at:// URI (no atproto lib needed — the grammar is
  public: ``at://<did>/<collection>/<rkey>``).
- ``MXLookup`` — stdlib/udfs/mx_lookup.py:15-31 is an async DNS lookup; no
  network in this environment, so the kernel is a clearly-marked STUB with
  a deterministic fake resolver (documented; swap ``_resolve`` for aiodns
  in production).  The Ray-side shape (per-batch unique-key dedupe →
  resolver → join back) is real.
"""

from __future__ import annotations

import re

import pyarrow as pa

from osprey_ray.expr import ExprError
from osprey_ray.kernels import kernel
from osprey_ray.kernels.strings import _censor_pattern, _clean_string

EMOJI_PATTERN = re.compile(
    "["
    "\U0001f600-\U0001f64f"  # emoticons
    "\U0001f300-\U0001f5ff"  # symbols & pictographs
    "\U0001f680-\U0001f6ff"  # transport & map
    "\U0001f1e0-\U0001f1ff"  # flags
    "☀-➿"          # misc symbols / dingbats
    "]",
)


@kernel("ExtractEmoji")
class ExtractEmoji:
    @staticmethod
    def batch(ctx, target):
        out = [None if v is None else EMOJI_PATTERN.findall(v) for v in target.to_pylist()]
        return pa.array(out, pa.list_(pa.string()))

    @staticmethod
    def row(rctx, target):
        if target is None:
            raise ExprError("None")
        return EMOJI_PATTERN.findall(target)


@kernel("CensorizedListContains")
class CensorizedListContains:
    """Any token matches the obfuscation-tolerant wordlist pattern."""

    @staticmethod
    def batch(ctx, target, words):
        rx = _censor_pattern(tuple(words))
        out = []
        for lst in target.to_pylist():
            if lst is None:
                out.append(None)
            else:
                out.append(
                    any(rx.search(_clean_string(t)) is not None for t in lst if t is not None)
                )
        return pa.array(out, pa.bool_())

    @staticmethod
    def row(rctx, target, words):
        if target is None:
            raise ExprError("None")
        rx = _censor_pattern(tuple(words))
        return any(rx.search(_clean_string(t)) is not None for t in target if t is not None)


@kernel("EntityJson")
class EntityJson:
    """Entity keyed by a JSON-path value: ``type/"<payload[path]>"``."""

    @staticmethod
    def batch(ctx, target, type, path):
        from osprey_ray.kernels import get_kernel

        ids = get_kernel("JsonData").batch(ctx, target=target, path=path, required=False, coerce_type="str")
        return get_kernel("Entity").batch(ctx, type=type, id=ids)

    @staticmethod
    def row(rctx, target, type, path):
        from osprey_ray.kernels import get_kernel

        v = get_kernel("JsonData").row(rctx, target=target, path=path, required=False, coerce_type="str")
        if v is None:
            raise ExprError("None entity id")
        return f"{type}/{v}"


_AT_URI_RE = re.compile(r"^at://([^/]+)")


@kernel("DidFromUri")
class DidFromUri:
    @staticmethod
    def batch(ctx, target):
        out = []
        for v in target.to_pylist():
            if v is None:
                out.append(None)
                continue
            m = _AT_URI_RE.match(v)
            out.append(m.group(1) if m else None)
        return pa.array(out, pa.string())

    @staticmethod
    def row(rctx, target):
        if target is None:
            return None
        m = _AT_URI_RE.match(target)
        if m is None:
            raise ExprError("not an at-uri")
        return m.group(1)


def _fake_resolve_mx(domain: str) -> str:
    """Default STUB resolver — deterministic fake (no network in this
    sandbox).  Production swaps in a real resolver via
    :func:`set_mx_resolver`."""
    import hashlib

    h = hashlib.blake2b(domain.encode(), digest_size=4).digest()
    return f"mx.{domain}|{h[0]}.{h[1]}.{h[2]}.{h[3]}"


_mx_resolver = _fake_resolve_mx
_MX_CACHE: dict[str, str] = {}
_MX_CACHE_MAX = 65_536  # coarse bound: full clear at capacity


def set_mx_resolver(fn, clear_cache: bool = True):
    """Inject the DNS resolver (``domain -> str``) the MXLookup kernel
    calls — e.g. an aiodns MX→A lookup, exactly the reference's
    mx_lookup.py:15-31 shape.  Runs once per DISTINCT domain per worker
    process (cross-batch memo cache mirrors the reference's
    external-service memoisation, external_service_utils.py:12-100).
    Returns the previous resolver so tests can restore it."""
    global _mx_resolver
    prev = _mx_resolver
    _mx_resolver = fn
    if clear_cache:
        _MX_CACHE.clear()
    return prev


def _resolve_mx(domain: str) -> str:
    v = _MX_CACHE.get(domain)
    if v is None:
        if len(_MX_CACHE) >= _MX_CACHE_MAX:
            _MX_CACHE.clear()
        v = _mx_resolver(domain)
        _MX_CACHE[domain] = v
    return v


@kernel("MXLookup")
class MXLookup:
    """Per-batch unique-key dedupe → resolver → join back (the reference's
    external-service memoisation, engine/executor/external_service_utils.py
    :12-100, becomes one lookup per distinct domain per batch)."""

    @staticmethod
    def batch(ctx, target):
        vals = target.to_pylist()
        uniq = {v for v in vals if v is not None}
        table = {v: _resolve_mx(v) for v in uniq}
        return pa.array([None if v is None else table[v] for v in vals], pa.string())

    @staticmethod
    def row(rctx, target):
        if target is None:
            raise ExprError("None")
        return _resolve_mx(target)
