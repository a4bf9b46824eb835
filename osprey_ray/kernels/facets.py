"""atproto facets extractors + the remaining example-plugin list kernels.

Analogues of /root/reference/example_plugins/src/udfs/atproto/facets.py:36-103
(LinksFromFacets / MentionsFromFacets / TagsFromFacets) and
list.py SimpleListContains (:270) / string.py ExtractListDomains (:110-118).

The facets input is the ``operation.record.facets`` payload — either a JSON
string column or an already-parsed list-of-struct column.  Reference
semantics mirrored exactly, including the early-return: a facet with no
``features`` key stops the scan and returns what was collected so far
(facets.py:46-48), and features missing ``$type`` or the value key are
skipped.  Extraction is per-row over small nested objects (the same shape
as the JsonData kernel); the Arrow list<struct> input path skips the
json.loads cost.
"""

from __future__ import annotations

import json
import re

import pyarrow as pa
import pyarrow.compute as pc

from osprey_ray.expr import ExprError
from osprey_ray.kernels import kernel


def _extract_from_facets(facets, feature_type: str, key: str) -> list[str]:
    if facets is None:
        return []
    if isinstance(facets, (str, bytes)):
        try:
            facets = json.loads(facets)
        except (json.JSONDecodeError, ValueError):
            raise ExprError("bad facets json")
    if not isinstance(facets, list):
        return []
    out: list[str] = []
    for facet in facets:
        if not isinstance(facet, dict) or "features" not in facet or facet["features"] is None:
            # reference behavior: a facet without features RETURNS the
            # values collected so far (facets.py:46-48), not continue
            return out
        for feature in facet["features"]:
            if not isinstance(feature, dict):
                continue
            if feature.get("$type") == feature_type and key in feature:
                v = feature[key]
                if v is not None:
                    out.append(str(v).lower())
    return out


def _facets_kernel(name: str, feature_type: str, key: str):
    def row(rctx, facets):
        return _extract_from_facets(facets, feature_type, key)

    def batch(ctx, facets):
        vals = facets.to_pylist()
        out = []
        err = []
        for v in vals:
            try:
                out.append(_extract_from_facets(v, feature_type, key))
            except ExprError:
                out.append(None)
                err.append(len(out) - 1)
        if err:
            import numpy as np

            mask = np.zeros(ctx.n, dtype=bool)
            mask[err] = True
            ctx.add_errors(mask)
        return pa.array(out, pa.list_(pa.string()))

    cls = type(name, (), {"batch": staticmethod(batch), "row": staticmethod(row)})
    return kernel(name)(cls)


LinksFromFacets = _facets_kernel("LinksFromFacets", "app.bsky.richtext.facet#link", "uri")
MentionsFromFacets = _facets_kernel("MentionsFromFacets", "app.bsky.richtext.facet#mention", "did")
TagsFromFacets = _facets_kernel("TagsFromFacets", "app.bsky.richtext.facet#tag", "tag")


_W_RE2 = r"[^\p{L}\p{N}_]"


@kernel("SimpleListContains")
class SimpleListContains:
    """First word of the inline word list found in any of the row's phrases
    (word-boundary substring match, case-insensitive by default) — the
    reference's SimpleListContains (list.py:270-300) with the list supplied
    inline.  Returns the matching word or null.

    Batch path: one RE2 match per constant word over the flattened phrase
    array, segment-reduced per row — no per-row Python."""

    @staticmethod
    def batch(ctx, target, words, case_sensitive=False, word_boundaries=True):
        import numpy as np

        if isinstance(target, pa.ChunkedArray):
            target = target.combine_chunks()
        flat = target.flatten()
        offsets = np.asarray(target.offsets)
        offsets = offsets - offsets[0]
        n = len(target)
        valid = target.is_valid().to_numpy(zero_copy_only=False)
        result = np.full(n, -1, dtype=np.int64)
        for wi, word in enumerate(words):
            if word_boundaries:
                pat = f"(?:^|{_W_RE2})" + re.escape(word) + f"(?:{_W_RE2}|$)"
                m = pc.match_substring_regex(flat, pattern=pat, ignore_case=not case_sensitive)
            else:
                m = pc.match_substring(flat, pattern=word, ignore_case=not case_sensitive)
            mn = pc.fill_null(m, False).to_numpy(zero_copy_only=False)
            cums = np.concatenate([[0], np.cumsum(mn.astype(np.int64))])
            row_any = (cums[offsets[1:]] - cums[offsets[:-1]]) > 0
            hit = row_any & (result < 0)
            result[hit] = wi
        out = [words[i] if i >= 0 else None for i in result]
        return pa.array([v if ok else None for v, ok in zip(out, valid)], pa.string())

    @staticmethod
    def row(rctx, target, words, case_sensitive=False, word_boundaries=True):
        if target is None:
            raise ExprError("None")
        flags = 0 if case_sensitive else re.IGNORECASE
        for word in words:
            for phrase in target:
                if phrase is None:
                    continue
                if word_boundaries:
                    if re.search(r"(?:^|\W)" + re.escape(word) + r"(?:\W|$)", phrase, flags):
                        return word
                else:
                    w = word if case_sensitive else word.lower()
                    p = phrase if case_sensitive else phrase.lower()
                    if w in p:
                        return word
        return None


@kernel("ExtractListDomains")
class ExtractListDomains:
    """Domains extracted from every string in a list column, deduped keeping
    first appearance (string.py:110-118; the reference's set() order is
    nondeterministic — appearance order is the deterministic choice)."""

    @staticmethod
    def batch(ctx, target):
        from osprey_ray.kernels.strings import _DOMAIN_OF_URL_RE

        if isinstance(target, pa.ChunkedArray):
            target = target.combine_chunks()
        # join per-row lists in Python, SKIPPING null elements like the
        # row/oracle path does — pc.binary_join instead nulls the whole row
        # when any element is null (round-3 advice divergence).  The regex
        # scan below is the dominant cost either way.
        out = []
        for v in target.to_pylist():
            if v is None:
                out.append(None)
                continue
            text = " ".join(x for x in v if x is not None)
            seen: list[str] = []
            have = set()
            for m in _DOMAIN_OF_URL_RE.finditer(text):
                d = m.group(1).lower()
                if d not in have:
                    have.add(d)
                    seen.append(d)
            out.append(seen)
        return pa.array(out, pa.list_(pa.string()))

    @staticmethod
    def row(rctx, target):
        from osprey_ray.kernels.strings import _DOMAIN_OF_URL_RE

        if target is None:
            raise ExprError("None")
        seen: list[str] = []
        have = set()
        for s in target:
            if s is None:
                continue
            for m in _DOMAIN_OF_URL_RE.finditer(s):
                d = m.group(1).lower()
                if d not in have:
                    have.add(d)
                    seen.append(d)
        return seen
