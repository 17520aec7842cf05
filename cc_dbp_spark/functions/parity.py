"""Deterministic draw kernel — bit-exact parity with the reference's
java.util.Random / String.hashCode / SHA-1 composition.

The reference derives every sampling, splitting, salting, and ordering
decision from these functions (reference semantics at
``util/.../RandomUtil.java:37-47``, ``kbp/.../GroundTruth.java:153-247``,
``kbp/.../RelexMention.java:127-132,298-303``,
``kbp/.../GroupRelexMentionTsvDataset.java:87-89``). The rebuild's crawl
ordering, URL-seen set, downsample filters, and skew salts all inherit
determinism from here, so these must match the JVM bit-for-bit.

Everything below is vectorized numpy over arrays of inputs. The only
per-element C call is ``hashlib.sha1``; the LCG stages are pure uint64
array arithmetic, so these run Arrow-batched inside pandas UDFs with no
per-row Python in the Spark plan.

Golden vectors in ``tools/golden_vectors.tsv`` were generated from the
actual JDK (``tools/GenGoldenVectors.java``); tests assert exact equality.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterable

import numpy as np
import pandas as pd

_MULT = np.uint64(0x5DEECE66D)
_ADD = np.uint64(0xB)
_MASK = np.uint64((1 << 48) - 1)
_TWO53 = float(1 << 53)


def _scramble(seed: np.ndarray) -> np.ndarray:
    """java.util.Random(seed) initial scramble. seed: uint64 array."""
    return (seed ^ _MULT) & _MASK


def _next(state: np.ndarray, bits: int) -> tuple[np.ndarray, np.ndarray]:
    """One LCG step; returns (new_state, top-`bits` value as uint64)."""
    state = (state * _MULT + _ADD) & _MASK
    return state, state >> np.uint64(48 - bits)


def java_random_next_double(seed: np.ndarray | Iterable[int]) -> np.ndarray:
    """Vectorized ``new java.util.Random(seed).nextDouble()``.

    seed: array-like of int64 (interpreted as Java signed long).
    Returns float64 array in [0, 1).
    """
    seed = np.asarray(seed, dtype=np.int64).view(np.uint64)
    state = _scramble(seed)
    state, hi = _next(state, 26)
    state, lo = _next(state, 27)
    return ((hi << np.uint64(27)) + lo).astype(np.float64) / _TWO53


def java_random_next_int(seed: np.ndarray | Iterable[int], n: int) -> np.ndarray:
    """Vectorized ``new java.util.Random(seed).nextInt(n)`` for n >= 1.

    Handles both the power-of-two fast path and the rejection loop
    (iterating the rare rejects until all lanes accept).
    """
    if n <= 0:
        raise ValueError("n must be positive")
    seed = np.asarray(seed, dtype=np.int64).view(np.uint64)
    state = _scramble(seed)
    un = np.uint64(n)
    if (n & -n) == n:  # power of two
        state, bits = _next(state, 31)
        return ((un * bits) >> np.uint64(31)).astype(np.int64)
    out = np.zeros(len(state), dtype=np.int64)
    pending = np.arange(len(state))
    st = state
    while len(pending):
        st, bits = _next(st, 31)
        val = bits % un
        # overflow test: bits - val + (n-1) < 0 in signed int32
        acc = (bits.astype(np.int64) - val.astype(np.int64) + (n - 1)) <= np.int64(2**31 - 1)
        out[pending[acc]] = val[acc].astype(np.int64)
        pending = pending[~acc]
        st = st[~acc]
    return out


def sha1_head_long(strings: Iterable[str]) -> np.ndarray:
    """SHA-1(UTF-8(s)) -> first 8 bytes big-endian -> signed int64 array."""
    vals = [
        int.from_bytes(hashlib.sha1(s.encode("utf-8")).digest()[:8], "big", signed=True)
        for s in strings
    ]
    return np.array(vals, dtype=np.int64)


def pseudo_random_from_string(strings: Iterable[str]) -> np.ndarray:
    """Vectorized ``RandomUtil.pseudoRandomFromString`` (D1).

    SHA-1(UTF-8(s)) -> first-8-bytes big-endian signed long ->
    ``new java.util.Random(seed).nextDouble()``.
    """
    strings = list(strings)
    if not strings:
        return np.empty(0, dtype=np.float64)
    return java_random_next_double(sha1_head_long(strings))


def java_string_hashcode(strings: Iterable[str]) -> np.ndarray:
    """Vectorized java ``String.hashCode`` over UTF-16 code units (int32)."""
    out = []
    for s in strings:
        h = np.int32(0)
        units = np.frombuffer(s.encode("utf-16-be"), dtype=">u2").astype(np.int32)
        with np.errstate(over="ignore"):
            for u in units:
                h = np.int32(np.int32(31) * h + np.int32(u))
        out.append(int(h))
    return np.array(out, dtype=np.int64)  # keep as int64 seed-ready (sign-extended int32)


def java_string_hashcode_fast(strings: pd.Series | Iterable[str]) -> np.ndarray:
    """Batched String.hashCode using a precomputed power table (vectorized
    inner product per string; loop only over strings, not characters)."""
    vals = []
    pw_cache: dict[int, np.ndarray] = {}
    for s in strings:
        units = np.frombuffer(s.encode("utf-16-be"), dtype=">u2").astype(np.uint32)
        n = len(units)
        if n == 0:
            vals.append(0)
            continue
        pows = pw_cache.get(n)
        if pows is None:
            # 31^(n-1-i) mod 2^32
            pows = np.empty(n, dtype=np.uint32)
            p = np.uint32(1)
            with np.errstate(over="ignore"):
                for i in range(n - 1, -1, -1):
                    pows[i] = p
                    p = p * np.uint32(31)
            pw_cache[n] = pows
        with np.errstate(over="ignore"):
            h = np.uint32(np.sum(units * pows, dtype=np.uint32))
        vals.append(int(np.int32(h)))
    return np.array(vals, dtype=np.int64)


# --- keyed draws (D2-D7), exactly the reference's key prefixes ---

def document_downsample_priority(text_or_id: Iterable[str]) -> np.ndarray:
    """D2: draw for doc downsample = D1("SAMPLEDOC"+s) (GroundTruth.java:169-174)."""
    return pseudo_random_from_string("SAMPLEDOC" + s for s in text_or_id)


def ordered_id_pair(id1: Iterable[str], id2: Iterable[str]) -> list[str]:
    """Lexicographically ordered tab-joined pair (GroundTruth.java:153-161).

    KNOWN DIVERGENCE (documented, not fixed): Java ``String.compareTo``
    orders by UTF-16 code units, which places supplementary-plane
    characters (surrogate pairs, lead 0xD800-0xDBFF) BEFORE
    U+E000..U+FFFF; Python/Spark/DuckDB compare by code point and order
    them after. An entity id containing a character in U+E000..U+FFFF
    compared against one with a supplementary-plane character (emoji,
    rare CJK extensions) therefore pairs in the opposite order, flipping
    the D3/D4 draw strings and the ARGONE/ARGTWO assignment for that
    pair. KB entity ids are URI-shaped ASCII in every reference dataset,
    so the divergence is unreachable in practice; matching it would
    require a per-character UTF-16 re-encode on the hot path of every
    pair draw (engine AND oracle), which is not worth the cost. The
    engine and the DuckDB oracles share the code-point order, so the
    gate stays consistent."""
    return [a + "\t" + b if a <= b else b + "\t" + a for a, b in zip(id1, id2)]


def negative_downsample_priority(id1: Iterable[str], id2: Iterable[str]) -> np.ndarray:
    """D3: D1("DOWNSAMPLEID"+orderedPair) (GroundTruth.java:213-241)."""
    return pseudo_random_from_string(
        "DOWNSAMPLEID" + p for p in ordered_id_pair(id1, id2)
    )


def split_location(id1: Iterable[str], id2: Iterable[str]) -> np.ndarray:
    """D4: D1("SPLIT"+orderedPair) (GroundTruth.java:184-205)."""
    return pseudo_random_from_string("SPLIT" + p for p in ordered_id_pair(id1, id2))


def group_salt(sentences: Iterable[str], split_count: np.ndarray | int) -> np.ndarray:
    """D5: floor(D1("GS:"+sentence)*splitCount) clamped (RelexMention.java:127-132).

    split_count may be a scalar or per-row array.
    """
    draws = pseudo_random_from_string("GS:" + s for s in sentences)
    sc = np.asarray(split_count, dtype=np.int64)
    ndx = np.floor(draws * sc).astype(np.int64)
    return np.minimum(ndx, sc - 1)


def learning_curve_position(doc_ids: Iterable[str]) -> np.ndarray:
    """D6: new Random(docId.hashCode()+123321).nextDouble() (RelexMention.java:298-303).

    Java evaluates ``hashCode() + 123321`` in 32-BIT int arithmetic (the
    wrapped int then widens to long for the Random seed), so hashCodes
    above INT_MAX-123321 wrap negative — an int64 add here diverged from
    the live JVM on exactly those ids (verified against java.util.Random
    directly; golden vectors never covered the boundary)."""
    hc = java_string_hashcode_fast(doc_ids)
    with np.errstate(over="ignore"):
        seed = (hc.astype(np.int32) + np.int32(123321)).astype(np.int64)
    return java_random_next_double(seed)


def partition_assignment(group_ids: Iterable[str], num_parts: int) -> np.ndarray:
    """D7: new Random(groupId.hashCode()).nextInt(numParts)
    (GroupRelexMentionTsvDataset.java:87-89)."""
    hc = java_string_hashcode_fast(group_ids)
    return java_random_next_int(hc, num_parts)


def sample_from_cdf(draws: np.ndarray, cdf: list[float]) -> np.ndarray:
    """Bucket index of draw under a CDF (RandomUtil.sampleFromCDF shape,
    used for train/val/test split assignment via D4)."""
    return np.searchsorted(np.asarray(cdf, dtype=np.float64), draws, side="right")


def pseudo_random_from_string_col(c):
    """Native-Column twin of :func:`pseudo_random_from_string` (D1) —
    bit-exact ``new java.util.Random(sha1_head_long(s)).nextDouble()``
    with zero Python in the plan, so hot paths (the frontier tie-break
    over 10^10 urls/round) skip the Arrow round-trip entirely.

    Stays inside ANSI-safe 64-bit arithmetic: the LCG state is < 2^48,
    the 48-bit multiply splits into 24-bit halves (products <= 2^59),
    and the seed's low 48 bits come straight from sha1 hex chars 5..16
    (the scramble XOR masks the top 16 bits away, so the signed head
    long's high bits never matter). The mantissa sum hi*2^27 + lo is
    < 2^53, so the final double scale by 2^-53 is exact — identical
    rounding to the JDK. Golden-tested against tools/golden_vectors.tsv
    and differentially against the numpy twin.
    """
    from pyspark.sql import functions as F

    mask24 = 1 << 24
    a_low24 = int(_MULT) % mask24

    def step(s):
        lo24 = s % F.lit(mask24)
        hi24 = F.shiftright(s, 24)
        prod_low = lo24 * F.lit(int(_MULT))
        term_h = F.pmod(hi24 * F.lit(a_low24), F.lit(mask24)) * F.lit(mask24)
        return F.pmod(prod_low + term_h + F.lit(int(_ADD)), F.lit(1 << 48))

    low48 = F.conv(F.substring(F.sha1(c), 5, 12), 16, 10).cast("long")
    s0 = low48.bitwiseXOR(F.lit(int(_MULT)))
    s1 = step(s0)
    s2 = step(s1)
    hi = F.shiftright(s1, 22)  # next(26)
    lo = F.shiftright(s2, 21)  # next(27)
    return ((hi * F.lit(1 << 27) + lo).cast("double") * F.lit(1.0 / _TWO53))


def is_parseint_col(col):
    """Exact ``Integer.parseInt`` acceptance (``Lang.isInteger``) as a
    pure-string native Column — the ONE shared definition used by the
    gazetteer label filter (BuildGazetteer.java:92-107 path), the vocab
    digit-sequence twins, and the tensor encoder's OOV-integer fallback
    (RelexVocab.java:56-69, RelexTensors.java:170-175). Keep every
    caller on this helper: the predicate is parity-critical and drifting
    copies would silently desynchronize vocab counts from the fallback.

    Semantics: optional sign + digits, numeric value within int32.
    Strip sign and leading zeros; < 10 significant digits always fits,
    exactly 10 compares lexically against the bound (2147483647, or
    2147483648 for negatives), > 10 never fits. All-zero inputs
    canonicalize to '' (length 0 < 10: accepted). The DuckDB oracle
    applies the identical regex chain (``_parseint_sql``).

    KNOWN DIVERGENCE (documented, not fixed): Java's parseInt accepts
    non-ASCII decimal digits via ``Character.digit`` (e.g. Arabic-Indic
    U+0660-0669, full-width U+FF10-FF19), while ``\\d`` here is ASCII in
    both Spark and the DuckDB oracle's RE2 — a non-ASCII-digit token the
    reference would twin as '#'-runs stays a plain token in the rebuild.
    Matching it would need per-digit numeric-value canonicalization (the
    magnitude test is lexical) on every token of the hot vocab/tensor
    paths for a case the DBpedia/Common-Crawl English corpora the
    reference targets do not produce; both engine and oracle share the
    ASCII reading, so the gate is consistent."""
    from pyspark.sql import functions as F

    canon = F.regexp_replace(F.regexp_replace(col, r"^[+-]", ""), r"^0+", "")
    bound = F.when(col.startswith("-"), F.lit("2147483648")).otherwise(
        F.lit("2147483647")
    )
    return col.rlike(r"^[+-]?\d+$") & (
        (F.length(canon) < 10) | ((F.length(canon) == 10) & (canon <= bound))
    )


# --- Spark-facing pandas UDF factories (registered lazily to avoid
#     importing pyspark at module import time in pure-python tests) ---

def register_udfs(spark):
    """Register the parity kernel as Arrow-batched pandas UDFs + SQL names.

    Returns a dict of column-function handles. All are vectorized per
    Arrow batch; no per-row Python appears in the plan.
    """
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import DoubleType, LongType

    @pandas_udf(DoubleType())
    def prand(s: pd.Series) -> pd.Series:
        return pd.Series(pseudo_random_from_string(s.fillna("")))

    @pandas_udf(DoubleType())
    def doc_downsample(s: pd.Series) -> pd.Series:
        return pd.Series(document_downsample_priority(s.fillna("")))

    @pandas_udf(DoubleType())
    def neg_downsample(id1: pd.Series, id2: pd.Series) -> pd.Series:
        return pd.Series(negative_downsample_priority(id1.fillna(""), id2.fillna("")))

    @pandas_udf(DoubleType())
    def split_loc(id1: pd.Series, id2: pd.Series) -> pd.Series:
        return pd.Series(split_location(id1.fillna(""), id2.fillna("")))

    @pandas_udf(LongType())
    def jhashcode(s: pd.Series) -> pd.Series:
        return pd.Series(java_string_hashcode_fast(s.fillna("")))

    @pandas_udf(DoubleType())
    def lc_pos(s: pd.Series) -> pd.Series:
        return pd.Series(learning_curve_position(s.fillna("")))

    @pandas_udf(LongType())
    def gsalt(s: pd.Series, split_count: pd.Series) -> pd.Series:
        # fillna(1) like the sibling UDFs null-handle: a null split
        # count (non-hot host in a left-joined table) means "no split"
        # rather than a ValueError killing the Arrow batch
        return pd.Series(
            group_salt(s.fillna(""), split_count.fillna(1).to_numpy(dtype=np.int64))
        )

    fns = {
        "prand": prand,
        "doc_downsample": doc_downsample,
        "neg_downsample": neg_downsample,
        "split_loc": split_loc,
        "jhashcode": jhashcode,
        "gsalt": gsalt,
        "lc_pos": lc_pos,
    }
    for name, fn in fns.items():
        spark.udf.register(f"ccdbp_{name}", fn)
    return fns
