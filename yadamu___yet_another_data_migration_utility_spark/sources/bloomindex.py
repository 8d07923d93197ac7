"""File-level key Bloom indexes -- Iceberg-puffin-style SIDECAR files.

Point lookups on a hashed merge key defeat min/max zone maps: the keys
a CDC operator asks for are scattered uniformly through every file of
the bucket they hash to, so the ``[min(keys), max(keys)]`` envelope
(``LakeTable.lookup``) prunes nothing once a bucket holds more than a
few key-clustered files. The membership question "could url X be in
this file at all?" needs a Bloom filter -- exactly what Iceberg stores
in puffin sidecar files and Delta in its file-skipping indexes.

Layout (the puffin split, manifest stays O(refs)):

- one gzip'd-bitset JSON **sidecar** per harvest under
  ``metadata/blooms/``: ``{format, key, m, k, blooms: {rel: b64}}``
  where each value is ``base64(gzip(little-endian bitset of m bits))``;
- the manifest carries only ``bloom_files: {sidecar_rel: [covered
  rels]}`` + ``blooms_format`` -- inherited by every commit through the
  ``{**parent}`` spread and pruned to live files at publish, like zone
  maps. Data files are immutable, so a bloom entry keyed by path can
  be orphaned but never stale: ANY surviving entry is valid no matter
  which commit line (branch, rollback, rebase) carried it.

Soundness: a Bloom filter has no false negatives, so skipping a file
whose bloom rejects EVERY probe key is exact; files without an entry
(written after the harvest, or larger than the size cap) are always
scanned, and the reader's residual ``isin`` keeps results exact either
way. Same contract as zone maps: pruning is an optimization the
planner may decline, never a semantics change.

Determinism contract (Spark side and driver side must agree bit-for-
bit, the repo-wide md5 rule -- functions/sketchlib.py):

- value string: the key cast to string (supported key types are
  StringType and the integral types, whose Spark cast and Python
  ``str()`` spell identical text);
- h1 = md5_long(s), h2 = md5_long(s + "#bloom2") -- two independent
  60-bit hashes from the shared md5->60-bit contract;
- bit_i = (h1 + i*h2) mod m for i in 0..k-1 (Kirsch-Mitzenmacher
  double hashing; h1 + (k-1)*h2 < 5*2^60 stays inside int64);
- bit p lives at byte p>>3, bit p&7 of the little-endian bitset.

Scale: the harvest is ONE Spark job over just the key column of the
uncovered files (column-pruned parquet scan); bit positions fold into
64-bit words JVM-side (``bit_or`` partial agg), so the driver receives
O(set bits / 64) longs, not rows. At 100 TB the same job would write
sidecars executor-side (foreachPartition per file group) instead of
folding through the driver -- the manifest/ sidecar split already
supports that, only the harvest plumbing would move.

Provenance: the reference has no secondary indexes (its staged
datasets carry only a control-file manifest,
/root/reference/src/YADAMU/loader/node/loaderDBI.js:321); this is the
Iceberg capability class its lake-format successor needs, built on the
engine's own deterministic-hash contract.
"""

from __future__ import annotations

import base64
import gzip
import hashlib
import json

from pyspark.sql import types as T

#: bump when the hash/bitset contract changes; stale-format sidecars
#: are ignored by the planner (same discipline as STATS_FORMAT)
BLOOM_FORMAT = 1

#: salt deriving the second hash of the double-hashing scheme
BLOOM_SALT = "#bloom2"

#: separator joining the component strings of a COMPOSITE key into the
#: one canonical value both sides hash. A C0 control char cannot occur
#: in the str() form of any supported component type except free-text
#: strings, where collisions ("a\x1fb"+"c" vs "a"+"b\x1fc") merely
#: create a shared bloom entry -- an extra false POSITIVE, which the
#: reader's exact residual removes; soundness (no false negatives for
#: the true tuple) is unaffected.
KEY_SEP = "\x1f"


def canonical_probe(value) -> str | int | None:
    """The canonical hash input for a probe: scalars pass through
    (``positions`` strs them -- bit-compatible with every existing
    single-key sidecar); a composite tuple/list joins its components'
    str() forms with :data:`KEY_SEP`. None anywhere means "matches
    nothing" (SQL equality), surfaced as None."""
    if value is None:
        return None
    if isinstance(value, (tuple, list)):
        if any(v is None for v in value):
            return None
        return KEY_SEP.join(
            v if isinstance(v, str) else str(v) for v in value)
    return value

#: largest supported hash count: the Spark-side position expression
#: ``h1 + i*h2`` is evaluated in BIGINT, and with h1, h2 < 2^60 the
#: largest term ``h1 + (MAX_K-1)*h2 < 7*2^60`` stays inside int64;
#: k = 8 would reach 2^63 and wrap negative on the JVM while Python's
#: big ints stay exact -- silently breaking the cross-side contract
MAX_K = 7

_SUPPORTED_KEY_TYPES = (
    T.StringType, T.LongType, T.IntegerType, T.ShortType, T.ByteType,
)


def bloom_supported(dt: T.DataType) -> bool:
    """Key types whose Spark cast-to-string and Python str() agree --
    the precondition for the cross-side hash contract."""
    return isinstance(dt, _SUPPORTED_KEY_TYPES)


def _md5_60(s: str) -> int:
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def positions(value, m_bits: int, k: int) -> list[int]:
    """Driver-side bit positions for a probe value (None has NO
    positions -- the empty list -- because SQL equality never matches
    a NULL key; ``might_contain`` maps that to False)."""
    if value is None:
        return []
    s = value if isinstance(value, str) else str(value)
    h1 = _md5_60(s)
    h2 = _md5_60(s + BLOOM_SALT)
    return [(h1 + i * h2) % m_bits for i in range(k)]


def might_contain(bits: bytes, m_bits: int, k: int, value) -> bool:
    if value is None:  # a NULL probe matches nothing, like SQL equality
        return False
    return all(
        (bits[p >> 3] >> (p & 7)) & 1 for p in positions(value, m_bits, k)
    )


def encode_bitset(words: dict[int, int], m_bits: int) -> str:
    """{word_index: int64} -> base64(gzip(little-endian bitset)).
    int64 words may arrive sign-extended from Spark's BIGINT bit_or."""
    big = 0
    for w, val in words.items():
        big |= (val & 0xFFFFFFFFFFFFFFFF) << (64 * w)
    return base64.b64encode(
        gzip.compress(big.to_bytes(m_bits // 8, "little"))
    ).decode("ascii")


def decode_bitset(b64: str) -> bytes:
    return gzip.decompress(base64.b64decode(b64))


def encode_sidecar(key: str, m_bits: int, k: int,
                   blooms: dict[str, str]) -> str:
    return json.dumps({
        "format": BLOOM_FORMAT, "key": key, "m": m_bits, "k": k,
        "blooms": blooms,
    }, sort_keys=True)


def decode_sidecar(text: str) -> dict | None:
    """Parsed sidecar, or None when unreadable / wrong format (the
    planner then simply scans the covered files -- coverage loss is
    always sound)."""
    try:
        doc = json.loads(text)
    except (ValueError, TypeError):
        return None
    if not isinstance(doc, dict) or doc.get("format") != BLOOM_FORMAT:
        return None
    # a JSON-valid but malformed document must degrade to a scan, not
    # crash the planner: m/k must be usable by positions() (m > 0 is
    # the modulus) and blooms must be the {rel: b64} dict probes index
    if not isinstance(doc.get("m"), int) or not isinstance(doc.get("k"), int):
        return None
    if doc["m"] <= 0 or doc["k"] <= 0:
        return None
    if not isinstance(doc.get("blooms"), dict):
        return None
    return doc
