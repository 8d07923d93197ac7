"""URL canonicalization as a reusable column expression.

Library surface for the ``url_canonical_dedup`` catalog query
(``plans/webtext.py``) -- a pipeline author calls
``df.withColumn("url", canonical_url(F.col("url")))`` the same way the
reference's identifier-normalization layer rewrites names before
matching (/root/reference/src/YADAMU/common/yadamuDBI.js:497-653).

Pure built-in string algebra: the whole thing is one codegen'd
projection (regexp_replace / lower / split / array_sort), zero Python
workers, no shuffle. Idempotent: canonical_url(canonical_url(u)) ==
canonical_url(u) (tested in tests/test_entry_and_extras.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: query parameters that identify a *visit*, not a *page*
TRACKING_PARAMS = "(^|&)(utm_[a-z]+|fbclid|gclid)=[^&]*"


def canonical_url(u: Column) -> Column:
    """Canonical form of a page URL:

    1. strip the fragment (``#...`` never reaches the server),
    2. lowercase ``scheme://host`` (case-insensitive per RFC 3986;
       the path stays case-sensitive and is left alone),
    3. drop the default ``:443`` port -- anchored to the authority and
       https-only, so ``:443`` inside a path or query value, or on an
       ``http://`` URL (where 443 is NOT the default), is untouched,
    4. drop tracking query params (``utm_*``, ``fbclid``, ``gclid``),
    5. sort the surviving query params (order never changes the page).

    Mirrored step-for-step by the DuckDB oracle ``_CANON_SQL`` in
    ``plans/webtext.py`` so string equality is exact.
    """
    u1 = F.regexp_replace(u, "#.*$", "")
    # authority stops at '/', '?' or '#' -- '[^/]*' alone would run into
    # the query string on path-less URLs and lowercase case-sensitive
    # query values
    pre = F.regexp_extract(u1, "^[A-Za-z]+://[^/?#]*", 0)
    tail = u1.substr(F.length(pre) + F.lit(1), F.length(u1))
    u2 = F.regexp_replace(
        F.concat(F.lower(pre), tail), "^(https://[^/:?#]*):443([/?]|$)", "$1$2"
    )
    parts = F.split(u2, "\\?", 2)
    path = F.element_at(parts, 1)
    q = F.when(F.size(parts) > 1, F.element_at(parts, 2)).otherwise(F.lit(""))
    q2 = F.regexp_replace(
        F.regexp_replace(q, TRACKING_PARAMS, ""), "^&+", ""
    )
    return F.when(q2 == "", path).otherwise(
        F.concat(path, F.lit("?"), F.array_join(F.array_sort(F.split(q2, "&")), "&"))
    )
