"""URL/domain curation — the front door of a web-scale training pipeline.

The reference engine has no web stage (it decodes CAN frames); these
operators extend the north-star corpus layer with the three standard
URL-level passes every crawl-derived corpus runs BEFORE any text is
touched (they are narrow or broadcast-joined, so they cut corpus mass at
scan cost):

- :func:`domain_filter` — drop documents whose host matches a blocklist
  (exact host or any-subdomain suffix).  A small blocklist compiles to a
  literal predicate chain that pushes into the parquet scan; a large one
  becomes a broadcast anti-join.
- :func:`url_dedup` — canonicalize URLs (scheme dropped, host
  lowercased, ``www.`` and default ports stripped, trailing slashes
  trimmed, query params sorted with tracking params removed, fragment
  dropped) and keep the first occurrence per canonical URL — the
  same skew-safe min-struct shape as ``paragraph_dedup``
  (operators/dedup.py:773): ONE shuffle, no window over the corpus.
- :func:`domain_cap` — limit any single domain's share: one grouped
  count (driver-small result per DOMAIN, not per doc) broadcast back as
  a keep-fraction, then a deterministic hash filter — the
  ``temperature_mix`` execution shape (operators/sampling.py).  The cap
  is exact in expectation and deterministic given the salt;
  :func:`domain_cap_exact` is the strict window-ranked variant for
  small/skew-tolerant inputs.

Every canonicalization step is expressed in builtin column functions
(regexp_extract / array_sort / filter) so the whole stage stays inside
whole-stage codegen, and each has a 1:1 DuckDB rendering
(:func:`canonical_url_sql`) so the operators are oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dbc_informed_socketcan_to_parquet_spark.functions.hashing import md5_long

#: query params stripped during canonicalization: click/campaign trackers
#: that never change the resource identity.  Matching is on the param KEY
#: (the text before ``=``), so valueless variants (``?fbclid``, common
#: when trackers are stripped upstream) are removed too — a prefix match
#: on ``fbclid=`` would let those survive and split one dedup identity.
_TRACKING_KEYS = ("fbclid", "gclid", "msclkid")
_TRACKING_KEY_PREFIX = "utm_"

_HOST_RE = r"^(?:[a-zA-Z][a-zA-Z0-9+.-]*://)?([^/?#]*)"
_PATH_RE = r"^(?:[a-zA-Z][a-zA-Z0-9+.-]*://)?[^/?#]*([^?#]*)"
_QUERY_RE = r"\?([^#]*)"

#: RFC 3986 §2.3 unreserved characters — percent-escapes of these are
#: equivalent to the bare character and decode during canonicalization;
#: every other escape is kept but hex-uppercased (§6.2.2.1)
_UNRESERVED = (
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~"
)


def pct_normalize(c: Column) -> Column:
    """RFC 3986 §6.2.2 percent-encoding normalization as a pure builtin
    expression chain (stays in codegen; 1:1 DuckDB rendering in
    :func:`pct_normalize_sql`):

    1. uppercase the hex digits of every escape (``%3a`` → ``%3A``) —
       no case-transform exists in a regex replacement, so each
       lowercase hex letter is rewritten per position with a
       backreference carrying the other digit (12 replaces);
    2. decode escapes of UNRESERVED characters (``%41`` → ``A``,
       ``%7E`` → ``~``) via literal replaces against the now-uppercase
       forms (66 replaces).  Reserved escapes (``%2F``, ``%3D``,
       ``%26``...) stay encoded, so path/query structure parsed BEFORE
       this call is never re-interpreted, and ``%25`` (the escape of
       ``%`` itself) cannot cascade into a second decode.

    Malformed escapes (``%zz``, trailing ``%a``) pass through untouched.
    """
    for d in "abcdef":
        c = F.regexp_replace(c, f"%{d}([0-9a-fA-F])", f"%{d.upper()}$1")
    for d in "abcdef":
        c = F.regexp_replace(c, f"%([0-9A-F]){d}", f"%$1{d.upper()}")
    for ch in _UNRESERVED:
        c = F.replace(c, F.lit("%%%02X" % ord(ch)), F.lit(ch))
    return c


def pct_normalize_sql(expr: str) -> str:
    """DuckDB rendering of :func:`pct_normalize` — identical rewrite
    order; DuckDB needs the explicit ``'g'`` flag (its regexp_replace is
    first-match-only by default, Spark's is global)."""
    c = expr
    for d in "abcdef":
        c = f"regexp_replace({c}, '%{d}([0-9a-fA-F])', '%{d.upper()}\\1', 'g')"
    for d in "abcdef":
        c = f"regexp_replace({c}, '%([0-9A-F]){d}', '%\\1{d.upper()}', 'g')"
    for ch in _UNRESERVED:
        c = f"replace({c}, '%{ord(ch):02X}', '{ch}')"
    return c


def _idna_fold(host: Column) -> Column:
    """Fold ``xn--`` (punycode/IDNA) labels to their unicode form in an
    Arrow-batched kernel (stdlib ``encodings.idna`` — no Spark builtin
    exists).  Labels that fail to decode pass through unchanged; hosts
    without ``xn--`` never enter the per-label loop."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _fold(hosts):
        from encodings import idna as _idna

        def one(h):
            if not h or "xn--" not in h:
                return h
            out = []
            for lbl in h.split("."):
                if lbl.startswith("xn--"):
                    try:
                        lbl = _idna.ToUnicode(lbl)
                    except (UnicodeError, ValueError):
                        pass
                out.append(lbl)
            return ".".join(out)

        return hosts.map(one)

    _fold.__annotations__ = {"hosts": pd.Series, "return": pd.Series}
    return pandas_udf(_fold, "string")(host)


def host_of(url: Column | str, decode_idna: bool = False) -> Column:
    """Canonical host: lowercased, ``www.`` prefix and default ``:80`` /
    ``:443`` ports stripped.  Pure builtin expressions — stays in
    codegen, pushes down.  ``decode_idna=True`` additionally folds
    ``xn--`` punycode labels to unicode (Arrow kernel — opt-in because
    it leaves codegen and has no DuckDB oracle rendering)."""
    url = F.col(url) if isinstance(url, str) else url
    h = F.lower(F.regexp_extract(url, _HOST_RE, 1))
    h = F.regexp_replace(h, r"^www\.", "")
    h = F.regexp_replace(h, r":(80|443)$", "")
    return _idna_fold(h) if decode_idna else h


def registrable_domain(url: Column | str, public_suffixes=None) -> Column:
    """eTLD+1 of the host.  Default (no suffix list): last two labels —
    the approximation that is exact for plain TLDs but folds
    ``news.bbc.co.uk`` to ``co.uk``.  Pass ``public_suffixes`` (an
    iterable of multi-label public suffixes, e.g. a PSL-derived
    ``{"co.uk", "com.au", ...}``) for exactness: the LONGEST listed
    suffix matching the host gets one more label — evaluated in an
    Arrow-batched kernel against the broadcast-small set (the real PSL
    is ~10k entries).

    Single-label hosts (``localhost``, intranet names) are their own
    registrable domain on BOTH paths: the expression path guards on
    label count (``F.slice(parts, -2, 2)`` returns an EMPTY array for a
    1-element input, which would fold every intranet host into one
    ``''`` group), matching the pandas path's ``parts[-2:]``."""
    if public_suffixes is None:
        host = host_of(url)
        parts = F.split(host, r"\.")
        return F.when(
            F.size(parts) >= 2, F.array_join(F.slice(parts, -2, 2), ".")
        ).otherwise(host)

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    sfx = frozenset(s.lower().strip(".") for s in public_suffixes)

    def _etld1(hosts):
        def one(h):
            if not h:
                return h
            parts = h.split(".")
            # longest listed public suffix, then one more label
            for k in range(len(parts) - 1, 0, -1):
                if ".".join(parts[-k:]) in sfx:
                    take = min(k + 1, len(parts))
                    return ".".join(parts[-take:])
            return ".".join(parts[-2:])
        return hosts.map(one)

    _etld1.__annotations__ = {"hosts": pd.Series, "return": pd.Series}
    kernel = pandas_udf(_etld1, "string")
    return kernel(host_of(url))


def canonical_url(url: Column | str, decode_idna: bool = False) -> Column:
    """Canonical form for identity comparison: ``host + path + '?' +
    sorted-kept-query``.  Scheme and fragment are dropped (http/https
    serve the same resource in dedup terms), tracking params removed,
    remaining params sorted so order never splits an identity.

    Path and query are percent-normalized (:func:`pct_normalize`):
    unreserved escapes decode, the rest hex-uppercase — so
    ``/a%2Db%3f`` and ``/a-b%3F`` are one identity.  Normalization runs
    AFTER structural parsing, and reserved escapes stay encoded, so a
    ``%26`` in a value can never split into a new query param.
    ``decode_idna=True`` folds punycode hosts too (see
    :func:`host_of`)."""
    url = F.col(url) if isinstance(url, str) else url
    host = host_of(url, decode_idna=decode_idna)
    path = pct_normalize(
        F.regexp_replace(F.regexp_extract(url, _PATH_RE, 1), r"/+$", "")
    )
    raw_q = pct_normalize(F.regexp_extract(url, _QUERY_RE, 1))
    kept = F.filter(
        F.split(raw_q, "&"),
        lambda p: (F.length(p) > 0) & ~_is_tracking_param(p),
    )
    q = F.array_join(F.array_sort(kept), "&")
    return F.concat(
        host, path, F.when(q != F.lit(""), F.concat(F.lit("?"), q)).otherwise(F.lit(""))
    )


def _is_tracking_param(p: Column) -> Column:
    """True when the param's KEY (text before the first ``=``; the whole
    param when valueless) is a tracker — utm_* prefix or a known click id."""
    key = F.split_part(p, F.lit("="), F.lit(1))
    return key.startswith(_TRACKING_KEY_PREFIX) | key.isin(*_TRACKING_KEYS)


def canonical_url_sql(expr: str) -> str:
    """DuckDB rendering of :func:`canonical_url` over SQL expression text
    — byte-identical semantics (RE2 regexes, ASCII sort, same tracking
    prefixes), used by the oracle-paired registry entries."""
    host = (
        f"regexp_replace(regexp_replace(lower(regexp_extract({expr}, '{_HOST_RE}', 1)),"
        f" '^www\\.', ''), ':(80|443)$', '')"
    )
    path = pct_normalize_sql(
        f"regexp_replace(regexp_extract({expr}, '{_PATH_RE}', 1), '/+$', '')"
    )
    keys = ", ".join(f"'{k}'" for k in _TRACKING_KEYS)
    not_tracked = (
        f"NOT (starts_with(split_part(p, '=', 1), '{_TRACKING_KEY_PREFIX}')"
        f" OR split_part(p, '=', 1) IN ({keys}))"
    )
    raw_q = pct_normalize_sql(f"regexp_extract({expr}, '\\?([^#]*)', 1)")
    q = (
        f"array_to_string(list_sort(list_filter(string_split("
        f"{raw_q}, '&'),"
        f" p -> len(p) > 0 AND {not_tracked})), '&')"
    )
    return (
        f"({host} || {path} || CASE WHEN {q} <> '' THEN '?' || {q} ELSE '' END)"
    )


def host_of_sql(expr: str) -> str:
    """DuckDB rendering of :func:`host_of`."""
    return (
        f"regexp_replace(regexp_replace(lower(regexp_extract({expr}, '{_HOST_RE}', 1)),"
        f" '^www\\.', ''), ':(80|443)$', '')"
    )


def domain_filter(
    df: DataFrame,
    blocklist,
    url_col: str = "url",
    impl: str = "join",
) -> DataFrame:
    """Drop rows whose canonical host is a blocked domain or any
    subdomain of one.

    ``blocklist`` is either a Python sequence of domains — compiled into
    a literal OR-chain so Catalyst pushes the predicate into the scan
    (right for the usual 10²–10⁴-entry lists) — or a single-column
    DataFrame of domains for the million-entry case.  The DataFrame path
    (default ``impl="join"``) stays entirely JVM-side: the host's suffix
    chain only needs probing at the label DEPTHS that occur in the
    blocklist (a 12-label host can only match a 2-label entry via its
    last-2-label suffix), so the filter is max-blocklist-depth chained
    **broadcast left-anti hash joins** — one equi-probe per depth, all
    inside codegen, the corpus never shuffles and never crosses into
    Python.  ``impl="kernel"`` keeps the earlier Arrow suffix-chain
    kernel (driver-collected frozenset + row-local probe) for
    environments where a broadcast is unavailable; both paths are
    pytest-pinned equivalent.  NULL urls are never blocked on any path
    (unknown is not blocked)."""
    host = host_of(url_col)
    if isinstance(blocklist, DataFrame):
        bcol = blocklist.columns[0]
        if impl == "join":
            # no .distinct(): LeftAnti is duplicate-insensitive on the build
            # side, and skipping it keeps the returned plan exchange-free
            bl = blocklist.select(F.lower(F.col(bcol)).alias("_bl_dom"))
            depths = [
                r["_k"]
                for r in bl.select(
                    F.size(F.split("_bl_dom", r"\.")).alias("_k")
                ).distinct().collect()
            ]
            parts = F.split(host, r"\.")
            out = df
            for k in sorted(depths):
                # last-k-label suffix; NULL when the host is shorter (and
                # for NULL urls) — NULL probe keys never match an anti-join
                sfx = F.when(
                    F.size(parts) >= k, F.array_join(F.slice(parts, -k, k), ".")
                )
                out = out.join(F.broadcast(bl), sfx == F.col("_bl_dom"), "left_anti")
            return out
        import pandas as pd
        from pyspark.sql.functions import pandas_udf

        domains = frozenset(
            r["_d"] for r in blocklist.select(F.lower(F.col(bcol)).alias("_d")).collect()
        )
        spark = df.sparkSession
        try:
            sc = spark.sparkContext  # Connect: no sparkContext -> closure ship
        except AttributeError:
            sc = None
        get_set = (
            (lambda b: (lambda: b.value))(sc.broadcast(domains))
            if sc is not None
            else (lambda d: (lambda: d))(domains)
        )

        def _blocked(hosts):
            dset = get_set()

            def hit(h):
                if not h:
                    return False
                parts = h.split(".")
                return any(".".join(parts[i:]) in dset for i in range(len(parts)))

            return hosts.map(hit)

        _blocked.__annotations__ = {"hosts": pd.Series, "return": pd.Series}
        blocked_udf = pandas_udf(_blocked, "boolean")
        return df.filter(~F.coalesce(blocked_udf(host), F.lit(False)))
    cond = F.lit(False)
    for d in blocklist:
        d = d.lower()
        cond = cond | (host == F.lit(d)) | host.endswith("." + d)
    # NULL url ⇒ NULL host ⇒ NULL predicate, which a bare filter would
    # DROP — but an unknown domain is not a blocked domain; keep the row
    return df.filter(~F.coalesce(cond, F.lit(False)))


def url_dedup(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep the first occurrence (min ``id_col``) per canonical URL —
    crawl snapshots and tracking-param variants collapse to one row.

    Execution: ONE groupBy on the canonical key with a min-struct
    aggregate carrying the whole row (partial aggregation runs map-side,
    so a hot URL never concentrates rows on one reducer) — the
    ``paragraph_dedup`` shape, no corpus-wide window.

    A NULL url is NO identity, not a shared one: NULL-url rows pass
    through untouched (a groupBy would otherwise collapse every
    url-less document in the corpus into a single survivor)."""
    cols = df.columns
    keyed = df.withColumn("_curl", canonical_url(url_col))
    no_url = keyed.filter(F.col(url_col).isNull()).drop("_curl")
    packed = keyed.filter(F.col(url_col).isNotNull()).groupBy("_curl").agg(
        F.min(F.struct(id_col, *[c for c in cols if c != id_col])).alias("_w")
    )
    deduped = packed.select(*[F.col(f"_w.{c}").alias(c) for c in cols])
    return deduped.unionByName(no_url.select(*cols))


def domain_cap(
    df: DataFrame,
    max_per_domain: int,
    url_col: str = "url",
    id_col: str = "doc_id",
    salt: str = "domcap",
    hash_fn: str = "xxhash",
) -> DataFrame:
    """Limit each domain to ``max_per_domain`` documents IN EXPECTATION:
    one grouped count per domain, a broadcast keep-fraction join, then a
    deterministic per-id hash filter (``hash_fn="md5"`` for the
    DuckDB-replayable oracle path, ``"xxhash"`` for production).

    Unlike a window rank this never concentrates a hot domain on one
    reducer — the filter is a narrow map after a broadcast join, the
    only aggregation output is one row per DOMAIN.  Adds ``keep_frac``
    (provenance for the recipe log), like ``temperature_mix``."""
    if max_per_domain <= 0:
        raise ValueError(f"max_per_domain must be positive, got {max_per_domain}")
    host = host_of(url_col)
    # NULL url ⇒ no domain to attribute the row to: it passes uncapped
    # with keep_frac 1.0 (grouping NULLs would cap "unknown" as if it
    # were one hot domain).  NULL-handling mirrors url_dedup.
    no_url = df.filter(F.col(url_col).isNull()).withColumn("keep_frac", F.lit(1.0))
    df = df.filter(F.col(url_col).isNotNull())
    keyed = df.withColumn("_dom", host)
    counts = keyed.groupBy("_dom").agg(F.count(F.lit(1)).alias("_n"))
    fracs = counts.select(
        "_dom",
        F.least(F.lit(1.0), F.lit(float(max_per_domain)) / F.col("_n")).alias("keep_frac"),
    )
    if hash_fn == "md5":
        u = md5_long(F.col(id_col), salt=salt) / F.lit(float(1 << 60))
    else:
        u = (
            F.shiftrightunsigned(
                F.xxhash64(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 4
            )
            / F.lit(float(1 << 60))
        )
    capped = (
        keyed.join(F.broadcast(fracs), "_dom")
        .filter((F.col("keep_frac") >= 1.0) | (u < F.col("keep_frac")))
        .drop("_dom")
    )
    return capped.unionByName(no_url)


def domain_cap_exact(
    df: DataFrame,
    max_per_domain: int,
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """Strictly-exact per-domain cap: rank within each domain by a
    deterministic (md5(id), id) order and keep the first
    ``max_per_domain``.  A window partitioned by domain — one shuffle on
    the domain key, and a HOT domain's rows do land on one reducer, so
    prefer :func:`domain_cap` at crawl scale; this variant exists for
    modest corpora where the cap must be exact."""
    if max_per_domain <= 0:
        raise ValueError(f"max_per_domain must be positive, got {max_per_domain}")
    from pyspark.sql.window import Window

    no_url = df.filter(F.col(url_col).isNull())   # no domain ⇒ uncapped
    keyed = df.filter(F.col(url_col).isNotNull()).withColumn("_dom", host_of(url_col))
    w = Window.partitionBy("_dom").orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    capped = (
        keyed.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= max_per_domain)
        .drop("_dom", "_rk")
    )
    return capped.unionByName(no_url)
