"""URL/domain curation operators (operators/urlops.py) — unit semantics.

The registry-level oracle parity (canonicalization vs DuckDB at sf0.01)
lives in tests/test_extra_registry.py (url_canonical_dedup,
domain_blocklist, domain_cap); here: edge-case canonicalization,
both blocklist execution paths, cap exactness, and the curate() gate.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbc_informed_socketcan_to_parquet_spark.operators.urlops import (
    canonical_url,
    domain_cap,
    domain_cap_exact,
    domain_filter,
    host_of,
    registrable_domain,
    url_dedup,
)


def _canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [r.c for r in df.select(canonical_url("url").alias("c")).collect()]


def test_canonical_url_rules(spark):
    cases = {
        # scheme + fragment dropped, host lowercased
        "https://EXAMPLE.com/a#frag": "example.com/a",
        "http://example.com/a": "example.com/a",
        # www. and default ports stripped
        "https://www.example.com:443/a": "example.com/a",
        "http://example.com:80/a": "example.com/a",
        # non-default port kept
        "https://example.com:8443/a": "example.com:8443/a",
        # trailing slashes trimmed; bare host stays bare
        "https://example.com/a///": "example.com/a",
        "https://example.com": "example.com",
        # query: tracking stripped, rest sorted; all-tracking -> no query
        "https://example.com/a?b=2&a=1": "example.com/a?a=1&b=2",
        "https://example.com/a?utm_source=x&a=1&gclid=z": "example.com/a?a=1",
        "https://example.com/a?utm_campaign=y": "example.com/a",
        # schemeless input parses the same
        "www.example.com/a?b=2&a=1#x": "example.com/a?a=1&b=2",
        # tracking match is on the param KEY: valueless click ids (?fbclid)
        # and bare utm keys are stripped too (ADVICE r6)...
        "https://example.com/a?fbclid&a=1": "example.com/a?a=1",
        "https://example.com/a?utm_source&gclid=&msclkid": "example.com/a",
        # ...but a non-tracker key that merely STARTS with a tracker name
        # is kept (key equality, not prefix, for the click ids)
        "https://example.com/a?fbclid2=x": "example.com/a?fbclid2=x",
        # percent-normalization (r7): unreserved escapes decode, the
        # rest hex-uppercase; %25 never cascades; reserved %2F/%3D stay
        "https://example.com/a%2db?x=%41%42": "example.com/a-b?x=AB",
        "https://example.com/p%3a?k=%7e": "example.com/p%3A?k=~",
        "https://example.com/%2541": "example.com/%2541",
        "https://example.com/a?b%3Dc=1": "example.com/a?b%3Dc=1",
        "https://example.com/a%2Fb": "example.com/a%2Fb",
        "http://example.com/100%good": "example.com/100%good",
    }
    got = _canon(spark, list(cases))
    assert got == list(cases.values())


def test_canonical_url_idna_fold(spark):
    """decode_idna folds punycode labels to unicode; undecodable xn--
    labels and plain hosts pass through; default path leaves them be."""
    df = spark.createDataFrame(
        [
            ("https://xn--mnchen-3ya.example/a",),   # münchen
            ("https://www.XN--BCHER-KVA.ch/x",),      # bücher, via lowercase
            ("https://xn--zzzzzz-!!!.com/y",),        # undecodable -> as-is
            ("https://plain.example.com/z",),
        ],
        "url string",
    )
    got = [r.c for r in df.select(canonical_url("url", decode_idna=True).alias("c")).collect()]
    assert got == [
        "münchen.example/a",
        "bücher.ch/x",
        "xn--zzzzzz-!!!.com/y",
        "plain.example.com/z",
    ]
    plain = [r.c for r in df.select(canonical_url("url").alias("c")).collect()]
    assert plain[0] == "xn--mnchen-3ya.example/a"


def test_host_and_registrable_domain(spark):
    df = spark.createDataFrame(
        [("https://www.news.bbc.co.uk:443/x",), ("http://sub.a.example.com/p",)],
        "url string",
    )
    rows = df.select(
        host_of("url").alias("h"), registrable_domain("url").alias("r")
    ).collect()
    assert (rows[0].h, rows[0].r) == ("news.bbc.co.uk", "co.uk")  # documented PSL limit
    assert (rows[1].h, rows[1].r) == ("sub.a.example.com", "example.com")

    # with a public-suffix list the eTLD+1 is exact: longest suffix wins
    psl = df.select(
        registrable_domain("url", public_suffixes={"co.uk", "uk"}).alias("r")
    ).collect()
    assert [r.r for r in psl] == ["bbc.co.uk", "example.com"]


def test_registrable_domain_single_label_host(spark):
    """Single-label hosts (localhost, intranet names) are their own
    registrable domain on BOTH paths — the expression path must not fold
    them all into one '' group (ADVICE r6)."""
    df = spark.createDataFrame(
        [("http://localhost:8080/x",), ("https://intranet/y",), ("https://a.example.com/z",)],
        "url string",
    )
    expr = [r.r for r in df.select(registrable_domain("url").alias("r")).collect()]
    psl = [
        r.r
        for r in df.select(
            registrable_domain("url", public_suffixes={"co.uk"}).alias("r")
        ).collect()
    ]
    assert expr == ["localhost:8080", "intranet", "example.com"] or expr == [
        "localhost", "intranet", "example.com",
    ]
    assert expr == psl  # the two paths agree


@pytest.fixture()
def url_docs(spark):
    rows = [
        (1, "https://spam.example.com/a"),
        (2, "https://deep.spam.example.com/b"),   # subdomain of blocked
        (3, "https://ok.example.org/c"),
        (4, "https://www.ok.example.org/c/"),     # canonical dup of 3
        (5, "http://ok.example.org/c?utm_source=x"),  # canonical dup of 3
        (6, "https://other.net/z?b=2&a=1"),
        (7, "https://other.net/z?a=1&b=2"),       # canonical dup of 6
        (8, "https://unique.io/q"),
    ]
    return spark.createDataFrame(rows, "doc_id long, url string")


def test_domain_filter_literal_chain(spark, url_docs):
    kept = domain_filter(url_docs, ["spam.example.com"], url_col="url")
    assert sorted(r.doc_id for r in kept.collect()) == [3, 4, 5, 6, 7, 8]


def test_domain_filter_broadcast_dataframe(spark, url_docs):
    bl = spark.createDataFrame([("spam.example.com",), ("other.net",)], "domain string")
    kept = domain_filter(url_docs, bl, url_col="url")
    # full subdomain semantics, same as the literal path (r6): doc 2
    # (deep.spam.example.com) is a subdomain of a blocked domain -> gone
    assert sorted(r.doc_id for r in kept.collect()) == [3, 4, 5, 8]
    assert set(kept.columns) == {"doc_id", "url"}
    # all three paths agree exactly (r7: default DataFrame path is the
    # JVM-side chained broadcast anti-join; the Arrow kernel remains as
    # impl="kernel")
    lit = domain_filter(url_docs, ["spam.example.com", "other.net"], url_col="url")
    kern = domain_filter(url_docs, bl, url_col="url", impl="kernel")
    assert (
        sorted(r.doc_id for r in lit.collect())
        == sorted(r.doc_id for r in kern.collect())
        == sorted(r.doc_id for r in kept.collect())
    )


def test_domain_filter_join_kernel_equivalence_mixed_depths(spark):
    """join vs kernel paths on a blocklist mixing 1/2/3-label entries and
    hosts at every relative depth (exact, shallower, deeper, unrelated)."""
    rows = [
        (1, "https://tld/x"),                      # exact 1-label match
        (2, "https://a.tld/x"),                    # subdomain of 1-label
        (3, "https://bad.com/x"),                  # exact 2-label
        (4, "https://x.y.bad.com/x"),              # deep subdomain of 2-label
        (5, "https://notbad.com/x"),               # suffix-STRING but not label
        (6, "https://deep.block.co.uk/x"),         # subdomain of 3-label
        (7, "https://block.co.uk/x"),              # exact 3-label
        (8, "https://co.uk/x"),                    # SHALLOWER than 3-label entry
        (9, None),
        (10, "https://fine.org/x"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    bl = spark.createDataFrame(
        [("tld",), ("bad.com",), ("block.co.uk",)], "domain string"
    )
    joined = sorted(r.doc_id for r in domain_filter(df, bl, url_col="url").collect())
    kernel = sorted(
        r.doc_id for r in domain_filter(df, bl, url_col="url", impl="kernel").collect()
    )
    assert joined == kernel == [5, 8, 9, 10]


def test_url_dedup_first_occurrence(spark, url_docs):
    out = url_dedup(url_docs, url_col="url", id_col="doc_id")
    assert sorted(r.doc_id for r in out.collect()) == [1, 2, 3, 6, 8]
    assert out.columns == ["doc_id", "url"]


def test_url_dedup_keeps_full_row(spark):
    df = spark.createDataFrame(
        [(10, "https://a.com/x", "ten"), (2, "http://www.a.com/x/", "two")],
        "doc_id long, url string, payload string",
    )
    rows = url_dedup(df, url_col="url", id_col="doc_id").collect()
    assert len(rows) == 1 and rows[0].doc_id == 2 and rows[0].payload == "two"


def test_domain_cap_exact_and_expectation(spark):
    rows = [(i, "https://hot.com/p%d" % i) for i in range(400)] + [
        (1000 + i, "https://cold%d.com/x" % i) for i in range(10)
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    strict = domain_cap_exact(df, 30, url_col="url", id_col="doc_id")
    per = {r.h: r.n for r in strict.groupBy(host_of("url").alias("h")).count()
           .withColumnRenamed("count", "n").collect()}
    assert per["hot.com"] == 30 and all(v == 1 for h, v in per.items() if h != "hot.com")

    capped = domain_cap(df, 30, url_col="url", id_col="doc_id")
    n_hot = capped.filter(host_of("url") == "hot.hot.com".replace("hot.hot", "hot")).count()
    # expectation 30, binomial(400, .075) — generous band, deterministic seed
    assert 10 <= n_hot <= 60
    # under-cap domains keep everything, keep_frac provenance attached
    assert capped.filter(F.col("keep_frac") >= 1.0).count() == 10
    # deterministic across runs
    a = sorted(r.doc_id for r in capped.collect())
    b = sorted(r.doc_id for r in domain_cap(df, 30, url_col="url", id_col="doc_id").collect())
    assert a == b


def test_domain_cap_rejects_nonpositive(spark, url_docs):
    with pytest.raises(ValueError):
        domain_cap(url_docs, 0)
    with pytest.raises(ValueError):
        domain_cap_exact(url_docs, -1)


def test_curate_url_front_door(spark):
    """curate() with the url gates on: blocklisted domain drops, canonical
    dups collapse, survivors flow into the text pipeline unchanged."""
    from dbc_informed_socketcan_to_parquet_spark.operators.curate import (
        CurateConfig,
        curate,
    )

    rows = [
        (1, "the quick brown fox jumps over the lazy dog near the river bank today",
         "https://spam.example.com/a"),
        (2, "distributed query engines shuffle data between executors during wide joins",
         "https://keep.org/p?b=2&a=1"),
        (3, "a completely different sentence about gardens and tomatoes in summer heat",
         "http://www.keep.org/p/?a=1&b=2&utm_source=x"),  # URL dup of 2
        (4, "columnar storage formats compress runs of similar values very effectively",
         "https://keep.org/other"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, url string")
    cfg = CurateConfig(
        min_chars=10, min_quality=0.0, jaccard_threshold=0.99,
        url_col="url", url_blocklist=("spam.example.com",), url_dedup=True,
    )
    kept = curate(docs, config=cfg)
    assert sorted(r.doc_id for r in kept.collect()) == [2, 4]
    assert set(kept.columns) == {"doc_id", "text", "url"}


def test_null_url_semantics(spark):
    """A NULL url is NO identity: blocklist keeps the row (unknown is not
    blocked), url_dedup passes every NULL-url row through (they must not
    collapse into one survivor), caps leave them uncapped."""
    rows = [
        (1, "https://spam.example.com/a"),
        (2, None),
        (3, None),
        (4, "https://ok.org/x"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")

    kept = domain_filter(df, ["spam.example.com"], url_col="url")
    assert sorted(r.doc_id for r in kept.collect()) == [2, 3, 4]

    bl = spark.createDataFrame([("spam.example.com",)], "domain string")
    kept_df = domain_filter(df, bl, url_col="url")
    assert sorted(r.doc_id for r in kept_df.collect()) == [2, 3, 4]

    deduped = url_dedup(df, url_col="url", id_col="doc_id")
    assert sorted(r.doc_id for r in deduped.collect()) == [1, 2, 3, 4]

    capped = domain_cap(df, 1, url_col="url", id_col="doc_id")
    got = {r.doc_id: r.keep_frac for r in capped.collect()}
    assert {2, 3} <= set(got) and got[2] == 1.0 and got[3] == 1.0

    strict = domain_cap_exact(df, 1, url_col="url", id_col="doc_id")
    assert {2, 3} <= {r.doc_id for r in strict.collect()}
