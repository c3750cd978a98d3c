"""Property-based cross-engine check for the URL canonicalizer: for
RANDOMLY COMPOSED urls (and outright garbage), Spark's `canonical_url`
expression and its DuckDB rendering (`canonical_url_sql`) must agree
byte-for-byte — the guarantee behind the url_canonical_dedup oracle at
any input, not just the fixture-derived shapes.

Values travel through a registered relation (never SQL literals), so
quoting can't mask a divergence.  Alphabet is printable-ASCII + a few
BMP unicode chars; supplementary-plane chars are excluded because Java
(UTF-16 code-unit) and DuckDB (UTF-8 byte) sort orders diverge there —
a documented limit of the cross-engine sort contract, not of the
operator."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dbc_informed_socketcan_to_parquet_spark.operators.urlops import (
    canonical_url,
    canonical_url_sql,
)

_WORD = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789-._~é漢",
    min_size=0,
    max_size=8,
)

#: percent-escape fragments — valid escapes of unreserved (%41, %7e) and
#: reserved (%2F, %3d) chars in both hex cases, the self-escape %25, and
#: malformed sequences (%, %a, %zz, %4g) that must pass through
_ESC = st.sampled_from(
    ["%41", "%7e", "%7E", "%2F", "%2f", "%3d", "%3D", "%25", "%2541",
     "%aa", "%AA", "%", "%a", "%zz", "%4g", "%%41"]
)

_WORD = st.builds(
    lambda a, e, b: a + e + b,
    _WORD,
    st.one_of(st.just(""), _ESC),
    _WORD,
)

_PARAM = st.one_of(
    st.builds(lambda k, v: f"{k}={v}", _WORD, _WORD),
    st.sampled_from(["utm_source=x", "utm_campaign=Y", "fbclid=abc",
                     "gclid=1", "msclkid=2", "", "a", "=5"]),
)

_URL = st.builds(
    lambda scheme, www, host, port, segs, params, frag, slashes: (
        scheme + www + host + port
        + "".join("/" + s for s in segs) + slashes
        + ("?" + "&".join(params) if params else "")
        + frag
    ),
    scheme=st.sampled_from(["https://", "http://", "ftp://", ""]),
    www=st.sampled_from(["www.", "WWW.", ""]),
    host=st.builds(lambda a, b: f"{a}.{b}".strip("."), _WORD, _WORD),
    port=st.sampled_from(["", ":80", ":443", ":8080"]),
    segs=st.lists(_WORD, max_size=3),
    params=st.lists(_PARAM, max_size=4),
    frag=st.sampled_from(["", "#f", "#a?b=1"]),
    slashes=st.sampled_from(["", "/", "///"]),
)

_GARBAGE = st.text(
    alphabet="abc:/?#&=%. \t漢é419AFf",
    min_size=0,
    max_size=24,
)


@pytest.fixture(scope="module")
def duck():
    return duckdb.connect()


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(urls=st.lists(st.one_of(_URL, _GARBAGE), min_size=1, max_size=24))
def test_canonical_url_cross_engine(spark, duck, urls):
    pdf = pd.DataFrame({"url": urls})
    duck.register("rel_urls", pdf)
    want = [r[0] for r in duck.execute(
        f"SELECT {canonical_url_sql('url')} FROM rel_urls").fetchall()]
    duck.unregister("rel_urls")

    df = spark.createDataFrame(pdf)
    got = [r.c for r in df.select(canonical_url("url").alias("c")).collect()]
    assert got == want
