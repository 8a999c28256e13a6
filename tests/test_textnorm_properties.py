"""Property: URL canonicalization and PII scrubbing equal `re` replays.

Both operators are regexp chains whose ORDER is load-bearing (URLs
mask before emails because an URL may contain '@'; the utm strip keeps
the separator so consecutive params chain; the authority lowercases
but the path must not).  A Python `re` replay of the identical
patterns on generated messy inputs pins every step and the documented
idempotence of the canonical form.
"""

from __future__ import annotations

import hashlib
import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from oracdc_spark.operators.textops import (
    PII_EMAIL_RE,
    PII_IP_RE,
    PII_URL_RE,
    pii_scrub,
)

_SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_URL = st.tuples(
    st.sampled_from(["http", "https", "HTTP", "HTTPS"]),
    st.sampled_from(["Example.COM", "a.b", "X-1.net"]),
    st.sampled_from(["", ":80", ":443", ":8080"]),
    st.sampled_from(["", "/", "/Path/Sub", "/p/"]),
    st.sampled_from(
        ["", "?q=1", "?utm_source=x", "?utm_a=1&utm_b=2", "?q=1&utm_c=3&r=2", "?utm_x=&q=2"]
    ),
    st.sampled_from(["", "#frag", "#a/b?c"]),
).map(lambda t: t[0] + "://" + t[1] + t[2] + t[3] + t[4] + t[5])


def _canon_model(u):
    u1 = re.sub(r"#.*$", "", u)
    m = re.search(r"^[^/]*//[^/?#]*", u1)
    auth = (m.group(0) if m else "").lower()
    rest = re.sub(r"^[^/]*//[^/?#]*", "", u1)
    u2 = auth + rest
    u3 = re.sub(r"^(http://[^/?#:]*):80([/?#].*)?$", lambda g: g.group(1) + (g.group(2) or ""), u2)
    u4 = re.sub(r"^(https://[^/?#:]*):443([/?#].*)?$", lambda g: g.group(1) + (g.group(2) or ""), u3)
    u5 = re.sub(r"([?&])utm_[a-zA-Z]+=[^&#]*", r"\1", u4)
    u6 = re.sub(r"([?&])&+", r"\1", u5)
    u7 = re.sub(r"[?&]+$", "", u6)
    return re.sub(r"/$", "", u7)


@given(urls=st.lists(_URL, min_size=1, max_size=10))
@settings(**_SETTINGS)
def test_canonical_url_matches_re_replay_and_is_idempotent(spark, urls):
    from oracdc_spark.operators.textops import canonical_url

    import pyspark.sql.functions as F

    df = spark.createDataFrame(list(enumerate(urls)), "i long, url string")
    got = {
        (r.i, r.c, r.cc)
        for r in df.select(
            "i",
            canonical_url(F.col("url")).alias("c"),
            canonical_url(canonical_url(F.col("url"))).alias("cc"),
        ).collect()
    }
    expect = {(i, _canon_model(u), _canon_model(_canon_model(u))) for i, u in enumerate(urls)}
    assert got == expect
    for _i, c, cc in got:
        assert c == cc  # idempotence


_FRAG = st.sampled_from(
    [
        "plain words",
        "a@b.co",
        "first.last+tag@sub.domain.org",
        "not-an-email@",
        "http://x.y/path?a=1",
        "https://u:p@h.io/z",
        "10.0.0.1",
        "999.999.1.1",
        "1.2.3.4.5",
        "text 8.8.8.8, end",
        "{code}",
    ]
)


@given(texts=st.lists(st.lists(_FRAG, min_size=0, max_size=5).map(" ".join),
                      min_size=1, max_size=8))
@settings(**_SETTINGS)
def test_pii_scrub_matches_re_replay(spark, texts):
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {
        (r.doc_id, r.n_urls, r.n_emails, r.n_ips, r.clean_digest)
        for r in pii_scrub(df).collect()
    }
    expect = set()
    for i, t in enumerate(texts):
        n_urls = len(re.findall(PII_URL_RE, t))
        after_url = re.sub(PII_URL_RE, "<URL>", t)
        n_emails = len(re.findall(PII_EMAIL_RE, after_url))
        after_email = re.sub(PII_EMAIL_RE, "<EMAIL>", after_url)
        n_ips = len(re.findall(PII_IP_RE, after_email))
        clean = re.sub(PII_IP_RE, "<IP>", after_email)
        expect.add(
            (i, n_urls, n_emails, n_ips, hashlib.md5(clean.encode()).hexdigest())
        )
    assert got == expect
