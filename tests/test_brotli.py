"""Tests for the gated libbrotlidec binding (io.brotli_codec).

Everything that DECODES is skipped when no system libbrotlidec loads
(the binding's whole design: capability-probed, loud reject-and-count
when absent — the availability-off behavior is itself pinned here via
monkeypatching the probe).
"""

import base64

import pytest

from kiji_mapreduce_spark.io import brotli_codec

_HAVE = brotli_codec.available()

#: reference-encoded (libbrotlienc q9) fixture for the page below
PAGE = b"<p>a brotli page with enough words to keep around</p>"
PAGE_BR = base64.b64decode(
    "GzQAAMRtbF3Haxxp/ToRBEkEG3DgUrTYRgPjsDF2ruA41kt5IG9/Gop60IpJAFuk"
    "5R3eKU0O")


@pytest.mark.skipif(not _HAVE, reason="no system libbrotlidec")
def test_decode_fixture_and_error_surface():
    assert brotli_codec.decompress(PAGE_BR) == PAGE
    for bad in (PAGE_BR[:8], PAGE_BR + b"x", b"\xff\xff\xffgarbage",
                b""):
        with pytest.raises(ValueError):
            brotli_codec.decompress(bad)
    with pytest.raises(ValueError, match="ceiling"):
        brotli_codec.decompress(PAGE_BR, max_output=10)


@pytest.mark.skipif(not _HAVE, reason="no system libbrotlidec")
def test_round_trips_via_system_encoder():
    import os
    import random

    random.seed(7)
    for trial in range(20):
        n = random.randint(0, 30000)
        kind = trial % 3
        if kind == 0:
            data = os.urandom(n // 4)
        elif kind == 1:
            data = (b"tile " * (n // 5 + 1))[:n]
        else:
            data = bytes(random.randrange(7) for _ in range(n))
        for q in (1, 5, 9, 11):
            enc = brotli_codec._encode_for_tests(data, quality=q)
            assert brotli_codec.decompress(enc) == data


@pytest.mark.skipif(not _HAVE, reason="no system libbrotlidec")
def test_http_br_body_decodes(spark, tmp_path):
    """content-encoding: br pages become documents end-to-end (the
    r10/r11 'missing #1' coverage loss, closed where a system
    libbrotlidec exists); corrupt br bodies still reject-and-count."""
    from kiji_mapreduce_spark.io.inputs import (_decode_http_payload,
                                                read_warc_records)
    from kiji_mapreduce_spark.pipeline.crawl import (crawl_documents,
                                                     encoding_rejects)
    from tests.test_io import _warc_record

    body = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
            b"Content-Encoding: br\r\n\r\n" + PAGE_BR)
    out = _decode_http_payload(body)
    assert out.endswith(b"\r\n\r\n" + PAGE)

    recs = (_warc_record("response", "http://br.example.com/ok",
                         body)
            + _warc_record("response", "http://br.example.com/corrupt",
                           b"HTTP/1.1 200 OK\r\n"
                           b"Content-Encoding: br\r\n\r\n"
                           + bytes((i * 37 + 101) % 256
                                   for i in range(400))))
    d = tmp_path / "brwarc2"
    d.mkdir()
    (d / "a.warc").write_bytes(recs)
    records = read_warc_records(spark, [str(d)])
    docs = crawl_documents(records, spark)
    assert {r.url for r in docs.collect()} == {"http://br.example.com/ok"}
    rej = {r.content_encoding: r.n_rejected
           for r in encoding_rejects(records).collect()}
    assert rej == {"br": 1}


def test_unavailable_library_behavior(monkeypatch, spark):
    """With NO libbrotlidec (probe forced off), br bodies pass through
    the payload decoder untouched and the crawl gate rejects-and-counts
    them — the exact pre-r12 contract. The probe is patched on the
    DRIVER, which is where both decision points live: the payload
    decoder here is called directly, and the gate's inflatable-codings
    list is baked into the plan at build time (executors never
    re-probe for it)."""
    import kiji_mapreduce_spark.io.brotli_codec as bc
    from kiji_mapreduce_spark.io.inputs import _decode_http_payload
    from kiji_mapreduce_spark.pipeline.crawl import (crawl_documents,
                                                     encoding_rejects)

    monkeypatch.setattr(bc, "available", lambda: False)
    body = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
            b"Content-Encoding: br\r\n\r\n" + PAGE_BR)
    assert _decode_http_payload(body) == body

    # records-shaped rows built directly (bypassing the WARC parser,
    # whose executor-side workers would re-probe the REAL library):
    # the still-encoded gate must reject the undecoded body
    records = spark.createDataFrame(
        [("a.warc", 0, "response", "http://br.example.com/x",
          "2026-01-01T00:00:00Z", "<id>", len(body), body)],
        "path string, record_no long, warc_type string, "
        "target_uri string, warc_date string, record_id string, "
        "content_length long, content binary")
    assert crawl_documents(records, spark).count() == 0
    assert encoding_rejects(records).count() == 1
