"""Property-based tests (hypothesis): codec byte layouts and the wire
broker, for ANY input — not just the fixtures.

Pure-Python properties (no SparkSession): hundreds of examples are cheap,
so these run at full hypothesis defaults unlike the Spark-bound FAST suite
in test_properties.py.
"""

from __future__ import annotations

import threading

from hypothesis import given, settings
from hypothesis import strategies as st

from hybrid_nutrition_data_pipeline_batch_streaming_spark.operators.codecs import (
    decode_bmp,
    decode_ppm,
    decode_wav_pcm16,
    encode_bmp,
    encode_ppm,
    encode_wav_pcm16,
)
from hybrid_nutrition_data_pipeline_batch_streaming_spark.streaming.wirebroker import (
    WireBroker,
    WireClient,
)

dims = st.tuples(st.integers(1, 17), st.integers(1, 9))


@given(dims=dims, data=st.data())
@settings(max_examples=50, deadline=None)
def test_bmp_roundtrip_any_dims(dims, data):
    """BMP encode→decode is the identity for every (width, height) —
    including widths 1..17, which exercise all four row-padding cases."""
    w, h = dims
    rgb = bytes(
        data.draw(
            st.lists(
                st.integers(0, 255), min_size=w * h * 3, max_size=w * h * 3
            )
        )
    )
    assert decode_bmp(encode_bmp(w, h, rgb)) == (w, h, rgb)


@given(dims=dims, data=st.data())
@settings(max_examples=50, deadline=None)
def test_ppm_roundtrip_any_dims(dims, data):
    w, h = dims
    rgb = bytes(
        data.draw(
            st.lists(
                st.integers(0, 255), min_size=w * h * 3, max_size=w * h * 3
            )
        )
    )
    assert decode_ppm(encode_ppm(w, h, rgb)) == (w, h, rgb)


@given(
    samples=st.lists(st.integers(-32768, 32767), min_size=1, max_size=300),
    rate=st.sampled_from([8000, 16000, 44100]),
)
@settings(max_examples=50, deadline=None)
def test_wav_roundtrip_any_samples(samples, rate):
    """WAV PCM-16 encode→decode is the identity for any int16 sample list,
    including odd lengths (word-aligned chunk padding) and both extremes."""
    assert decode_wav_pcm16(encode_wav_pcm16(samples, rate)) == (
        rate,
        1,
        samples,
    )


@given(
    values=st.lists(
        st.text(min_size=0, max_size=40), min_size=1, max_size=30
    )
)
@settings(max_examples=25, deadline=None)
def test_broker_preserves_any_payload(values):
    """PRODUCE→FETCH is the identity for arbitrary unicode payloads —
    newlines, quotes, control characters — thanks to JSON framing; offsets
    are dense and fetch is order-preserving and repeatable."""
    with WireBroker() as broker:
        host, port = broker.address
        with WireClient(host, port) as c:
            offs = [c.produce("t", v) for v in values]
            assert offs == list(range(len(values)))
            got = c.fetch("t", 0, len(values))
            assert got == list(enumerate(values))
            assert c.fetch("t", 0, len(values)) == got  # repeatable


def test_broker_concurrent_producers_lose_nothing():
    """N threads producing concurrently: offsets stay dense, every message
    is stored exactly once (the broker's lock discipline)."""
    with WireBroker() as broker:
        host, port = broker.address
        n_threads, per = 8, 50

        def produce(tid: int) -> None:
            with WireClient(host, port) as c:
                for i in range(per):
                    c.produce("t", f"{tid}:{i}")

        threads = [
            threading.Thread(target=produce, args=(t,))
            for t in range(n_threads)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        with WireClient(host, port) as c:
            assert c.end_offset("t") == n_threads * per
            got = c.fetch("t", 0, n_threads * per)
            assert sorted(v for _, v in got) == sorted(
                f"{t}:{i}" for t in range(n_threads) for i in range(per)
            )
            assert [o for o, _ in got] == list(range(n_threads * per))
