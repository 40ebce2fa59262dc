"""The fetch worker pool: bounded, never stalling, cap held through
retries. Ported from /root/reference/test/concurrency.test.js."""

import threading
import time

import pytest

from mhtml_to_html_spark.mime import parse_mhtml
from mhtml_to_html_spark.operators.convert import fetch_and_convert
from tests.helpers.page_builder import page


def tracking_fetch(fail=False, hold_ms=0):
    """≅ trackingFetch (fetch.js): records calls and peak in-flight."""
    state = {"calls": 0, "in_flight": 0, "peak": 0}
    lock = threading.Lock()

    def fetch(url):
        with lock:
            state["calls"] += 1
            state["in_flight"] += 1
            state["peak"] = max(state["peak"], state["in_flight"])
        try:
            if hold_ms:
                time.sleep(hold_ms / 1000.0)
            if fail:
                return {"status": 500}
            return {"status": 200, "content_type": "image/png", "body": b"PNG"}
        finally:
            with lock:
                state["in_flight"] -= 1

    return fetch, state


def images(count):
    return parse_mhtml(page(body="".join(f'<img src="i{i}.png">' for i in range(count))))


def count_inlined(data):
    return data.count("data:image/png;base64,")


def test_default_cap_saturates_at_16():
    # a small hold lets every worker be in flight at once (the JS event
    # loop gives the reference this for free; threads need real overlap)
    fetch, state = tracking_fetch(hold_ms=10)
    result = fetch_and_convert(images(200), fetch)
    assert state["peak"] == 16, f"peak {state['peak']}"
    assert state["calls"] == 200
    assert count_inlined(result.data) == 200, "some resources were dropped under the cap"


@pytest.mark.parametrize("cap", [1, 4, 32])
def test_cap_respected_exactly(cap):
    # hold long enough that every worker thread starts before the first
    # finishes, even on a loaded host
    fetch, state = tracking_fetch(hold_ms=50)
    result = fetch_and_convert(images(100), fetch, max_parallel_requests=cap)
    assert state["peak"] == cap, f"peak {state['peak']}"
    assert count_inlined(result.data) == 100


def test_cap_larger_than_workload():
    fetch, state = tracking_fetch(hold_ms=20)
    result = fetch_and_convert(images(3), fetch, max_parallel_requests=100)
    assert state["peak"] == 3
    assert count_inlined(result.data) == 3


@pytest.mark.parametrize("cap", [0, -5])
def test_degenerate_cap_falls_back_to_one_worker(cap):
    fetch, state = tracking_fetch()
    result = fetch_and_convert(images(5), fetch, max_parallel_requests=cap)
    assert state["peak"] == 1
    assert count_inlined(result.data) == 5


def test_cap_holds_through_retries():
    fetch, state = tracking_fetch(fail=True)
    fetch_and_convert(images(50), fetch, max_parallel_requests=4, max_retries=1)
    assert state["peak"] <= 4, f"peak {state['peak']}"
    assert state["calls"] == 100, "50 resources should be attempted twice each"


def test_work_spread_across_pool():
    fetch, _ = tracking_fetch(hold_ms=20)
    start = time.perf_counter()
    fetch_and_convert(images(64), fetch, max_parallel_requests=16)
    elapsed = (time.perf_counter() - start) * 1000
    # 64 requests at 16 in flight is four waves of 20ms; serialized it
    # would be 64 waves (the collect walk adds a little on top)
    assert 60 <= elapsed < 700, f"{elapsed:.0f}ms for four waves of 20ms"
