"""Retry/backoff semantics pinned against the reference constants
(/root/reference/lib/convert.js:105-228, test/retry.test.js)."""

from mhtml_to_html_spark.frontier.fixtures import (
    MAX_RETRY_DELAY_MS,
    RETRY_BASE_DELAY_MS,
    backoff_delay_ms,
    fetch_with_retries,
    is_transient,
    parse_retry_after_ms,
    retry_delay_ms,
)


def test_backoff_doubles_and_caps():
    # 500ms · 2^n capped at 5000ms
    assert [backoff_delay_ms(n) for n in range(6)] == [500, 1000, 2000, 4000, 5000, 5000]
    assert RETRY_BASE_DELAY_MS == 500 and MAX_RETRY_DELAY_MS == 5000


def test_transient_statuses():
    assert is_transient(429)
    assert all(is_transient(s) for s in (500, 503, 599))
    assert is_transient(-1)  # thrown error
    assert not is_transient(404)
    assert not is_transient(200)
    assert not is_transient(600)


def test_retry_after_seconds():
    assert retry_delay_ms({"retry_after": "2"}, 0) == 2000
    assert retry_delay_ms({"retry_after": "0"}, 0) == 0


def test_retry_after_beyond_cap_gives_up():
    assert retry_delay_ms({"retry_after": "6"}, 0) is None
    assert retry_delay_ms({"retry_after": "99"}, 0) is None


def test_retry_after_http_date():
    # a date 3 seconds from 'now'
    assert parse_retry_after_ms("Fri, 31 Mar 2006 19:25:19 GMT", now_ms=1143833116000) == 3000
    # a date in the past clamps to 0
    assert parse_retry_after_ms("Fri, 31 Mar 2006 19:25:10 GMT", now_ms=1143833116000) == 0


def test_retry_after_unparsable_gives_up():
    assert retry_delay_ms({"retry_after": "not-a-date-at-all !!"}, 0) is None


def test_no_retry_after_uses_backoff():
    assert retry_delay_ms({}, 0) == 500
    assert retry_delay_ms({}, 3) == 4000


def test_attempt_budget_never_exceeded():
    # maxRetries=2 ⇒ at most 3 attempts for any scripted URL
    for i in range(300):
        status, attempts, _ = fetch_with_retries(f"https://h{i}.example.com/p{i}")
        assert attempts <= 3
        assert status in ("ok", "failed")
