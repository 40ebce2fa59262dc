"""Counting-Bloom / cuckoo-filter correctness: no false negatives,
deletion works, serialization round-trips."""

import numpy as np

from mhtml_to_html_spark.frontier.seenset import (
    CountingBloom,
    CuckooFilter,
    ShardedSeenSet,
    url_hash64,
)

KEYS = [f"https://host{i % 13}.example.com/p{i}" for i in range(2000)]
ABSENT = [f"https://other{i}.example.net/x{i}" for i in range(2000)]


def test_counting_bloom_no_false_negatives():
    bloom = CountingBloom(1 << 16, 4)
    for k in KEYS:
        bloom.add(url_hash64(k))
    assert all(bloom.might_contain(url_hash64(k)) for k in KEYS)


def test_counting_bloom_fpp_reasonable():
    bloom = CountingBloom(1 << 16, 4)
    for k in KEYS:
        bloom.add(url_hash64(k))
    fp = sum(bloom.might_contain(url_hash64(k)) for k in ABSENT)
    assert fp / len(ABSENT) < 0.05


def test_counting_bloom_delete():
    bloom = CountingBloom(1 << 16, 4)
    for k in KEYS:
        bloom.add(url_hash64(k))
    for k in KEYS[:500]:
        bloom.remove(url_hash64(k))
    # removed keys may still collide, but the retained ones must remain
    assert all(bloom.might_contain(url_hash64(k)) for k in KEYS[500:])


def test_counting_bloom_vectorized_matches_scalar():
    bloom = CountingBloom(1 << 14, 4)
    for k in KEYS[:300]:
        bloom.add(url_hash64(k))
    hs = np.array([url_hash64(k) for k in KEYS[:300] + ABSENT[:300]], dtype=np.uint64)
    vec = bloom.might_contain_many(hs)
    scalar = np.array([bloom.might_contain(int(h)) for h in hs])
    assert (vec == scalar).all()


def test_counting_bloom_serialization():
    bloom = CountingBloom(1 << 12, 3)
    for k in KEYS[:100]:
        bloom.add(url_hash64(k))
    restored = CountingBloom.from_bytes(bloom.to_bytes())
    assert (restored.counts == bloom.counts).all()
    assert restored.k == 3


def test_cuckoo_membership_and_delete():
    cf = CuckooFilter(1 << 12)
    for k in KEYS:
        cf.add(url_hash64(k))
    assert all(cf.contains(url_hash64(k)) for k in KEYS), "cuckoo false negative"
    fp = sum(cf.contains(url_hash64(k)) for k in ABSENT)
    assert fp / len(ABSENT) < 0.01
    for k in KEYS[:500]:
        assert cf.remove(url_hash64(k))
    assert all(cf.contains(url_hash64(k)) for k in KEYS[500:])


def test_cuckoo_serialization():
    cf = CuckooFilter(1 << 10)
    for k in KEYS[:800]:
        cf.add(url_hash64(k))
    restored = CuckooFilter.from_bytes(cf.to_bytes())
    assert (restored.table == cf.table).all()
    assert restored.stash == cf.stash
    assert all(restored.contains(url_hash64(k)) for k in KEYS[:800])


def test_sharded_hybrid_round_trip():
    ss = ShardedSeenSet(n_shards=4)
    for k in KEYS:
        ss.add(k)
    assert all(ss.might_contain(k) for k in KEYS)
    restored = ShardedSeenSet.from_shard_blobs(ss.shard_blobs())
    assert all(restored.might_contain(k) for k in KEYS)
    fp = sum(restored.might_contain(k) for k in ABSENT)
    assert fp / len(ABSENT) < 0.01
    for k in KEYS[:300]:
        restored.remove(k)
    assert all(restored.might_contain(k) for k in KEYS[300:])
