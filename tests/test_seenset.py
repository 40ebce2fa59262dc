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


def test_bloom_merge_equals_single_build():
    a, b, whole = CountingBloom(1 << 14, 4), CountingBloom(1 << 14, 4), CountingBloom(1 << 14, 4)
    for k in KEYS[:1000]:
        a.add(url_hash64(k))
        whole.add(url_hash64(k))
    for k in KEYS[1000:]:
        b.add(url_hash64(k))
        whole.add(url_hash64(k))
    a.merge(b)
    assert np.array_equal(a.counts, whole.counts)


def test_cuckoo_merge_no_false_negatives():
    a, b = CuckooFilter(1 << 10), CuckooFilter(1 << 10)
    for k in KEYS[:1000]:
        a.add(url_hash64(k))
    for k in KEYS[1000:]:
        b.add(url_hash64(k))
    a.merge_from(b)
    assert all(a.contains(url_hash64(k)) for k in KEYS), (
        "merge lost a fingerprint — the exactly-once guarantee rides on this"
    )


def test_cuckoo_merge_overflow_lands_in_stash():
    # deliberately tiny: way past capacity, stash must absorb everything
    a, b = CuckooFilter(8), CuckooFilter(8)
    for k in KEYS[:300]:
        a.add(url_hash64(k))
    for k in KEYS[300:600]:
        b.add(url_hash64(k))
    a.merge_from(b)
    assert all(a.contains(url_hash64(k)) for k in KEYS[:600])


def test_sharded_vectorized_probe_matches_scalar():
    s = ShardedSeenSet(n_shards=8, bloom_bits=1 << 14, cuckoo_buckets=1 << 8)
    for k in KEYS[:1000]:
        s.add(k)
    hs = np.array([url_hash64(k) for k in KEYS[:1000] + ABSENT[:1000]], dtype=np.uint64)
    vec = s.might_contain_many(hs)
    scalar = [s.might_contain_h64(int(h)) for h in hs]
    assert vec.tolist() == scalar
    assert vec[:1000].all(), "a seen key probed definitely-new"


def test_sharded_capacity_million_keys():
    """North-rule scale contract: at 10^6 keys the hybrid stays
    false-negative-free (hard requirement) with a useful
    false-positive rate (the prune actually prunes)."""
    n = 1_000_000
    rng = np.random.default_rng(42)
    present = rng.integers(0, 1 << 63, size=n, dtype=np.int64).astype(np.uint64)
    absent = (
        rng.integers(0, 1 << 63, size=100_000, dtype=np.int64).astype(np.uint64)
        | np.uint64(1 << 63)
    )  # disjoint by the top bit
    s = ShardedSeenSet(n_shards=16, bloom_bits=1 << 20, cuckoo_buckets=1 << 16)
    for h in present:
        s.add_h64(int(h))
    assert s.might_contain_many(present).all(), "false negative at 10^6 keys"
    fpp = s.might_contain_many(absent).mean()
    assert fpp < 0.02, f"false-positive rate {fpp:.3%} — the prune is useless"
