"""Partitioned counting-Bloom + cuckoo-filter hybrid seen-set.

The 10^10-URL design (north_rule):

- URLs are keyed by ``xxhash/md5(canonicalize_url(url))`` and
  hash-partitioned into P shards; each shard owns a counting-Bloom
  (fast membership, supports deletion when a crawl segment is
  retracted) and a cuckoo filter (compact exact-ish verify layer whose
  fingerprints make false positives ~2^-f instead of the Bloom's fpp).
- Probe path in Spark: ``might_contain(bloom, xxhash64(url))`` prunes
  the definitely-new URLs JVM-side; only the maybe-seen remainder pays
  the exact anti-join against the seen table. The filters are an
  accelerator — the exact table is the source of truth, so the crawl
  is false-negative-free AND false-positive-free.
- Shard blobs serialize to bytes rows, so the whole structure lives in
  a DataFrame/Parquet and survives checkpoints.

Numpy-vectorized; no Spark imports (usable inside pandas UDFs).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np


def url_hash64(key: str) -> int:
    """Stable 64-bit hash of a canonical URL (md5-based, portable)."""
    return int.from_bytes(hashlib.md5(key.encode("utf-8")).digest()[:8], "big")


class CountingBloom:
    """Counting Bloom filter: k derived hash positions, uint8 counters
    (saturating), delete-capable."""

    def __init__(self, n_bits: int = 1 << 16, k: int = 4):
        self.n_bits = n_bits
        self.k = k
        self.counts = np.zeros(n_bits, dtype=np.uint8)

    def _positions(self, h64: int) -> np.ndarray:
        # double hashing: pos_i = h1 + i*h2 (Kirsch–Mitzenmacher)
        h1 = h64 & 0xFFFFFFFF
        h2 = (h64 >> 32) | 1
        return (h1 + np.arange(self.k, dtype=np.uint64) * h2) % self.n_bits

    def add(self, h64: int) -> None:
        pos = self._positions(h64)
        counts = self.counts[pos]
        self.counts[pos] = np.minimum(counts.astype(np.uint16) + 1, 255).astype(np.uint8)

    def remove(self, h64: int) -> None:
        pos = self._positions(h64)
        counts = self.counts[pos]
        # saturated counters are sticky (standard counting-Bloom rule)
        dec = np.where((counts > 0) & (counts < 255), counts - 1, counts)
        self.counts[pos] = dec

    def might_contain(self, h64: int) -> bool:
        return bool(np.all(self.counts[self._positions(h64)] > 0))

    def merge(self, other: "CountingBloom") -> None:
        """Union by saturating counter add (the distributed-build merge:
        per-partition partial filters sum into the global one)."""
        assert other.n_bits == self.n_bits and other.k == self.k
        total = self.counts.astype(np.uint16) + other.counts.astype(np.uint16)
        self.counts = np.minimum(total, 255).astype(np.uint8)

    def might_contain_many(self, h64s: np.ndarray) -> np.ndarray:
        h1 = (h64s & 0xFFFFFFFF).astype(np.uint64)
        h2 = ((h64s >> np.uint64(32)) | np.uint64(1)).astype(np.uint64)
        out = np.ones(len(h64s), dtype=bool)
        for i in range(self.k):
            pos = (h1 + np.uint64(i) * h2) % np.uint64(self.n_bits)
            out &= self.counts[pos.astype(np.int64)] > 0
        return out

    def to_bytes(self) -> bytes:
        return struct.pack("<II", self.n_bits, self.k) + self.counts.tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes) -> "CountingBloom":
        n_bits, k = struct.unpack_from("<II", blob, 0)
        f = cls(n_bits, k)
        f.counts = np.frombuffer(blob, dtype=np.uint8, count=n_bits, offset=8).copy()
        return f


class CuckooFilter:
    """Cuckoo filter: 16-bit fingerprints, 4-way buckets, partial-key
    cuckoo eviction. Exact-ish verify layer: a hit means 'same
    fingerprint in one of two candidate buckets' (fp rate ~ 2^-13 at
    4 slots); deletion supported."""

    SLOTS = 4
    MAX_KICKS = 500

    def __init__(self, n_buckets: int = 1 << 12):
        assert n_buckets & (n_buckets - 1) == 0, "n_buckets must be a power of two"
        self.n_buckets = n_buckets
        self.table = np.zeros((n_buckets, self.SLOTS), dtype=np.uint16)
        self.stash: set[tuple[int, int]] = set()  # overflow, never lossy

    def _fingerprint(self, h64: int) -> int:
        fp = (h64 >> 48) & 0xFFFF
        return fp or 1  # 0 marks an empty slot

    def _index1(self, h64: int) -> int:
        return h64 & (self.n_buckets - 1)

    def _index2(self, i1: int, fp: int) -> int:
        # partial-key: i2 = i1 xor hash(fp)
        return (i1 ^ (fp * 0x5BD1E995)) & (self.n_buckets - 1)

    def add(self, h64: int) -> None:
        fp = self._fingerprint(h64)
        self._insert_fp(self._index1(h64), fp)

    def _insert_fp(self, i1: int, fp: int) -> None:
        """Insert a fingerprint known to belong at bucket ``i1`` (or its
        partial-key alternate). Never lossy: eviction overflow lands in
        the stash, so ``contains`` has NO false negatives — the property
        the seen-set prune's exactly-once guarantee rides on."""
        i2 = self._index2(i1, fp)
        for i in (i1, i2):
            empty = np.where(self.table[i] == 0)[0]
            if len(empty):
                self.table[i, empty[0]] = fp
                return
        # evict
        rng = np.random.default_rng((i1 * 0x9E3779B1 + fp) & 0xFFFFFFFF)
        i = i1
        for _ in range(self.MAX_KICKS):
            slot = int(rng.integers(0, self.SLOTS))
            fp, self.table[i, slot] = int(self.table[i, slot]), fp
            i = self._index2(i, fp)
            empty = np.where(self.table[i] == 0)[0]
            if len(empty):
                self.table[i, empty[0]] = fp
                return
        self.stash.add((i, fp))

    def merge_from(self, other: "CuckooFilter") -> None:
        """Union: re-insert every occupied slot of ``other`` at its
        bucket index (valid because i ↔ i^hash(fp) is an involution, so
        a fingerprint stored at bucket i still belongs to the same
        bucket pair in the merged table). Stash entries carry their
        bucket, so they re-insert the same way."""
        assert other.n_buckets == self.n_buckets
        buckets, slots = np.nonzero(other.table)
        for i, s in zip(buckets.tolist(), slots.tolist()):
            self._insert_fp(i, int(other.table[i, s]))
        for i, fp in other.stash:
            self._insert_fp(i, fp)

    def contains(self, h64: int) -> bool:
        fp = self._fingerprint(h64)
        i1 = self._index1(h64)
        i2 = self._index2(i1, fp)
        if fp in self.table[i1] or fp in self.table[i2]:
            return True
        return (i1, fp) in self.stash or (i2, fp) in self.stash

    def remove(self, h64: int) -> bool:
        fp = self._fingerprint(h64)
        i1 = self._index1(h64)
        for i in (i1, self._index2(i1, fp)):
            slots = np.where(self.table[i] == fp)[0]
            if len(slots):
                self.table[i, slots[0]] = 0
                return True
            if (i, fp) in self.stash:
                self.stash.remove((i, fp))
                return True
        return False

    def to_bytes(self) -> bytes:
        stash = sorted(self.stash)
        head = struct.pack("<II", self.n_buckets, len(stash))
        body = self.table.tobytes()
        tail = b"".join(struct.pack("<IH", i, fp) for i, fp in stash)
        return head + body + tail

    @classmethod
    def from_bytes(cls, blob: bytes) -> "CuckooFilter":
        n_buckets, n_stash = struct.unpack_from("<II", blob, 0)
        f = cls(n_buckets)
        count = n_buckets * cls.SLOTS
        f.table = (
            np.frombuffer(blob, dtype=np.uint16, count=count, offset=8)
            .reshape(n_buckets, cls.SLOTS)
            .copy()
        )
        offset = 8 + count * 2
        for _ in range(n_stash):
            i, fp = struct.unpack_from("<IH", blob, offset)
            f.stash.add((i, fp))
            offset += 6
        return f


class ShardedSeenSet:
    """P-sharded hybrid: shard = h64 % P; each shard holds a counting
    Bloom (fast reject) + cuckoo filter (verify). The exact key table
    lives in Spark; this structure is the probe accelerator that rides
    in broadcast/checkpoint blobs."""

    def __init__(self, n_shards: int = 8, bloom_bits: int = 1 << 16, cuckoo_buckets: int = 1 << 12):
        self.n_shards = n_shards
        self.blooms = [CountingBloom(bloom_bits) for _ in range(n_shards)]
        self.cuckoos = [CuckooFilter(cuckoo_buckets) for _ in range(n_shards)]

    def _shard(self, h64: int) -> int:
        return h64 % self.n_shards

    def add(self, key: str) -> None:
        self.add_h64(url_hash64(key))

    def add_h64(self, h64: int) -> None:
        h64 &= 0xFFFFFFFFFFFFFFFF
        s = self._shard(h64)
        self.blooms[s].add(h64)
        self.cuckoos[s].add(h64)

    def remove(self, key: str) -> None:
        h = url_hash64(key)
        s = self._shard(h)
        self.blooms[s].remove(h)
        self.cuckoos[s].remove(h)

    def might_contain(self, key: str) -> bool:
        return self.might_contain_h64(url_hash64(key))

    def might_contain_h64(self, h64: int) -> bool:
        h64 &= 0xFFFFFFFFFFFFFFFF
        s = self._shard(h64)
        return self.blooms[s].might_contain(h64) and self.cuckoos[s].contains(h64)

    def might_contain_many(self, h64s: "np.ndarray") -> "np.ndarray":
        """Vectorized probe: per-shard Bloom batch check first, then the
        cuckoo verify only on the Bloom-positive sliver (the hybrid's
        point: most probes stop at the Bloom)."""
        h64s = h64s.astype(np.uint64)
        out = np.zeros(len(h64s), dtype=bool)
        shards = (h64s % np.uint64(self.n_shards)).astype(np.int64)
        for s in range(self.n_shards):
            idx = np.where(shards == s)[0]
            if len(idx) == 0:
                continue
            bloom_hit = self.blooms[s].might_contain_many(h64s[idx])
            for j in idx[bloom_hit]:
                out[j] = self.cuckoos[s].contains(int(h64s[j]))
        return out

    def merge_shard(self, shard: int, bloom_blob: bytes, cuckoo_blob: bytes) -> None:
        """Fold a distributed-build partial (one shard's per-partition
        filters) into this set."""
        self.blooms[shard].merge(CountingBloom.from_bytes(bloom_blob))
        self.cuckoos[shard].merge_from(CuckooFilter.from_bytes(cuckoo_blob))

    def shard_blobs(self) -> list[tuple[int, bytes, bytes]]:
        return [
            (i, self.blooms[i].to_bytes(), self.cuckoos[i].to_bytes())
            for i in range(self.n_shards)
        ]

    @classmethod
    def from_shard_blobs(cls, blobs: list[tuple[int, bytes, bytes]]) -> "ShardedSeenSet":
        inst = cls(n_shards=len(blobs), bloom_bits=8, cuckoo_buckets=8)
        inst.blooms = [None] * len(blobs)  # type: ignore[list-item]
        inst.cuckoos = [None] * len(blobs)  # type: ignore[list-item]
        for i, bloom_blob, cuckoo_blob in blobs:
            inst.blooms[i] = CountingBloom.from_bytes(bloom_blob)
            inst.cuckoos[i] = CuckooFilter.from_bytes(cuckoo_blob)
        return inst
