"""Membership structures (SURVEY.md §2.3, A3–A5): partitioned Bloom filter
and a deletable cuckoo filter.

Contract (BASELINE.json:6): "filters seen URLs via a partitioned Bloom filter
(with cuckoo-filter fallback for deletable politeness bans) broadcast per
host-hash partition". PySpark does not expose ``DataFrameStatFunctions
.bloomFilter`` (Scala-only — SURVEY.md §0.3), so both structures are custom,
numpy-vectorized, and serializable to bytes so they can be checkpointed with
the round manifest (S6) and broadcast to executors.

Exactness invariant (SURVEY.md §2.3): these are PREFILTERS only. A Bloom
"maybe-seen" answer is always re-checked by the exact anti-join against the
``seen`` table; a Bloom "definitely-new" answer is trusted (Bloom filters have
no false negatives), which is what lets most genuinely-new URLs skip the
shuffle join against a 10^10-row seen set.

Scale design: ONE filter per host-hash bucket, not one global filter. At a
10^10-URL frontier a single 1% FP Bloom is ~12 GB — too big to broadcast —
but per-bucket filters are (a) individually small enough for the executors
that own that bucket to load directly, (b) folded incrementally per round
from only that bucket's new hashes (A5), and (c) partition-addressable for
checkpoint lineage. The blobs live in a parquet sidecar written and read by
executors (`load_bucket_blob`); the driver carries only the int index
{bucket: latest_round} — filter bytes never transit the driver or a
whole-structure broadcast (engine._fold_into_bloom / _with_maybe_seen).
"""

from __future__ import annotations

import math

import numpy as np

__all__ = ["BloomFilter", "CuckooFilter", "PartitionedBloom", "load_bucket_blob"]

_GOLDEN64 = np.uint64(0x9E3779B97F4A7C15)


def _mix(h: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — derives a second independent 64-bit stream from
    the xxhash64 url_hash so k Bloom probes use double hashing h1 + i*h2."""
    h = h.astype(np.uint64, copy=True)
    h += _GOLDEN64
    h ^= h >> np.uint64(30)
    h *= np.uint64(0xBF58476D1CE4E5B9)
    h ^= h >> np.uint64(27)
    h *= np.uint64(0x94D049BB133111EB)
    h ^= h >> np.uint64(31)
    return h


class BloomFilter:
    """Plain Bloom filter over int64 keys (the xxhash64 of a canonical URL).

    Vectorized: ``add_many`` / ``contains_many`` take numpy int64 arrays and
    touch the bitset with numpy fancy indexing — no per-element Python.
    """

    def __init__(self, capacity: int, fp_rate: float = 0.01):
        capacity = max(int(capacity), 8)
        m = max(64, int(-capacity * math.log(fp_rate) / (math.log(2) ** 2)))
        self.n_bits = ((m + 63) // 64) * 64
        self.k = max(1, round(self.n_bits / capacity * math.log(2)))
        self.bits = np.zeros(self.n_bits // 8, dtype=np.uint8)
        self.n_items = 0

    # -- positions: double hashing (Kirsch & Mitzenmacher 2006 [pub]) -------
    def _positions(self, keys: np.ndarray) -> np.ndarray:
        h1 = keys.astype(np.uint64)
        h2 = _mix(h1) | np.uint64(1)
        i = np.arange(self.k, dtype=np.uint64)[:, None]
        return ((h1[None, :] + i * h2[None, :]) % np.uint64(self.n_bits)).astype(
            np.int64
        )

    def add_many(self, keys: np.ndarray) -> None:
        if len(keys) == 0:
            return
        pos = self._positions(np.asarray(keys, dtype=np.int64)).ravel()
        np.bitwise_or.at(self.bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
        self.n_items += len(keys)

    def contains_many(self, keys: np.ndarray) -> np.ndarray:
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(np.asarray(keys, dtype=np.int64))
        hit = (self.bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
        return hit.all(axis=0).astype(bool)

    # -- (de)serialization for checkpoint + broadcast ------------------------
    def to_bytes(self) -> bytes:
        head = np.array([self.n_bits, self.k, self.n_items], dtype=np.int64)
        return head.tobytes() + self.bits.tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes) -> "BloomFilter":
        head = np.frombuffer(blob[:24], dtype=np.int64)
        f = cls.__new__(cls)
        f.n_bits, f.k, f.n_items = int(head[0]), int(head[1]), int(head[2])
        f.bits = np.frombuffer(blob[24:], dtype=np.uint8).copy()
        return f

    def union_update(self, other: "BloomFilter") -> None:
        """A5 incremental rebuild: fold a same-shape filter of the round's new
        hashes into the cumulative filter (bitwise OR)."""
        if other.n_bits != self.n_bits or other.k != self.k:
            raise ValueError("bloom shape mismatch: rebuild required")
        np.bitwise_or(self.bits, other.bits, out=self.bits)
        self.n_items += other.n_items


class PartitionedBloom:
    """One BloomFilter per host-hash bucket (A3).

    ``probe`` is the executor-side hot path: given parallel arrays
    (bucket, url_hash) it answers maybe-seen per element, fully vectorized
    (group by bucket via argsort, one contains_many per bucket present).
    """

    def __init__(self, num_buckets: int, capacity_per_bucket: int, fp_rate: float):
        self.num_buckets = num_buckets
        self.fp_rate = fp_rate
        self.capacity = capacity_per_bucket
        self.filters: dict[int, BloomFilter] = {}

    def add(self, buckets: np.ndarray, keys: np.ndarray) -> None:
        buckets = np.asarray(buckets, dtype=np.int64)
        keys = np.asarray(keys, dtype=np.int64)
        for b in np.unique(buckets):
            f = self.filters.get(int(b))
            if f is None:
                f = self.filters[int(b)] = BloomFilter(self.capacity, self.fp_rate)
            f.add_many(keys[buckets == b])

    def probe(self, buckets: np.ndarray, keys: np.ndarray) -> np.ndarray:
        buckets = np.asarray(buckets, dtype=np.int64)
        keys = np.asarray(keys, dtype=np.int64)
        out = np.zeros(len(keys), dtype=bool)
        for b in np.unique(buckets):
            f = self.filters.get(int(b))
            if f is not None:
                m = buckets == b
                out[m] = f.contains_many(keys[m])
        return out

    def to_blobs(self) -> dict[int, bytes]:
        return {b: f.to_bytes() for b, f in self.filters.items()}

    @classmethod
    def from_blobs(
        cls,
        blobs: dict[int, bytes],
        num_buckets: int,
        capacity_per_bucket: int,
        fp_rate: float,
    ) -> "PartitionedBloom":
        p = cls(num_buckets, capacity_per_bucket, fp_rate)
        p.filters = {int(b): BloomFilter.from_bytes(v) for b, v in blobs.items()}
        return p


def load_bucket_blob(bloom_base: str, rnd: int, bucket: int) -> "BloomFilter | None":
    """Executor-side read of ONE bucket's merged Bloom blob from the sidecar
    parquet written at round ``rnd`` (storage.write_bloom_round). This is the
    map-side half of the partition-addressable design: a task that owns
    bucket b reads only blob b — filter bytes never transit the driver or a
    whole-dict broadcast. pyarrow dataset filtering prunes to the matching
    row (blob files are written clustered by host_hash)."""
    import pyarrow.dataset as pds

    dset = pds.dataset(f"{bloom_base}/round={rnd:05d}", format="parquet")
    tbl = dset.to_table(
        columns=["blob"], filter=pds.field("host_hash") == int(bucket)
    )
    if tbl.num_rows == 0:
        return None
    return BloomFilter.from_bytes(tbl.column("blob")[0].as_py())


class CuckooFilter:
    """Deletable approximate-membership filter (Fan et al., CoNEXT 2014 [pub]).

    Used for the *deletable politeness ban* set (A4, BASELINE.json:6): hosts
    get banned and later unbanned; a Bloom filter cannot delete, a cuckoo
    filter can. 4-slot buckets, 16-bit fingerprints, partial-key cuckoo
    hashing; numpy table so lookup_many is vectorized.
    """

    SLOTS = 4
    MAX_KICKS = 500

    def __init__(self, capacity: int):
        n_buckets = 1
        while n_buckets * self.SLOTS < max(capacity, 16) * 1.25:
            n_buckets *= 2
        self.n_buckets = n_buckets
        self.table = np.zeros((n_buckets, self.SLOTS), dtype=np.uint16)
        self.n_items = 0
        self._rng = np.random.default_rng(42)  # deterministic kick choice

    def _fingerprint(self, keys: np.ndarray) -> np.ndarray:
        fp = (_mix(keys.astype(np.uint64)) & np.uint64(0xFFFF)).astype(np.uint16)
        fp[fp == 0] = 1  # 0 means empty slot
        return fp

    def _index1(self, keys: np.ndarray) -> np.ndarray:
        return (keys.astype(np.uint64) % np.uint64(self.n_buckets)).astype(np.int64)

    def _alt_index(self, idx: np.ndarray, fp: np.ndarray) -> np.ndarray:
        h = _mix(fp.astype(np.uint64))
        return ((idx.astype(np.uint64) ^ h) % np.uint64(self.n_buckets)).astype(
            np.int64
        )

    def insert(self, key: int) -> bool:
        fp = self._fingerprint(np.array([key], dtype=np.int64))[0]
        i1 = int(self._index1(np.array([key], dtype=np.int64))[0])
        i2 = int(self._alt_index(np.array([i1]), np.array([fp]))[0])
        for i in (i1, i2):
            empty = np.flatnonzero(self.table[i] == 0)
            if len(empty):
                self.table[i, empty[0]] = fp
                self.n_items += 1
                return True
        # relocate
        i = i1
        for _ in range(self.MAX_KICKS):
            s = int(self._rng.integers(0, self.SLOTS))
            fp, self.table[i, s] = self.table[i, s], fp
            i = int(self._alt_index(np.array([i]), np.array([fp]))[0])
            empty = np.flatnonzero(self.table[i] == 0)
            if len(empty):
                self.table[i, empty[0]] = fp
                self.n_items += 1
                return True
        return False  # table full — caller must resize

    def delete(self, key: int) -> bool:
        fp = self._fingerprint(np.array([key], dtype=np.int64))[0]
        i1 = int(self._index1(np.array([key], dtype=np.int64))[0])
        i2 = int(self._alt_index(np.array([i1]), np.array([fp]))[0])
        for i in (i1, i2):
            hit = np.flatnonzero(self.table[i] == fp)
            if len(hit):
                self.table[i, hit[0]] = 0
                self.n_items -= 1
                return True
        return False

    def contains_many(self, keys: np.ndarray) -> np.ndarray:
        keys = np.asarray(keys, dtype=np.int64)
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        fp = self._fingerprint(keys)
        i1 = self._index1(keys)
        i2 = self._alt_index(i1, fp)
        in1 = (self.table[i1] == fp[:, None]).any(axis=1)
        in2 = (self.table[i2] == fp[:, None]).any(axis=1)
        return in1 | in2

    def to_bytes(self) -> bytes:
        head = np.array([self.n_buckets, self.n_items], dtype=np.int64)
        return head.tobytes() + self.table.tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes) -> "CuckooFilter":
        head = np.frombuffer(blob[:16], dtype=np.int64)
        f = cls.__new__(cls)
        f.n_buckets, f.n_items = int(head[0]), int(head[1])
        f.table = (
            np.frombuffer(blob[16:], dtype=np.uint16)
            .reshape(f.n_buckets, cls.SLOTS)
            .copy()
        )
        f._rng = np.random.default_rng(42)
        return f
