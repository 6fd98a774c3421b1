"""Sharded cuckoo-filter URL-seen set (north_star component).

A from-scratch cuckoo filter (Fan et al., "Cuckoo Filter: Practically Better
Than Bloom", CoNEXT 2014) with a determinism-first design for conformance
(SURVEY.md §7.3):

- **No random eviction walks.** Insert tries the two candidate buckets; if
  both are full the fingerprint goes to an exact overflow set.  With sizing
  headroom the overflow stays tiny, and filter state is a pure function of
  the *sorted multiset* of committed hashes — not of insert order or thread
  timing.
- **Wave-commit protocol.** During a crawl wave, ``contains`` answers from
  the state committed at the end of the previous wave while ``stage`` buffers
  new hashes; ``commit`` sorts the buffer and inserts.  All parallel
  executions therefore see identical membership answers, and the
  single-threaded scheduler oracle reproduces them exactly.
- **Fixed hash seeds / shard count** independent of parallelism: shard
  routing is ``url_hash % num_shards`` on the blake2b-64 URL hash
  (engine.ids.url_hash64).

False positives are possible (a "seen" FP silently drops a URL) — accepted
filter semantics, but deterministic under the rules above, so oracle and
distributed runs drop the same URLs.

``CuckooShard`` is wrapped as a Ray actor by the crawl pipeline
(``@ray.remote`` applied at use site so this module stays importable without
Ray).  Checkpoint/restore round-trips the full state to bytes for the
per-wave Parquet checkpoint (north_rule resume requirement).
"""

from __future__ import annotations

import io
import pickle
from typing import List, Set, Tuple

import numpy as np

_FP_BITS = 16
_BUCKET_SLOTS = 4
_EMPTY = np.uint16(0)


class CuckooFilter:
    """Single-shard cuckoo filter over uint64 hashes."""

    def __init__(self, capacity: int = 1 << 16):
        # Power-of-two bucket count sized for ~50% occupancy headroom.
        nb = 1
        bits = 0
        while nb * _BUCKET_SLOTS < capacity * 2:
            nb <<= 1
            bits += 1
        self.num_buckets = nb
        self._bucket_bits = bits
        self.buckets = np.zeros((nb, _BUCKET_SLOTS), dtype=np.uint16)
        self.overflow: Set[Tuple[int, int]] = set()
        self._staged: List[int] = []
        self.count = 0

    # -- hashing ------------------------------------------------------------
    def _fingerprint(self, h: int) -> int:
        fp = (h >> 32) & 0xFFFF
        return fp if fp != 0 else 1  # 0 marks an empty slot

    def _index1(self, h: int) -> int:
        # Mix before masking: callers route hashes to shards with
        # ``h % num_shards``, so raw low bits are CONSTANT within a shard —
        # masking them directly would leave only 1/num_shards of buckets
        # reachable as i1 (measured 33x overflow blowup).  Fibonacci-mix the
        # full word and take HIGH bits instead.
        mixed = ((h ^ (h >> 17)) * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
        return mixed >> (64 - self._bucket_bits)

    def _index2(self, i1: int, fp: int) -> int:
        # Partial-key cuckoo hashing: i2 = i1 xor hash(fp).
        return (i1 ^ (fp * 0x5BD1E995)) & (self.num_buckets - 1)

    # -- committed-state queries --------------------------------------------
    def contains(self, h: int) -> bool:
        fp = self._fingerprint(h)
        i1 = self._index1(h)
        if fp in self.buckets[i1]:
            return True
        i2 = self._index2(i1, fp)
        if fp in self.buckets[i2]:
            return True
        return (i1, fp) in self.overflow or (i2, fp) in self.overflow

    def contains_many(self, hashes: np.ndarray) -> np.ndarray:
        """Vectorized committed-state membership: both candidate buckets are
        gathered and compared in one numpy pass; the exact overflow set is
        consulted only for the (normally empty) miss remainder."""
        h = np.asarray(hashes, dtype=np.uint64)
        if len(h) == 0:
            return np.zeros(0, dtype=bool)
        fp = ((h >> np.uint64(32)) & np.uint64(0xFFFF)).astype(np.uint16)
        fp[fp == 0] = 1
        mixed = (h ^ (h >> np.uint64(17))) * np.uint64(0x9E3779B97F4A7C15)
        i1 = (mixed >> np.uint64(64 - self._bucket_bits)).astype(np.int64)
        i2 = (
            i1 ^ (fp.astype(np.int64) * 0x5BD1E995)
        ) & (self.num_buckets - 1)
        hit = (self.buckets[i1] == fp[:, None]).any(axis=1) | (
            self.buckets[i2] == fp[:, None]
        ).any(axis=1)
        if self.overflow:
            miss = np.nonzero(~hit)[0]
            for j in miss:
                key1 = (int(i1[j]), int(fp[j]))
                key2 = (int(i2[j]), int(fp[j]))
                if key1 in self.overflow or key2 in self.overflow:
                    hit[j] = True
        return hit

    # -- wave protocol ------------------------------------------------------
    def stage(self, hashes: np.ndarray) -> None:
        self._staged.extend(int(h) for h in hashes)

    def commit(self) -> int:
        """Sort staged hashes, insert each once; return number inserted."""
        inserted = 0
        for h in sorted(set(self._staged)):
            if not self.contains(h):
                self._insert(h)
                inserted += 1
        self._staged.clear()
        return inserted

    def _insert(self, h: int) -> None:
        fp = self._fingerprint(h)
        i1 = self._index1(h)
        i2 = self._index2(i1, fp)
        for i in (i1, i2):
            row = self.buckets[i]
            empty = np.nonzero(row == _EMPTY)[0]
            if len(empty):
                row[empty[0]] = fp
                self.count += 1
                return
        self.overflow.add((i1, fp))
        self.count += 1

    # -- checkpoint ---------------------------------------------------------
    def to_bytes(self) -> bytes:
        buf = io.BytesIO()
        pickle.dump(
            {
                "num_buckets": self.num_buckets,
                "buckets": self.buckets,
                "overflow": sorted(self.overflow),
                "count": self.count,
            },
            buf,
            protocol=4,
        )
        return buf.getvalue()

    @classmethod
    def from_bytes(cls, data: bytes) -> "CuckooFilter":
        d = pickle.loads(data)
        f = cls.__new__(cls)
        f.num_buckets = d["num_buckets"]
        f._bucket_bits = int(d["num_buckets"]).bit_length() - 1
        f.buckets = d["buckets"]
        f.overflow = set(tuple(t) for t in d["overflow"])
        f._staged = []
        f.count = d["count"]
        return f


class CuckooShard:
    """One shard of the URL-seen set; wrapped as a Ray actor at use site.

    Batched API so a map_batches stage makes ONE call per (batch, shard)
    pair, not per URL (SURVEY.md §2.4 ST5).
    """

    def __init__(self, shard_id: int, capacity: int = 1 << 16):
        self.shard_id = shard_id
        self.filter = CuckooFilter(capacity)

    def contains_many(self, hashes: np.ndarray) -> np.ndarray:
        return self.filter.contains_many(np.asarray(hashes, dtype=np.uint64))

    def stage(self, hashes: np.ndarray) -> int:
        self.filter.stage(np.asarray(hashes, dtype=np.uint64))
        return len(hashes)

    def contains_and_stage(self, hashes: np.ndarray) -> np.ndarray:
        """Single-round form of the wave-protocol pair: answer membership
        from COMMITTED state, stage the not-seen hashes, return the seen
        mask.  Exactly equivalent to contains_many + stage(~seen), but one
        actor RPC per (batch, shard) instead of two sequential rounds —
        the per-wave coordination floor is RPC-round-bound (VERDICT r2 #2).
        """
        h = np.asarray(hashes, dtype=np.uint64)
        seen = self.filter.contains_many(h)
        if (~seen).any():
            self.filter.stage(h[~seen])
        return seen

    def commit(self) -> int:
        return self.filter.commit()

    def snapshot(self) -> Tuple[int, bytes]:
        """(seen_count, checkpoint blob) in one RPC."""
        return self.filter.count, self.filter.to_bytes()

    def commit_snapshot(self) -> Tuple[int, int, bytes]:
        """Commit the wave's staged hashes, then snapshot — one RPC round
        replaces the commit + seen_count + checkpoint trio (3 rounds/wave)."""
        inserted = self.filter.commit()
        return inserted, self.filter.count, self.filter.to_bytes()

    def seen_count(self) -> int:
        return self.filter.count

    def checkpoint(self) -> bytes:
        return self.filter.to_bytes()

    def restore(self, data: bytes) -> None:
        self.filter = CuckooFilter.from_bytes(data)


class ShardedSeenSet:
    """Driver-side single-process view over all shards: the scheduler oracle.

    Uses the exact same filters + wave protocol as the distributed actor
    pool, so membership answers (including false positives) are identical.
    """

    def __init__(self, num_shards: int = 16, capacity_per_shard: int = 1 << 16):
        self.num_shards = num_shards
        self.shards = [CuckooShard(i, capacity_per_shard) for i in range(num_shards)]

    def _route(self, hashes: np.ndarray) -> np.ndarray:
        return (np.asarray(hashes, dtype=np.uint64) % np.uint64(self.num_shards)).astype(
            np.int64
        )

    def contains_many(self, hashes: np.ndarray) -> np.ndarray:
        hashes = np.asarray(hashes, dtype=np.uint64)
        out = np.zeros(len(hashes), dtype=bool)
        sid = self._route(hashes)
        for s in range(self.num_shards):
            mask = sid == s
            if mask.any():
                out[mask] = self.shards[s].contains_many(hashes[mask])
        return out

    def stage(self, hashes: np.ndarray) -> None:
        hashes = np.asarray(hashes, dtype=np.uint64)
        sid = self._route(hashes)
        for s in range(self.num_shards):
            mask = sid == s
            if mask.any():
                self.shards[s].stage(hashes[mask])

    def commit(self) -> int:
        return sum(s.commit() for s in self.shards)

    def seen_count(self) -> int:
        return sum(s.seen_count() for s in self.shards)
