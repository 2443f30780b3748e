"""Sharded shared mutable index — the one operator family where raw
Ray actors are the right tool (a global index that map tasks must
read-and-update cannot be expressed as a Dataset transform without a
full shuffle per probe).

Reference analog: the reference's extractors keep per-instance caches
(e.g. A000's warmed model and per-document state); the distributed
version of "a mutable lookup structure the whole job shares" is an
ACTOR SERVICE sharded by key hash:

- N index actors, each owning one hash range of the key space, so no
  single actor serializes the whole job (shard count scales with the
  cluster, hot shards can be split).
- Map tasks batch their updates per shard and issue ONE actor call per
  (batch, shard) — never per row.
- All merge operations are COMMUTATIVE (min), so the final index state
  is independent of task arrival order and the result is deterministic
  under any parallelism, retries included (min is idempotent).

The demo operator is streaming-ingest exact dedup: each content hash
claims its minimal doc_id across the whole stream. Equivalent to the
shuffle-based ``stages.dedup.exact_dedup_keep`` (a test pins them
equal), but the index stays RESIDENT between calls — the property a
shuffle cannot give you — so successive ingest waves dedup against
everything already seen.
"""

from __future__ import annotations

import hashlib
from typing import List

import numpy as np
import pandas as pd


def _shard_of(h: str, n_shards: int) -> int:
    # first 8 hex chars of the content hash -> stable shard id
    return int(h[:8], 16) % n_shards


class _IndexShard:
    """One hash-range shard of the index: content-hash -> min doc id.
    Plain class wrapped with ray.remote at pool construction (keeps the
    module importable without Ray)."""

    def __init__(self):
        self.index: dict = {}

    def claim_min(self, hashes: List[str], ids: List[int]) -> None:
        """Commutative batch update: each hash keeps the min id seen."""
        idx = self.index
        for h, i in zip(hashes, ids):
            cur = idx.get(h)
            if cur is None or i < cur:
                idx[h] = i

    def winners(self) -> pd.DataFrame:
        return pd.DataFrame({
            "h": list(self.index.keys()),
            "doc_id": pd.array(list(self.index.values()), dtype="int64"),
        })

    def size(self) -> int:
        return len(self.index)


class DedupIndex:
    """Sharded dedup index service. Create once per ingest job; feed it
    dataset batches with ``ingest``; read the kept set with
    ``kept_ids``."""

    def __init__(self, n_shards: int = 8):
        import ray
        self.n_shards = n_shards
        # num_cpus=0: shards are lightweight dict holders that must
        # NEVER compete with (or starve) the ingest map tasks — a
        # CPU-reserving shard pool could deadlock the job in either
        # direction (actors hold every slot and map tasks starve, or
        # map tasks hold every slot blocked on pending actors): the
        # same pool-reserves-all-CPUs class measured in BASELINE.md
        shard_cls = ray.remote(num_cpus=0)(_IndexShard)
        self.shards = [shard_cls.remote() for _ in range(n_shards)]

    def ingest(self, ds, *, text_col: str = "text", id_col: str = "doc_id",
               batch_size: int = 8192) -> int:
        """Stream a dataset through the index: every batch hashes its
        texts, groups updates by shard, and issues one claim_min call
        per shard. Returns the number of rows ingested. Safe to call
        repeatedly — later waves dedup against all earlier ones."""
        import ray
        shards = self.shards
        n_shards = self.n_shards

        def update(b: pd.DataFrame) -> pd.DataFrame:
            hs = [hashlib.md5(t.encode("utf-8")).hexdigest()
                  for t in b[text_col]]
            ids = b[id_col].to_numpy(dtype=np.int64)
            shard_ids = np.fromiter((_shard_of(h, n_shards) for h in hs),
                                    dtype=np.int64, count=len(hs))
            calls = []
            for s in range(n_shards):
                m = shard_ids == s
                if m.any():
                    calls.append(shards[s].claim_min.remote(
                        [hs[i] for i in np.flatnonzero(m)],
                        ids[m].tolist()))
            ray.get(calls)       # barrier per batch: updates landed
            return pd.DataFrame({"n": [len(b)]})

        counts = ds.map_batches(update, batch_format="pandas",
                                batch_size=batch_size).to_pandas()
        if counts.empty or "n" not in counts.columns:
            return 0            # empty ingest wave: no batch ever ran
        return int(counts["n"].sum())

    def kept_ids(self) -> pd.DataFrame:
        """The deduped keep-set: min doc_id per distinct content hash
        across everything ever ingested."""
        import ray
        frames = ray.get([s.winners.remote() for s in self.shards])
        out = pd.concat(frames, ignore_index=True)
        return (out[["doc_id"]].sort_values("doc_id")
                .reset_index(drop=True))

    def size(self) -> int:
        import ray
        return int(sum(ray.get([s.size.remote() for s in self.shards])))

    def shutdown(self):
        import ray
        for s in self.shards:
            ray.kill(s)
        self.shards = []
