"""Shared md5-upper-64 hashing — THE engine/oracle mirroring contract.

Every operator that hash-buckets strings for a DuckDB-verified surface
(winnowing fingerprints, DSIR feature buckets, Count-Min sketch rows)
uses the SAME definition: the first 8 md5 digest bytes read
little-endian, which is exactly DuckDB's ``md5_number_upper``. Keeping
the contract in one place means a change to it cannot silently break
one operator's parity while the others still pass.
"""
from __future__ import annotations

import hashlib

# per-worker memo shared by every bucketed caller: hot keys (stop
# words, heavy users) recur across batches, so the md5 runs once per
# distinct (value, modulus) per worker. Wholesale clear past the cap —
# the memo is a cache, never a correctness surface.
_MD5_BUCKET_MEMO: dict = {}


def md5_upper64(s: str) -> int:
    """Upper 64 bits of md5(s) as an unsigned int — DuckDB's
    ``md5_number_upper(s)`` bit-for-bit."""
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8],
                          "little")


def md5_bucket(s: str, k: int) -> int:
    """``md5_upper64(s) % k``, memoized per worker."""
    key = (s, k)
    v = _MD5_BUCKET_MEMO.get(key)
    if v is None:
        if len(_MD5_BUCKET_MEMO) > 2_000_000:
            _MD5_BUCKET_MEMO.clear()
        v = md5_upper64(s) % k
        _MD5_BUCKET_MEMO[key] = v
    return v
