"""Vectorized numpy kernels for MinHash (F15) and SimHash (F16).

Pure functions over batches of shingle-hash arrays — unit-testable
without Spark, wrapped by pandas UDFs in operators/minhash.py and
operators/simhash.py. Replaces the reference's designed-but-stubbed
similarity providers (src/similarity.rs:1-7, DESIGN.md:240-258) with
the standard MinHash/SimHash constructions (Broder 1997; Charikar 2002).

All arithmetic stays in fixed-width integers: shingle hashes are reduced
mod p = 2^31 - 1, permutation params a, b < p, so a*h + b < 2^62 fits
uint64 with no Python bigints in the hot path.
"""

from __future__ import annotations

import numpy as np

from uncp_spark.config import SimilarityConfig

# cap on elements of the (perm_chunk x total_shingles) work matrix
_CHUNK_ELEMS = 8_000_000


def minhash_params(cfg: SimilarityConfig) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic permutation parameters, seeded once — identical on
    every executor for every batch (broadcast-by-construction)."""
    rng = np.random.RandomState(cfg.seed)
    p = cfg.prime
    a = rng.randint(1, p, size=cfg.num_perm).astype(np.uint64)
    b = rng.randint(0, p, size=cfg.num_perm).astype(np.uint64)
    return a, b


def minhash_batch(
    shingle_arrays: list[np.ndarray],
    a: np.ndarray,
    b: np.ndarray,
    prime: int,
) -> np.ndarray:
    """MinHash signatures for a batch of shingle-hash sets.

    Returns int64 array of shape (n_rows, num_perm). Empty sets get the
    sentinel signature [prime]*num_perm (never collides with a real
    min, which is < prime).
    """
    n_perm = len(a)
    n_rows = len(shingle_arrays)
    p = np.uint64(prime)
    out = np.full((n_rows, n_perm), prime, dtype=np.int64)

    lens = np.fromiter((len(s) for s in shingle_arrays), dtype=np.int64, count=n_rows)
    nz = np.flatnonzero(lens)
    if nz.size == 0:
        return out

    flat = np.concatenate([np.asarray(shingle_arrays[i], dtype=np.int64) for i in nz])
    h = np.mod(flat, np.int64(prime)).astype(np.uint64)  # non-negative residues
    starts = np.zeros(nz.size, dtype=np.int64)
    np.cumsum(lens[nz][:-1], out=starts[1:])

    chunk = max(1, min(n_perm, _CHUNK_ELEMS // max(1, h.size)))
    for lo in range(0, n_perm, chunk):
        hi = min(lo + chunk, n_perm)
        # (chunk, total_shingles) permuted values mod p
        vals = (a[lo:hi, None] * h[None, :] + b[lo:hi, None]) % p
        mins = np.minimum.reduceat(vals, starts, axis=1)  # (chunk, n_nonempty)
        out[nz, lo:hi] = mins.T.astype(np.int64)
    return out


def simhash_batch(token_hash_arrays: list[np.ndarray]) -> np.ndarray:
    """64-bit frequency-weighted SimHash per row (Charikar 2002).

    Input arrays keep token repetition, so each occurrence votes — the
    'token-frequency weighted' variant the pinned config requires.
    Returns int64 array of shape (n_rows,); empty rows hash to 0.
    """
    n_rows = len(token_hash_arrays)
    out = np.zeros(n_rows, dtype=np.int64)
    lens = np.fromiter((len(s) for s in token_hash_arrays), dtype=np.int64, count=n_rows)
    nz = np.flatnonzero(lens)
    if nz.size == 0:
        return out

    flat = np.concatenate(
        [np.asarray(token_hash_arrays[i], dtype=np.int64) for i in nz]
    ).view(np.uint64)
    bits = np.arange(64, dtype=np.uint64)
    # (total_tokens, 64) in {-1, +1}; int8 keeps the matrix small
    votes = (((flat[:, None] >> bits[None, :]) & np.uint64(1)).astype(np.int8) * 2) - 1
    starts = np.zeros(nz.size, dtype=np.int64)
    np.cumsum(lens[nz][:-1], out=starts[1:])
    sums = np.add.reduceat(votes.astype(np.int32), starts, axis=0)  # (n_nonempty, 64)
    packed = ((sums > 0).astype(np.uint64) << bits[None, :]).sum(
        axis=1, dtype=np.uint64
    )
    out[nz] = packed.view(np.int64)
    return out


def est_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    """Signature-estimated Jaccard — fraction of agreeing positions."""
    return float(np.mean(np.asarray(sig_a) == np.asarray(sig_b)))
