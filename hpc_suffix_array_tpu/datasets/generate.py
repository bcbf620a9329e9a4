"""Dataset generation: benchmark corpora + canonical test fixtures.

Parity with the reference generator (scripts/generate_large_datasets.py):
random alnum (:12-14), repetitive with a 1000-char base pattern (:16-23),
DNA ACGT (:25-28), the standard size ladder (:53-84), the small canonical
fixtures (:86-102), MD5 ``.meta`` sidecars (:30-51), and idempotent skips
(:64-66,71-72).

TPU-first difference: generation is vectorized numpy (chunked to bound host
RSS), not a Python string-concat loop — a 500 MB corpus generates in
seconds, and the arrays can feed `jax.device_put` directly.
"""

from __future__ import annotations

import hashlib
import json
import pathlib
import time

import numpy as np

ALNUM = np.frombuffer(
    b"abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789",
    dtype=np.uint8)
DNA = np.frombuffer(b"ACGT", dtype=np.uint8)

# Canonical strings (reference generate_large_datasets.py:86-102); their
# golden LRS values live in the reference Makefile:131-138.
SMALL_FIXTURES = {
    "banana": b"banana",
    "mississippi": b"mississippi",
    "abcabcabc": b"abcabcabc",
    "aaaa": b"a" * 1000,
    "ababab": b"ab" * 500,
}

MB = 1024 * 1024


def generate_random_text(n: int, seed: int = 0) -> np.ndarray:
    """Uniform random alnum bytes (reference :12-14)."""
    rng = np.random.default_rng(seed)
    return ALNUM[rng.integers(0, len(ALNUM), n)]


def generate_repetitive_text(n: int, seed: int = 0,
                             period: int = 1000) -> np.ndarray:
    """A random base pattern of ``period`` chars tiled to n (reference :16-23)."""
    base = generate_random_text(period, seed)
    return np.tile(base, -(-n // period))[:n]


def generate_dna_text(n: int, seed: int = 0) -> np.ndarray:
    """Uniform ACGT bytes (reference :25-28)."""
    rng = np.random.default_rng(seed)
    return DNA[rng.integers(0, 4, n)]


def _write_with_meta(path: pathlib.Path, data: np.ndarray,
                     kind: str) -> None:
    """Write corpus + MD5 .meta sidecar (reference :30-51), chunked."""
    md5 = hashlib.md5()
    with open(path, "wb") as f:
        for off in range(0, len(data), 64 * MB):
            chunk = bytes(data[off:off + 64 * MB])
            f.write(chunk)
            md5.update(chunk)
    meta = {
        "filename": path.name,
        "type": kind,
        "length": int(len(data)),
        "md5": md5.hexdigest(),
        "generated": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    path.with_suffix(path.suffix + ".meta").write_text(
        json.dumps(meta, indent=2))


def generate_test_fixtures(out_dir) -> list[pathlib.Path]:
    """Write the five canonical small fixtures (reference :86-102)."""
    out = pathlib.Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    written = []
    for name, text in SMALL_FIXTURES.items():
        p = out / f"{name}.txt"
        if not p.exists():  # idempotent, reference :64-66
            _write_with_meta(p, np.frombuffer(text, np.uint8), "fixture")
        written.append(p)
    return written


def generate_standard_datasets(out_dir, random_mb=(1, 50, 100, 200, 500),
                               repetitive_mb=(1, 50, 100), dna_mb=(10,),
                               seed: int = 42) -> list[pathlib.Path]:
    """The reference's standard corpus ladder (reference :53-84), idempotent."""
    out = pathlib.Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    written = []
    plans = (
        [(f"random_{s}MB.txt", "random", generate_random_text, s)
         for s in random_mb]
        + [(f"repetitive_{s}MB.txt", "repetitive",
            generate_repetitive_text, s) for s in repetitive_mb]
        + [(f"dna_{s}MB.txt", "dna", generate_dna_text, s) for s in dna_mb]
    )
    for fname, kind, fn, size_mb in plans:
        p = out / fname
        if not p.exists():
            _write_with_meta(p, fn(size_mb * MB, seed), kind)
        written.append(p)
    return written
