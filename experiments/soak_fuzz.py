"""Long-running routing soak: randomized corpora x randomized knobs vs
the SA-IS/Kasai oracles (CPU). A scaled-up, knob-randomizing companion
to tests/test_routing_fuzz.py — run after structural changes to the
routing/count-free/carried-words machinery.

    python experiments/soak_fuzz.py [minutes] [seed0]

Each draw randomizes the environment thresholds so every dispatch path
gets hit: direct (2/3 words, ascending/chain/mispredicted), count-free
vs exact MSD (incl. forced-overflow reruns via negative margins),
doubling fallback, and the LCP routing stack.

Half the draws come from ADVERSARIAL families engineered against the
host-side samplers (r4):
  * probe_edge — planted repeated blocks with length straddling
    estimate_repeat_len's probe_depth (4096): the estimate saturates,
    chain mode is (mis)predicted, and the build must recover through
    the bounded misprediction rerun;
  * heavy_k0  — 85-95% of positions share one leading symbol but the
    text is aperiodic: the edge sampler's uniformity assumption and the
    count-free slab fill fractions are both wrong, forcing overflow
    reruns;
  * min_tail  — power-of-two alphabet with a long minimum-symbol tail
    run: under minpad packing those suffixes all pack to key 0,
    colliding with past-end padding semantics;
  * words     — Zipfian dictionary-word stream (r5; the natural-text
    proxy): window-tie mass far beyond every host residue cap, driving
    the device refinement pass (core/refine.py) with randomized
    refinement knobs (piece size, round budget, host-finish budget).
Every build reports its meta through ``info`` and the soak asserts the
rerun chain stays BOUNDED (<= 3 entries) — a misprediction may re-run
once or twice, never loop.
"""
from __future__ import annotations

import importlib
import os
import sys
import time

import numpy as np

ALNUM = np.frombuffer(
    b"abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789",
    np.uint8)


def _draw_adversarial(rng, n: int) -> np.ndarray:
    """Corpora engineered against the samplers (module docstring)."""
    kind = int(rng.integers(0, 4))
    if kind == 3:                         # words (drives refinement)
        from hpc_suffix_array_tpu.datasets.generate import (
            generate_words_text)
        return generate_words_text(n, seed=int(rng.integers(0, 1 << 30)),
                                   vocab_size=int(rng.choice(
                                       [1 << 8, 1 << 11, 1 << 14])))
    if kind == 0:                         # probe_edge
        t = ALNUM[rng.integers(0, 62, n)]
        blk = int(rng.choice([3800, 4090, 4096, 4200, 5000]))
        blk = min(blk, n // 3)
        src = int(rng.integers(0, n - 2 * blk))
        for _ in range(int(rng.integers(1, 4))):
            at = int(rng.integers(0, n - blk))
            t[at:at + blk] = t[src:src + blk]
        return t
    if kind == 1:                         # heavy_k0 aperiodic skew
        t = np.full(n, ALNUM[0], np.uint8)
        frac = float(rng.uniform(0.05, 0.15))
        breaks = rng.integers(0, n, max(int(n * frac), 8))
        t[breaks] = ALNUM[rng.integers(1, 62, len(breaks))]
        return t
    # min_tail: 4-symbol alphabet, long min-symbol tail run (minpad
    # packs the all-min suffixes to key 0).
    t = np.frombuffer(b"ACGT", np.uint8)[rng.integers(0, 4, n)].copy()
    run = int(rng.integers(100, min(5000, n // 2)))
    t[-run:] = ord("A")
    if rng.integers(0, 2):                # sometimes a mid-text run too
        at = int(rng.integers(0, n - run))
        t[at:at + run] = ord("A")
    return t


def main():
    minutes = float(sys.argv[1]) if len(sys.argv) > 1 else 20.0
    seed0 = int(sys.argv[2]) if len(sys.argv) > 2 else 0x50
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    # Undo the package's malloc pin for this compile-heavy CPU run:
    # XLA:CPU's LLVM JIT churn fragments a pinned heap into unbounded
    # fresh RSS on this VM class (see utils/hostmem + TODO.md; soak run
    # 2026-08-19 died with 'LLVM compilation error: Cannot allocate
    # memory' without this).
    from hpc_suffix_array_tpu.utils.hostmem import release_host_memory

    release_host_memory()
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests"))
    fuzz = importlib.import_module("test_routing_fuzz")

    from hpc_suffix_array_tpu.core.lcp import build_lcp_array, build_sa_lcp
    from hpc_suffix_array_tpu.core.oracle import (lcp_oracle,
                                                  suffix_array_oracle)
    from hpc_suffix_array_tpu.core.suffix_array import build_suffix_array

    deadline = time.time() + minutes * 60
    i = 0
    while time.time() < deadline:
        rng = np.random.default_rng(seed0 + i)
        n = int(rng.integers(4_100, 120_000))
        adversarial = bool(rng.integers(0, 2))
        text = _draw_adversarial(rng, n) if adversarial else fuzz._draw(rng, n)
        # Randomize the routing knobs.
        os.environ["SA_BIG_THRESHOLD"] = str(int(rng.integers(2_000, 8_000)))
        os.environ["SA_LCP_BIG_MIN"] = str(int(rng.integers(2_000, 8_000)))
        os.environ["SA_LCP_WINDOW_MIN"] = str(int(rng.integers(1_000, 4_000)))
        os.environ["SA_DIRECT_MAX"] = str(
            int(rng.choice([1 << 12, 1 << 15, 1 << 28])))
        os.environ["SA_CF_MARGIN"] = str(
            float(rng.choice([0.06, 0.02, -0.3])))   # -0.3 forces reruns
        os.environ["SA_BIG_COUNT_FREE"] = str(int(rng.integers(0, 2)))
        # Refinement knobs (r5): small host caps force the device
        # deepening rounds; tiny piece targets force multi-piece cuts.
        os.environ["SA_HOST_RESIDUE_MAX"] = str(
            int(rng.choice([8, 512, 32768])))
        os.environ["SA_REFINE_PIECE"] = str(
            int(rng.choice([1 << 10, 1 << 14, 1 << 22])))
        os.environ["SA_REFINE_HOST_PIECE"] = str(
            int(rng.choice([1, 64, 1 << 16])))
        os.environ["SA_REFINE_ROUNDS"] = str(int(rng.choice([2, 8, 64])))
        ref = np.asarray(suffix_array_oracle(text.tobytes()))
        info: dict = {}
        sa = np.asarray(build_suffix_array(text, info=info))
        assert np.array_equal(sa, ref), \
            f"SA mismatch i={i} n={n} adv={adversarial} " \
            f"env={ {k: v for k, v in os.environ.items() if k[:3] == 'SA_'} }"
        reruns = info.get("rerun", [])
        assert len(reruns) <= 3, \
            f"unbounded rerun chain i={i} n={n} adv={adversarial}: {reruns}"
        want_lcp = np.asarray(lcp_oracle(text, ref))
        lcp = np.asarray(build_lcp_array(text, ref))
        assert np.array_equal(lcp, want_lcp), f"LCP mismatch i={i} n={n}"
        sa2, lcp2 = build_sa_lcp(text)
        assert np.array_equal(np.asarray(sa2), ref), f"fused SA i={i}"
        assert np.array_equal(np.asarray(lcp2), want_lcp), f"fused LCP i={i}"
        i += 1
        if i % 10 == 0:
            print(f"{i} draws ok ({time.time() + minutes * 60 - deadline:.0f}"
                  f"s elapsed)", flush=True)
        if i % 50 == 0:
            # Every draw compiles fresh randomized shapes (~5 address
            # mappings per XLA:CPU executable, measured); past ~200
            # draws the process exhausts vm.max_map_count (65530) and
            # LLVM dies with 'Cannot allocate memory' despite ~122 GB
            # free (observed twice, 2026-08-20). Dropping the
            # executable cache unmaps the JIT code pages.
            import jax

            jax.clear_caches()
    print(f"SOAK PASS: {i} draws, no mismatch", flush=True)


if __name__ == "__main__":
    main()
