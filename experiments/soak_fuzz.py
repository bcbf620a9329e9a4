"""Long-running routing soak: randomized corpora x randomized knobs vs
the SA-IS/Kasai oracles (CPU). A scaled-up, knob-randomizing companion
to tests/test_routing_fuzz.py — run after structural changes to the
routing/count-free/carried-words machinery.

    python experiments/soak_fuzz.py [minutes] [seed0]

Each draw randomizes the environment thresholds so every dispatch path
gets hit: direct (2/3 words, ascending/chain/mispredicted), count-free
vs exact MSD (incl. forced-overflow reruns via negative margins),
doubling fallback, and the LCP routing stack.
"""
from __future__ import annotations

import importlib
import os
import sys
import time

import numpy as np


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
        text = fuzz._draw(rng, n)
        # Randomize the routing knobs.
        os.environ["SA_BIG_THRESHOLD"] = str(int(rng.integers(2_000, 8_000)))
        os.environ["SA_LCP_BIG_MIN"] = str(int(rng.integers(2_000, 8_000)))
        os.environ["SA_LCP_WINDOW_MIN"] = str(int(rng.integers(1_000, 4_000)))
        os.environ["SA_DIRECT_MAX"] = str(
            int(rng.choice([1 << 12, 1 << 15, 1 << 28])))
        os.environ["SA_CF_MARGIN"] = str(
            float(rng.choice([0.06, 0.02, -0.3])))   # -0.3 forces reruns
        os.environ["SA_BIG_COUNT_FREE"] = str(int(rng.integers(0, 2)))
        ref = np.asarray(suffix_array_oracle(text.tobytes()))
        sa = np.asarray(build_suffix_array(text))
        assert np.array_equal(sa, ref), \
            f"SA mismatch i={i} n={n} env={dict(os.environ)}"
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
    print(f"SOAK PASS: {i} draws, no mismatch", flush=True)


if __name__ == "__main__":
    main()
