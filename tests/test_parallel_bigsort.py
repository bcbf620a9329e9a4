"""Sharded one-pass MSD build (parallel/bigsort.py) vs the oracle."""

import numpy as np
import pytest

from hpc_suffix_array_tpu.core.oracle import suffix_array_oracle
from hpc_suffix_array_tpu.parallel import make_mesh
from hpc_suffix_array_tpu.parallel.bigsort import build_suffix_array_sharded_big

ALNUM = np.frombuffer(
    b"abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789",
    dtype=np.uint8)


@pytest.fixture(scope="module")
def mesh8():
    return make_mesh(8)


def _check(text, mesh, **kw):
    sa = np.asarray(build_suffix_array_sharded_big(text, mesh, **kw))
    ref = suffix_array_oracle(text.tobytes())
    assert np.array_equal(sa, ref)


def test_random_alnum(mesh8, rng):
    _check(ALNUM[rng.integers(0, 62, 8 * 4096)], mesh8)


def test_random_bytes(mesh8, rng):
    _check(rng.integers(0, 256, 3 * 4096).astype(np.uint8), mesh8)


def test_dna(mesh8, rng):
    _check(np.frombuffer(b"ACGT", np.uint8)[rng.integers(0, 4, 8 * 2048)],
           mesh8)


def test_periodic_chain(mesh8, rng):
    base = ALNUM[rng.integers(0, 62, 1000)]
    text = np.tile(base, 40)[: 8 * 4096]
    _check(text, mesh8)


def test_all_same_char(mesh8):
    _check(np.full(8 * 1024, ord("a"), np.uint8), mesh8)


def test_short_period(mesh8):
    _check(np.frombuffer(b"ab" * (4 * 1024), np.uint8), mesh8)


def test_residue_patch(mesh8, rng):
    """A text with a few long duplicated windows: ascending mode with
    host-resolved residue groups (ties beyond 2*spw symbols)."""
    text = ALNUM[rng.integers(0, 62, 8 * 2048)].copy()
    text[500:600] = text[3000:3100]       # one 100-byte repeat
    text[7000:7040] = text[9000:9040]     # one 40-byte repeat
    _check(text, mesh8)


def test_irregular_heavy_ties_fall_back(mesh8, rng):
    """Mostly-periodic text with a corrupted tail: chain mode must refuse
    (delta not a global period / irregular chains) rather than return a
    wrong SA — the caller then uses the doubling builder."""
    base = ALNUM[rng.integers(0, 62, 8)]
    text = np.tile(base, 2048)[: 8 * 2048].copy()
    text[-100:] = ALNUM[rng.integers(0, 62, 100)]
    try:
        _check(text, mesh8)          # correct is also acceptable
    except NotImplementedError:
        pass


def test_sharded_build_routes_to_msd(mesh8, rng, monkeypatch):
    """build_suffix_array_sharded routes large texts through the one-pass
    builder (and the result stays exact), falling back on refusal."""
    from hpc_suffix_array_tpu.parallel import build_suffix_array_sharded

    monkeypatch.setenv("SA_SHARDED_MSD_MIN", "4096")
    text = ALNUM[rng.integers(0, 62, 8 * 2048)]
    sa = np.asarray(build_suffix_array_sharded(text, mesh8))
    assert np.array_equal(sa, suffix_array_oracle(text.tobytes()))
    # corrupted-tail periodic text: MSD may refuse -> doubling fallback
    base = ALNUM[rng.integers(0, 62, 8)]
    tricky = np.tile(base, 2048)[: 8 * 2048].copy()
    tricky[-100:] = ALNUM[rng.integers(0, 62, 100)]
    sa = np.asarray(build_suffix_array_sharded(tricky, mesh8))
    assert np.array_equal(sa, suffix_array_oracle(tricky.tobytes()))


def test_mesh_shape_invariance(rng):
    text = ALNUM[rng.integers(0, 62, 8 * 1024)]
    ref = suffix_array_oracle(text.tobytes())
    for p in (1, 2, 4, 8):
        sa = np.asarray(build_suffix_array_sharded_big(text, make_mesh(p)))
        assert np.array_equal(sa, ref), f"mesh={p}"


# --- wide-index (two-word global index) mode: the >=4 GiB path ---------

def test_wide_random_alnum(mesh8, rng):
    _check(ALNUM[rng.integers(0, 62, 8 * 4096)], mesh8, wide_index=True)


def test_wide_random_bytes(mesh8, rng):
    _check(rng.integers(0, 256, 3 * 4096).astype(np.uint8), mesh8,
           wide_index=True)


def test_wide_periodic_chain(mesh8, rng):
    _check(np.tile(ALNUM[rng.integers(0, 62, 500)], 60), mesh8,
           wide_index=True)


def test_wide_all_same_char(mesh8):
    _check(np.full(8 * 1024, ord("a"), np.uint8), mesh8, wide_index=True)


def test_wide_residue_patch(mesh8, rng):
    text = ALNUM[rng.integers(0, 62, 8 * 2048)]
    block = ALNUM[rng.integers(0, 62, 64)]
    for at in (100, 5000, 9000, 13000):
        text[at:at + 64] = block
    _check(text, mesh8, wide_index=True)


def test_wide_matches_narrow(mesh8, rng):
    """Same input, both index widths: identical arrays (dtype aside)."""
    text = ALNUM[rng.integers(0, 62, 8 * 2048)]
    wide = np.asarray(build_suffix_array_sharded_big(
        text, mesh8, wide_index=True))
    narrow = np.asarray(build_suffix_array_sharded_big(
        text, mesh8, wide_index=False))
    assert wide.dtype == np.int64
    assert np.array_equal(wide, narrow.astype(np.int64))


def _check_lcp(text, mesh, **kw):
    from hpc_suffix_array_tpu.core.oracle import lcp_oracle

    sa, lcp = build_suffix_array_sharded_big(text, mesh, want_lcp=True,
                                             **kw)
    ref = np.asarray(suffix_array_oracle(text.tobytes()))
    assert np.array_equal(np.asarray(sa), ref)
    assert np.array_equal(np.asarray(lcp), lcp_oracle(text, ref))


def test_want_lcp_random(mesh8, rng):
    _check_lcp(ALNUM[rng.integers(0, 62, 8 * 4096)], mesh8)


def test_want_lcp_bytes(mesh8, rng):
    _check_lcp(rng.integers(0, 256, 3 * 4096).astype(np.uint8), mesh8)


def test_want_lcp_periodic_chain(mesh8, rng):
    base = ALNUM[rng.integers(0, 62, 500)]
    _check_lcp(np.tile(base, 70)[:8 * 4096], mesh8)


def test_want_lcp_residue(mesh8, rng):
    """Ties past the carried window take the host lcp patches."""
    text = ALNUM[rng.integers(0, 62, 8 * 4096)]
    block = ALNUM[rng.integers(0, 62, 80)]
    for at in (700, 9000, 17000, 25000):
        text[at:at + 80] = block
    _check_lcp(text, mesh8)


def test_want_lcp_wide_refuses(mesh8, rng):
    with pytest.raises(NotImplementedError):
        build_suffix_array_sharded_big(
            ALNUM[rng.integers(0, 62, 8 * 2048)], mesh8,
            wide_index=True, want_lcp=True)
