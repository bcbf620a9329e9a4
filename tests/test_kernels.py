"""Pallas kernel tests (interpret mode on CPU; compiled path runs on TPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from hpc_suffix_array_tpu.kernels.pack import pack_ranks_pallas


def _reference_pack(codes, bits, h0):
    ext = np.concatenate([codes, np.zeros(h0, np.int32)])
    want = np.zeros(len(codes), np.int64)
    for j in range(h0):
        want = (want << bits) | ext[j:j + len(codes)]
    return want.astype(np.int32)


@pytest.mark.parametrize("n,bits,h0", [
    (128, 6, 5), (128 * 8, 3, 10), (128 * 9, 9, 3),
    (128 * 513, 6, 5), (1 << 17, 1, 30),
])
def test_pack_matches_reference(rng, n, bits, h0):
    codes = rng.integers(0, 1 << bits, n).astype(np.int32)
    got = np.asarray(pack_ranks_pallas(jnp.asarray(codes), bits, h0, True))
    assert np.array_equal(got, _reference_pack(codes, bits, h0))


def test_pack_zero_tail(rng):
    """Trailing zeros (pad sentinel region) fold in as rank 0."""
    codes = np.zeros(1024, np.int32)
    codes[:100] = rng.integers(1, 4, 100)
    got = np.asarray(pack_ranks_pallas(jnp.asarray(codes), 2, 15, True))
    assert np.array_equal(got, _reference_pack(codes, 2, 15))


def _load_radix_write():
    """The retired radix pass lives under experiments/ (r2 FINAL VERDICT:
    measured dead end, kept as the reference implementation of the
    approach); import it by path so the package tree stays live-code-only."""
    import importlib.util
    import pathlib
    path = pathlib.Path(__file__).resolve().parents[1] / "experiments" /         "radix_write.py"
    spec = importlib.util.spec_from_file_location("radix_write_exp", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class TestRadix:
    """Pallas radix pass (interpret mode; retained as a documented dead
    end - see experiments/radix_write.py FINAL VERDICT)."""

    def test_dma_pass(self, rng):
        import jax.numpy as jnp
        rw = _load_radix_write()
        BLOCK, radix_pass_dma = rw.BLOCK, rw.radix_pass_dma

        n = BLOCK * 2
        for name, keys in [
            ("uniform", rng.integers(0, 1 << 20, n)),
            ("skewed", np.where(rng.random(n) < 0.95, 15 << 8,
                                rng.integers(0, 1 << 20, n))),
        ]:
            keys = keys.astype(np.int32)
            pay = np.arange(n, dtype=np.int32)
            k, p = radix_pass_dma(jnp.asarray(keys), jnp.asarray(pay), 8,
                                  True)
            order = np.argsort((keys >> 8) & 15, kind="stable")
            assert np.array_equal(np.asarray(k), keys[order]), name
            assert np.array_equal(np.asarray(p), pay[order]), name

    def test_scan_paths_equivalent(self, rng):
        """Explicit shift-add scan == cumsum (run under the interpreter)."""
        import functools
        import jax
        import jax.numpy as jnp
        from jax import lax
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu
        rw = _load_radix_write()
        SUBL, LANES, _inclusive_scan_flat = (
            rw.SUBL, rw.LANES, rw._inclusive_scan_flat)

        def kern(m_ref, out_ref):
            row = lax.broadcasted_iota(jnp.int32, (SUBL, LANES), 0)
            lane = lax.broadcasted_iota(jnp.int32, (SUBL, LANES), 1)
            out_ref[:] = _inclusive_scan_flat(
                m_ref[:], row, lane, interpret=False)

        m = rng.integers(0, 2, (SUBL, LANES)).astype(np.int32)
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((SUBL, LANES), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=True,
        )(jnp.asarray(m))
        want = np.cumsum(m.reshape(-1)).reshape(SUBL, LANES)
        assert np.array_equal(np.asarray(out), want)
