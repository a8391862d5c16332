"""Unit tests for the Pallas sweep primitives (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tokendagger_tpu.ops import sweep as SW


R, L = 16, 128
BLK = R * L


def _pallas_global_scan(x, op, reverse=False, interpret=True):
    """Global scan over (N,) via a sequential-grid sweep with SMEM carry."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N = x.shape[0]
    G = N // BLK
    ident = SW._ident(op)

    def kernel(x_ref, o_ref, carry):
        g = pl.program_id(0)

        @pl.when(g == 0)
        def _():
            carry[0] = ident

        tile = x_ref[...]
        if reverse:
            out = SW.reverse_raster_scan(tile, op, carry[0])
            carry[0] = out[0, 0]
        else:
            out = SW.raster_scan(tile, op, carry[0])
            carry[0] = out[R - 1, L - 1]
        o_ref[...] = out

    idx = (lambda i: (G - 1 - i, 0)) if reverse else (lambda i: (i, 0))
    out = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[pl.BlockSpec((R, L), idx, memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((R, L), idx, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N // L, L), jnp.int32),
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
        interpret=interpret,
    )(x.reshape(N // L, L))
    return out.reshape(N)


@pytest.mark.parametrize("op", ["max", "min", "add"])
@pytest.mark.parametrize("reverse", [False, True])
def test_global_scan_matches_lax(op, reverse):
    rng = np.random.default_rng(0)
    N = BLK * 4
    x = jnp.asarray(rng.integers(-1000, 1000, N, dtype=np.int32))
    got = _pallas_global_scan(x, op, reverse=reverse)
    fn = {"max": jax.lax.cummax, "min": jax.lax.cummin,
          "add": jnp.cumsum}[op]
    want = fn(x, axis=0, reverse=reverse) if op != "add" else (
        jnp.cumsum(x[::-1])[::-1] if reverse else jnp.cumsum(x))
    assert np.array_equal(np.asarray(got), np.asarray(want)), op


def test_shifts_match_reference():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.integers(-99, 99, (R, L), dtype=np.int32))

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_ref, f_ref, b_ref):
        f_ref[...] = SW.shift_fwd(x_ref[...], jnp.int32(-7))
        b_ref[...] = SW.shift_bwd(x_ref[...], jnp.int32(-9))

    f, b = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((R, L), jnp.int32)] * 2,
        interpret=True,
    )(x)
    flat = np.asarray(x).reshape(-1)
    want_f = np.concatenate([[-7], flat[:-1]])
    want_b = np.concatenate([flat[1:], [-9]])
    assert np.array_equal(np.asarray(f).reshape(-1), want_f)
    assert np.array_equal(np.asarray(b).reshape(-1), want_b)
