"""Pallas retile kernels (ops/pallas_retile.py): interpret-mode oracle
equivalence with the jit-level reshape pack/unpack they replace on TPU."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from protgram_directgcn_tpu.ops.pallas_retile import (
    pack_rg_pallas,
    unpack_pad_rg_pallas,
)


@pytest.mark.parametrize("f", [64, 32, 16])
def test_unpack_pad_matches_reshape(f):
    a, gp = 3, 24
    k = 128 // f
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((a, gp, 128)).astype(np.float32))
    u = np.asarray(unpack_pad_rg_pallas(x, f, interpret=True))
    ref = np.asarray(x).reshape(a, gp * k, f)
    np.testing.assert_array_equal(u[..., :f], ref)
    assert (u[..., f:] == 0).all()


@pytest.mark.parametrize("f", [64, 32])
@pytest.mark.parametrize("padded", [False, True])
def test_pack_roundtrip(f, padded):
    a, gp = 2, 16
    k = 128 // f
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((a, gp, 128)).astype(np.float32))
    u = unpack_pad_rg_pallas(x, f, interpret=True)
    if not padded:
        u = u[..., :f]
    p = np.asarray(pack_rg_pallas(u, f, interpret=True))
    np.testing.assert_array_equal(p, np.asarray(x))


def test_model_pack_unpack_route_equivalence(monkeypatch):
    """pack_rg_carry/unpack_rg_carry produce identical values through the
    kernel route (forced via the env knob, interpret on CPU is not wired —
    so compare the kernel's interpret output against the reshape path)."""
    from protgram_directgcn_tpu.models import directgcn as m

    rng = np.random.default_rng(2)
    t = jnp.asarray(rng.standard_normal((3, 11, 64)).astype(np.float32))
    monkeypatch.setenv("PROTGRAM_RETILE_PALLAS", "off")
    packed_ref = m.pack_rg_carry(t)
    un_ref = m.unpack_rg_carry(packed_ref, 64, 11)
    np.testing.assert_array_equal(np.asarray(un_ref), np.asarray(t))
    # kernel route on the same padded input (interpret mode)
    gp = packed_ref.shape[1]
    tp = jnp.pad(t, ((0, 0), (0, gp * 2 - 11), (0, 0)))
    packed_k = pack_rg_pallas(tp, 64, interpret=True)
    np.testing.assert_array_equal(np.asarray(packed_k), np.asarray(packed_ref))
    un_k = unpack_pad_rg_pallas(packed_k, 64, interpret=True)[:, :11, :64]
    np.testing.assert_array_equal(np.asarray(un_k), np.asarray(t))


@pytest.mark.parametrize("f", [64, 32])
def test_retile_custom_vjps(f):
    """Both kernels are linear; their VJPs are each other.  float64-oracle
    via the reshape formulation."""
    a, gp = 2, 8
    k = 128 // f
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((a, gp, 128)).astype(np.float32))
    ct = jnp.asarray(rng.standard_normal((a, gp * k, 128)).astype(np.float32))

    def loss_u(t):
        return jnp.sum(unpack_pad_rg_pallas(t, f, True) * ct)

    dx = np.asarray(jax.grad(loss_u)(x))
    ref = np.asarray(pack_rg_pallas(ct, f, True))
    np.testing.assert_array_equal(dx, ref)

    u = unpack_pad_rg_pallas(x, f, True)[..., :f]
    ct2 = jnp.asarray(rng.standard_normal((a, gp, 128)).astype(np.float32))

    def loss_p(t):
        return jnp.sum(pack_rg_pallas(t, f, True) * ct2)

    du = np.asarray(jax.grad(loss_p)(u))
    ref2 = np.asarray(unpack_pad_rg_pallas(ct2, f, True))[..., :f]
    np.testing.assert_array_equal(du, ref2)
