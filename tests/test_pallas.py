"""Pallas kernels: interpret-mode correctness (VMEM + HBM wave-DMA)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from protgram_directgcn_tpu.ops import spmm
from protgram_directgcn_tpu.ops.pallas_spmm import _ell_hbm_raw, _ell_pallas_raw
from tests.conftest import random_graph_arrays


@pytest.fixture
def ell_and_x(rng):
    n = 200
    src, tgt, w = random_graph_arrays(rng, n=n, e=5 * n)
    adj = spmm.build_ell(src, tgt, w, n)
    x = rng.standard_normal((n, 64)).astype(np.float32)
    ref = np.asarray(spmm._ell_apply(adj.idx, adj.w, jnp.asarray(x)))
    return adj, x, ref


def test_vmem_kernel_interpret(ell_and_x):
    adj, x, ref = ell_and_x
    out = np.asarray(_ell_pallas_raw(adj.idx, adj.w, jnp.asarray(x), interpret=True))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_hbm_kernel_interpret(ell_and_x):
    adj, x, ref = ell_and_x
    out = np.asarray(_ell_hbm_raw(adj.idx, adj.w, jnp.asarray(x), interpret=True))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_hbm_kernel_unaligned_rows(rng):
    """Row counts not divisible by the tile size must pad correctly."""
    n = 137
    src, tgt, w = random_graph_arrays(rng, n=n, e=3 * n)
    adj = spmm.build_ell(src, tgt, w, n)
    x = rng.standard_normal((n, 32)).astype(np.float32)
    ref = np.asarray(spmm._ell_apply(adj.idx, adj.w, jnp.asarray(x)))
    out = np.asarray(_ell_hbm_raw(adj.idx, adj.w, jnp.asarray(x), interpret=True))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)
