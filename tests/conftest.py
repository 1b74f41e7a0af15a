"""Test harness: run everything on a virtual 8-device CPU mesh.

Must set XLA flags before jax is first imported anywhere in the test run.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# In this environment jax may already be pre-imported at interpreter startup
# (device tunnel plugin), so the env vars alone can be too late — force the
# platform through the live config as well (works until backend init).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture
def toy_fasta(tmp_path):
    """Small FASTA matching the reference's smoke-test style
    (reference: run_graph_builder.py:24-28)."""
    path = tmp_path / "toy.fasta"
    path.write_text(
        ">sp|P001|PROT1\nMKTAYIAKQR\n>sp|P002|PROT2\nQDKTAYIAK\n>sp|P003|PROT3\nMKTAYHRQD\n"
    )
    return path


def random_graph_arrays(rng, n=50, e=200):
    """Random directed multigraph collapsed to unique weighted edges."""
    src = rng.integers(0, n, e)
    tgt = rng.integers(0, n, e)
    pairs, counts = np.unique(np.stack([src, tgt], 1), axis=0, return_counts=True)
    return pairs[:, 0].astype(np.int32), pairs[:, 1].astype(np.int32), counts.astype(np.float32)
