"""Environment doctor: TPU/JAX/toolchain sanity checks.

Replaces the reference's environment tooling (reference:
create_environment.py, verify_cuda_cudnn.py) for the TPU stack: reports
device inventory, runs a tiny MXU matmul, checks the native toolchain and
key library versions.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import time


def check(name: str, fn):
    try:
        result = fn()
        print(f"  [ok] {name}: {result}")
        return True
    except Exception as e:
        print(f"  [!!] {name}: {type(e).__name__}: {e}")
        return False


def main() -> int:
    print("== ProtGram-DirectGCN TPU environment doctor ==")
    ok = True

    def versions():
        import flax, jax, numpy, optax, scipy

        return (f"jax {jax.__version__}, flax {flax.__version__}, optax {optax.__version__}, "
                f"numpy {numpy.__version__}, scipy {scipy.__version__}")

    ok &= check("libraries", versions)

    def devices():
        import jax

        devs = jax.devices()
        return f"{len(devs)}x {devs[0].device_kind} ({devs[0].platform})"

    ok &= check("devices", devices)

    def matmul():
        import jax
        import jax.numpy as jnp

        t0 = time.time()
        out = (jnp.ones((512, 512), jnp.bfloat16) @ jnp.ones((512, 512), jnp.bfloat16))
        out.block_until_ready()
        return f"512x512 bf16 matmul ok ({time.time() - t0:.2f}s incl. compile)"

    ok &= check("device matmul", matmul)

    def toolchain():
        found = [t for t in ("g++", "make", "cmake", "ninja") if shutil.which(t)]
        return ", ".join(found) if found else "none"

    ok &= check("native toolchain", toolchain)

    def native_lib():
        sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        from protgram_directgcn_tpu import native

        return "loaded" if native.available() else "unavailable (numpy fallback active)"

    ok &= check("native ETL kernels", native_lib)

    def virtual_mesh():
        env = dict(os.environ)
        env["XLA_FLAGS"] = env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
        code = ("import jax; jax.config.update('jax_platforms','cpu');"
                "assert len(jax.devices())==4; print('4 virtual cpu devices')")
        out = subprocess.run([sys.executable, "-c", code], env=env, capture_output=True,
                             text=True, timeout=120)
        if out.returncode != 0:
            raise RuntimeError(out.stderr.strip()[-200:])
        return out.stdout.strip()

    ok &= check("virtual multi-device mesh", virtual_mesh)

    print("== all checks passed ==" if ok else "== some checks FAILED ==")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
