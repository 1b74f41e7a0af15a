"""Environment bootstrap: create a ready-to-run venv for the framework.

TPU-native replacement for the reference's conda bootstrap
(reference: create_environment.py:53-112, which solves a conda YAML and then
pip-installs the PyG stack).  The TPU stack is pure pip (jax[tpu] wheels),
so this creates a plain ``venv`` and installs the dependency set in the
right order (jax first, with the libtpu releases index), then verifies the
install by importing every dependency and delegating hardware checks to
``tools/doctor.py``.

Usage:
    python tools/bootstrap_env.py ENV_DIR [--tpu|--cpu] [--dry-run]
    python tools/bootstrap_env.py --print-requirements

``--dry-run`` prints the exact commands without executing (also the mode
exercised by the offline test suite; this container is pre-baked and
offline, so executing here is pointless).
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

# Dependency set mirroring what the package actually imports (see
# PARITY.md for the reference's stack -> TPU stack mapping).  jax must be
# resolved against the libtpu releases index for TPU VMs.
CORE_REQUIREMENTS = [
    "numpy",
    "scipy",
    "h5py",
    "flax",
    "optax",
    "orbax-checkpoint",
    "chex",
    "einops",
    "matplotlib",
    "scikit-learn",
    "pandas",
    "requests",
    "pytest",
]
JAX_TPU = 'jax[tpu]'
JAX_CPU = "jax"
TPU_INDEX = "https://storage.googleapis.com/jax-releases/libtpu_releases.html"
OPTIONAL = ["mlflow", "transformers", "torch"]  # metric mirroring / HF embedder


def plan_commands(env_dir: str, tpu: bool, with_optional: bool):
    py = os.path.join(env_dir, "bin", "python")
    cmds = [[sys.executable, "-m", "venv", env_dir]]
    pip = [py, "-m", "pip", "install", "--upgrade"]
    cmds.append(pip + ["pip"])
    if tpu:
        cmds.append(pip + [JAX_TPU, "-f", TPU_INDEX])
    else:
        cmds.append(pip + [JAX_CPU])
    cmds.append(pip + CORE_REQUIREMENTS)
    if with_optional:
        cmds.append(pip + OPTIONAL)
    # Verification: import everything, then run the doctor.
    mods = "jax, flax, optax, orbax.checkpoint, chex, numpy, scipy, h5py, sklearn, pandas, matplotlib"
    cmds.append([py, "-c", f"import {mods}; print('imports OK')"])
    cmds.append([py, os.path.join(os.path.dirname(os.path.abspath(__file__)), "doctor.py")])
    return cmds


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("env_dir", nargs="?", help="directory for the new venv")
    ap.add_argument("--tpu", action="store_true", default=True,
                    help="install jax[tpu] against the libtpu index (default)")
    ap.add_argument("--cpu", dest="tpu", action="store_false",
                    help="CPU-only jax (dev boxes, CI)")
    ap.add_argument("--with-optional", action="store_true",
                    help="also install mlflow/transformers/torch extras")
    ap.add_argument("--dry-run", action="store_true",
                    help="print the commands without executing")
    ap.add_argument("--print-requirements", action="store_true",
                    help="emit a requirements.txt to stdout and exit")
    args = ap.parse_args(argv)

    if args.print_requirements:
        print((JAX_TPU if args.tpu else JAX_CPU) + (f" -f {TPU_INDEX}" if args.tpu else ""))
        for r in CORE_REQUIREMENTS:
            print(r)
        return 0

    if not args.env_dir:
        ap.error("ENV_DIR required unless --print-requirements")
    cmds = plan_commands(args.env_dir, args.tpu, args.with_optional)
    for cmd in cmds:
        print("$", " ".join(cmd))
        if args.dry_run:
            continue
        try:
            subprocess.run(cmd, check=True)
        except FileNotFoundError as e:
            print(f"ERROR: command not found: {e.filename}", file=sys.stderr)
            return 1
        except subprocess.CalledProcessError as e:
            print(f"ERROR: exit {e.returncode} from: {' '.join(cmd)}", file=sys.stderr)
            return e.returncode
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
