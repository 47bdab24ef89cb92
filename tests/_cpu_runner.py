"""Run a repo script pinned to the CPU jax platform.

The JAX_PLATFORMS env var is claimed by sitecustomize at interpreter
start on the dev host, so subprocesses that must stay off the TPU (e.g.
the release drill while a training run owns the chip) need the platform
forced from Python before any jax use. Usage:

    python tests/_cpu_runner.py path/to/script.py [args...]

`make egress-day PY="python tests/_cpu_runner.py"` runs the whole
egress-day chain this way (tests/test_release_drill.py).
"""

import runpy
import sys

import jax

jax.config.update("jax_platforms", "cpu")

script = sys.argv[1]
sys.argv = sys.argv[1:]
runpy.run_path(script, run_name="__main__")
