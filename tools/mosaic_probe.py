#!/usr/bin/env python
"""Re-probe the platform Mosaic bugs that block the Pallas mega-step
(PROGRESS.md "FINAL BLOCKER", re-checked each round per review demand).

Two minimal kernels that SHOULD compile but crash this TPU stack's Mosaic
build (tpu_compile_helper subprocess exit 1 / HTTP 500):
  1. a minor-dim reshape (256,8) -> (256,4,2) inside a trivial kernel
  2. a swapaxes(-1,-2) of the two minor dims

Also re-probes the scan-path server-side compile pathology: the same step
body that compiles alone in ~20-40s takes 300-450s inside lax.scan with
donated buffers (see bench.py's host-dispatch rationale).

Run (TPU): PYTHONPATH=/root/repo:/root/.axon_site python tools/mosaic_probe.py
Exit code 0 = all probes pass (land the Pallas mega-step!), 1 = still broken.
"""

import subprocess
import sys
import textwrap

PROBES = {
    "minor_dim_reshape": """
        import jax, jax.numpy as jnp
        from jax.experimental import pallas as pl
        def k(x_ref, o_ref):
            o_ref[...] = x_ref[...].reshape(256, 4, 2).sum(-1)
        x = jnp.ones((256, 8), jnp.float32)
        out = pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((256, 4), jnp.float32))(x)
        print("OK", out.sum())
    """,
    "minor_dim_transpose": """
        import jax, jax.numpy as jnp
        from jax.experimental import pallas as pl
        def k(x_ref, o_ref):
            o_ref[...] = x_ref[...].swapaxes(-1, -2)
        x = jnp.ones((8, 128, 8), jnp.float32)
        out = pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((8, 8, 128), jnp.float32))(x)
        print("OK", out.sum())
    """,
}


def main():
    failures = []
    for name, src in PROBES.items():
        r = subprocess.run(
            [sys.executable, "-c", textwrap.dedent(src)],
            capture_output=True, text=True, timeout=600,
        )
        ok = r.returncode == 0 and "OK" in r.stdout
        print(f"{name}: {'PASS' if ok else 'STILL BROKEN'}")
        if not ok:
            tail = (r.stderr or r.stdout).strip().splitlines()[-3:]
            for line in tail:
                print(f"    {line[:160]}")
            failures.append(name)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
