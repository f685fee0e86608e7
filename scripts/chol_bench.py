"""Microbench: batched Cholesky variants on the real chip.

Compares XLA's batched cholesky vs Pallas v2 (symmetric-slice + Newton
inverse) vs Pallas v3 (mini-panel + in-kernel MXU updates + in-kernel
triangular inverse) at the bench shape (B=128, n=640) and checks factor
accuracy against XLA.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from auxpm_tpu.ops import chol_pallas as cp
from auxpm_tpu.utils.profiling import timed

B = int(os.environ.get("CB_B", 128))
N = int(os.environ.get("CB_N", 640))
REPS = int(os.environ.get("CB_REPS", 20))

rng = np.random.default_rng(0)
# SE-Gram-like SPD batch: moderate condition number
x = rng.standard_normal((N, 3))
sq = ((x[:, None] - x[None]) ** 2).sum(-1)
ells = rng.uniform(0.5, 3.0, B)
k = np.exp(-0.5 * sq[None] / ells[:, None, None] ** 2) + 1e-2 * np.eye(N)
assert np.isfinite(np.linalg.cholesky(k)).all()
k = jnp.asarray(k, jnp.float32)

flops = B * N**3 / 3

xla = jax.jit(jnp.linalg.cholesky)
t_xla, l_xla = timed(xla, k, reps=REPS, warmup=2)
print(f"XLA   : {t_xla*1e3:8.2f} ms  {flops/t_xla/1e9:8.1f} GFLOP/s")

v2 = jax.jit(lambda a: cp.cholesky_batched2(a, 32))
t2, l2 = timed(v2, k, reps=REPS, warmup=2)
err2 = float(jnp.max(jnp.abs(jnp.tril(l2) - jnp.tril(l_xla))))
print(f"v2    : {t2*1e3:8.2f} ms  {flops/t2/1e9:8.1f} GFLOP/s  maxerr {err2:.2e}  ({t_xla/t2:.2f}x XLA)")

for bt in (8, 16, 32):
    v3 = jax.jit(lambda a, bt=bt: cp.cholesky_batched3(a, bt))
    try:
        t3, l3 = timed(v3, k, reps=REPS, warmup=2)
    except Exception as e:
        print(f"v3 bt={bt}: FAILED {type(e).__name__}: {str(e)[:300]}")
        continue
    err3 = float(jnp.max(jnp.abs(jnp.tril(l3) - jnp.tril(l_xla))))
    print(f"v3 bt={bt:2d}: {t3*1e3:8.2f} ms  {flops/t3/1e9:8.1f} GFLOP/s  maxerr {err3:.2e}  ({t_xla/t3:.2f}x XLA)")

# inverse accuracy of the panel kernel alone
kp = k[:, :128, :128]
l, xt = jax.jit(lambda a: cp.chol_panel_batched3(a, 16))(kp)
resid = jnp.max(jnp.abs(cp._mm(jnp.swapaxes(xt, -1, -2), l) - jnp.eye(128)))
print(f"panel inv residual |inv(L)L - I|_max = {float(resid):.2e}")
