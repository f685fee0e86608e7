"""Batched Cholesky via a Pallas panel kernel — the framework's hot factor.

Why: the GP estimator's per-probe cost is dominated by Cholesky of many
medium (n ~ 500-1000) matrices, one per vmapped chain (SURVEY.md §3.4).
XLA's TPU Cholesky reaches only ~500 GFLOP/s here because its sequential
panel factorisation doesn't vectorise across the batch.  This kernel runs
the unavoidable sequential part — the 128-wide panel factorisation — as ONE
128-step loop whose per-step work covers the WHOLE batch tile in the VPU
lanes, and simultaneously builds inv(L_panel) so the off-diagonal panel
solve becomes a plain MXU GEMM in the blocked driver.

Blocked right-looking driver (``cholesky_batched``):

    for each 128-panel j:
        L[j,j], inv(L[j,j])  <- Pallas kernel  (batch-vectorised loop)
        L[i,j]   = A[i,j] @ inv(L[j,j])^T      (MXU GEMM)
        A[tr,tr] -= L[tr,j] @ L[tr,j]^T        (MXU SYRK)

All heavy FLOPs (n³/3) land on the MXU; the sequential depth is n steps
total for the entire batch instead of n steps *per matrix*.

Requires n % 128 == 0 (pad; see ``pad_gram`` — padding with identity keeps
the factor exact and the extra rows are sliced away).  Falls back to
``jnp.linalg.cholesky`` off-TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None

BLK = 128


def _chol_panel_kernel(a_ref, l_ref, linv_ref):
    """Cholesky + inverse of a (Bt, 128, 128) SPD tile batch.

    One fori_loop of 128 steps; each step does full-tile masked VPU ops over
    the whole batch tile (the batch rides the vector lanes).
    """
    bt = a_ref.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (bt, BLK, BLK), 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (bt, BLK, BLK), 2)
    rvec = jax.lax.broadcasted_iota(jnp.int32, (bt, BLK), 1)

    # NOTE: no dynamic_slice in the Mosaic lowering — every per-k access is
    # a masked full-tile reduction (the VPU touches full tiles per step
    # regardless, so this costs nothing extra).
    def body(k, carry):
        a, l, linv = carry
        # all intermediates kept rank>=2 (Mosaic layouts reject rank-1)
        dk2 = jnp.sum(
            jnp.where((rows == k) & (cols == k), a, 0.0), axis=2, keepdims=True
        )  # (Bt, 128, 1) with the value at row k
        dk2 = jnp.sum(dk2, axis=1, keepdims=True)  # (Bt, 1, 1) = a[:, k, k]
        dk = jnp.sqrt(dk2)  # (Bt, 1, 1)
        col_raw = jnp.sum(
            jnp.where(cols == k, a, 0.0), axis=2, keepdims=True
        )  # (Bt, 128, 1) = a[:, :, k]
        rcol = rvec[:, :, None]  # (Bt, 128, 1)
        col = jnp.where(rcol > k, col_raw / dk, 0.0)
        col = jnp.where(rcol == k, dk, col)  # (Bt, 128, 1)

        # store column k of L
        l = jnp.where(cols == k, col, l)

        # rank-1 update of the trailing submatrix
        upd = col * jnp.swapaxes(col, 1, 2)  # (Bt, 128, 128)
        mask = (rows > k) & (cols > k)
        a = a - jnp.where(mask, upd, 0.0)

        # forward substitution row k of inv(L):
        #   x_k = (e_k - L[k, :k] @ X[:k, :]) / L[k,k]
        lrow_full = jnp.sum(
            jnp.where(rows == k, l, 0.0), axis=1, keepdims=True
        )  # (Bt, 1, 128) = l[:, k, :]
        lrow = jnp.where(rvec[:, None, :] < k, lrow_full, 0.0)
        acc = jnp.sum(
            jnp.swapaxes(lrow, 1, 2) * linv, axis=1, keepdims=True
        )  # (Bt, 1, 128)
        ek = (rvec[:, None, :] == k).astype(a.dtype)
        xrow = (ek - acc) / dk  # (Bt, 1, 128)
        linv = jnp.where(rows == k, xrow, linv)
        return a, l, linv

    a0 = a_ref[:]
    z = jnp.zeros_like(a0)
    _, l, linv = jax.lax.fori_loop(0, BLK, body, (a0, z, z))
    l_ref[:] = l
    linv_ref[:] = linv


@functools.partial(jax.jit, static_argnames=("bt",))
def chol_panel_batched(a, bt=8):
    """(B, 128, 128) SPD -> (L, inv(L)), both lower-triangular, via Pallas."""
    b = a.shape[0]
    if b % bt:
        bt = 1 if b < 8 else 8 if b % 8 == 0 else 1
    grid = (b // bt,)
    return pl.pallas_call(
        _chol_panel_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bt, BLK, BLK), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=(
            pl.BlockSpec((bt, BLK, BLK), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, BLK, BLK), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(a.shape, a.dtype),
            jax.ShapeDtypeStruct(a.shape, a.dtype),
        ),
    )(a)


def _mm(a, b):
    """f32-precision MXU matmul.

    CRITICAL: TPU default matmul precision is bf16 passes; inside a blocked
    Cholesky the trailing-update rounding then destroys positive
    definiteness at condition numbers as low as ~1e5 (measured: NaN factors
    on SE Grams that LAPACK f32 handles fine).  HIGHEST forces the f32
    (6-pass) MXU path for the O(n³) updates.
    """
    return jax.lax.dot_general(
        a,
        b,
        dimension_numbers=(((a.ndim - 1,), (b.ndim - 2,)),
                           (tuple(range(a.ndim - 2)), tuple(range(b.ndim - 2)))),
        precision=jax.lax.Precision.HIGHEST,
    )


def cholesky_batched(a, bt=8):
    """Blocked batched Cholesky: (B, n, n) -> lower L, n % 128 == 0.

    Panel factorisations via the Pallas kernel; solves and trailing updates
    as f32-precision MXU GEMMs.  ~n/128 kernel launches regardless of batch
    size.
    """
    n = a.shape[-1]
    nb = n // BLK
    if nb * BLK != n:
        raise ValueError(f"n={n} must be a multiple of {BLK}; use pad_gram")
    out = jnp.zeros_like(a)
    for j in range(nb):
        sl = slice(j * BLK, (j + 1) * BLK)
        tr = slice((j + 1) * BLK, n)
        ljj, linv = chol_panel_batched(a[..., sl, sl], bt)
        out = out.at[..., sl, sl].set(ljj)
        if j + 1 < nb:
            pan = a[..., tr, sl]
            lij = _mm(pan, jnp.swapaxes(linv, -1, -2))  # MXU, f32
            out = out.at[..., tr, sl].set(lij)
            a = a.at[..., tr, tr].add(-_mm(lij, jnp.swapaxes(lij, -1, -2)))
    return out


def pad_gram(k, n_pad):
    """Embed (B, n, n) SPD into (B, n_pad, n_pad) with identity padding:
    chol([[K,0],[0,I]]) = [[chol(K),0],[0,I]] — exact, slice back rows."""
    n = k.shape[-1]
    if n == n_pad:
        return k
    b = k.shape[:-2]
    out = jnp.zeros(b + (n_pad, n_pad), k.dtype)
    out = out.at[..., :n, :n].set(k)
    idx = jnp.arange(n, n_pad)
    return out.at[..., idx, idx].set(1.0)


def on_tpu():
    return jax.default_backend() not in ("cpu",)


def cholesky_fast(k, bt=8):
    """Batched Cholesky of (..., n, n): Pallas blocked path on TPU (with
    identity padding to 128 alignment), XLA elsewhere.  Returns (..., n, n)."""
    if not on_tpu() or pltpu is None:
        return jnp.linalg.cholesky(k)
    n = k.shape[-1]
    n_pad = -(-n // BLK) * BLK
    batch = k.shape[:-2]
    kk = k.reshape((-1,) + k.shape[-2:])
    kk = pad_gram(kk, n_pad)
    l = cholesky_batched(kk, bt)
    return l[..., :n, :n].reshape(batch + (n, n))


# ---------------------------------------------------------------------------
# v2 panel kernel: symmetric-slice formulation
# ---------------------------------------------------------------------------
#
# v1's per-step cost is ~8 full-tile VPU passes (masked reductions to extract
# row/column k, masked updates, in-kernel forward substitution for inv(L)).
# v2 exploits two structural facts:
#   1. the trailing block of A stays SYMMETRIC under rank-1 updates, so
#      column k equals row k — extracted with a cheap sublane dynamic slice
#      instead of a full-tile masked reduction;
#   2. inv(L_panel) need not be built in-kernel: with X0 = diag(1/diag(L)),
#      the Newton iteration X <- X (2I - L X) has error E = I - X L that is
#      STRICTLY lower triangular (nilpotent), so 7 squarings reach E = 0
#      EXACTLY — 14 batched MXU GEMMs in the driver instead of 128 in-kernel
#      substitution steps.
# Per step v2 does ONE unmasked full-tile pass (the rank-1 update); the
# pivot column is zeroed above/at the pivot so no trailing mask is needed
# (the factored region of `a` may be corrupted — L lives in the separate
# transposed output).  L is stored transposed (row stores are sublane-cheap)
# and swapped back in the driver.


def _chol_panel_kernel2(a_ref, lt_ref, a_s):
    """(bt, 128, 128) SPD tile batch -> transposed Cholesky factor L^T.

    Mosaic cannot lower dynamic_slice on loop-carried VALUES, so the
    working matrix lives in a VMEM scratch REF (``a_s``) and each step uses
    ref-based ``pl.ds`` loads/stores (sublane-dim slicing is cheap).
    """
    bt = a_ref.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (bt, 1, BLK), 2)
    sub = jax.lax.broadcasted_iota(jnp.int32, (bt, BLK, 1), 1)
    a_s[:] = a_ref[:]

    def body(k, _):
        row = a_s[:, pl.ds(k, 1), :]  # (bt,1,128) = column k by symmetry
        onehot = (lane == k).astype(row.dtype)
        dk2 = jnp.sum(row * onehot, axis=2, keepdims=True)  # (bt,1,1)
        inv_dk = jax.lax.rsqrt(dk2)
        lrow = jnp.where(lane > k, row * inv_dk, 0.0)
        lt_ref[:, pl.ds(k, 1), :] = lrow + onehot * jnp.sqrt(dk2)
        colv = jnp.swapaxes(lrow, 1, 2)  # (bt,128,1)
        colv = jnp.where(sub > k, colv, 0.0)
        # rank-1 update; factored region harmlessly drifts (L is stored)
        a_s[:] = a_s[:] - colv * lrow
        return 0

    jax.lax.fori_loop(0, BLK, body, 0)


def _best_bt(b, bt, cap=128):
    """Largest supported batch-tile dividing b."""
    for cand in (min(bt, cap), 64, 32, 16, 8, 4, 2, 1):
        if b % cand == 0 and cand <= bt:
            return cand
    return 1


def chol_panel_batched2(a, bt=32):
    """(B, 128, 128) SPD -> lower-tri L via the v2 Pallas kernel."""
    b = a.shape[0]
    bt = _best_bt(b, bt)
    grid = (b // bt,)
    lt = pl.pallas_call(
        _chol_panel_kernel2,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bt, BLK, BLK), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (bt, BLK, BLK), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(a.shape, a.dtype),
        scratch_shapes=[pltpu.VMEM((bt, BLK, BLK), jnp.float32)],
    )(a)
    return jnp.swapaxes(lt, -1, -2)


def tri_inv_newton(l):
    """Exact inverse of a batched lower-triangular (B, n, n) via Newton
    squaring: X <- X(2I - L X) with X0 = diag(1/diag(L)); the error
    I - X L is strictly lower triangular (nilpotent), so ceil(log2 n)
    iterations terminate EXACTLY.  All work is MXU GEMMs (f32 precision)."""
    n = l.shape[-1]
    eye = jnp.eye(n, dtype=l.dtype)
    # x0 = diag(1/diag(L)): eye/diag[..., None, :] scales column j of the
    # identity by 1/l[j,j], so x0[i,i] = 1/l[i,i] as required.
    x = eye / jnp.diagonal(l, axis1=-2, axis2=-1)[..., None, :]
    steps = max(1, (n - 1).bit_length())
    for _ in range(steps):
        lx = _mm(l, x)
        x = _mm(x, 2.0 * eye - lx)
    return x


def cholesky_batched2(a, bt=32):
    """Blocked batched Cholesky, v2: symmetric-slice panel kernel + Newton
    triangular inverse + f32 MXU GEMM updates.  n % 128 == 0.

    Measured (v5e, B=128, n=640): 13.4 ms vs XLA's 21.1 ms (1.57x), factor
    matches XLA to 1e-6."""
    n = a.shape[-1]
    nb = n // BLK
    if nb * BLK != n:
        raise ValueError(f"n={n} must be a multiple of {BLK}; use pad_gram")
    out = jnp.zeros_like(a)
    for j in range(nb):
        sl = slice(j * BLK, (j + 1) * BLK)
        tr = slice((j + 1) * BLK, n)
        ljj = chol_panel_batched2(a[..., sl, sl], bt)
        linv = tri_inv_newton(ljj)
        out = out.at[..., sl, sl].set(ljj)
        if j + 1 < nb:
            pan = a[..., tr, sl]
            lij = _mm(pan, jnp.swapaxes(linv, -1, -2))
            out = out.at[..., tr, sl].set(lij)
            a = a.at[..., tr, tr].add(-_mm(lij, jnp.swapaxes(lij, -1, -2)))
    return out


# ---------------------------------------------------------------------------
# v3 panel kernel: 8-wide mini-panels + in-kernel MXU trailing updates
# ---------------------------------------------------------------------------
#
# v2's 128 sequential steps each pay a full (bt,128,128) VPU rank-1 update —
# the whole tile, 128 times.  v3 restructures the tile factorisation into 16
# static 8-wide mini-panels:
#   * the 8 rank-1 steps of a mini-panel touch only an (bt, 8, 128) STRIP
#     (copied into a small scratch ref) — 1/16 of v2's per-step VPU work;
#   * the tile-wide effect of the 8 columns lands as ONE rank-8 MXU GEMM
#     (Lp @ Lp^T via dot_general contracting the sublane dim of L^T rows),
#     i.e. the O(n^3) work rides the MXU instead of the VPU.
# The already-factored region of the working matrix drifts (strip rows get
# the full rank-8 update on top of their in-strip updates) — harmless, since
# later strips only read lanes >= their own first column, exactly as in v2.
#
# v3 also computes inv(L)^T IN-KERNEL by blocked backward substitution over
# the same mini-panels (16 skinny (bt,8,128)@(bt,128,128) MXU GEMMs + cheap
# 8-step strip solves), replacing the driver-side Newton iteration: Newton
# costs 28 n^3 FLOPs per tile (14 full GEMMs) against ~2 n^3 here, and the
# work stays VMEM-resident.  The kernel returns inv(L)^T directly because
# that is the operand the blocked driver's panel solve consumes
# (L_ij = A_ij @ inv(L_jj)^T) — no transposes anywhere on the hot path.

MP = 8  # mini-panel width


def _dotg(a, b, dims):
    return jax.lax.dot_general(
        a,
        b,
        dimension_numbers=dims,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )


def _chol_panel_kernel3(a_ref, lt_ref, xt_ref, a_s, t_s):
    """(bt,128,128) SPD tile batch -> (L^T, inv(L)^T), both upper-tri."""
    bt = a_ref.shape[0]
    lane1 = jax.lax.broadcasted_iota(jnp.int32, (bt, 1, BLK), 2)
    lane8 = jax.lax.broadcasted_iota(jnp.int32, (bt, MP, BLK), 2)
    sub8 = jax.lax.broadcasted_iota(jnp.int32, (bt, MP, 1), 1)
    a_s[:] = a_ref[:]

    def panel(p, _):
        c0 = p * MP
        t_s[:] = a_s[:, pl.ds(c0, MP), :]  # strip = 8 rows of symmetric A

        def step(k, _):
            g = c0 + k
            row = t_s[:, pl.ds(k, 1), :]  # (bt,1,128): row g of working A
            onehot = (lane1 == g).astype(row.dtype)
            dk2 = jnp.sum(row * onehot, axis=2, keepdims=True)  # pivot
            inv_dk = jax.lax.rsqrt(dk2)
            lrow = jnp.where(lane1 > g, row * inv_dk, 0.0) + onehot * jnp.sqrt(
                dk2
            )  # (bt,1,128) = row g of L^T = column g of L
            lt_ref[:, pl.ds(g, 1), :] = lrow
            # in-strip rank-1 update: coeff over strip rows = A[c0+j, g]/dk
            colv = (
                jnp.sum(t_s[:] * (lane8 == g).astype(row.dtype), axis=2, keepdims=True)
                * inv_dk
            )  # (bt,8,1)
            colv = jnp.where(sub8 > k, colv, 0.0)
            t_s[:] = t_s[:] - colv * lrow
            return 0

        jax.lax.fori_loop(0, MP, step, 0)
        # rank-8 tile-wide trailing update: A -= Lp @ Lp^T on the MXU.
        lpt = lt_ref[:, pl.ds(c0, MP), :]  # (bt,8,128) = the 8 new L^T rows
        upd = _dotg(lpt, lpt, (((1,), (1,)), ((0,), (0,))))  # (bt,128,128)
        a_s[:] = a_s[:] - upd
        return 0

    jax.lax.fori_loop(0, BLK // MP, panel, 0)

    # ---- in-kernel inv(L)^T = inv(U) (U = L^T) by blocked backward subst.
    xt_ref[:] = jnp.zeros_like(xt_ref)

    def ipanel(q, _):
        p = BLK // MP - 1 - q
        c0 = p * MP
        u_strip = lt_ref[:, pl.ds(c0, MP), :]  # (bt,8,128) rows g of U
        # contribution of already-solved later rows: U[strip, later] @ X
        u_off = jnp.where(lane8 >= c0 + MP, u_strip, 0.0)
        csum = _dotg(u_off, xt_ref[:], (((2,), (1,)), ((0,), (0,))))
        estrip = (lane8 == c0 + sub8).astype(csum.dtype)  # identity rows
        t_s[:] = estrip - csum  # rhs; solved rows overwrite in place

        def istep(kk, _):
            k = MP - 1 - kk
            g = c0 + k
            urow = lt_ref[:, pl.ds(g, 1), :]  # (bt,1,128) row g of U
            # coeff[b,j] = U[g, c0+j] for strip rows j>k (already solved)
            coeff = jnp.sum(
                urow * (lane8 == c0 + sub8).astype(urow.dtype), axis=2, keepdims=True
            )  # (bt,8,1)
            coeff = jnp.where(sub8 > k, coeff, 0.0)
            acc = jnp.sum(coeff * t_s[:], axis=1, keepdims=True)  # (bt,1,128)
            dg = jnp.sum(urow * (lane1 == g).astype(urow.dtype), axis=2, keepdims=True)
            xrow = (t_s[:, pl.ds(k, 1), :] - acc) / dg
            t_s[:, pl.ds(k, 1), :] = xrow
            return 0

        jax.lax.fori_loop(0, MP, istep, 0)
        xt_ref[:, pl.ds(c0, MP), :] = t_s[:]
        return 0

    jax.lax.fori_loop(0, BLK // MP, ipanel, 0)


def chol_panel_batched3(a, bt=16, interpret=False):
    """(B,128,128) SPD -> (L lower-tri, inv(L)^T upper-tri) via the v3
    mini-panel Pallas kernel.

    Large batch tiles matter: the 128 strip steps are sequential per grid
    step, and a (bt,8,128) strip op only fills the VPU when bt is large —
    going bt 32 -> 64 halves the total sequential depth (needs the raised
    vmem budget below; ~5 * bt * 64 KB)."""
    b = a.shape[0]
    bt = _best_bt(b, bt)
    grid = (b // bt,)
    kw = {}
    # Raise the scoped-vmem budget ONLY when the tile actually needs it:
    # measured 2026-08-19, passing vmem_limit_bytes at bt=32 slowed the
    # kernel ~30x (7.5 -> 219 ms; the limit also steers Mosaic's pipelining
    # heuristics), while bt=64 needs ~41 MB > the 16 MB default.
    if not interpret and pltpu is not None and bt > 32:
        kw["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024
        )
    lt, xt = pl.pallas_call(
        _chol_panel_kernel3,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bt, BLK, BLK), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=(
            pl.BlockSpec((bt, BLK, BLK), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, BLK, BLK), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(a.shape, a.dtype),
            jax.ShapeDtypeStruct(a.shape, a.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((bt, BLK, BLK), jnp.float32),
            pltpu.VMEM((bt, MP, BLK), jnp.float32),
        ],
        interpret=interpret,
        **kw,
    )(a)
    return jnp.swapaxes(lt, -1, -2), xt


# ---------------------------------------------------------------------------
# v4 (REMOVED): whole-matrix-in-VMEM fused kernel — negative result
# ---------------------------------------------------------------------------
#
# A v4 that moved the whole blocked driver in-kernel (one grid step factors
# a (bt, n, n) batch tile entirely in VMEM) was built and measured
# 2026-08-19: correct to 1.2e-5 but ~30x SLOWER than v3 (215-233 ms vs
# 7.5 ms at B=128, n=640).  Two causes: (a) VMEM capacity forces bt<=4 for
# whole 640-wide matrices, starving the VPU in the 128-step strip loops
# ((4,8,128) ops are 1/8 of a vreg-efficient (32,8,128)) and multiplying
# the total sequential depth by B/bt; (b) Mosaic lane-dim slicing of the
# 640-lane working ref forces relayouts on every tile access.  v3's split —
# bt=32 tile kernels + XLA driver GEMMs — is the right architecture for
# this VMEM size; the code was removed, this note is the record.


def cholesky_batched3(a, bt=16, interpret=False):
    """Blocked batched Cholesky, v3: mini-panel Pallas kernel with in-kernel
    MXU trailing updates and in-kernel triangular inverse.  n % 128 == 0.

    The panel solve uses the kernel's inv(L)^T output directly
    (L_ij = A_ij @ inv(L_jj)^T) — no Newton iteration, no transposes."""
    n = a.shape[-1]
    nb = n // BLK
    if nb * BLK != n:
        raise ValueError(f"n={n} must be a multiple of {BLK}; use pad_gram")
    out = jnp.zeros_like(a)
    for j in range(nb):
        sl = slice(j * BLK, (j + 1) * BLK)
        tr = slice((j + 1) * BLK, n)
        ljj, linv_t = chol_panel_batched3(a[..., sl, sl], bt, interpret=interpret)
        out = out.at[..., sl, sl].set(ljj)
        if j + 1 < nb:
            pan = a[..., tr, sl]
            lij = _mm(pan, linv_t)
            out = out.at[..., tr, sl].set(lij)
            a = a.at[..., tr, tr].add(-_mm(lij, jnp.swapaxes(lij, -1, -2)))
    return out
