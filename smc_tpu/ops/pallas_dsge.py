"""Fused Pallas TPU kernels for the batch-last DSGE likelihood.

Round-3 measured the XLA batch-last path at ~10x off its own roofline
(benchmarks/README.md: AS likelihood 135 ms vs ~9-19 ms floor at 16k
particles), blaming (a) the GJ pivot argmax/select chains, (b) f64 division
emulation, and (c) imperfect fusion across the ~80-op scan body — every
scan step round-trips its [r,c,N] carry through HBM. These kernels close
(c) structurally: the ENTIRE likelihood (cyclic-reduction RE solve +
Chandrasekhar Kalman scan) runs per particle-tile with all intermediates
resident in VMEM — HBM is touched once for inputs and once for outputs.

f64 cannot cross a Pallas boundary on TPU (XLA's X64-rewrite pass does not
handle custom calls — measured on this box), so the kernels carry their own
double-float arithmetic (ops/df64.py): every value is an (hi, lo) f32 pair
with ~2^-48 relative precision, the same accuracy class as XLA's own TPU
f64 emulation. Boundaries split/merge f64 <-> f32-pairs outside the kernel.

Layout: particle tiles of 1024 = (8 sublanes, 128 lanes); every per-particle
matrix entry is an [8,128] f32 tile, so each elementwise op runs at full VPU
width. Matrices are Python lists-of-lists of df64 pairs — all loops over the
tiny static matrix dims unroll at trace time.

Scope: models with small state dimension (n_s <= 8, e.g. An-Schorfheide's 6)
and n_obs == 3 (closed-form cofactor innovation solves). Smets-Wouters
(n_s=37: the cyclic-reduction carry alone would need ~22 MB of VMEM per
1024-tile) stays on the XLA batch-last path (models/dsge.py).

Reference workload being replaced: the DSGE.jl Kalman likelihood the
reference's examples call (examples/dsge_models/small_dsge_model.jl:37-43).
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from smc_tpu.ops.df64 import (df_add, df_sub, df_mul, df_neg, df_recip,
                              df_add_f32, df_mul_f32, split_f64, merge_f64)

_LOG_2PI = 1.8378770664093453
TILE = (8, 128)
TILE_N = TILE[0] * TILE[1]


# ---------------------------------------------------------------------------
# df64 matrix helpers on lists-of-lists of (hi, lo) tile pairs.
# Pure jnp — unit-testable outside Pallas on plain arrays.
# ---------------------------------------------------------------------------


def mat_mul_df(A, B):
    """[r x k] @ [k x c] in df64; entries are (hi, lo) array pairs."""
    r, inner, c = len(A), len(B), len(B[0])
    out = []
    for i in range(r):
        row = []
        for k in range(c):
            acc = df_mul(A[i][0], B[0][k])
            for j in range(1, inner):
                acc = df_add(acc, df_mul(A[i][j], B[j][k]))
            row.append(acc)
        out.append(row)
    return out


def mat_add_df(A, B):
    return [[df_add(a, b) for a, b in zip(ra, rb)] for ra, rb in zip(A, B)]


def mat_sub_df(A, B):
    return [[df_sub(a, b) for a, b in zip(ra, rb)] for ra, rb in zip(A, B)]


def mat_neg_df(A):
    return [[df_neg(a) for a in ra] for ra in A]


def mat_transpose(A):
    return [list(col) for col in zip(*A)]


def mat_sym_df(A):
    """0.5 (A + A')."""
    n = len(A)
    return [[df_mul_f32(df_add(A[i][j], A[j][i]), 0.5) for j in range(n)]
            for i in range(n)]


def _where_df(cond, x, y):
    return (jnp.where(cond, x[0], y[0]), jnp.where(cond, x[1], y[1]))


def gj_solve_df(A, B):
    """Solve A X = B in df64 by Gauss-Jordan with partial pivoting. A is
    [n x n], B [n x m], entries (hi, lo) pairs of identically-shaped arrays.

    Pivot CHOICE compares hi components only (f32) — any well-scaled pivot
    is numerically valid and the choice does not need 48-bit precision; the
    elimination arithmetic itself is full df64. Row swaps are where-selects
    (no gathers), mirroring ops/linalg.py's mask-select discipline."""
    n, m = len(A), len(B[0])
    M = [[A[i][j] for j in range(n)] + [B[i][j] for j in range(m)]
         for i in range(n)]
    for k in range(n):
        absk = [jnp.abs(M[i][k][0]) for i in range(n)]
        mx = absk[k]
        for i in range(k + 1, n):
            mx = jnp.maximum(mx, absk[i])
        # first row >= k attaining the max (tie -> smallest index)
        found = jnp.zeros_like(mx, dtype=jnp.bool_)
        sel = [None] * n
        for i in range(k, n):
            hit = (absk[i] >= mx) & (~found)
            sel[i] = hit
            found = found | hit
        zero = (jnp.zeros_like(mx), jnp.zeros_like(mx))
        row_p = [zero] * (n + m)
        for i in range(k, n):
            for j in range(k, n + m):
                row_p[j] = _where_df(sel[i], M[i][j], row_p[j])
        row_k_old = M[k]
        for i in range(k + 1, n):
            for j in range(k, n + m):
                M[i][j] = _where_df(sel[i], row_k_old[j], M[i][j])
        M[k] = row_p
        # normalize row k, eliminate column k elsewhere (Jordan)
        inv_piv = df_recip(M[k][k])
        new_k = [df_mul(M[k][j], inv_piv) for j in range(n + m)]
        for i in range(n):
            if i == k:
                continue
            f = M[i][k]
            for j in range(k + 1, n + m):
                M[i][j] = df_sub(M[i][j], df_mul(f, new_k[j]))
        M[k] = new_k
    return [[M[i][n + j] for j in range(m)] for i in range(n)]


def cofactor_solve3_df(F, B):
    """(X, det) for symmetric 3x3 F in df64: X = adj(F) B / det. One
    df_recip; logdet/PSD handling happens at the caller (det <= 0 -> bad)."""
    a, b, c = F[0][0], F[0][1], F[0][2]
    d, e = F[1][1], F[1][2]
    f = F[2][2]
    C00 = df_sub(df_mul(d, f), df_mul(e, e))
    C01 = df_sub(df_mul(c, e), df_mul(b, f))
    C02 = df_sub(df_mul(b, e), df_mul(c, d))
    C11 = df_sub(df_mul(a, f), df_mul(c, c))
    C12 = df_sub(df_mul(b, c), df_mul(a, e))
    C22 = df_sub(df_mul(a, d), df_mul(b, b))
    det = df_add(df_mul(a, C00), df_add(df_mul(b, C01), df_mul(c, C02)))
    inv_det = df_recip(det)
    adj = [[C00, C01, C02], [C01, C11, C12], [C02, C12, C22]]
    m = len(B[0])
    X = []
    for i in range(3):
        row = []
        for k in range(m):
            acc = df_mul(adj[i][0], B[0][k])
            acc = df_add(acc, df_mul(adj[i][1], B[1][k]))
            acc = df_add(acc, df_mul(adj[i][2], B[2][k]))
            row.append(df_mul(acc, inv_det))
        X.append(row)
    return X, det


def mat_mul_f32(A, B):
    """f32-only [r x k] @ [k x c] (plain arrays, not pairs)."""
    r, inner, c = len(A), len(B), len(B[0])
    out = []
    for i in range(r):
        row = []
        for k in range(c):
            acc = A[i][0] * B[0][k]
            for j in range(1, inner):
                acc = acc + A[i][j] * B[j][k]
            row.append(acc)
        out.append(row)
    return out


def spectral_bound_neg_log(M32, n_squarings: int = 12):
    """f32 repeated-squaring spectral bound. Returns `total`, with
    rho_bound = exp(total / 2^n_squarings): the caller tests total < 0
    (i.e. bound < 1), so f32 log precision suffices — the decision only
    flips for draws within ~1e-6 of the unit circle, the same fuzz class
    as the f64 estimate's own non-normal transient inflation
    (models/dsge.py _spectral_radius_bound docstring)."""
    n = len(M32)
    total = jnp.zeros_like(M32[0][0])
    M = [[M32[i][j] for j in range(n)] for i in range(n)]
    for _ in range(n_squarings):
        sq = M[0][0] * M[0][0]
        for i in range(n):
            for j in range(n):
                if not (i == 0 and j == 0):
                    sq = sq + M[i][j] * M[i][j]
        nrm = jnp.sqrt(sq) + 1e-30
        inv = 1.0 / nrm
        M = [[M[i][j] * inv for j in range(n)] for i in range(n)]
        total = 2.0 * (total + jnp.log(nrm))
        M = mat_mul_f32(M, M)
    sq = M[0][0] * M[0][0]
    for i in range(n):
        for j in range(n):
            if not (i == 0 and j == 0):
                sq = sq + M[i][j] * M[i][j]
    return total + jnp.log(jnp.sqrt(sq) + 1e-30)


# ---------------------------------------------------------------------------
# flat pack/unpack: lists-of-lists of pairs <-> tuples (for loop carries)
# ---------------------------------------------------------------------------


def _pack(mats):
    flat = []
    for mat in mats:
        for row in mat:
            for (hi, lo) in row:
                flat.append(hi)
                flat.append(lo)
    return tuple(flat)


def _unpack(flat, shapes):
    mats = []
    idx = 0
    for (r, c) in shapes:
        mat = []
        for i in range(r):
            row = []
            for j in range(c):
                row.append((flat[idx], flat[idx + 1]))
                idx += 2
            mat.append(row)
        mats.append(mat)
    return mats, idx


def _ref_mat(hi_ref, lo_ref, r, c):
    """Read an [r, c, 1, 8, 128]-blocked ref pair into a df64 matrix."""
    return [[(hi_ref[i, j, 0], lo_ref[i, j, 0]) for j in range(c)]
            for i in range(r)]


# ---------------------------------------------------------------------------
# Kernel 1: rational-expectations solve by cyclic reduction
# (df64 twin of models/dsge.py bl_solve_linear_re)
# ---------------------------------------------------------------------------


def _re_kernel(n_s, n_shock, n_iter, tol,
               A_hi, A_lo, B_hi, B_lo, C_hi, C_lo, D_hi, D_lo,
               X_hi, X_lo, M_hi, M_lo, ok_ref):
    A = _ref_mat(A_hi, A_lo, n_s, n_s)
    B = _ref_mat(B_hi, B_lo, n_s, n_s)
    C = _ref_mat(C_hi, C_lo, n_s, n_s)
    D = _ref_mat(D_hi, D_lo, n_s, n_shock)

    shapes = [(n_s, n_s)] * 4

    # Convergence scale for the early exit: max input magnitude across the
    # tile (A/B/C are O(1)-to-O(100) for DSGE systems; the test below is
    # relative to this).
    scale = jnp.abs(A[0][0][0])
    for mat in (A, B, C):
        for i in range(n_s):
            for j in range(n_s):
                scale = jnp.maximum(scale, jnp.abs(mat[i][j][0]))
    # NaN/inf lanes must not poison the tile-wide scale (inf would make
    # tol_exit infinite -> the whole tile exits at iteration 0 and every
    # good lane fails the residual check); drop them to 0 here — the
    # in-loop NaN->inf mapping below separately keeps such lanes from
    # triggering the early exit.
    scale = jnp.maximum(jnp.max(
        jnp.where(jnp.isfinite(scale), scale, 0.0)), 1.0)
    # Exit once max(|A0|,|A2|) < 2^-27 * scale: cyclic reduction is
    # quadratic, so the NEXT update to A1/Ah is O(|A0|^2/scale) <
    # 2^-54 * scale — below df64 resolution (2^-48), i.e. bit-equivalent
    # to running all n_iter iterations. Lanes that never converge
    # (indeterminate/explosive draws, NaN lanes) keep the tile running to
    # the n_iter cap and are flagged by the residual/finite guards below.
    tol_exit = scale * jnp.float32(2.0 ** -27)

    def cr_cond(carry):
        k = carry[0]
        (A0, _, A2, _), _n = _unpack(carry[1:], shapes)
        mx = jnp.abs(A0[0][0][0])
        for i in range(n_s):
            for j in range(n_s):
                mx = jnp.maximum(mx, jnp.abs(A0[i][j][0]))
                mx = jnp.maximum(mx, jnp.abs(A2[i][j][0]))
        mx = jnp.where(jnp.isnan(mx), jnp.inf, mx)  # NaN lane: no early exit
        return (k < n_iter) & (jnp.max(mx) > tol_exit)

    def cr_body(carry):
        k = carry[0]
        (A0, A1, A2, Ah), _n = _unpack(carry[1:], shapes)
        SA = gj_solve_df(A1, [A0[i] + A2[i] for i in range(n_s)])
        SA0 = [row[:n_s] for row in SA]
        SA2 = [row[n_s:] for row in SA]
        A2SA0 = mat_mul_df(A2, SA0)
        Ah_n = mat_sub_df(Ah, A2SA0)
        A1_n = mat_sub_df(mat_sub_df(A1, mat_mul_df(A0, SA2)), A2SA0)
        A0_n = mat_neg_df(mat_mul_df(A0, SA0))
        A2_n = mat_neg_df(mat_mul_df(A2, SA2))
        return (k + 1,) + _pack([A0_n, A1_n, A2_n, Ah_n])

    # i32 loop bounds: under jax_enable_x64 a Python-int bound makes the
    # induction variable i64, which Mosaic cannot legalize
    carry = jax.lax.while_loop(cr_cond, cr_body,
                               (jnp.int32(0),) + _pack([A, B, C, B]))
    (_, _, _, Ah), _ = _unpack(carry[1:], shapes)

    X = mat_neg_df(gj_solve_df(Ah, A))
    lhs = mat_add_df(B, mat_mul_df(C, X))
    # one augmented df64 solve gives both M = -lhs^{-1} D (likelihood
    # precision) and Fwd = -lhs^{-1} C (feeds only the f32 spectral bound)
    MF = gj_solve_df(lhs, [D[i] + C[i] for i in range(n_s)])
    M = [[df_neg(MF[i][j]) for j in range(n_shock)] for i in range(n_s)]
    Fwd32 = [[-MF[i][n_shock + j][0] for j in range(n_s)] for i in range(n_s)]

    resid = mat_add_df(
        mat_add_df(A, mat_mul_df(B, X)), mat_mul_df(C, mat_mul_df(X, X)))
    max_resid = jnp.abs(resid[0][0][0])
    max_A = jnp.abs(A[0][0][0])
    for i in range(n_s):
        for j in range(n_s):
            if not (i == 0 and j == 0):
                max_resid = jnp.maximum(max_resid, jnp.abs(resid[i][j][0]))
                max_A = jnp.maximum(max_A, jnp.abs(A[i][j][0]))
    converged = max_resid < tol * jnp.maximum(max_A, 1.0)

    X32 = [[X[i][j][0] for j in range(n_s)] for i in range(n_s)]
    stable = spectral_bound_neg_log(X32) < 0.0
    unique = spectral_bound_neg_log(Fwd32) < 0.0

    finite = jnp.isfinite(X[0][0][0])
    for i in range(n_s):
        for j in range(n_s):
            finite = finite & jnp.isfinite(X[i][j][0])
        for j in range(n_shock):
            finite = finite & jnp.isfinite(M[i][j][0])
    ok = converged & stable & unique & finite

    zero = jnp.zeros_like(ok, dtype=jnp.float32)
    for i in range(n_s):
        for j in range(n_s):
            X_hi[i, j, 0] = jnp.where(ok, X[i][j][0], zero)
            X_lo[i, j, 0] = jnp.where(ok, X[i][j][1], zero)
        for j in range(n_shock):
            M_hi[i, j, 0] = jnp.where(ok, M[i][j][0], zero)
            M_lo[i, j, 0] = jnp.where(ok, M[i][j][1], zero)
    ok_ref[0] = ok.astype(jnp.float32)


# ---------------------------------------------------------------------------
# Kernel 2: Chandrasekhar Kalman likelihood
# (df64 twin of models/dsge.py bl_kalman_loglike_chandrasekhar, n_obs == 3)
# ---------------------------------------------------------------------------


def _exponent_extract(x):
    """(mantissa_scale, e) with x * mantissa_scale in [1, 2) and
    mantissa_scale = 2^-e, exact. x must be positive normal."""
    bits = jax.lax.bitcast_convert_type(x, jnp.int32)
    e = ((bits >> 23) & 0xFF) - 127
    scale = jax.lax.bitcast_convert_type(((127 - e) << 23), jnp.float32)
    return scale, e


def _kalman_kernel(n_s, n_o, T, lyap_iter,
                   ys_hi, ys_lo,                      # SMEM [T, n_o]
                   T_hi, T_lo, R_hi, R_lo, Q_hi, Q_lo,
                   Z_hi, Z_lo, d_hi, d_lo, H_hi, H_lo,
                   prod_hi_ref, prod_lo_ref, etot_ref,
                   quad_hi_ref, quad_lo_ref, bad_ref):
    Tm = _ref_mat(T_hi, T_lo, n_s, n_s)
    R = _ref_mat(R_hi, R_lo, n_s, len(Q_hi))
    Q = _ref_mat(Q_hi, Q_lo, len(Q_hi), len(Q_hi))
    Z = _ref_mat(Z_hi, Z_lo, n_o, n_s)
    d = [(d_hi[i, 0, 0], d_lo[i, 0, 0]) for i in range(n_o)]
    H = _ref_mat(H_hi, H_lo, n_o, n_o)

    tshape = Tm[0][0][0].shape
    fzero = jnp.zeros(tshape, jnp.float32)
    dfzero = (fzero, fzero)

    RQR = mat_mul_df(R, mat_mul_df(Q, mat_transpose(R)))

    # --- P0 by doubling (models/dsge.py bl_lyapunov_doubling), with an
    # early exit once A_k has decayed below df64 resolution (contributions
    # < 2^-49 |P| cannot register; bit-equivalent to running all iters) ---
    shapes2 = [(n_s, n_s)] * 2

    def lyap_cond(carry):
        k = carry[0]
        flat = carry[1:]
        (Ak, _), _ = _unpack(flat, shapes2)
        mx = jnp.abs(Ak[0][0][0])
        for i in range(n_s):
            for j in range(n_s):
                mx = jnp.maximum(mx, jnp.abs(Ak[i][j][0]))
        # NaN lanes (unsanitized T from a bad RE draw) must NOT trigger the
        # tile-wide early exit: NaN > 1e-20 is False, and one NaN lane would
        # hand every good lane in the tile P0 = RQR (finite but wrong).
        # Mapping NaN -> inf makes such tiles just run all lyap_iter
        # iterations; the NaN lanes get flagged by the finiteness guard.
        mx = jnp.where(jnp.isnan(mx), jnp.inf, mx)
        return (k < lyap_iter) & (jnp.max(mx) > 1e-20)

    def lyap_body(carry):
        k = carry[0]
        flat = carry[1:]
        (Ak, Pk), _ = _unpack(flat, shapes2)
        Pn = mat_add_df(Pk, mat_mul_df(Ak, mat_mul_df(Pk, mat_transpose(Ak))))
        An = mat_mul_df(Ak, Ak)
        return (k + 1,) + _pack([An, Pn])

    carry0 = (jnp.int32(0),) + _pack([Tm, RQR])
    carry = jax.lax.while_loop(lyap_cond, lyap_body, carry0)
    (_, P0), _ = _unpack(carry[1:], shapes2)

    PZt = mat_mul_df(P0, mat_transpose(Z))
    F1 = mat_sym_df(mat_add_df(mat_mul_df(Z, PZt), H))
    K1 = mat_mul_df(Tm, PZt)
    eye = [[(jnp.full(tshape, 1.0, jnp.float32), fzero) if i == j else dfzero
            for j in range(n_o)] for i in range(n_o)]
    M1_inv, _ = cofactor_solve3_df(F1, eye)
    M1 = mat_sym_df(mat_neg_df(M1_inv))
    s0 = [dfzero for _ in range(n_s)]

    tr_F1 = df_add(df_add(F1[0][0], F1[1][1]), F1[2][2])
    tr_cap = tr_F1[0] * (1.0 + 1e-6) + 1e-12

    mat_shapes = [(n_s, 1), (n_s, n_o), (n_o, n_o), (n_s, n_o), (n_o, n_o)]

    def step(t, carry):
        flat = carry[:-6]
        prod, e_tot, quad, bad = (carry[-6], carry[-5]), carry[-4], \
            (carry[-3], carry[-2]), carry[-1]
        (s_m, K, F, W, M), _ = _unpack(flat, mat_shapes)
        s = [row[0] for row in s_m]

        # v = y_t - d - Z s
        Zs = [mat_mul_df(Z, [[si] for si in s])[i][0] for i in range(n_o)]
        v = []
        for o in range(n_o):
            y_o = (ys_hi[t, o], ys_lo[t, o])      # scalar from SMEM
            vo = df_sub(df_sub((jnp.full(tshape, y_o[0], jnp.float32),
                                jnp.full(tshape, y_o[1], jnp.float32)),
                               d[o]), Zs[o])
            v.append(vo)

        ZW = mat_mul_df(Z, W)                                   # [n_o,n_o]
        rhs = [[v[i]] + ZW[i] for i in range(n_o)]
        sol, det = cofactor_solve3_df(F, rhs)
        Finv_v = [sol[i][0] for i in range(n_o)]
        Finv_ZW = [sol[i][1:] for i in range(n_o)]
        quad_t = df_mul(v[0], Finv_v[0])
        for o in range(1, n_o):
            quad_t = df_add(quad_t, df_mul(v[o], Finv_v[o]))
        quad = df_add(quad, quad_t)

        # det product with exponent renormalization (one log at the end,
        # done in XLA f64 outside the kernel). bad and e_tot are carried as
        # f32 vectors: Mosaic cannot legalize an scf.for whose carry holds
        # i1/i32 vectors (measured on the v5e; exponent sums stay < 2^24 so
        # f32 holds them exactly).
        bad = jnp.maximum(bad, (det[0] <= 0.0).astype(jnp.float32))
        bad_b = bad > 0.5
        det_safe = _where_df(bad_b,
                             (jnp.full(tshape, 1.0, jnp.float32), fzero),
                             det)
        scale, e = _exponent_extract(det_safe[0])
        prod = df_mul(prod, (det_safe[0] * scale, det_safe[1] * scale))
        scale2, e2 = _exponent_extract(prod[0])
        prod = (prod[0] * scale2, prod[1] * scale2)
        e_tot = e_tot + (e + e2).astype(jnp.float32)

        # state update: s' = T s + K F^{-1} v
        Ts = mat_mul_df(Tm, [[si] for si in s])
        KFv = mat_mul_df(K, [[fv] for fv in Finv_v])
        s_new = [[df_add(Ts[i][0], KFv[i][0])] for i in range(n_s)]

        MWtZt = mat_mul_df(M, mat_transpose(ZW))                # [n_o,n_o]
        WMWtZt = mat_mul_df(W, MWtZt)                           # [n_s,n_o]
        F_new = mat_sym_df(mat_add_df(F, mat_mul_df(Z, WMWtZt)))
        K_new = mat_add_df(K, mat_mul_df(Tm, WMWtZt))
        W_new = mat_sub_df(mat_mul_df(Tm, W), mat_mul_df(K, Finv_ZW))
        Fn_inv_ZW, _det2 = cofactor_solve3_df(F_new, ZW)
        M_new = mat_sym_df(
            mat_sub_df(M, mat_mul_df(MWtZt, mat_mul_df(Fn_inv_ZW, M))))

        diag_bad = (F_new[0][0][0] <= 0.0)
        for o in range(1, n_o):
            diag_bad = diag_bad | (F_new[o][o][0] <= 0.0)
        tr_new = df_add(df_add(F_new[0][0], F_new[1][1]), F_new[2][2])
        bad = jnp.maximum(
            bad, ((quad_t[0] < 0.0) | diag_bad
                  | (tr_new[0] > tr_cap)).astype(jnp.float32))

        return _pack([s_new, K_new, F_new, W_new, M_new]) + (
            prod[0], prod[1], e_tot, quad[0], quad[1], bad)

    carry0 = _pack([[[si] for si in s0], K1, F1, K1, M1]) + (
        jnp.full(tshape, 1.0, jnp.float32), fzero,
        fzero, fzero, fzero, fzero)
    carry = jax.lax.fori_loop(jnp.int32(0), jnp.int32(T), step, carry0)

    prod_hi_ref[0] = carry[-6]
    prod_lo_ref[0] = carry[-5]
    etot_ref[0] = carry[-4]
    quad_hi_ref[0] = carry[-3]
    quad_lo_ref[0] = carry[-2]
    bad_ref[0] = carry[-1]


# ---------------------------------------------------------------------------
# Host-side wrappers
# ---------------------------------------------------------------------------


def _to_tiles(x64):
    """f64 [r, c, N] -> (hi, lo) f32 [r, c, NT, 8, 128]."""
    hi, lo = split_f64(x64)
    r, c, n = x64.shape
    nt = n // TILE_N
    return (hi.reshape(r, c, nt, *TILE), lo.reshape(r, c, nt, *TILE))


def _pad_batch(x, n_pad):
    if n_pad == 0:
        return x
    pad = [(0, 0)] * (x.ndim - 1) + [(0, n_pad)]
    return jnp.pad(x, pad)


def _mat_spec(r, c):
    # index_map constants as CONCRETE i32 (np, not jnp — index maps may not
    # capture tracers): under jax_enable_x64 plain Python zeros trace as
    # i64, which Mosaic cannot legalize (func.return i64 failure)
    _z = np.int32(0)
    return pl.BlockSpec((r, c, 1, *TILE), lambda g: (_z, _z, g, _z, _z),
                        memory_space=pltpu.VMEM)


def _out_spec():
    _z = np.int32(0)
    return pl.BlockSpec((1, *TILE), lambda g: (g, _z, _z),
                        memory_space=pltpu.VMEM)


@functools.partial(jax.jit, static_argnames=("n_iter", "tol", "interpret"))
def pallas_solve_linear_re(A, B, C, D, n_iter: int = 16, tol: float = 1e-8,
                           interpret: bool = False):
    """Pallas twin of bl_solve_linear_re: A/B/C [n,n,N], D [n,k,N] f64 ->
    (X [n,n,N], M [n,k,N], ok bool [N])."""
    n_s = A.shape[0]
    n_shock = D.shape[1]
    n = A.shape[-1]
    n_pad = (-n) % TILE_N
    A, B, C, D = (_pad_batch(jnp.asarray(x, jnp.float64), n_pad)
                  for x in (A, B, C, D))
    nt = (n + n_pad) // TILE_N

    ins = []
    for x in (A, B, C):
        ins.extend(_to_tiles(x))
    ins.extend(_to_tiles(D))

    kernel = functools.partial(_re_kernel, n_s, n_shock, n_iter, tol)
    out_shape = [
        jax.ShapeDtypeStruct((n_s, n_s, nt, *TILE), jnp.float32),  # X hi
        jax.ShapeDtypeStruct((n_s, n_s, nt, *TILE), jnp.float32),  # X lo
        jax.ShapeDtypeStruct((n_s, n_shock, nt, *TILE), jnp.float32),
        jax.ShapeDtypeStruct((n_s, n_shock, nt, *TILE), jnp.float32),
        jax.ShapeDtypeStruct((nt, *TILE), jnp.float32),            # ok
    ]
    in_specs = ([_mat_spec(n_s, n_s)] * 6 + [_mat_spec(n_s, n_shock)] * 2)
    out_specs = [_mat_spec(n_s, n_s)] * 2 + \
        [_mat_spec(n_s, n_shock)] * 2 + [_out_spec()]
    X_hi, X_lo, M_hi, M_lo, ok = pl.pallas_call(
        kernel,
        grid=(nt,),
        out_shape=out_shape,
        in_specs=in_specs,
        out_specs=out_specs,
        interpret=interpret,
    )(*ins)

    def back(hi, lo, r, c):
        out = merge_f64(hi, lo).reshape(r, c, nt * TILE_N)
        return out[..., :n]

    X = back(X_hi, X_lo, n_s, n_s)
    M = back(M_hi, M_lo, n_s, n_shock)
    okb = ok.reshape(nt * TILE_N)[:n] > 0.5
    return X, M, okb


@functools.partial(jax.jit,
                   static_argnames=("lyap_iter", "interpret", "return_parts"))
def pallas_kalman_chandrasekhar(T_mat, R_mat, Q, Z, d_obs, H, data,
                                lyap_iter: int = 30,
                                interpret: bool = False,
                                return_parts: bool = False):
    """Pallas twin of bl_kalman_loglike_chandrasekhar (n_obs == 3 only):
    system matrices batch-last f64, data [n_o, T] shared -> loglh f64 [N]."""
    n_s = T_mat.shape[0]
    n_o = Z.shape[0]
    if n_o != 3:
        raise ValueError("pallas kalman kernel requires n_obs == 3 "
                         "(cofactor innovation solves)")
    n_sh = R_mat.shape[1]
    n = T_mat.shape[-1]
    T_len = data.shape[1]
    n_pad = (-n) % TILE_N
    nt = (n + n_pad) // TILE_N

    T_mat, R_mat, Q, Z, H = (_pad_batch(jnp.asarray(x, jnp.float64), n_pad)
                             for x in (T_mat, R_mat, Q, Z, H))
    d_obs = _pad_batch(jnp.asarray(d_obs, jnp.float64), n_pad)

    ins = []
    ys = jnp.asarray(data, jnp.float64).T          # [T, n_o]
    ys_hi, ys_lo = split_f64(ys)
    ins.extend((ys_hi, ys_lo))
    for x in (T_mat, R_mat, Q, Z):
        ins.extend(_to_tiles(x))
    dr = d_obs.reshape(n_o, 1, d_obs.shape[-1])
    ins.extend(_to_tiles(dr))
    ins.extend(_to_tiles(H))

    kernel = functools.partial(_kalman_kernel, n_s, n_o, T_len, lyap_iter)
    out_shape = [jax.ShapeDtypeStruct((nt, *TILE), jnp.float32)
                 for _ in range(6)]
    # explicit i32 index map: the default SMEM index map returns Python-int
    # zeros, which trace as i64 under x64 and fail Mosaic legalization
    _z = np.int32(0)
    smem = pl.BlockSpec((T_len, n_o), lambda g: (_z, _z),
                        memory_space=pltpu.SMEM)
    in_specs = [smem, smem,
                *[_mat_spec(n_s, n_s)] * 2,
                *[_mat_spec(n_s, n_sh)] * 2,
                *[_mat_spec(n_sh, n_sh)] * 2,
                *[_mat_spec(n_o, n_s)] * 2,
                *[_mat_spec(n_o, 1)] * 2,
                *[_mat_spec(n_o, n_o)] * 2]
    out_specs = [_out_spec()] * 6
    prod_hi, prod_lo, e_tot, quad_hi, quad_lo, bad = pl.pallas_call(
        kernel,
        grid=(nt,),
        out_shape=out_shape,
        in_specs=in_specs,
        out_specs=out_specs,
        interpret=interpret,
    )(*ins)

    flat = lambda a: a.reshape(nt * TILE_N)[:n]
    logdet = (jnp.log(merge_f64(flat(prod_hi), flat(prod_lo)))
              + flat(e_tot).astype(jnp.float64) * float(np.log(2.0)))
    quad = merge_f64(flat(quad_hi), flat(quad_lo))
    total = -0.5 * (T_len * n_o * _LOG_2PI + logdet + quad)
    ok = (flat(bad) < 0.5) & jnp.isfinite(total)
    if return_parts:
        return jnp.where(ok, total, -jnp.inf), logdet, quad, flat(bad)
    return jnp.where(ok, total, -jnp.inf)


def pallas_dsge_loglike(A, B, C, D, Q, Z, d_obs, H, data,
                        interpret: bool = False):
    """Full fused DSGE likelihood: RE solve + Chandrasekhar Kalman, both as
    Pallas kernels. Same signature family as the XLA bl_ path; bad draws
    (indeterminate / explosive / non-PSD innovations) -> -inf."""
    X, M, ok = pallas_solve_linear_re(A, B, C, D, interpret=interpret)
    ll = pallas_kalman_chandrasekhar(X, M, Q, Z, d_obs, H, data,
                                     interpret=interpret)
    return jnp.where(ok, ll, -jnp.inf)
