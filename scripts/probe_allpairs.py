"""Kernel lab: all-pairs fused-MD variants, timed on the real chip.

Measures atom-steps/s for the production all-pairs kernel (v0, via
ops.md_fused) against experimental variants (slim standalone kernels with
the same step structure: NHC thermostat + velocity Verlet + fix-deform).

Variants:
  v0   production fused path (ops/md_fused.py), for the reference number
  v1   slim re-port of v0's math (sanity: should match v0's speed)
  v2   cached integer-image matrices (n1,n2,n3) in VMEM scratch,
       refreshed in-kernel every R steps; per-step shift reconstruction
       s = n.h(t) via scalar-broadcast FMAs (EXACT forces: a pair's
       min image can only change after ~2.3 A of relative drift)
  v3   v2 + op trims: 6*4*eps baked into w4e, single cutoff compare,
       accumulate blocks into a (128,128) accumulator and reduce once
  v4   v3 + uniform-sigma specialization (scalar sig2, no dense load)

Run:  python scripts/probe_allpairs.py [variants...]
"""
from __future__ import annotations

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
NHC_LEN = 3

N_JOBS = 576
N_STEPS = 500
N_ATOMS = 512
R_REFRESH = 20


def sync(x):
    return float(np.asarray(jax.device_get(x)))


# --------------------------------------------------------------- system
def build_inputs(dtype=jnp.float32):
    """A 512-atom octane-melt-like box (positions at liquid density)."""
    rng = np.random.default_rng(0)
    L = 24.6
    pos = rng.uniform(0, L, (N_ATOMS, 3))
    vel = rng.normal(0, 0.004, (N_ATOMS, 3))
    masses = np.full(N_ATOMS, 14.0)
    h6 = np.array([L, L, L, 0.0, 0.0, 0.0])
    # dense pair params: eps table like OPLS UA (2 types), sigma 3.905
    types = rng.integers(0, 2, N_ATOMS)
    eps_t = np.array([0.175, 0.118])
    epsp = np.sqrt(eps_t[types][:, None] * eps_t[types][None, :])
    w = 1.0 - np.eye(N_ATOMS)
    # fake exclusions: ~3 per atom zeroed like bonded neighbors
    for i in range(N_ATOMS - 1):
        w[i, i + 1] = w[i + 1, i] = 0.0
    w4e = 4.0 * epsp * w
    sig2 = np.full((N_ATOMS, N_ATOMS), 3.905**2)
    return (jnp.asarray(pos, dtype), jnp.asarray(vel, dtype),
            jnp.asarray(masses, dtype), jnp.asarray(h6, dtype),
            jnp.asarray(w4e, dtype), jnp.asarray(sig2, dtype))


CUTOFF2 = 100.0
R2MIN = 0.25
BOLTZ = 0.0019872067
FTM2V = 1.0 / 48.88821291 / 48.88821291
TDAMP = 100.0
DT = 2.0
TEMP = 300.0


# ---------------------------------------------------------- slim kernels
# state rows: 0..2 pos, 3..5 vel, 6 invm(ftm2v/m), 7 m/ftm2v
# fscal: 0 dt, 1 T, 2..7 h0, 8..13 eps, 14..16 vxi
# iscal: 0 n_run, 1 n_tot

def _h_at(h0, eps, frac):
    lx0, ly0, lz0, xy0, xz0, yz0 = h0
    lx = lx0 * (1.0 + frac * eps[0])
    ly = ly0 * (1.0 + frac * eps[1])
    lz = lz0 * (1.0 + frac * eps[2])
    xy = xy0 + frac * eps[3] * ly0
    xz = xz0 + frac * eps[4] * lz0
    yz = yz0 + frac * eps[5] * lz0
    return (lx, ly, lz, xy, xz, yz)


def _remap_coeffs(h_old, h_new):
    lx, ly, lz, xy, xz, yz = h_old
    nlx, nly, nlz, nxy, nxz, nyz = h_new
    i00 = 1.0 / lx
    i11 = 1.0 / ly
    i22 = 1.0 / lz
    i01 = -xy / (lx * ly)
    i12 = -yz / (ly * lz)
    i02 = (xy * yz - xz * ly) / (lx * ly * lz)
    return (nlx * i00, nlx * i01 + nxy * i11,
            nlx * i02 + nxy * i12 + nxz * i22,
            nly * i11, nly * i12 + nyz * i22, nlz * i22)


def make_slim_kernel(NT, variant, jobs=1):
    # NT = lane tiles PER JOB; the state carries jobs*NT tiles
    NPAD = NT * LANE

    def kernel(iscal_ref, fscal_ref, state_ref, w4e_ref, sig2_ref,
               state_out, sacc_ref, *scratch):
        dtype = state_ref.dtype
        n_run = iscal_ref[0, 0]
        n_tot = iscal_ref[0, 1]
        dt = fscal_ref[0, 0]
        T = fscal_ref[0, 1]
        h0 = tuple(fscal_ref[0, 2 + i] for i in range(6))
        eps = tuple(fscal_ref[0, 8 + i] for i in range(6))
        invm = state_ref[0, 6]
        mftm = state_ref[0, 7]
        ndof = (3 * N_ATOMS - 3) * jobs

        def h_of(g):
            frac = g.astype(dtype) / n_tot.astype(dtype)
            return _h_at(h0, eps, frac)

        def forces_v1(px, py, pz, h6):
            lx, ly, lz, xy, xz, yz = h6
            inv_lx, inv_ly, inv_lz = 1.0 / lx, 1.0 / ly, 1.0 / lz
            cols = [
                (jnp.swapaxes(px[u].reshape(1, LANE), 0, 1),
                 jnp.swapaxes(py[u].reshape(1, LANE), 0, 1),
                 jnp.swapaxes(pz[u].reshape(1, LANE), 0, 1))
                for u in range(NT)
            ]
            fxs, fys, fzs = [], [], []
            for t in range(NT):
                xi = px[t].reshape(1, LANE)
                yi = py[t].reshape(1, LANE)
                zi = pz[t].reshape(1, LANE)
                fx_t = jnp.zeros((1, LANE), dtype)
                fy_t = jnp.zeros((1, LANE), dtype)
                fz_t = jnp.zeros((1, LANE), dtype)
                for u in range(NT):
                    xj, yj, zj = cols[u]
                    w4e = w4e_ref[0, u * LANE:(u + 1) * LANE,
                                  t * LANE:(t + 1) * LANE]
                    sig2 = sig2_ref[0, u * LANE:(u + 1) * LANE,
                                    t * LANE:(t + 1) * LANE]
                    dx = xj - xi
                    dy = yj - yi
                    dz = zj - zi
                    n3 = jnp.round(dz * inv_lz)
                    dz = dz - n3 * lz
                    dy = dy - n3 * yz
                    n2 = jnp.round(dy * inv_ly)
                    dy = dy - n2 * ly
                    dx = dx - n3 * xz - n2 * xy
                    n1 = jnp.round(dx * inv_lx)
                    dx = dx - n1 * lx
                    r2 = dx * dx + dy * dy + dz * dz
                    live = (r2 < CUTOFF2) & (r2 > R2MIN)
                    r2c = jnp.maximum(r2, R2MIN)
                    inv_r2 = 1.0 / r2c
                    s2 = sig2 * inv_r2
                    s6 = s2 * s2 * s2
                    fpair = jnp.where(
                        live, 6.0 * w4e * (2.0 * s6 * s6 - s6) * inv_r2, 0.0)
                    fx_t = fx_t - jnp.sum(fpair * dx, axis=0, keepdims=True)
                    fy_t = fy_t - jnp.sum(fpair * dy, axis=0, keepdims=True)
                    fz_t = fz_t - jnp.sum(fpair * dz, axis=0, keepdims=True)
                fxs.append(fx_t.reshape(LANE))
                fys.append(fy_t.reshape(LANE))
                fzs.append(fz_t.reshape(LANE))
            return jnp.stack(fxs), jnp.stack(fys), jnp.stack(fzs)

        def refresh_images(px, py, pz, h6):
            """Store n1,n2,n3 (f32) per pair into scratch."""
            lx, ly, lz, xy, xz, yz = h6
            inv_lx, inv_ly, inv_lz = 1.0 / lx, 1.0 / ly, 1.0 / lz
            n1_s, n2_s, n3_s = scratch
            for j in range(jobs):
              for tj in range(NT):
                t = j * NT + tj
                xi = px[t].reshape(1, LANE)
                yi = py[t].reshape(1, LANE)
                zi = pz[t].reshape(1, LANE)
                for uj in range(NT):
                    u = j * NT + uj
                    xj = jnp.swapaxes(px[u].reshape(1, LANE), 0, 1)
                    yj = jnp.swapaxes(py[u].reshape(1, LANE), 0, 1)
                    zj = jnp.swapaxes(pz[u].reshape(1, LANE), 0, 1)
                    dx = xj - xi
                    dy = yj - yi
                    dz = zj - zi
                    n3 = -jnp.round(dz * inv_lz)
                    dz = dz + n3 * lz
                    dy = dy + n3 * yz
                    n2 = -jnp.round(dy * inv_ly)
                    dy = dy + n2 * ly
                    dx = dx + n3 * xz + n2 * xy
                    n1 = -jnp.round(dx * inv_lx)
                    sl = (slice(u * LANE, (u + 1) * LANE),
                          slice(tj * LANE, (tj + 1) * LANE))
                    n1_s[sl] = n1
                    n2_s[sl] = n2
                    n3_s[sl] = n3

        def forces_newton(px, py, pz, h6):
            """v5: cached images + trims + Newton-halving via block
            transposes (reaction of block (t,u), u>t accumulated by a
            (128,128) transpose — XLU work, concurrent with the VPU)."""
            lx, ly, lz, xy, xz, yz = h6
            n1_s, n2_s, n3_s = scratch
            cols = [
                (jnp.swapaxes(px[u].reshape(1, LANE), 0, 1),
                 jnp.swapaxes(py[u].reshape(1, LANE), 0, 1),
                 jnp.swapaxes(pz[u].reshape(1, LANE), 0, 1))
                for u in range(NT * jobs)
            ]
            acc = [[jnp.zeros((LANE, LANE), dtype) for _ in range(3)]
                   for _ in range(NT * jobs)]
            for j in range(jobs):
              for tj in range(NT):
                t = j * NT + tj
                xi = px[t].reshape(1, LANE)
                yi = py[t].reshape(1, LANE)
                zi = pz[t].reshape(1, LANE)
                for uj in range(tj, NT):
                    u = j * NT + uj
                    xj, yj, zj = cols[u]
                    sl = (slice(u * LANE, (u + 1) * LANE),
                          slice(tj * LANE, (tj + 1) * LANE))
                    w4e = w4e_ref[0][slice(uj * LANE, (uj + 1) * LANE),
                                     slice(tj * LANE, (tj + 1) * LANE)]
                    sig2 = sig2_ref[0][slice(uj * LANE, (uj + 1) * LANE),
                                       slice(tj * LANE, (tj + 1) * LANE)]
                    n1 = n1_s[sl]
                    n2 = n2_s[sl]
                    n3 = n3_s[sl]
                    dx = xj - xi + n1 * lx + n2 * xy + n3 * xz
                    dy = yj - yi + n2 * ly + n3 * yz
                    dz = zj - zi + n3 * lz
                    r2 = dx * dx + dy * dy + dz * dz
                    live = r2 < CUTOFF2
                    r2c = jnp.maximum(r2, R2MIN)
                    if variant in ("v5p", "v7p", "v5r"):
                        # lj1/lj2 5-op form (w4e carries lj1, sig2 lj2)
                        if variant == "v5r":
                            ir = jax.lax.rsqrt(r2c)
                            inv_r2 = ir * ir
                        else:
                            inv_r2 = 1.0 / r2c
                        u2 = inv_r2 * inv_r2
                        u3 = u2 * inv_r2
                        fpair = jnp.where(
                            live, (w4e * u3 - sig2) * u2 * u2, 0.0)
                    else:
                        inv_r2 = 1.0 / r2c
                        s2 = sig2 * inv_r2
                        s6 = s2 * s2 * s2
                        fpair = jnp.where(
                            live, w4e * (2.0 * s6 * s6 - s6) * inv_r2, 0.0)
                    wx = fpair * dx
                    wy = fpair * dy
                    wz = fpair * dz
                    acc[t][0] = acc[t][0] - wx
                    acc[t][1] = acc[t][1] - wy
                    acc[t][2] = acc[t][2] - wz
                    if u > t:
                        acc[u][0] = acc[u][0] + jnp.swapaxes(wx, 0, 1)
                        acc[u][1] = acc[u][1] + jnp.swapaxes(wy, 0, 1)
                        acc[u][2] = acc[u][2] + jnp.swapaxes(wz, 0, 1)
            fxs = [jnp.sum(acc[t][0], axis=0) for t in range(NT * jobs)]
            fys = [jnp.sum(acc[t][1], axis=0) for t in range(NT * jobs)]
            fzs = [jnp.sum(acc[t][2], axis=0) for t in range(NT * jobs)]
            return jnp.stack(fxs), jnp.stack(fys), jnp.stack(fzs)

        def forces_newton_enddot(px, py, pz, h6):
            """v5m: like v5 but the reaction side of block (t,u), u>t is
            accumulated UNtransposed (plain VPU add into a per-tile
            column-sense accumulator) and reduced over lanes ONCE per
            tile at the end via an MXU matvec; only the final (128,1)
            columns get transposed (cheap)."""
            lx, ly, lz, xy, xz, yz = h6
            n1_s, n2_s, n3_s = scratch
            ones_col = jnp.ones((LANE, 1), dtype)
            cols = [
                (jnp.swapaxes(px[u].reshape(1, LANE), 0, 1),
                 jnp.swapaxes(py[u].reshape(1, LANE), 0, 1),
                 jnp.swapaxes(pz[u].reshape(1, LANE), 0, 1))
                for u in range(NT)
            ]
            acc = [[jnp.zeros((LANE, LANE), dtype) for _ in range(3)]
                   for _ in range(NT)]
            accT = [[jnp.zeros((LANE, LANE), dtype) for _ in range(3)]
                    for _ in range(NT)]
            used = [False] * NT
            for t in range(NT):
                xi = px[t].reshape(1, LANE)
                yi = py[t].reshape(1, LANE)
                zi = pz[t].reshape(1, LANE)
                for u in range(t, NT):
                    xj, yj, zj = cols[u]
                    sl = (slice(u * LANE, (u + 1) * LANE),
                          slice(t * LANE, (t + 1) * LANE))
                    w4e = w4e_ref[0][sl]
                    sig2 = sig2_ref[0][sl]
                    n1 = n1_s[sl]
                    n2 = n2_s[sl]
                    n3 = n3_s[sl]
                    dx = xj - xi + n1 * lx + n2 * xy + n3 * xz
                    dy = yj - yi + n2 * ly + n3 * yz
                    dz = zj - zi + n3 * lz
                    r2 = dx * dx + dy * dy + dz * dz
                    live = r2 < CUTOFF2
                    r2c = jnp.maximum(r2, R2MIN)
                    inv_r2 = 1.0 / r2c
                    u2 = inv_r2 * inv_r2
                    u3 = u2 * inv_r2
                    fpair = jnp.where(
                        live, (w4e * u3 - sig2) * u2 * u2, 0.0)
                    wx = fpair * dx
                    wy = fpair * dy
                    wz = fpair * dz
                    acc[t][0] = acc[t][0] - wx
                    acc[t][1] = acc[t][1] - wy
                    acc[t][2] = acc[t][2] - wz
                    if u > t:
                        accT[u][0] = accT[u][0] + wx
                        accT[u][1] = accT[u][1] + wy
                        accT[u][2] = accT[u][2] + wz
                        used[u] = True
            fs = []
            for d in range(3):
                rows_ = []
                for t in range(NT):
                    f = jnp.sum(acc[t][d], axis=0)
                    if used[t]:
                        col = jax.lax.dot_general(
                            accT[t][d], ones_col, (((1,), (0,)), ((), ())),
                            preferred_element_type=dtype)
                        f = f + jnp.swapaxes(col, 0, 1).reshape(LANE)
                    rows_.append(f)
                fs.append(jnp.stack(rows_))
            return fs[0], fs[1], fs[2]

        def forces_newton_mxu(px, py, pz, h6):
            """v8: like v5 but the reaction sum of block (t,u) u>t runs as
            an MXU matvec (wx @ ones -> column) instead of an XLU
            transpose; per-tile column accumulators are transposed once."""
            lx, ly, lz, xy, xz, yz = h6
            n1_s, n2_s, n3_s = scratch
            ones_col = jnp.ones((LANE, 1), dtype)
            cols = [
                (jnp.swapaxes(px[u].reshape(1, LANE), 0, 1),
                 jnp.swapaxes(py[u].reshape(1, LANE), 0, 1),
                 jnp.swapaxes(pz[u].reshape(1, LANE), 0, 1))
                for u in range(NT)
            ]
            acc = [[jnp.zeros((LANE, LANE), dtype) for _ in range(3)]
                   for _ in range(NT)]
            accc = [[jnp.zeros((LANE, 1), dtype) for _ in range(3)]
                    for _ in range(NT)]
            for t in range(NT):
                xi = px[t].reshape(1, LANE)
                yi = py[t].reshape(1, LANE)
                zi = pz[t].reshape(1, LANE)
                for u in range(t, NT):
                    xj, yj, zj = cols[u]
                    sl = (slice(u * LANE, (u + 1) * LANE),
                          slice(t * LANE, (t + 1) * LANE))
                    w4e = w4e_ref[0][sl]
                    sig2 = sig2_ref[0][sl]
                    n1 = n1_s[sl]
                    n2 = n2_s[sl]
                    n3 = n3_s[sl]
                    dx = xj - xi + n1 * lx + n2 * xy + n3 * xz
                    dy = yj - yi + n2 * ly + n3 * yz
                    dz = zj - zi + n3 * lz
                    r2 = dx * dx + dy * dy + dz * dz
                    live = r2 < CUTOFF2
                    r2c = jnp.maximum(r2, R2MIN)
                    inv_r2 = 1.0 / r2c
                    s2 = sig2 * inv_r2
                    s6 = s2 * s2 * s2
                    fpair = jnp.where(
                        live, w4e * (2.0 * s6 * s6 - s6) * inv_r2, 0.0)
                    wx = fpair * dx
                    wy = fpair * dy
                    wz = fpair * dz
                    acc[t][0] = acc[t][0] - wx
                    acc[t][1] = acc[t][1] - wy
                    acc[t][2] = acc[t][2] - wz
                    if u > t:
                        accc[u][0] = accc[u][0] + jax.lax.dot_general(
                            wx, ones_col, (((1,), (0,)), ((), ())),
                            preferred_element_type=dtype)
                        accc[u][1] = accc[u][1] + jax.lax.dot_general(
                            wy, ones_col, (((1,), (0,)), ((), ())),
                            preferred_element_type=dtype)
                        accc[u][2] = accc[u][2] + jax.lax.dot_general(
                            wz, ones_col, (((1,), (0,)), ((), ())),
                            preferred_element_type=dtype)
            fxs = [jnp.sum(acc[t][0], axis=0)
                   + jnp.swapaxes(accc[t][0], 0, 1).reshape(LANE)
                   for t in range(NT)]
            fys = [jnp.sum(acc[t][1], axis=0)
                   + jnp.swapaxes(accc[t][1], 0, 1).reshape(LANE)
                   for t in range(NT)]
            fzs = [jnp.sum(acc[t][2], axis=0)
                   + jnp.swapaxes(accc[t][2], 0, 1).reshape(LANE)
                   for t in range(NT)]
            return jnp.stack(fxs), jnp.stack(fys), jnp.stack(fzs)

        def forces_cached(px, py, pz, h6, trim, unisig):
            lx, ly, lz, xy, xz, yz = h6
            n1_s, n2_s, n3_s = scratch
            cols = [
                (jnp.swapaxes(px[u].reshape(1, LANE), 0, 1),
                 jnp.swapaxes(py[u].reshape(1, LANE), 0, 1),
                 jnp.swapaxes(pz[u].reshape(1, LANE), 0, 1))
                for u in range(NT)
            ]
            sig2s = jnp.asarray(3.905**2, dtype)
            fxs, fys, fzs = [], [], []
            for t in range(NT):
                xi = px[t].reshape(1, LANE)
                yi = py[t].reshape(1, LANE)
                zi = pz[t].reshape(1, LANE)
                if trim:
                    ax = jnp.zeros((LANE, LANE), dtype)
                    ay = jnp.zeros((LANE, LANE), dtype)
                    az = jnp.zeros((LANE, LANE), dtype)
                else:
                    fx_t = jnp.zeros((1, LANE), dtype)
                    fy_t = jnp.zeros((1, LANE), dtype)
                    fz_t = jnp.zeros((1, LANE), dtype)
                for u in range(NT):
                    xj, yj, zj = cols[u]
                    sl = (slice(u * LANE, (u + 1) * LANE),
                          slice(t * LANE, (t + 1) * LANE))
                    w4e = w4e_ref[0][sl]
                    sig2 = sig2s if unisig else sig2_ref[0][sl]
                    n1 = n1_s[sl]
                    n2 = n2_s[sl]
                    n3 = n3_s[sl]
                    dx = xj - xi + n1 * lx + n2 * xy + n3 * xz
                    dy = yj - yi + n2 * ly + n3 * yz
                    dz = zj - zi + n3 * lz
                    r2 = dx * dx + dy * dy + dz * dz
                    if trim:
                        live = r2 < CUTOFF2
                        r2c = jnp.maximum(r2, R2MIN)
                        inv_r2 = 1.0 / r2c
                        s2 = sig2 * inv_r2
                        s6 = s2 * s2 * s2
                        fpair = jnp.where(
                            live, w4e * (2.0 * s6 * s6 - s6) * inv_r2, 0.0)
                        ax = ax + fpair * dx
                        ay = ay + fpair * dy
                        az = az + fpair * dz
                    else:
                        live = (r2 < CUTOFF2) & (r2 > R2MIN)
                        r2c = jnp.maximum(r2, R2MIN)
                        inv_r2 = 1.0 / r2c
                        s2 = sig2 * inv_r2
                        s6 = s2 * s2 * s2
                        fpair = jnp.where(
                            live,
                            6.0 * w4e * (2.0 * s6 * s6 - s6) * inv_r2, 0.0)
                        fx_t = fx_t - jnp.sum(fpair * dx, axis=0,
                                              keepdims=True)
                        fy_t = fy_t - jnp.sum(fpair * dy, axis=0,
                                              keepdims=True)
                        fz_t = fz_t - jnp.sum(fpair * dz, axis=0,
                                              keepdims=True)
                if trim:
                    fx_t = -jnp.sum(ax, axis=0, keepdims=True)
                    fy_t = -jnp.sum(ay, axis=0, keepdims=True)
                    fz_t = -jnp.sum(az, axis=0, keepdims=True)
                fxs.append(fx_t.reshape(LANE))
                fys.append(fy_t.reshape(LANE))
                fzs.append(fz_t.reshape(LANE))
            return jnp.stack(fxs), jnp.stack(fys), jnp.stack(fzs)

        def forces(px, py, pz, h6):
            if variant == "v1":
                return forces_v1(px, py, pz, h6)
            if variant == "v5m":
                return forces_newton_enddot(px, py, pz, h6)
            if variant in ("v5", "v7", "v7d4", "v5p", "v5r", "v7p"):
                return forces_newton(px, py, pz, h6)
            if variant == "v8":
                return forces_newton_mxu(px, py, pz, h6)
            return forces_cached(px, py, pz, h6,
                                 trim=variant in ("v3", "v4"),
                                 unisig=variant == "v4")

        def nhc_half(vx, vy, vz, vxi):
            kt = BOLTZ * T
            q0 = ndof * kt * TDAMP**2
            q = [q0] + [kt * TDAMP**2] * (NHC_LEN - 1)
            dt2, dt4, dt8 = dt / 2.0, dt / 4.0, dt / 8.0
            ke2 = jnp.sum(mftm * (vx * vx + vy * vy + vz * vz))

            def g(kk, ke2_, vxi_):
                if kk == 0:
                    return (ke2_ - ndof * kt) / q[0]
                return (q[kk - 1] * vxi_[kk - 1] ** 2 - kt) / q[kk]

            vxi = list(vxi)
            for kk in range(NHC_LEN - 1, -1, -1):
                if kk == NHC_LEN - 1:
                    vxi[kk] = vxi[kk] + dt4 * g(kk, ke2, vxi)
                else:
                    s = jnp.exp(-dt8 * vxi[kk + 1])
                    vxi[kk] = s * (s * vxi[kk] + dt4 * g(kk, ke2, vxi))
            scale = jnp.exp(-dt2 * vxi[0])
            vx, vy, vz = vx * scale, vy * scale, vz * scale
            ke2 = ke2 * scale * scale
            for kk in range(NHC_LEN):
                if kk == NHC_LEN - 1:
                    vxi[kk] = vxi[kk] + dt4 * g(kk, ke2, vxi)
                else:
                    s = jnp.exp(-dt8 * vxi[kk + 1])
                    vxi[kk] = s * (s * vxi[kk] + dt4 * g(kk, ke2, vxi))
            return vx, vy, vz, tuple(vxi)

        px = state_ref[0, 0]
        py = state_ref[0, 1]
        pz = state_ref[0, 2]
        vx = state_ref[0, 3]
        vy = state_ref[0, 4]
        vz = state_ref[0, 5]
        vxi0 = tuple(fscal_ref[0, 14 + i] for i in range(NHC_LEN))

        fx0, fy0, fz0 = forces(px, py, pz, h_of(jnp.asarray(0, jnp.int32)))

        def step(g_now, carry):
            (px, py, pz, vx, vy, vz, fx, fy, fz, vxi) = carry
            h_now = h_of(g_now)
            vx, vy, vz, vxi = nhc_half(vx, vy, vz, vxi)
            half = 0.5 * dt
            vx = vx + half * fx * invm
            vy = vy + half * fy * invm
            vz = vz + half * fz * invm
            px = px + dt * vx
            py = py + dt * vy
            pz = pz + dt * vz
            fx, fy, fz = forces(px, py, pz, h_now)
            vx = vx + half * fx * invm
            vy = vy + half * fy * invm
            vz = vz + half * fz * invm
            vx, vy, vz, vxi = nhc_half(vx, vy, vz, vxi)
            h_new = h_of(g_now + 1)
            a00, a01, a02, a11, a12, a22 = _remap_coeffs(h_now, h_new)
            px = a00 * px + a01 * py + a02 * pz
            py = a11 * py + a12 * pz
            pz = a22 * pz
            return (px, py, pz, vx, vy, vz, fx, fy, fz, vxi)

        carry = (px, py, pz, vx, vy, vz, fx0, fy0, fz0, vxi0)
        if variant == "v1":
            def stepw(s, c):
                return step(s, c)
            carry = jax.lax.fori_loop(0, n_run, stepw, carry)
        else:
            # chunked: refresh cached images every R steps
            n_outer = (n_run + R_REFRESH - 1) // R_REFRESH

            def outer(c, carry):
                g0 = c * R_REFRESH
                (px, py, pz) = carry[:3]
                refresh_images(px, py, pz, h_of(g0))
                trips = jnp.minimum(n_run - g0, R_REFRESH)

                def inner(s, cc):
                    return step(g0 + s, cc)
                return jax.lax.fori_loop(0, trips, inner, carry)

            carry = jax.lax.fori_loop(0, n_outer, outer, carry)

        (px, py, pz, vx, vy, vz, fx, fy, fz, vxi) = carry
        state_out[0, 0] = px
        state_out[0, 1] = py
        state_out[0, 2] = pz
        state_out[0, 3] = vx
        state_out[0, 4] = vy
        state_out[0, 5] = vz
        state_out[0, 6] = invm
        state_out[0, 7] = mftm
        for i in range(NHC_LEN):
            sacc_ref[0, i] = vxi[i]
        ke2 = jnp.sum(mftm * (vx * vx + vy * vy + vz * vz))
        sacc_ref[0, NHC_LEN] = ke2
        for i in range(NHC_LEN + 1, 8):
            sacc_ref[0, i] = jnp.zeros((), dtype)

    return kernel


@partial(jax.jit, static_argnames=("variant", "nt", "jobs"))
def run_slim(variant, nt, state, w4e, sig2, iscal, fscal, jobs=1):
    NPAD = nt * LANE
    kern = make_slim_kernel(nt, variant, jobs=jobs)
    dense = pl.BlockSpec((1, NPAD, NPAD), lambda: (0, 0, 0))
    scratch = []
    if variant != "v1":
        scratch = [pltpu.VMEM((jobs * NPAD, NPAD), state.dtype)] * 3
    out = pl.pallas_call(
        kern,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        out_shape=(
            jax.ShapeDtypeStruct((1, 8, jobs * nt, LANE), state.dtype),
            jax.ShapeDtypeStruct((1, 8), state.dtype),
        ),
        in_specs=[
            pl.BlockSpec((1, 2), lambda: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 20), lambda: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8, jobs * nt, LANE), lambda: (0, 0, 0, 0)),
            dense, dense,
        ],
        out_specs=(
            pl.BlockSpec((1, 8, jobs * nt, LANE), lambda: (0, 0, 0, 0)),
            pl.BlockSpec((1, 8), lambda: (0, 0), memory_space=pltpu.SMEM),
        ),
        scratch_shapes=scratch,
        interpret=False,
    )(iscal[None], fscal[None], state[None], w4e[None], sig2[None])
    return out[0][0], out[1][0]


def pack_state(pos, vel, masses, dtype):
    n = pos.shape[0]
    npad = ((n + LANE - 1) // LANE) * LANE
    NT = npad // LANE

    def ch(x):
        return jnp.pad(x.astype(dtype), (0, npad - n)).reshape(NT, LANE)

    invm = FTM2V / masses
    mftm = masses / FTM2V
    return jnp.stack([ch(pos[:, 0]), ch(pos[:, 1]), ch(pos[:, 2]),
                      ch(vel[:, 0]), ch(vel[:, 1]), ch(vel[:, 2]),
                      ch(invm), ch(mftm)])


def time_variant(name, fn, *args):
    t0 = time.perf_counter()
    st, sacc = fn(*args)
    sync(sacc[0, 0])
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        st, sacc = fn(*args)
        sync(sacc[0, 0])
        times.append(time.perf_counter() - t0)
    best = min(times)
    aps = N_JOBS * N_ATOMS * N_STEPS / best
    pps = N_JOBS * N_ATOMS * N_ATOMS * N_STEPS / best
    print(f"{name}: {best*1e3:.1f} ms  {aps:.3e} atom-steps/s  "
          f"{pps/1e9:.1f} Gpair/s  (compile {compile_s:.1f}s)  "
          f"vxi0={sync(sacc[0, 0]):.6g} ke2={sync(sacc[0, 3]):.6g}")
    return aps


def main(variants):
    dtype = jnp.float32
    pos, vel, masses, h6, w4e, sig2 = build_inputs(dtype)
    NT = 4
    state = pack_state(pos, vel, masses, dtype)
    eps = jnp.zeros(6, dtype).at[2].set(3e-4)
    fscal = jnp.zeros(20, dtype)
    fscal = fscal.at[0].set(DT).at[1].set(TEMP)
    fscal = fscal.at[2:8].set(h6)
    fscal = fscal.at[8:14].set(eps)
    iscal = jnp.asarray([N_STEPS, N_STEPS], jnp.int32)

    for v in variants:
        if v in ("v0", "v0p"):
            time_v0(packed=v == "v0p")
            continue
        w4e_v = w4e * (6.0 if v in ("v3", "v4", "v5", "v7", "v7d4", "v8")
                       else 1.0)
        sig2_v = sig2
        if v in ("v5p", "v5r", "v7p", "v5m"):
            # lj1/lj2 coefficient matrices (w4e slot = lj1, sig2 slot = lj2)
            w4e_v = 12.0 * w4e * sig2 ** 6
            sig2_v = 6.0 * w4e * sig2 ** 3
        jobs = {"v7": 2, "v7d4": 4, "v7p": 2}.get(v, 1)
        nprog = N_JOBS // jobs
        st2 = jnp.concatenate([state] * jobs, axis=1)
        batch = jnp.broadcast_to(st2, (nprog,) + st2.shape)
        w4e_b = jnp.broadcast_to(w4e_v, (nprog,) + w4e.shape)
        sig2_b = jnp.broadcast_to(sig2_v, (nprog,) + sig2.shape)
        isb = jnp.broadcast_to(iscal, (nprog,) + iscal.shape)
        fsb = jnp.broadcast_to(fscal, (nprog,) + fscal.shape)

        @jax.jit
        def run_batch(b, w, s2_, ib, fb, v=v, jobs=jobs):
            return jax.vmap(
                lambda st_, w_, s_, i_, f_: run_slim(v, NT, st_, w_, s_, i_,
                                                     f_, jobs=jobs)
            )(b, w, s2_, ib, fb)

        time_variant(v, run_batch, batch, w4e_b, sig2_b, isb, fsb)


def time_v0(packed=False):
    """Production path baseline via ops.md_fused (packed=2 jobs/program)."""
    from scema_tpu.md import material as M
    from scema_tpu.md import engine as E
    from scema_tpu.md.homogenization import MDParams
    from scema_tpu.ops import md_fused as MFU

    spec = M.MaterialSpec(name="g0", force_field="opls")
    sys_, st0 = M.build_system(spec, dtype=jnp.float32)
    params = MDParams(temperature=300.0, dt=2.0, strain_rate=1e-4,
                      nsteps_sample=100)
    key = jax.random.PRNGKey(0)
    st0 = M.equilibrate(sys_, st0, params, key, minimize_steps=50,
                        equil_steps=50)
    eps = jnp.zeros((N_JOBS, 6), jnp.float32).at[:, 2].set(
        jnp.linspace(1e-4, 5e-4, N_JOBS))
    batch = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (N_JOBS,) + x.shape), st0)

    if packed:
        J = 2
        batch = jax.tree_util.tree_map(
            lambda x: x.reshape((N_JOBS // J, J) + x.shape[1:]), batch)
        eps = eps.reshape(N_JOBS // J, J, 6)
        nsJ = jnp.full((J,), N_STEPS, jnp.int32)
        dtJ = jnp.full((J,), 2.0, jnp.float32)

        @jax.jit
        def run(b, e):
            return jax.vmap(
                lambda s, ee: MFU.run_strain_fused_multi(
                    sys_.fused, s, ee, nsJ, 300.0, dtJ))(b, e)
    else:
        @jax.jit
        def run(b, e):
            return jax.vmap(
                lambda s, ee: E.run_strain(sys_, s, ee, jnp.asarray(N_STEPS),
                                           300.0, 2.0))(b, e)

    t0 = time.perf_counter()
    out = run(batch, eps)
    sync(out.pos.reshape(-1)[0])
    lbl = "v0p" if packed else "v0"
    print(f"  ({lbl} compile+run {time.perf_counter()-t0:.1f}s)")
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(batch, eps)
        sync(out.pos.reshape(-1)[0])
        times.append(time.perf_counter() - t0)
    best = min(times)
    aps = N_JOBS * N_ATOMS * N_STEPS / best
    print(f"{lbl}: {best*1e3:.1f} ms  {aps:.3e} atom-steps/s")


if __name__ == "__main__":
    main(sys.argv[1:] or ["v0", "v1", "v2", "v3", "v4"])
